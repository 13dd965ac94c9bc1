"""Pallas TPU kernel for a whole stride-1 MBConv block.

The measured v2.4 roofline (docs/performance.md) is activation traffic:
XLA already fuses each block's expand-1x1 + BN + swish *into* the
depthwise conv, but the 6x-expanded depthwise output slab ``h [Cm, HW]``
still crosses HBM on its way through SE and the project conv. For the
ten stride-1 blocks of the v2.4 backbone those mid slabs sum to ~3.5 M
elements per batch item — ~3.6 GB/step of the program's ~6 GB at b256.

This kernel runs the ENTIRE block per batch item with every intermediate
VMEM-resident:

    x0 [Cin, HW] -> expand 1x1 (MXU) -> BN affine -> swish
       -> depthwise kxk stride-1 SAME (VPU, masked lane shifts)
       -> BN affine -> swish
       -> SE gate (lane-reduce pool + two MXU dots + sigmoid)
       -> project 1x1 (MXU) -> BN affine -> [+ residual]
    -> out [O, HW]

HBM crossings per block drop to read(x0) + [read(x_res)] + write(out) —
the expanded slab never exists outside VMEM.

The depthwise conv is the part XLA cannot do this way: its lowering
materializes the conv operand. Here it is k*k masked shift-MACs against
a zero-padded VMEM scratch — shifts along the flattened HW lane axis are
*static* slices (stride 1 means input and output grids coincide; the
only correction is a per-column validity mask at the left/right image
borders, and the zero scratch apron covers top/bottom). Stride-2 blocks
would need a lane compaction (gather) Mosaic does not offer — they keep
the SE/SEP kernels (``ops/se.py``).

BN affines arrive pre-folded (scale/shift per channel, conv biases
folded into the shift at graph time — ``onnx/fuse.py::fuse_mbconv_s1``),
so real exports that fold BN into conv weights match the same kernel
with identity affines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Mosaic's default scoped-vmem check is 16 MB; v5e has 128 MB of VMEM per
# core. The kernel requests a higher ceiling (it's a compile-time check,
# not an allocation) and the geometry gate below keeps requests honest.
_VMEM_LIMIT = 100 * 2**20
_VMEM_BUDGET = 72 * 2**20


def kernel_enabled(compute_dtype) -> bool:
    """bf16-on-TPU gate; ``BIRDA_MBCONV_KERNEL=off`` forces composed ops,
    ``=pallas`` forces the kernel on (interpret mode off-TPU — tests)."""
    import os

    # Default "off" until the kernel is Mosaic-verified on the real chip
    # (scripts/verify_kernels_tpu.py) — the tunnel was down when it landed.
    mode = os.environ.get("BIRDA_MBCONV_KERNEL", "off")
    if mode == "off":
        return False
    if compute_dtype != jnp.bfloat16:
        return False
    if mode != "pallas":
        try:
            if jax.default_backend() != "tpu":
                return False
        except RuntimeError:
            return False
    return True


def geometry_ok(x_shape, cm: int, o_ch: int, k: int,
                has_expand: bool, has_res: bool) -> bool:
    """Whole-block VMEM budget: x0 + expanded slab + padded dw scratch +
    fp32 dw accumulator + gate scratch + fp32 out accumulator."""
    if len(x_shape) != 4:
        return False
    _, cin, h, w = (int(d) for d in x_shape)
    hw = h * w
    if cin % 8 or cm % 8 or o_ch % 8 or hw % 8:
        return False
    if k % 2 == 0 or k > 7:
        return False
    pad = (k // 2) * w + (k // 2)
    x_b = cin * hw * 2
    e_b = cm * hw * (2 + 4) if has_expand else 0  # bf16 slab + f32 dot temp
    scratch_b = cm * (hw + 2 * pad) * 2
    dw_acc_b = cm * hw * 4
    tap_b = cm * hw * 12  # one tap's slice/mask/convert/product temps
    h_b = cm * hw * (4 + 2 + 2)  # h f32, h16, gated
    out_b = o_ch * hw * 2 + o_ch * hw * 4
    res_b = o_ch * hw * 2 if has_res else 0
    gate_b = cm * 128 * 4 * 2
    total = (x_b + e_b + scratch_b + dw_acc_b + tap_b + h_b + out_b
             + res_b + gate_b)
    return total < _VMEM_BUDGET


def _kernel(k, w_img, hw, interpret, has_expand, has_res, *refs):
    from jax import lax

    # refs: x0, [we], ae_s, ae_t, wd, ad_s, ad_t, w1, b1, w2, b2,
    #       wp, ap_s, ap_t, [x_res], o, dw_scratch, acc_scratch
    it = iter(refs)
    x_ref = next(it)
    we_ref = ae_s = ae_t = None
    if has_expand:
        we_ref, ae_s, ae_t = next(it), next(it), next(it)
    wd_ref = next(it)
    ad_s, ad_t = next(it), next(it)
    w1_ref, b1_ref, w2_ref, b2_ref = next(it), next(it), next(it), next(it)
    wp_ref, ap_s, ap_t = next(it), next(it), next(it)
    res_ref = next(it) if has_res else None
    o_ref = next(it)
    pad_ref = next(it)  # [Cm, HW + 2*PAD] bf16 scratch
    acc_ref = next(it)  # [Cm, HW] f32 scratch (dw accumulator)

    x0 = x_ref[0]  # [Cin, HW] bf16
    if has_expand:
        we = we_ref[:]
        lhs, rhs = we, x0
        if interpret:
            lhs, rhs = lhs.astype(jnp.float32), rhs.astype(jnp.float32)
        e = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
        e = e * ae_s[:] + ae_t[:]
        e = e * jax.nn.sigmoid(e)
        e16 = e.astype(jnp.bfloat16)
    else:
        e16 = x0

    # Depthwise kxk stride-1 SAME: zero apron + masked static lane shifts.
    p = k // 2
    pad_n = p * w_img + p
    pad_ref[:] = jnp.zeros(pad_ref.shape, pad_ref.dtype)
    pad_ref[:, pad_n:pad_n + hw] = e16
    col = lax.broadcasted_iota(jnp.int32, (1, hw), 1) % w_img
    # Accumulate into a VMEM scratch ref, one store per tap: the SSA-chain
    # form kept every tap's slice/convert temporaries live on the Mosaic
    # scoped-vmem stack (k=5 at HW=384 wanted 30 MB against the 16 MB
    # default); ref stores bound the live set to one tap's temporaries.
    acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)
    for dy in range(k):
        for dx in range(k):
            off = (dy - p) * w_img + (dx - p)
            sl = pad_ref[:, pad_n + off:pad_n + off + hw]
            dxr = dx - p
            if dxr < 0:
                sl = jnp.where(col + dxr >= 0, sl, 0)
            elif dxr > 0:
                sl = jnp.where(col + dxr < w_img, sl, 0)
            acc_ref[:] = acc_ref[:] + wd_ref[:, dy * k + dx:dy * k + dx + 1] \
                * sl.astype(jnp.float32)
    h = acc_ref[:] * ad_s[:] + ad_t[:]
    h = h * jax.nn.sigmoid(h)
    h16 = h.astype(jnp.bfloat16)

    # SE gate, everything in VMEM (same math as ops/se.py).
    pool = (jnp.sum(h, axis=1, keepdims=True) * (1.0 / hw))
    s = jnp.broadcast_to(pool, (pool.shape[0], 128)).astype(jnp.bfloat16)
    w1, w2, wp = w1_ref[:], w2_ref[:], wp_ref[:]
    if interpret:
        s, w1, w2, wp = (v.astype(jnp.float32) for v in (s, w1, w2, wp))
    r = jnp.dot(w1, s, preferred_element_type=jnp.float32) + b1_ref[:]
    r = r * jax.nn.sigmoid(r)
    rb = r.astype(jnp.bfloat16)
    if interpret:
        rb = rb.astype(jnp.float32)
    g = jnp.dot(w2, rb, preferred_element_type=jnp.float32) + b2_ref[:]
    gate = jax.nn.sigmoid(g[:, :1]).astype(jnp.bfloat16)

    gated = h16 * gate
    if interpret:
        gated = gated.astype(jnp.float32)
    out = jnp.dot(wp, gated, preferred_element_type=jnp.float32)
    out = out * ap_s[:] + ap_t[:]
    if has_res:
        out = out + res_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def fused_mbconv_s1(x, we, ae_scale, ae_shift, wd, ad_scale, ad_shift,
                    w1, b1, w2, b2, wp, ap_scale, ap_shift, x_res=None,
                    interpret: bool | None = None):
    """``[B,Cin,H,W] -> [B,O,H,W]`` whole stride-1 MBConv block.

    ``we [Cm, Cin]`` (or None when expand ratio is 1), ``wd [Cm, k*k]``
    depthwise taps, gate MLP ``w1/b1/w2/b2``, project ``wp [O, Cm]``.
    The ``a*_scale``/``a*_shift`` pairs are the folded per-channel
    affines (BatchNorm + conv bias); identity when the export folded BN
    into the weights. ``x_res`` is the optional residual operand.
    """
    if interpret is None:
        try:
            interpret = jax.default_backend() != "tpu"
        except RuntimeError:
            interpret = True
    return _fused_mbconv_s1(x, we, ae_scale, ae_shift, wd, ad_scale,
                            ad_shift, w1, b1, w2, b2, wp, ap_scale,
                            ap_shift, x_res, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_mbconv_s1(x, we, ae_scale, ae_shift, wd, ad_scale, ad_shift,
                     w1, b1, w2, b2, wp, ap_scale, ap_shift, x_res,
                     interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, cin, h, w = x.shape
    hw = h * w
    cm = wd.shape[0]
    k = int(round(float(wd.shape[1]) ** 0.5))
    assert k * k == wd.shape[1], wd.shape
    c_se = w1.shape[0]
    o_ch = wp.shape[0]
    has_expand = we is not None
    has_res = x_res is not None
    pad_n = (k // 2) * w + (k // 2)

    f32col = lambda v, n: jnp.asarray(v, jnp.float32).reshape(n, 1)  # noqa: E731
    full = lambda shape: pl.BlockSpec(  # noqa: E731 — weight-resident spec
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    operands = [x.reshape(b, cin, hw).astype(jnp.bfloat16)]
    in_specs = [pl.BlockSpec((1, cin, hw), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    if has_expand:
        operands += [jnp.asarray(we, jnp.bfloat16),
                     f32col(ae_scale, cm), f32col(ae_shift, cm)]
        in_specs += [full((cm, cin)), full((cm, 1)), full((cm, 1))]
    operands += [jnp.asarray(wd, jnp.float32),
                 f32col(ad_scale, cm), f32col(ad_shift, cm),
                 jnp.asarray(w1, jnp.bfloat16), f32col(b1, c_se),
                 jnp.asarray(w2, jnp.bfloat16), f32col(b2, cm),
                 jnp.asarray(wp, jnp.bfloat16),
                 f32col(ap_scale, o_ch), f32col(ap_shift, o_ch)]
    in_specs += [full((cm, k * k)),
                 full((cm, 1)), full((cm, 1)),
                 full((c_se, cm)), full((c_se, 1)),
                 full((cm, c_se)), full((cm, 1)),
                 full((o_ch, cm)), full((o_ch, 1)), full((o_ch, 1))]
    if has_res:
        operands.append(x_res.reshape(b, o_ch, hw).astype(jnp.bfloat16))
        in_specs.append(pl.BlockSpec((1, o_ch, hw), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_kernel, k, w, hw, interpret, has_expand,
                          has_res),
        out_shape=jax.ShapeDtypeStruct((b, o_ch, hw), jnp.bfloat16),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, o_ch, hw), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((cm, hw + 2 * pad_n), jnp.bfloat16),
                        pltpu.VMEM((cm, hw), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hw * (cin * cm * has_expand + cm * k * k
                                + o_ch * cm)
            + 4 * b * cm * c_se * 128,
            bytes_accessed=b * hw * (cin + o_ch * (1 + has_res)) * 2,
            transcendentals=b * (2 * cm * hw + (cm + c_se) * 128),
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(b, o_ch, h, w).astype(x.dtype)
