"""Pallas TPU kernel for the squeeze-and-excitation (SE) gate.

Every MBConv block of the BirdNET/Perch backbones gates its depthwise
output ``h [B, C, H, W]`` with an SE branch (reference model family:
EfficientNet; the ONNX spelling is ``GlobalAveragePool -> 1x1 Conv ->
swish -> 1x1 Conv -> Sigmoid -> Mul``, see
``onnx/fullscale.py::_Builder.se``). Executed as composed XLA ops the
slab crosses HBM three times around the gate:

    dw-conv fusion writes h          (W)
    pool reduce reads h              (R)   <- this one is redundant
    Mul(h, gate) reads h, writes out (R+W)

The gate itself is tiny (two ``[C_se, C]``-sized matvecs), so the whole
branch is pure HBM traffic. This kernel performs pool + gate MLP + the
elementwise multiply in one pass with the slab VMEM-resident: per batch
item it reads ``h`` once, reduces it in fp32, runs the two gate matmuls
on the MXU, and writes the gated slab — 2 slab crossings instead of 3.
At BirdNET v2.4 batch-256 scale the SE slabs sum to ~1 GB/step of the
program's ~6 GB fusion-boundary traffic, so the saved read is worth
~5-8% end to end (measured table: docs/performance.md).

Layout notes (why this compiles on Mosaic where naive spellings don't):
the slab is kept ``[C, HW]`` — channels on sublanes, pixels on lanes —
so the pool is a lane reduction to ``[C, 1]``, the gate vector
lane-broadcasts back onto the slab, and no transpose is ever needed.
The pooled vector is broadcast to 128 lanes so both gate matmuls are
ordinary MXU dots (every lane computes the same gate; 128x redundant
compute on a ~C*C_se/4 FLOP matmul is noise next to one slab read).

Applies when ``C % 8 == 0`` and ``H*W % 8 == 0`` (true for every SE
block of the three release-graph geometries) and the slab fits VMEM;
everything else falls back to the composed-op path in
``onnx/lowering.py::op_BirdaFusedSE``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_VMEM_BUDGET = 13 * 2**20


def kernel_enabled(compute_dtype) -> bool:
    """bf16-on-TPU gate, same contract as ``stft_conv.kernel_enabled``:
    ``BIRDA_SE_KERNEL=off`` forces the composed path, ``=se`` fuses the
    gate but not the project conv (A/B isolation), ``=pallas`` forces the
    kernel on (interpret mode off-TPU — tests)."""
    import os

    # Default "off" until the kernel is Mosaic-verified on the real chip
    # (scripts/verify_kernels_tpu.py) — the tunnel was down when it landed.
    mode = os.environ.get("BIRDA_SE_KERNEL", "off")
    if mode == "off":
        return False
    if compute_dtype != jnp.bfloat16:
        return False
    if mode not in ("pallas", "pallas-se"):
        try:
            if jax.default_backend() != "tpu":
                return False
        except RuntimeError:
            return False
    return True


def absorb_project_enabled() -> bool:
    """Whether the fusion pass may absorb the block's 1x1 project conv
    into the SE kernel (``BIRDA_SE_KERNEL=se`` / ``pallas-se`` keep them
    separate — the A/B isolation modes)."""
    import os

    return os.environ.get("BIRDA_SE_KERNEL", "auto") not in (
        "se", "pallas-se")


def geometry_ok(x_shape) -> bool:
    """Mosaic-friendly slab: channels on 8-aligned sublanes, pixels on
    lanes (any 8-multiple — Mosaic pads the lane tail internally and the
    kernel's reductions/dots see logical shapes), in + out + fp32 gate
    scratch under the VMEM budget."""
    if len(x_shape) != 4:
        return False
    _, c, h, w = (int(d) for d in x_shape)
    hw = h * w
    if c % 8 or hw % 8:
        return False
    slab = c * hw * 2
    return 2 * slab + c * 128 * 4 * 2 < _VMEM_BUDGET


def geometry_ok_project(x_shape, out_ch: int, has_res: bool = False) -> bool:
    """:func:`geometry_ok` plus the project-conv output slab, its fp32
    accumulator, and (when absorbed) the residual slab in the same VMEM
    budget."""
    if not geometry_ok(x_shape):
        return False
    _, c, h, w = (int(d) for d in x_shape)
    hw = h * w
    slab = c * hw * 2
    out = out_ch * hw * 2 + out_ch * hw * 4  # bf16 out + fp32 acc
    res = out_ch * hw * 2 if has_res else 0
    return 2 * slab + out + res + c * 128 * 4 * 2 < _VMEM_BUDGET


def _kernel(hw, interpret, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    slab = x_ref[0]  # [C, HW] bf16
    pool = (jnp.sum(slab.astype(jnp.float32), axis=1, keepdims=True)
            * (1.0 / hw))  # [C, 1] fp32
    s = jnp.broadcast_to(pool, (pool.shape[0], 128)).astype(slab.dtype)
    w1, w2 = w1_ref[:], w2_ref[:]
    if interpret:  # XLA:CPU has no bf16 dot; operands already rounded
        s, w1, w2 = (v.astype(jnp.float32) for v in (s, w1, w2))
    r = jnp.dot(w1, s, preferred_element_type=jnp.float32) + b1_ref[:]
    r = r * jax.nn.sigmoid(r)  # swish, fp32
    rb = r.astype(slab.dtype)
    if interpret:
        rb = rb.astype(jnp.float32)
    g = jnp.dot(w2, rb, preferred_element_type=jnp.float32) + b2_ref[:]
    gate = jax.nn.sigmoid(g[:, :1]).astype(slab.dtype)  # [C, 1]
    o_ref[0] = slab * gate  # lane-broadcast multiply


def fused_se(x, w1, b1, w2, b2, interpret: bool | None = None):
    """``[B,C,H,W] -> [B,C,H,W]`` fused SE gate.

    ``w1 [C_se, C]`` / ``b1 [C_se]`` are the squeeze 1x1 conv (squeezed of
    its spatial axes), ``w2 [C, C_se]`` / ``b2 [C]`` the excite conv.
    bf16 slab and matmul operands, fp32 pool and gate math — one read and
    one write of the slab per batch item.
    """
    if interpret is None:
        try:
            interpret = jax.default_backend() != "tpu"
        except RuntimeError:
            interpret = True
    return _fused_se(x, w1, b1, w2, b2, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_se(x, w1, b1, w2, b2, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, c, h, w = x.shape
    hw = h * w
    c_se = w1.shape[0]
    xs = x.reshape(b, c, hw).astype(jnp.bfloat16)
    w1m = jnp.asarray(w1, jnp.bfloat16)
    w2m = jnp.asarray(w2, jnp.bfloat16)
    b1m = jnp.asarray(b1, jnp.float32).reshape(c_se, 1)
    b2m = jnp.asarray(b2, jnp.float32).reshape(c, 1)

    out = pl.pallas_call(
        functools.partial(_kernel, hw, interpret),
        out_shape=jax.ShapeDtypeStruct((b, c, hw), jnp.bfloat16),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, hw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_se, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_se, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c_se), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, hw), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (c * hw + 2 * c * c_se * 128),
            bytes_accessed=2 * b * c * hw * 2,
            transcendentals=b * (c + c_se) * 128,
        ),
        interpret=interpret,
    )(xs, w1m, b1m, w2m, b2m)
    return out.reshape(b, c, h, w).astype(x.dtype)


# ---------------------------------------------------------------------------
# SE + project-conv in one kernel: the gated slab never leaves VMEM
# ---------------------------------------------------------------------------

def _kernel_project(hw, interpret, has_bn, has_res, *refs):
    # refs: x, w1, b1, w2, b2, wp, bp, [bn_s, bn_t], [x_res], o
    (x_ref, w1_ref, b1_ref, w2_ref, b2_ref, wp_ref, bp_ref), rest = \
        refs[:7], refs[7:]
    bn_s_ref = bn_t_ref = res_ref = None
    if has_bn:
        bn_s_ref, bn_t_ref, rest = rest[0], rest[1], rest[2:]
    if has_res:
        res_ref, rest = rest[0], rest[1:]
    (o_ref,) = rest

    slab = x_ref[0]  # [C, HW] bf16
    pool = (jnp.sum(slab.astype(jnp.float32), axis=1, keepdims=True)
            * (1.0 / hw))
    s = jnp.broadcast_to(pool, (pool.shape[0], 128)).astype(slab.dtype)
    w1, w2, wp = w1_ref[:], w2_ref[:], wp_ref[:]
    if interpret:
        s, w1, w2, wp = (v.astype(jnp.float32) for v in (s, w1, w2, wp))
    r = jnp.dot(w1, s, preferred_element_type=jnp.float32) + b1_ref[:]
    r = r * jax.nn.sigmoid(r)
    rb = r.astype(slab.dtype)
    if interpret:
        rb = rb.astype(jnp.float32)
    g = jnp.dot(w2, rb, preferred_element_type=jnp.float32) + b2_ref[:]
    gate = jax.nn.sigmoid(g[:, :1]).astype(slab.dtype)
    gated = slab * gate  # [C, HW], VMEM only — never written to HBM
    if interpret:
        gated = gated.astype(jnp.float32)
    acc = jnp.dot(wp, gated, preferred_element_type=jnp.float32)  # [O, HW]
    acc = acc + bp_ref[:]
    if has_bn:
        acc = acc * bn_s_ref[:] + bn_t_ref[:]
    if has_res:
        acc = acc + res_ref[0].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def fused_se_project(x, w1, b1, w2, b2, wp, bp, bn_scale=None,
                     bn_shift=None, x_res=None,
                     interpret: bool | None = None):
    """``[B,C,H,W] -> [B,O,H,W]``: SE gate + the block's 1x1 project conv,
    optionally + the folded BatchNorm affine and the block's residual add.

    Same gate math as :func:`fused_se`, then the project matmul
    ``wp [O, C]`` (+ ``bp [O]``) runs on the MXU against the VMEM-resident
    gated slab — the chain's HBM crossings drop from
    ``write(h) + read(mul) + write(gated) + read(project) + write(out)``
    to ``write(h) + read(kernel) + write(out)``. Absorbing the BN affine
    (``bn_scale``/``bn_shift`` per channel, folded at graph time) and the
    residual (``x_res [B,O,H,W]``) also saves the project output's own
    HBM round trip through the elementwise BN+add fusion.
    """
    if interpret is None:
        try:
            interpret = jax.default_backend() != "tpu"
        except RuntimeError:
            interpret = True
    return _fused_se_project(x, w1, b1, w2, b2, wp, bp, bn_scale,
                             bn_shift, x_res, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_se_project(x, w1, b1, w2, b2, wp, bp, bn_scale, bn_shift,
                      x_res, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, c, h, w = x.shape
    hw = h * w
    c_se = w1.shape[0]
    o_ch = wp.shape[0]
    has_bn = bn_scale is not None
    has_res = x_res is not None
    xs = x.reshape(b, c, hw).astype(jnp.bfloat16)
    w1m = jnp.asarray(w1, jnp.bfloat16)
    w2m = jnp.asarray(w2, jnp.bfloat16)
    wpm = jnp.asarray(wp, jnp.bfloat16)
    b1m = jnp.asarray(b1, jnp.float32).reshape(c_se, 1)
    b2m = jnp.asarray(b2, jnp.float32).reshape(c, 1)
    bpm = jnp.asarray(bp, jnp.float32).reshape(o_ch, 1)

    full = lambda shape: pl.BlockSpec(  # noqa: E731 — weight-resident spec
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    operands = [xs, w1m, b1m, w2m, b2m, wpm, bpm]
    in_specs = [
        pl.BlockSpec((1, c, hw), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        full((c_se, c)), full((c_se, 1)), full((c, c_se)), full((c, 1)),
        full((o_ch, c)), full((o_ch, 1)),
    ]
    if has_bn:
        operands += [jnp.asarray(bn_scale, jnp.float32).reshape(o_ch, 1),
                     jnp.asarray(bn_shift, jnp.float32).reshape(o_ch, 1)]
        in_specs += [full((o_ch, 1)), full((o_ch, 1))]
    if has_res:
        operands.append(x_res.reshape(b, o_ch, hw).astype(jnp.bfloat16))
        in_specs.append(pl.BlockSpec((1, o_ch, hw), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_kernel_project, hw, interpret, has_bn, has_res),
        out_shape=jax.ShapeDtypeStruct((b, o_ch, hw), jnp.bfloat16),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, o_ch, hw), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (c * hw + 2 * c * c_se * 128 + o_ch * c * hw),
            bytes_accessed=(b * (c + o_ch * (1 + has_res)) * hw * 2
                            + o_ch * c * 2),
            transcendentals=b * (c + c_se) * 128,
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(b, o_ch, h, w).astype(x.dtype)
