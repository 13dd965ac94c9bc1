"""Pallas TPU kernel for the Conv1d-STFT front-end.

The BirdNET/Perch release graphs compute their spectrogram *in-graph* as a
single-channel strided Conv1d whose kernel is the windowed DFT matrix
(reference manifests, ``graph.notes``; lowered at
``birda_tpu/onnx/lowering.py::op_Conv``). At full scale that op is the
hottest thing in the program — for BirdNET v2.4 at batch 256 the window is
2048 samples on a 278-sample hop, so every input sample belongs to ~7.4
frames. XLA's two available lowerings both materialize that redundancy in
HBM:

- the frames-gather + matmul form writes a 536 MB ``[B, T, 2048]`` frames
  tensor and then a second ~536 MB layout copy before the dot — measured
  ~38% of the whole v2.4 inference step (``scripts/traffic_table.py``,
  XLA ``estimated_cycles``);
- ``lax.conv_general_dilated`` im2cols internally and estimates ~30%
  *slower* than the gather form.

This kernel removes the redundancy instead of copying it. Reshape the
signal into hop-sized blocks ``xb[B, NB, HOP]`` (a free bitcast — frame
``t`` starts exactly at block ``t``), and split the DFT kernel row-wise
into ``NBLK = ceil(K/HOP)`` hop-sized slabs ``W_j = W[j*HOP:(j+1)*HOP]``.
Then

    out[b, :, t] = sum_j  xb[b, t+j, :] @ W_j

— for a tile of ``TT`` consecutive frames the ``j``-th term is a plain
``[TT, HOP] @ [HOP, C]`` MXU matmul whose left operand is a *contiguous
sublane slice* of the resident ``xb`` row. Each program accumulates the
``NBLK`` terms in an fp32 VMEM scratch and writes one bf16 ``[C, TT]``
output tile. Per inference the signal is read once (74 MB for v2.4 b256),
the DFT slabs stay VMEM-resident, and the only HBM write is the 536 MB
spectrum itself — ~4x less front-end traffic than the gather form, with
identical numerics (same bf16 operands, fp32 accumulation).

Used by the ONNX lowering when compute dtype is bfloat16 on a TPU backend;
the gather+matmul form remains the fallback (CPU tests, fp32 parity mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TILE_T = 128  # frames per program: [TILE_T, HOP] @ [HOP, C] per slab


def kernel_enabled(compute_dtype) -> bool:
    """Backend/dtype/env gate shared by the plain kernel and the fused
    mel-front-end graph pass: bf16-on-TPU, overridable with
    ``BIRDA_STFT_KERNEL=gather`` (force off) / ``pallas`` (force on,
    interpret mode off-TPU — tests)."""
    import os

    mode = os.environ.get("BIRDA_STFT_KERNEL", "auto")
    if mode == "gather":
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


def enabled(x_shape, w_shape, hop: int, compute_dtype) -> bool:
    """The kernel applies to the Conv1d-STFT geometry when
    :func:`kernel_enabled` allows it and the working set fits VMEM
    (fp32 stays on the bit-faithful gather path)."""
    if not kernel_enabled(compute_dtype):
        return False
    k = int(w_shape[-1])
    c = int(w_shape[0])
    nblk = -(-k // hop)
    # VMEM budget: resident DFT slabs + x row + acc + output tile.
    w_bytes = nblk * hop * c * 2
    s = int(x_shape[-1])
    row_bytes = (s + (nblk + TILE_T) * hop) * 2
    acc_bytes = TILE_T * c * 4 + TILE_T * c * 2
    return w_bytes + 2 * row_bytes + 2 * acc_bytes < 13 * 2**20


def _kernel(nblk, interpret, x_ref, w_ref, o_ref, acc_ref):
    from jax.experimental import pallas as pl

    # Mosaic requires dynamic sublane starts to be provably 8-aligned, so
    # load one aligned superset of TILE_T + nblk rows and take the nblk
    # shifted views as static in-register slices (sublane rotates).
    pad = -(-nblk // 8) * 8
    t0 = pl.multiple_of(pl.program_id(1) * TILE_T, 8)
    sup = x_ref[0, pl.ds(t0, TILE_T + pad), :]
    acc = jnp.zeros(acc_ref.shape, jnp.float32)
    for j in range(nblk):  # static unroll: NBLK shifted slab matmuls
        lhs, rhs = sup[j:j + TILE_T, :], w_ref[j]
        if interpret:  # XLA:CPU has no bf16 dot; operands are already
            lhs, rhs = lhs.astype(jnp.float32), rhs.astype(jnp.float32)
            # bf16-rounded, so the f32 dot is numerically identical.
        acc = acc + jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
    acc_ref[:] = acc
    o_ref[0] = acc_ref[:].T.astype(o_ref.dtype)


def conv1d_stft(x, w, hop: int, interpret: bool | None = None):
    """Backend-resolving wrapper: interpret-mode off TPU (tests force the
    kernel on CPU via ``BIRDA_STFT_KERNEL=pallas``)."""
    if interpret is None:
        try:
            interpret = jax.default_backend() != "tpu"
        except RuntimeError:
            interpret = True
    return _conv1d_stft(x, w, hop, interpret)


@functools.partial(jax.jit, static_argnames=("hop", "interpret"))
def _conv1d_stft(x, w, hop: int, interpret: bool = False):
    """``[B, S] x [C, K] -> [B, C, T]`` strided windowed-DFT matmul.

    ``x`` is the (bf16) signal, ``w`` the Conv1d weight ``[C_out, K]``
    (already squeezed of its C_in=1 axis), ``hop`` the conv stride.
    ``T = (S - K)//hop + 1``. bf16 operands, fp32 accumulation, bf16 out —
    the same dtype discipline as the einsum form it replaces.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s = x.shape
    c, k = w.shape
    nblk = -(-k // hop)
    t = (s - k) // hop + 1
    n_tiles = -(-t // TILE_T)
    # Rows of xb reachable by the last program: the aligned superset load
    # spans TILE_T + ceil(nblk/8)*8 rows from the last tile's start.
    nb = n_tiles * TILE_T + -(-nblk // 8) * 8
    need = nb * hop
    xx = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (0, need - s)))
    xb = xx.reshape(b, nb, hop)
    # W slabs [NBLK, HOP, C]: W_j[h, c] = w[c, j*hop + h], zero-padded
    # beyond K (those rows multiply real signal but contribute 0).
    wp = jnp.pad(w.astype(jnp.bfloat16), ((0, 0), (0, nblk * hop - k)))
    slabs = wp.reshape(c, nblk, hop).transpose(1, 2, 0)

    out = pl.pallas_call(
        functools.partial(_kernel, nblk, interpret),
        out_shape=jax.ShapeDtypeStruct((b, c, t), jnp.bfloat16),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, nb, hop), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, hop, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, TILE_T), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TILE_T, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * k * c,
            bytes_accessed=b * s * 2 + nblk * hop * c * 2 + b * c * t * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xb, slabs)
    return out


# ---------------------------------------------------------------------------
# Fused log-mel front-end: DFT conv -> |X|^2 -> mel matmul -> log, one kernel
# ---------------------------------------------------------------------------

def fused_fits(s: int, k: int, hop: int, c: int, m: int) -> bool:
    """VMEM budget for :func:`fused_logmel` at signal length ``s``, DFT
    kernel ``[c, k]``, mel matrix ``[c//2, m]`` — the runtime analogue of
    :func:`enabled`'s check (the fusion pass cannot know ``s`` at graph
    time, so the evaluator falls back to composed ops when this fails)."""
    nblk = -(-k // hop)
    t = (s - k) // hop + 1
    n_tiles = max(1, -(-t // TILE_T))
    nb = n_tiles * TILE_T + -(-nblk // 8) * 8
    w_bytes = nblk * hop * c * 2
    fb_bytes = (c // 2) * m * 2
    row_bytes = nb * hop * 2
    acc_bytes = TILE_T * c * 4 + TILE_T * m * 2
    return (w_bytes + fb_bytes + 2 * row_bytes + 2 * acc_bytes
            < 13 * 2**20)


def _fused_kernel(nblk, bins, interpret, eps,
                  x_ref, w_ref, fb_ref, o_ref, acc_ref):
    from jax.experimental import pallas as pl

    pad = -(-nblk // 8) * 8
    t0 = pl.multiple_of(pl.program_id(1) * TILE_T, 8)
    sup = x_ref[0, pl.ds(t0, TILE_T + pad), :]
    acc = jnp.zeros(acc_ref.shape, jnp.float32)
    for j in range(nblk):
        lhs, rhs = sup[j:j + TILE_T, :], w_ref[j]
        if interpret:  # XLA:CPU has no bf16 dot (operands already rounded)
            lhs, rhs = lhs.astype(jnp.float32), rhs.astype(jnp.float32)
        acc = acc + jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
    acc_ref[:] = acc
    # |X|^2 from the [cos bank ; sin bank] halves, in fp32 straight off the
    # accumulator (the XLA path materializes bf16 first — strictly worse).
    re = acc_ref[:, :bins]
    im = acc_ref[:, bins:2 * bins]
    power = (re * re + im * im).astype(jnp.bfloat16)
    fb = fb_ref[:]
    if interpret:
        power, fb = power.astype(jnp.float32), fb.astype(jnp.float32)
    mel = jnp.dot(power, fb, preferred_element_type=jnp.float32)
    o_ref[0] = jnp.log(mel + eps).astype(o_ref.dtype)


def fused_logmel(x, w, fb, hop: int, eps: float,
                 interpret: bool | None = None):
    """``[B,S] x [2*bins,K] x [bins,M] -> [B,T,M]`` fused log-mel.

    The whole spectrogram front-end in one pass: windowed-DFT slab matmuls
    (as :func:`conv1d_stft`), power spectrum from the fp32 accumulator,
    mel projection, ``log(. + eps)``. Per inference the HBM-resident
    intermediate drops from the full ``[B, 2*bins, T]`` spectrum (536 MB
    for BirdNET v2.4 at batch 256, written once and re-read by power and
    by each mel bank) to just the ``[B, T, M]`` log-mel image (~50 MB).

    ``fb`` is the mel filterbank for all banks concatenated column-wise
    (``[bins, sum(n_mels)]``); ``w`` rows are the ``[cos ; -sin]`` banks.
    """
    if interpret is None:
        try:
            interpret = jax.default_backend() != "tpu"
        except RuntimeError:
            interpret = True
    return _fused_logmel(x, w, fb, hop, float(eps), interpret)


@functools.partial(jax.jit, static_argnames=("hop", "eps", "interpret"))
def _fused_logmel(x, w, fb, hop: int, eps: float, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s = x.shape
    c, k = w.shape
    bins, m = fb.shape
    assert c == 2 * bins, (c, bins)
    nblk = -(-k // hop)
    t = (s - k) // hop + 1
    n_tiles = -(-t // TILE_T)
    nb = n_tiles * TILE_T + -(-nblk // 8) * 8
    need = nb * hop
    xx = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (0, need - s)))
    xb = xx.reshape(b, nb, hop)
    wp = jnp.pad(w.astype(jnp.bfloat16), ((0, 0), (0, nblk * hop - k)))
    slabs = wp.reshape(c, nblk, hop).transpose(1, 2, 0)

    out = pl.pallas_call(
        functools.partial(_fused_kernel, nblk, bins, interpret, eps),
        out_shape=jax.ShapeDtypeStruct((b, t, m), jnp.bfloat16),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, nb, hop), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, hop, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bins, m), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_T, m), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TILE_T, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * (k * c + bins * m),
            bytes_accessed=b * s * 2 + nblk * hop * c * 2 + b * t * m * 2,
            transcendentals=b * t * m,
        ),
        interpret=interpret,
    )(xb, slabs, fb.astype(jnp.bfloat16))
    return out
