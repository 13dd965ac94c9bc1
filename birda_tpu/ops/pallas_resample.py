"""Pallas TPU kernel: exact polyphase rational resampling.

The XLA formulation of rational resampling is a dilated conv
(:mod:`birda_tpu.ops.resample`), which multiplies L-fold implicit zeros —
fine for 48 kHz <-> 32 kHz (L=2) but hopeless for 44.1 kHz -> 32 kHz
(L=320). This kernel does the *exact* polyphase computation instead:

    y[n] = sum_t H[p_n, t] * x[b_n - t],  q = n*M + c,
    p_n = q mod L,  b_n = q div L

Per output tile it DMAs just the input span the tile touches from HBM into
VMEM, computes phases/bases with on-the-fly iota (no index tensors in HBM),
and accumulates the T-tap dot products as VPU gathers — work is exactly
``N_out * T`` MACs regardless of L.

Tiles are shaped (ROWS, 128) to match the VPU lane layout; the output is
flattened and trimmed to the true length by the caller wrapper.

Mosaic's gather lowering requires operand, indices and output to share one
shape, so every lookup here is phrased as a same-width [1, W] gather: tap
indices are computed (and clamped) for the full slice width, and the filter
bank is pre-padded per tap to the slice width on the host.

STATUS: semantics verified against the host polyphase reference in
interpreter mode (tests/test_resample.py::TestPallasKernel). Compiled
execution is blocked by a measured Mosaic limitation on this generation:
``tpu.dynamic_gather`` only compiles when the lane dimension is exactly one
vreg (128 lanes) wide — [8,128]/[32,128] gathers work, anything wider
crashes the backend compiler. Our lookups span a ~3000-sample slice, so
the production paths remain host resampling for large L/M and the
dilated-conv device path for small L/M
(:func:`birda_tpu.ops.resample.device_resample_supported`). Round-2 plan:
decompose the table lookup into 128-lane segmented gathers with masks, or
per-phase strided loads.
"""

from __future__ import annotations

import functools
from math import ceil, gcd

import numpy as np

ROWS = 16
LANES = 128
TILE = ROWS * LANES  # 2048 output samples per grid step


@functools.lru_cache(maxsize=32)
def _plan(from_rate: int, to_rate: int):
    from .resample import _design_lowpass

    g = gcd(from_rate, to_rate)
    L, M = to_rate // g, from_rate // g
    h = _design_lowpass(L, M)
    K = len(h)
    T = ceil(K / L)
    hp = np.zeros(T * L, np.float64)
    hp[:K] = h
    H = hp.reshape(T, L).T.astype(np.float32).copy()  # [L, T]
    c = (K - 1) // 2
    return L, M, H, T, c


def resample_pallas(x, from_rate: int, to_rate: int, interpret: bool = False):
    """Resample a 1-D float32 signal via the polyphase Pallas kernel.

    ``interpret=True`` runs the Pallas interpreter (CPU) — used by the test
    suite for verification without TPU hardware.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if from_rate == to_rate:
        return x

    L, M, H, T, c = _plan(from_rate, to_rate)
    n_in = int(x.shape[0])
    n_out = ceil(n_in * L / M)
    n_tiles = ceil(n_out / TILE)

    # Input span one tile touches: bases advance by ~TILE*M/L, plus T taps
    # of history and rounding slack, rounded up to lane width.
    span = ceil(TILE * M / L) + T + 8
    # The same-shape gather needs a working width of at least TILE (the
    # accumulator is sliced to TILE rows at the end).
    slice_len = max(((span + LANES - 1) // LANES) * LANES, TILE)

    pad_left = T
    total = pad_left + n_in + slice_len
    S = slice_len
    # Filter bank padded per tap to the slice width: h_pad[t, p] = H[p, t].
    h_pad = np.zeros((T, S), np.float32)
    h_pad[:, :L] = H.T
    h_pad = jnp.asarray(h_pad)

    def kernel(xp_ref, h_ref, out_ref, x_vmem, sem):
        i = pl.program_id(0)
        n0 = i * TILE
        b0 = (n0 * M + c) // L
        dma = pltpu.make_async_copy(
            xp_ref.at[pl.ds(b0, slice_len)], x_vmem, sem
        )
        dma.start()

        # Indices for the full slice width; entries past TILE are clamped
        # garbage that never reaches the output.
        j = lax.broadcasted_iota(jnp.int32, (1, S), 1)
        n_vec = n0 + j
        q = n_vec * M + c
        b = q // L
        p = jnp.clip(q - b * L, 0, S - 1)
        local = jnp.clip(b - b0 + pad_left, 0, S - 1)

        dma.wait()
        xs2 = x_vmem[:].reshape(1, S)
        acc = jnp.zeros((1, S), jnp.float32)

        def body(t, acc):
            taps = jnp.take_along_axis(
                xs2, jnp.clip(local - t, 0, S - 1), axis=1
            )
            w = jnp.take_along_axis(h_ref[t, :].reshape(1, S), p, axis=1)
            return acc + taps * w

        acc = lax.fori_loop(0, T, body, acc)
        out_ref[:] = acc[0, :TILE].reshape(ROWS, LANES)

    xp = jnp.concatenate([
        jnp.zeros(pad_left, jnp.float32),
        x.astype(jnp.float32),
        jnp.zeros(total - pad_left - n_in, jnp.float32),
    ])

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # padded input in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # [T, S] padded bank
        ],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * ROWS, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((slice_len,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, h_pad)
    return out.reshape(-1)[:n_out]
