"""Mel-spectrogram front-end as MXU-friendly matmuls.

The reference's models carry their DSP front-end inside the ONNX graph
(BirdNET v2.4 48 kHz spectrogram; v3.0's "in-graph ONNX STFT replaced by an
equivalent Conv1d" — manifests/BirdNET-v3.0-Models.models.json graph.notes).
The TPU-native equivalent: frame the waveform, then compute the DFT as a
matmul against a precomputed windowed-DFT basis — two [frames, n_fft] x
[n_fft, bins] matmuls (real + imaginary) that land on the MXU and fuse with
the downstream conv stem, instead of an FFT butterfly that does not.

For the frame counts involved (a 3 s / 48 kHz segment at hop 512 is ~280
frames of 1024 samples) the O(N^2) DFT-as-matmul is a few MFLOPs per frame
batch — noise next to the backbone, and faster in practice than jnp.fft on
TPU because it tiles onto the systolic array.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class MelSpecConfig:
    """Spectrogram front-end parameters."""

    sample_rate: int = 48_000
    n_fft: int = 1024
    hop: int = 512
    n_mels: int = 128
    fmin: float = 50.0
    fmax: float = 15_000.0
    log_offset: float = 1e-6
    #: magnitude ("linear"), power ("power"), or log-power ("log")
    scale: str = "log"

    def frames(self, n_samples: int) -> int:
        """Number of STFT frames (center=False semantics)."""
        return 1 + (n_samples - self.n_fft) // self.hop


def hann(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def mel_filterbank(
    n_mels: int, n_fft: int, sample_rate: int, fmin: float, fmax: float
) -> np.ndarray:
    """Slaney-style triangular mel filterbank, shape [n_fft//2+1, n_mels]."""

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sample_rate / 2, n_bins)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fb = np.zeros((n_bins, n_mels))
    for m in range(n_mels):
        lo, ctr, hi = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-9)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-9)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    # Slaney normalization: equal area per filter.
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    fb *= enorm[None, :]
    return fb


@functools.lru_cache(maxsize=16)
def _bases(cfg: MelSpecConfig):
    """Precompute (windowed DFT real/imag bases fused with mel projection).

    Returns [n_fft, n_mels] matrices ``cos_mel`` and ``sin_mel`` when the
    power spectrum can't be fused (it can't — |X|^2 needs both parts first),
    so instead we return the windowed cos/sin bases [n_fft, n_bins] and the
    mel filterbank [n_bins, n_mels] separately.
    """
    n_bins = cfg.n_fft // 2 + 1
    k = np.arange(n_bins)[None, :]
    n = np.arange(cfg.n_fft)[:, None]
    w = hann(cfg.n_fft)[:, None]
    angle = 2 * np.pi * n * k / cfg.n_fft
    cos_b = (np.cos(angle) * w).astype(np.float32)
    sin_b = (-np.sin(angle) * w).astype(np.float32)
    fb = mel_filterbank(
        cfg.n_mels, cfg.n_fft, cfg.sample_rate, cfg.fmin, cfg.fmax
    ).astype(np.float32)
    return cos_b, sin_b, fb


def melspec(x, cfg: MelSpecConfig):
    """Compute mel spectrograms on device.

    Args:
        x: [batch, n_samples] float32 waveform.
    Returns:
        [batch, frames, n_mels] float32.
    """
    import jax.numpy as jnp

    cos_b, sin_b, fb = _bases(cfg)
    n_samples = x.shape[-1]
    frames = cfg.frames(n_samples)

    # Frame: [batch, frames, n_fft]. Indices are built ON DEVICE from iota —
    # a host np.arange outer-sum would bake a [frames, n_fft] int constant
    # (~2.3 MB at the v2.4 geometry) into every serialized HLO, which the
    # remote compile service may reject outright (CLAUDE.md).
    from jax import lax

    row = lax.broadcasted_iota(jnp.int32, (frames, cfg.n_fft), 0) * cfg.hop
    col = lax.broadcasted_iota(jnp.int32, (frames, cfg.n_fft), 1)
    framed = jnp.take(x, row + col, axis=-1)

    # Windowed DFT as two matmuls on the MXU.
    re = jnp.einsum(
        "bfn,nk->bfk", framed, jnp.asarray(cos_b),
        preferred_element_type=jnp.float32,
    )
    im = jnp.einsum(
        "bfn,nk->bfk", framed, jnp.asarray(sin_b),
        preferred_element_type=jnp.float32,
    )
    power = re * re + im * im

    mel = jnp.einsum(
        "bfk,km->bfm", power, jnp.asarray(fb),
        preferred_element_type=jnp.float32,
    )
    if cfg.scale == "log":
        return jnp.log(mel + cfg.log_offset)
    if cfg.scale == "power":
        return mel
    return jnp.sqrt(mel)


def melspec_from_chunk(chunk, cfg: MelSpecConfig, batch: int,
                       step_samples: int, n_samples: int, compute_dtype=None):
    """Mel spectrograms for overlapped windows of a contiguous 1-D chunk.

    The windowed DFT runs as **one strided conv over the whole chunk** —
    frames are computed on a global hop grid and each window then slices its
    rows with a tiny gather. Neither the ``[B, n_samples]`` window
    intermediate nor any giant index tensor materializes (large host-side
    index constants also bloat the serialized HLO, which a remote-compile
    service may reject outright). Requires ``step_samples % hop == 0`` so
    every window's frames land on the global grid; callers fall back to
    per-window framing otherwise.

    With ``compute_dtype=bfloat16`` the DFT kernel and mel projection run on
    the MXU at half the traffic; accumulation stays fp32.

    Args:
        chunk: [chunk_samples] float32 at the model rate.
        batch: number of windows.
        step_samples: distance between window starts (multiple of cfg.hop).
        n_samples: samples per window (the model's sample_count).
    Returns:
        [batch, frames, n_mels] float32.
    """
    import jax.numpy as jnp
    from jax import lax

    if step_samples % cfg.hop != 0:
        raise ValueError(
            f"step {step_samples} not a multiple of hop {cfg.hop}"
        )
    cos_b, sin_b, fb = _bases(cfg)
    frames = cfg.frames(n_samples)
    frames_per_step = step_samples // cfg.hop
    hop = cfg.hop

    # Frames on the global hop grid, WITHOUT a gather or conv: a frame is a
    # run of ceil(n_fft/hop) consecutive hop-blocks, so reshape the chunk to
    # [N_global, hop] at each of those part offsets and give every part its
    # own slice of the DFT basis — the framed [N, n_fft] tensor never
    # materializes, just reshape views feeding MXU matmuls.
    last_start = (batch - 1) * step_samples + (frames - 1) * hop
    n_global = last_start // hop + 1
    dtype = compute_dtype or chunk.dtype
    n_parts = -(-cfg.n_fft // hop)
    # Later part offsets overrun the chunk tail by up to n_parts*hop - n_fft
    # samples (full reshape rows whose trailing columns are never read).
    x = jnp.pad(chunk.astype(dtype), (0, n_parts * hop))
    re = im = None
    for part in range(n_parts):
        off = part * hop
        width = min(hop, cfg.n_fft - off)
        seg_view = lax.dynamic_slice_in_dim(x, off, n_global * hop)
        part_x = seg_view.reshape(n_global, hop)[:, :width]
        cb = jnp.asarray(cos_b[off : off + width], dtype)
        sb = jnp.asarray(sin_b[off : off + width], dtype)
        r = jnp.matmul(part_x, cb, preferred_element_type=jnp.float32)
        i = jnp.matmul(part_x, sb, preferred_element_type=jnp.float32)
        re = r if re is None else re + r
        im = i if im is None else im + i

    power = re * re + im * im                # [N_global, bins] fp32
    mel = jnp.einsum(
        "nk,km->nm", power.astype(dtype), jnp.asarray(fb, dtype),
        preferred_element_type=jnp.float32,
    )
    # Window b reads global frames [b*frames_per_step, +frames) — a small
    # [batch, frames] index built on device.
    row = lax.broadcasted_iota(jnp.int32, (batch, frames), 0) * frames_per_step
    col = lax.broadcasted_iota(jnp.int32, (batch, frames), 1)
    mel = jnp.take(mel, row + col, axis=0)   # [batch, frames, mels]
    if cfg.scale == "log":
        return jnp.log(mel + cfg.log_offset)
    if cfg.scale == "power":
        return mel
    return jnp.sqrt(mel)


def melspec_reference(x: np.ndarray, cfg: MelSpecConfig) -> np.ndarray:
    """Numpy reference implementation (FFT-based) for parity tests."""
    x = np.asarray(x, np.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    frames = cfg.frames(x.shape[-1])
    w = hann(cfg.n_fft)
    out = []
    _, _, fb = _bases(cfg)
    for row in x:
        f = np.stack(
            [row[i * cfg.hop : i * cfg.hop + cfg.n_fft] * w for i in range(frames)]
        )
        spec = np.fft.rfft(f, axis=-1)
        power = np.abs(spec) ** 2
        mel = power @ fb
        out.append(mel)
    mel = np.stack(out)
    if cfg.scale == "log":
        mel = np.log(mel + cfg.log_offset)
    elif cfg.scale == "linear":
        mel = np.sqrt(mel)
    return mel[0] if squeeze else mel
