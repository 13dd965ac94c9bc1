#!/usr/bin/env python3
"""Compile-and-run the shipping Pallas kernels at the release-graph
front-end geometries on the real chip.

One shot (B=4, seconds per shape once the backend is up): catches Mosaic
compile errors and numerical blowups in the Conv1d-STFT kernel and the
fused log-mel front-end (``ops/stft_conv.py``) without paying a
full-graph compile. Run this BEFORE trusting ``entry()``/``bench.py``
after a kernel change.

History: this script also verified the fused SE / SE+project /
whole-block MBConv kernels (round 3). They passed Mosaic compile and
numerics here but LOST the on-chip A/B decisively (off 17,921x vs gate
11,619x / gate+project 14,414x / whole-block 9,242x at v2.4 b768 bf16 —
docs/performance.md "negative results"), so they were deleted rather
than shipped dead; XLA's own SE-chain fusion is the production path.

Prints one JSON line per case and a final summary; exit 1 on any
failure. A Pallas failure surfaces as "HTTP 500: tpu_compile_helper
subprocess exit code 1" — the full exception string holds the Mosaic
error (CLAUDE.md).
"""

from __future__ import annotations

import json
import sys
import traceback
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# (name, S, K, hop, n_mels) — the three release front-end geometries
# (onnx/fullscale.py specs): v2.4 48kHz/3s, v3.0 32kHz/5s conv1d-STFT,
# Perch v2 32kHz/5s.
STFT_CASES = [
    ("v24", 144_000, 2048, 278, 128),
    ("v30", 160_000, 1024, 320, 96),
    ("perch", 160_000, 640, 320, 160),
]


def _ref_conv1d_stft(x, w, hop):
    """numpy windowed-DFT conv with bf16 operand rounding, f64 accum."""
    import jax.numpy as jnp

    t = (x.shape[1] - w.shape[1]) // hop + 1
    k = w.shape[1]
    row = np.arange(t)[:, None] * hop + np.arange(k)[None, :]
    xr = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float64)
    wr = np.asarray(jnp.asarray(w.T, jnp.bfloat16), np.float64)
    return np.einsum("btk,kc->bct", xr[:, row], wr)


def main() -> int:
    from birda_tpu.ops.stft_conv import conv1d_stft, fused_fits, fused_logmel

    B = 4
    failures = 0
    rng = np.random.default_rng(0)

    for name, s, k, hop, mels in STFT_CASES:
        bins = k // 2 + 1
        try:
            x = rng.normal(0, 0.3, (B, s)).astype(np.float32)
            w = rng.normal(0, 0.05, (2 * bins, k)).astype(np.float32)
            fb = rng.uniform(0, 0.05, (bins, mels)).astype(np.float32)

            got = np.asarray(conv1d_stft(x, w, hop), np.float32)
            want = _ref_conv1d_stft(x, w, hop)
            e1 = float(np.abs(got - want).max() / np.abs(want).max())

            ref_pow = (want[:, :bins, :] ** 2 + want[:, bins:, :] ** 2)
            ref_log = np.log(
                np.einsum("bct,cm->btm", ref_pow, fb.astype(np.float64))
                + 1e-6)
            assert fused_fits(s, k, hop, 2 * bins, mels), "budget gate"
            got2 = np.asarray(
                fused_logmel(x, w, fb, hop=hop, eps=1e-6), np.float32)
            e2 = float(np.quantile(np.abs(got2 - ref_log), 0.99))
            ok = e1 < 2e-2 and e2 < 5e-2
            failures += not ok
            print(json.dumps({"kernel": "stft/logmel", "case": name,
                              "conv_rel_err": round(e1, 5),
                              "logmel_q99_err": round(e2, 5), "ok": ok}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(json.dumps({"kernel": "stft/logmel", "case": name,
                              "error": str(e)[:2000]}), flush=True)
            traceback.print_exc(limit=3)

    print(json.dumps({"failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
