#!/usr/bin/env python3
"""Record ONNX-Runtime-CPU reference outputs for the score-parity harness.

Run this on a machine with the ``onnxruntime`` package and the installed
model assets (it is NOT needed in the TPU environment — only its .npz
output is):

    python scripts/record_parity_reference.py \
        --model ~/.local/share/birda/models/birdnet-v24.onnx \
        --sample-count 144000 --out parity_birdnet_v24.npz

Then on the TPU side:

    BIRDA_PARITY_MODEL=.../birdnet-v24.onnx \
    BIRDA_PARITY_REFERENCE=parity_birdnet_v24.npz \
    python -m pytest tests/test_score_parity.py -v

Inputs are a deterministic mix of synthetic tones (in the bird band) and
band-limited noise, which exercises the in-graph spectrogram front-end where
parity is won or lost (SURVEY §6).
"""

from __future__ import annotations

import argparse

import numpy as np


def make_inputs(sample_count: int, n: int = 16, rate: int = 48_000) -> np.ndarray:
    rng = np.random.default_rng(20260816)
    t = np.arange(sample_count) / rate
    rows = []
    for i in range(n):
        freq = 500.0 * (i + 1)
        tone = 0.3 * np.sin(2 * np.pi * freq * t)
        noise = 0.1 * rng.normal(0, 1, sample_count)
        rows.append(np.clip(tone + noise, -1, 1))
    return np.asarray(rows, np.float32)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--sample-count", type=int, required=True)
    ap.add_argument("--rate", type=int, default=48_000)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import onnxruntime as ort

    sess = ort.InferenceSession(args.model, providers=["CPUExecutionProvider"])
    inputs = make_inputs(args.sample_count, rate=args.rate)
    input_name = sess.get_inputs()[0].name
    scores = sess.run(None, {input_name: inputs})[0]
    np.savez_compressed(args.out, inputs=inputs, scores=scores)
    print(f"wrote {args.out}: inputs {inputs.shape}, scores {scores.shape}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
