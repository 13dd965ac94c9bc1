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


def _promote_all_nodes(model_path: str) -> tuple[bytes, list[str]]:
    """Return model bytes with EVERY node output promoted to a graph
    output, plus the promoted tensor names. Needs the ``onnx`` package
    (present wherever onnxruntime is — this script never runs on the TPU
    side). This is the standard ORT debugging recipe: outputs added by
    bare name, no type info required."""
    import onnx

    m = onnx.load(model_path)
    existing = {o.name for o in m.graph.output}
    promoted = []
    for node in m.graph.node:
        for out in node.output:
            if out and out not in existing:
                vi = onnx.ValueInfoProto()
                vi.name = out
                m.graph.output.append(vi)
                promoted.append(out)
    return m.SerializeToString(), promoted


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--sample-count", type=int, required=True)
    ap.add_argument("--rate", type=int, default=48_000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--record-nodes", action="store_true",
                    help="Also record EVERY node's output activation "
                         "(node:<tensor> npz keys) so a parity failure "
                         "bisects to the first diverging op instead of "
                         "just reporting the final max error. Recording "
                         "uses the first input row only (activations for "
                         "a 500-node graph are large).")
    ap.add_argument("--record-rows", type=int, default=1,
                    help="Input rows to run through the per-node recording "
                         "(default 1).")
    args = ap.parse_args()

    import onnxruntime as ort

    sess = ort.InferenceSession(args.model, providers=["CPUExecutionProvider"])
    inputs = make_inputs(args.sample_count, rate=args.rate)
    input_name = sess.get_inputs()[0].name
    scores = sess.run(None, {input_name: inputs})[0]
    payload = {"inputs": inputs, "scores": scores}

    if args.record_nodes:
        model_bytes, promoted = _promote_all_nodes(args.model)
        dbg = ort.InferenceSession(
            model_bytes, providers=["CPUExecutionProvider"]
        )
        out_names = [o.name for o in dbg.get_outputs()]
        sub = inputs[: args.record_rows]
        values = dbg.run(out_names, {input_name: sub})
        for name, val in zip(out_names, values):
            payload[f"node:{name}"] = np.asarray(val)
        payload["node_input_rows"] = np.asarray(args.record_rows)
        print(f"recorded {len(out_names)} node activations "
              f"({args.record_rows} row(s))")

    np.savez_compressed(args.out, **payload)
    print(f"wrote {args.out}: inputs {inputs.shape}, scores {scores.shape}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
