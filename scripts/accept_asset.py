#!/usr/bin/env python3
"""One-command day-one acceptance rehearsal for a real model asset.

Glues the acceptance pieces that previously lived in five scripts/tests
with separate env contracts into a single invocation — the day the real
assets land, acceptance is this command, not an archaeology session:

    python scripts/accept_asset.py MODEL.onnx LABELS.txt \
        [--reference scores.npz] [--sample-rate 48000] \
        [--skip-int8] [--skip-bench] [--json report.json]

Chain (each gate prints PASS/WARN/FAIL/SKIP; exit 1 iff any FAIL):

1. **load** — wire-format parse (external-data sidecars resolve).
2. **preflight** — every unsupported op/attr/dtype reported at once
   (``birda_tpu/onnx/preflight.py``); the ONNX-Runtime analogue is the
   session build the reference gates on (``classifier.rs:250,404-466``).
3. **labels** — label count == the graph's class width.
4. **fusion** — does the mel-front-end fusion engage on these bytes?
   WARN-only: a non-engaging spelling still executes correctly node by
   node; re-run ``scripts/traffic_table.py`` on the chip to see cost.
5. **parity** — fp32 scores vs the recorded ONNX-Runtime-CPU reference
   (``scripts/record_parity_reference.py``), budget ≤1e-3 (SURVEY §6).
   On divergence with ``--record-nodes`` recordings, names the FIRST
   diverging node. SKIP (warn) when no reference is given.
6. **int8** — the recall acceptance protocol
   (``birda_tpu/onnx/int8_accuracy.py``): drift, top-1/top-5 agreement,
   threshold-crossing counts against the documented criteria.
7. **bench** — a small timed point on the current backend (segments/sec,
   x realtime) so the asset's first number exists the day it loads.

Exercised in CI on real ``torch.onnx.export`` bytes as a stand-in asset
(``tests/test_accept_asset.py``).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PARITY_TOLERANCE = 1e-3


class Gate:
    def __init__(self):
        self.results: list[dict] = []

    def add(self, name: str, status: str, detail: str = "") -> None:
        self.results.append(
            {"gate": name, "status": status, "detail": detail})
        line = f"[{status:<4}] {name}"
        if detail:
            line += f": {detail}"
        print(line, flush=True)

    @property
    def failed(self) -> bool:
        return any(r["status"] == "FAIL" for r in self.results)


def _input_spec(model):
    """(name, shape with symbolic batch -> 8) of the first graph input.

    Some exporters also list initializers under graph.inputs; the asset's
    real input is the first one without initializer bytes."""
    inp = next(i for i in model.graph.inputs
               if i.name not in model.graph.initializers)
    shape = []
    for i, d in enumerate(inp.shape):
        if isinstance(d, int) and d > 0:
            shape.append(d)
        else:
            shape.append(8 if i == 0 else 1)
    return inp.name, tuple(shape)


def _scores_of(out) -> np.ndarray:
    return np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model", help="classifier ONNX file")
    ap.add_argument("labels", help="labels file (one per line)")
    ap.add_argument("--reference", default=None,
                    help="recorded ONNX-Runtime-CPU scores .npz "
                         "(scripts/record_parity_reference.py)")
    ap.add_argument("--sample-rate", type=int, default=48_000,
                    help="model sample rate (for the x-realtime number)")
    ap.add_argument("--skip-int8", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--bench-iters", type=int, default=4)
    ap.add_argument("--json", dest="json_out", default=None,
                    help="also write the gate results as JSON")
    args = ap.parse_args(argv)

    gate = Gate()

    # 1. load -----------------------------------------------------------
    from birda_tpu.onnx.proto import load_model

    try:
        model_bytes = Path(args.model).read_bytes()
        model = load_model(args.model)  # path form resolves external data
        n_params = sum(
            t.array.size for t in model.graph.initializers.values())
        gate.add("load", "PASS",
                 f"{len(model.graph.nodes)} nodes, opset "
                 f"{model.opset}, {n_params:,} params")
    except Exception as e:  # noqa: BLE001 — report, don't crash
        gate.add("load", "FAIL", f"{type(e).__name__}: {e}")
        return _finish(gate, args)

    # 2. preflight --------------------------------------------------------
    from birda_tpu.onnx.preflight import preflight

    findings = preflight(model)
    if findings:
        gate.add("preflight", "FAIL",
                 f"{len(findings)} unsupported construct(s): "
                 + "; ".join(f.render() for f in findings[:5])
                 + ("; ..." if len(findings) > 5 else ""))
        return _finish(gate, args)
    gate.add("preflight", "PASS", "every op/attr/dtype supported")

    # 3. labels + lowering -------------------------------------------------
    from birda_tpu.onnx.lowering import lower

    labels = [
        ln for ln in Path(args.labels).read_text().splitlines() if ln.strip()
    ]
    try:
        fn = lower(model_bytes)
        import jax

        in_name, in_shape = _input_spec(model)
        out_shape = jax.eval_shape(
            lambda x: fn(x, params=fn.params),
            jax.ShapeDtypeStruct(in_shape, np.float32))
        num_classes = int(
            (out_shape[0] if isinstance(out_shape, tuple) else out_shape)
            .shape[-1])
    except Exception as e:  # noqa: BLE001
        gate.add("labels", "FAIL", f"lowering failed: "
                                   f"{type(e).__name__}: {e}")
        return _finish(gate, args)
    if len(labels) != num_classes:
        gate.add("labels", "FAIL",
                 f"{len(labels)} labels != {num_classes} classes")
        return _finish(gate, args)
    gate.add("labels", "PASS", f"{num_classes} classes")

    # 4. fusion engagement --------------------------------------------------
    from birda_tpu.onnx.fuse import fuse_mel_frontend

    fused = fuse_mel_frontend(load_model(model_bytes).graph)
    if fused:
        gate.add("fusion", "PASS",
                 f"mel front-end fusion engaged ({fused} chain(s))")
    else:
        gate.add("fusion", "WARN",
                 "front-end fusion did not engage (node-by-node execution "
                 "is correct but slower; run scripts/traffic_table.py on "
                 "the chip to see the cost)")

    # 5. fp32 parity ---------------------------------------------------------
    ref = None
    if args.reference:
        ref = np.load(args.reference)
        inputs = np.asarray(ref["inputs"], np.float32)
        want = np.asarray(ref["scores"], np.float32)
        got = _scores_of(fn(inputs))
        max_err = float(np.max(np.abs(got - want)))
        if max_err < PARITY_TOLERANCE:
            gate.add("parity", "PASS",
                     f"max |Δ| = {max_err:.2e} (budget {PARITY_TOLERANCE})")
        else:
            from birda_tpu.onnx.parity import (
                find_first_divergence,
                node_records,
            )

            detail = f"max |Δ| = {max_err:.2e} over {PARITY_TOLERANCE}"
            recorded = node_records(ref)
            if recorded:
                rows = (int(ref["node_input_rows"])
                        if "node_input_rows" in ref.files else 1)
                div = find_first_divergence(
                    fn, inputs[:rows], recorded, tol=PARITY_TOLERANCE)
                if div is not None:
                    detail += f"; {div.render()}"
            else:
                detail += ("; re-record with --record-nodes to bisect to "
                           "the first diverging op")
            gate.add("parity", "FAIL", detail)
    else:
        _, in_shape = _input_spec(model)
        inputs = np.random.default_rng(20260816).normal(
            0, 0.1, in_shape).astype(np.float32)
        gate.add("parity", "SKIP",
                 "no --reference given; record one with "
                 "scripts/record_parity_reference.py on an "
                 "onnxruntime-equipped machine")

    # 6. int8 recall acceptance ----------------------------------------------
    if args.skip_int8:
        gate.add("int8", "SKIP", "--skip-int8")
    else:
        try:
            from birda_tpu.onnx.int8_accuracy import Criteria, evaluate_model

            # A dedicated eval set, NOT the parity batch: top-1 agreement
            # against the 0.98 criterion needs enough samples that one
            # near-tie flip is not an automatic failure (8 rows make the
            # bar "zero flips allowed"). 64 rows of the calibration-signal
            # family (pink noise + chirps) when the input is [B, samples];
            # random normal otherwise.
            _, in_shape = _input_spec(model)
            if len(in_shape) == 2:
                from birda_tpu.onnx.quantize import calibration_signals

                eval_in = np.concatenate([
                    b for b in calibration_signals(
                        in_shape[-1], batch=16, n_batches=4, seed=7)
                ])
            else:
                eval_in = np.random.default_rng(7).normal(
                    0, 0.1, (64,) + in_shape[1:]).astype(np.float32)
            report = evaluate_model(model_bytes, eval_in)
            fails = report.failures(Criteria())
            if fails:
                gate.add("int8", "FAIL", "; ".join(fails))
            else:
                gate.add("int8", "PASS",
                         f"max |Δ| {report.max_abs_delta:.4f}, top-1 "
                         f"agreement {report.top1_agreement:.3f} "
                         f"({len(eval_in)} samples)")
        except Exception as e:  # noqa: BLE001
            gate.add("int8", "FAIL", f"{type(e).__name__}: {e}")

    # 7. bench point ---------------------------------------------------------
    if args.skip_bench:
        gate.add("bench", "SKIP", "--skip-bench")
    else:
        try:
            import jax
            import jax.numpy as jnp
            from jax import lax

            # The tunnel lies to naive timers (CLAUDE.md): identical
            # executions dedupe server-side and each fetch is a round
            # trip. Same honest recipe as bench.py at small scale: fresh
            # random inputs per step, one lax.scan inside one jit,
            # outputs consumed to a checksum, fetched once.
            x = inputs
            xs = np.random.default_rng(11).normal(
                0, 0.1, (args.bench_iters,) + x.shape).astype(np.float32)
            xs_dev = jax.device_put(xs)

            @jax.jit
            def _multi(p, stacked):
                def body(carry, xi):
                    out = fn(xi, params=p)
                    s = out[0] if isinstance(out, tuple) else out
                    return carry, jnp.sum(s.astype(jnp.float32))
                return lax.scan(body, jnp.int32(0), stacked)[1]

            _ = np.asarray(_multi(fn.params, xs_dev))  # compile + warm
            t0 = time.perf_counter()
            _ = np.asarray(_multi(fn.params, xs_dev))
            dt = time.perf_counter() - t0
            seg_per_sec = x.shape[0] * args.bench_iters / dt
            seconds_per_segment = x.shape[-1] / args.sample_rate
            gate.add(
                "bench", "PASS",
                f"{seg_per_sec:,.0f} segments/s = "
                f"{seg_per_sec * seconds_per_segment:,.0f}x realtime "
                f"(batch {x.shape[0]}, {jax.default_backend()}, "
                f"scan+fetch; the canonical number is bench.py)")
        except Exception as e:  # noqa: BLE001
            gate.add("bench", "FAIL", f"{type(e).__name__}: {e}")

    return _finish(gate, args)


def _finish(gate: Gate, args) -> int:
    summary = {
        "asset": args.model,
        "accepted": not gate.failed,
        "gates": gate.results,
    }
    print(json.dumps({
        "accepted": summary["accepted"],
        "gates": {r["gate"]: r["status"] for r in gate.results},
    }))
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(summary, indent=1))
    return 1 if gate.failed else 0


if __name__ == "__main__":
    sys.exit(main())
