#!/usr/bin/env python3
"""Measure the int8 execution mode against bf16 on the attached chip.

Runs the full-scale BirdNET v2.4 / v3.0 / Perch v2 graphs through the same
scan+fetch methodology as bench.py (the tunnel defeats naive timing —
docs/performance.md), once with bf16 matmuls and once with calibrated int8
(`birda_tpu/onnx/quantize.py`), and reports the realtime factors plus the
max score drift between the two on one shared batch.

Usage: python scripts/bench_int8.py [family ...]   (default: birdnet-v24)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    try:
        from birda_tpu.config.paths import xla_cache_dir
        from birda_tpu.inference.classifier import enable_persistent_cache

        enable_persistent_cache(xla_cache_dir())
    except Exception:  # noqa: BLE001
        pass

    import bench
    from birda_tpu.onnx import fullscale as fs
    from birda_tpu.onnx.lowering import lower
    from birda_tpu.onnx.quantize import (
        cached_calibration,
        calibration_signals,
        lower_int8,
    )

    families = sys.argv[1:] or ["birdnet-v24"]
    on_tpu = jax.default_backend() == "tpu"
    batch = 256 if on_tpu else 8
    iters = 8 if on_tpu else 2
    out = {}
    for fam in families:
        spec = fs.SPECS[fam] if on_tpu else fs.tiny_spec(fs.SPECS[fam])
        g = fs.cached_build(spec, seed=1)
        secs = spec.sample_count / spec.sample_rate

        calib, _ = cached_calibration(g.model_bytes, spec.sample_count)
        qfn = lower_int8(g.model_bytes, calib)
        # Float leftovers (front-end, protected heads) live bf16 like the
        # production zoo path; int8 weights keep their dtype.
        qparams = {
            k: jax.device_put(
                np.asarray(v, jnp.bfloat16)
                if np.asarray(v).dtype.kind == "f" else np.asarray(v)
            )
            for k, v in qfn.params.items()
        }

        ffn = lower(g.model_bytes, compute_dtype=jnp.bfloat16)
        fparams = {k: jax.device_put(np.asarray(v, jnp.bfloat16))
                   for k, v in ffn.params.items()}

        # Score drift between the two modes on one shared batch.
        probe = next(calibration_signals(spec.sample_count, batch=8,
                                         n_batches=1, seed=123))
        sq = np.asarray(qfn(probe, params=qparams)[0], np.float32)
        sf = np.asarray(ffn(probe, params=fparams)[0], np.float32)

        def step_q(p, x):
            scores = qfn(x, params=p)[0].astype(jnp.float32)
            return jax.lax.top_k(scores, 5)

        def step_f(p, x):
            scores = ffn(x, params=p)[0].astype(jnp.float32)
            return jax.lax.top_k(scores, 5)

        rt_q = bench._measure(step_q, qparams,
                              (iters, batch, spec.sample_count), secs, iters)
        rt_f = bench._measure(step_f, fparams,
                              (iters, batch, spec.sample_count), secs, iters)
        out[fam] = {
            "bf16_x_realtime": round(rt_f, 0),
            "int8_x_realtime": round(rt_q, 0),
            "speedup": round(rt_q / rt_f, 3),
            "quantized_nodes": len(qfn.quantized_nodes),
            "max_score_drift_vs_bf16": float(np.max(np.abs(sq - sf))),
            "top1_agree": float(np.mean(
                np.argmax(sq, -1) == np.argmax(sf, -1))),
            "param_bytes_int8": int(sum(v.nbytes
                                        for v in qparams.values())),
            "param_bytes_bf16": int(sum(v.nbytes
                                        for v in fparams.values())),
        }
        print(json.dumps({fam: out[fam]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
