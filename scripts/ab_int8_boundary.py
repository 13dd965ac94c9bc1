#!/usr/bin/env python3
"""A/B the int8 eligibility/boundary-storage variants on the attached chip.

Variants of the full-scale BirdNET v2.4 graph, all at one batch size with
the scan+fetch methodology (the tunnel defeats naive timing):

- bf16      : no quantization (reference point)
- shipped   : round-3 rules — weight-size gate only, strict boundaries
- strict    : activation-size gate ON, strict boundaries
- frontier  : activation-size gate ON, store all but sole-quantized-reader
- tolerant  : activation-size gate ON, store every calibrated activation

Prints one JSON line per variant: ms/step, x realtime, drift vs bf16,
quantized/boundary counts.

Usage: python scripts/ab_int8_boundary.py [batch] [family]
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    fam = sys.argv[2] if len(sys.argv) > 2 else "birdnet-v24"
    on_tpu = jax.default_backend() == "tpu"
    spec = fs.SPECS[fam] if on_tpu else fs.tiny_spec(fs.SPECS[fam])
    g = fs.cached_build(spec, seed=1)
    secs = spec.sample_count / spec.sample_rate
    iters = 8 if on_tpu else 2

    calib, _ = cached_calibration(g.model_bytes, spec.sample_count)
    probe = next(calibration_signals(spec.sample_count, batch=8,
                                     n_batches=1, seed=123))

    def put(params):
        return {
            k: jax.device_put(
                np.asarray(v, jnp.bfloat16)
                if np.asarray(v).dtype.kind == "f" else np.asarray(v)
            )
            for k, v in params.items()
        }

    all_variants = {
        "bf16": lambda: lower(g.model_bytes, compute_dtype=jnp.bfloat16),
        "shipped": lambda: lower_int8(g.model_bytes, calib,
                                      min_act_elems=1 << 60,
                                      boundary_store="strict"),
        "strict": lambda: lower_int8(g.model_bytes, calib,
                                     boundary_store="strict"),
        "frontier": lambda: lower_int8(g.model_bytes, calib,
                                       boundary_store="frontier"),
        "tolerant": lambda: lower_int8(g.model_bytes, calib,
                                       boundary_store="tolerant"),
        # Post-patch defaults: activation gate on group==1 convs only.
        "nodw": lambda: lower_int8(g.model_bytes, calib,
                                   boundary_store="strict"),
        # Old (weight-only) eligibility with the widened storage policies:
        # residual-stream int8 without quantizing the early convs.
        "ship_tol": lambda: lower_int8(g.model_bytes, calib,
                                       min_act_elems=1 << 60,
                                       boundary_store="tolerant"),
        "ship_fro": lambda: lower_int8(g.model_bytes, calib,
                                       min_act_elems=1 << 60,
                                       boundary_store="frontier"),
        "ship_all": lambda: lower_int8(g.model_bytes, calib,
                                       min_act_elems=1 << 60,
                                       boundary_store="all"),
        # Mixed storage on the bf16 path (round-5 A/B): NOTHING quantizes,
        # compute stays bf16; only the large streams (SE pool/gate — the
        # bytes measured decisive in int8 mode) int8-materialize, every
        # consumer dequantizing on read. Pair against "bf16" at b768.
        "bf16_storage": lambda: lower_int8(g.model_bytes, calib,
                                           compute_dtype=jnp.bfloat16,
                                           boundary_store="storage"),
    }
    import os
    pick = os.environ.get("AB_VARIANTS")
    variants = ({k: all_variants[k] for k in pick.split(",")}
                if pick else all_variants)

    ref_scores = None
    out = {}
    for name, build in variants.items():
        fn = build()
        params = put(fn.params)
        sc = np.asarray(fn(probe, params=params)[0], np.float32)
        if ref_scores is None:
            ref_scores = sc

        def step(p, x, fn=fn):
            scores = fn(x, params=p)[0].astype(jnp.float32)
            return jax.lax.top_k(scores, 5)

        rt = bench._measure(step, params, (iters, batch, spec.sample_count),
                            secs, iters)
        ms = batch * secs / rt * 1000.0
        out[name] = {
            "x_realtime": round(rt, 0),
            "ms_per_step": round(ms, 2),
            "max_drift_vs_bf16": float(np.max(np.abs(sc - ref_scores))),
            "top1_agree": float(np.mean(
                np.argmax(sc, -1) == np.argmax(ref_scores, -1))),
            "quantized_nodes": len(getattr(fn, "quantized_nodes", [])),
            "boundary_tensors": len(getattr(fn, "int8_boundary_tensors", [])),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
