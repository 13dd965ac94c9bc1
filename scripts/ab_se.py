#!/usr/bin/env python3
"""A/B the fused squeeze-and-excitation kernel (ops/se.py) on the chip.

Two builds of the full-scale bf16 graph at one batch size, scan+fetch
methodology (the tunnel defeats naive timing — bench.py docstring):

- se_off  : composed-op SE chain (BIRDA_SE_KERNEL=off)
- se_gate : BirdaFusedSE gate kernel, project conv left to XLA (=se)
- se_proj : BirdaFusedSEProject — gate + project in one kernel (=auto)
- block   : + BirdaFusedMBConvS1 — whole stride-1 MBConv blocks in one
            kernel (expand/dw/SE/project/BN/residual, ops/mbconv.py);
            stride-2 blocks keep the SEP kernel

Prints one JSON line per variant (ms/step, x realtime, score drift vs
the off build) then a combined line. int8 is untouched by this pass, so
only bf16 is measured.

Usage: python scripts/ab_se.py [batch] [family]
"""

from __future__ import annotations

import json
import os
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    fam = sys.argv[2] if len(sys.argv) > 2 else "birdnet-v24"
    on_tpu = jax.default_backend() == "tpu"
    spec = fs.SPECS[fam] if on_tpu else fs.tiny_spec(fs.SPECS[fam])
    g = fs.cached_build(spec, seed=1)
    secs = spec.sample_count / spec.sample_rate
    iters = 6 if on_tpu else 2

    rng = np.random.default_rng(123)
    probe = rng.normal(0, 0.1, (8, spec.sample_count)).astype(np.float32)

    def put(params):
        return {
            k: jax.device_put(
                np.asarray(v, jnp.bfloat16)
                if np.asarray(v).dtype.kind == "f" else np.asarray(v)
            )
            for k, v in params.items()
        }

    ref_scores = None
    out = {}
    variants = (("se_off", "off", "off"), ("se_gate", "se", "off"),
                ("se_proj", "auto", "off"), ("block", "auto", "auto"))
    pick = os.environ.get("AB_VARIANTS")
    if pick:
        variants = tuple(v for v in variants if v[0] in pick.split(","))
    for name, mode, mb_mode in variants:
        os.environ["BIRDA_SE_KERNEL"] = mode
        os.environ["BIRDA_MBCONV_KERNEL"] = mb_mode
        fn = lower(g.model_bytes, compute_dtype=jnp.bfloat16)
        n_fused = sum(n.op_type in ("BirdaFusedSE", "BirdaFusedSEProject",
                                    "BirdaFusedMBConvS1")
                      for n in fn.graph.nodes)
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
            "fused_se_nodes": n_fused,
            "max_drift_vs_off": float(np.max(np.abs(sc - ref_scores))),
            "top1_agree": float(np.mean(
                np.argmax(sc, -1) == np.argmax(ref_scores, -1))),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
