#!/usr/bin/env python3
"""A/B the backbone lowering experiments (VERDICT r3 #3) on the chip.

Variants of the full-scale bf16 graph at one batch size, scan+fetch
methodology (bench.py docstring):

- base      : current lowering (grouped lax.conv depthwise, NCHW)
- dwshift   : depthwise convs as k^2 shift-multiply-accumulates
              (BIRDA_DEPTHWISE=shifts)
- nhwc      : 2-D convs run channels-minor (BIRDA_CONV_LAYOUT=nhwc)
- dwfold    : depthwise convs fold batch into channels
              (BIRDA_DW_BATCHFOLD=1)
- s2d       : stem stride-2 3x3 as space-to-depth + 2x2 stride-1
              (BIRDA_STEM_S2D=1)
- both      : dwshift + nhwc together

Select a subset with AB_VARIANTS=name,name.

Each variant also asserts score agreement with base (same math,
different schedule — drift must stay within bf16 noise).

Usage: python scripts/ab_backbone.py [batch] [family]
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

    knobs = ("BIRDA_DEPTHWISE", "BIRDA_CONV_LAYOUT",
             "BIRDA_DW_BATCHFOLD", "BIRDA_STEM_S2D")
    variants = (
        ("base", {}),
        ("dwshift", {"BIRDA_DEPTHWISE": "shifts"}),
        ("nhwc", {"BIRDA_CONV_LAYOUT": "nhwc"}),
        ("dwfold", {"BIRDA_DW_BATCHFOLD": "1"}),
        ("s2d", {"BIRDA_STEM_S2D": "1"}),
        ("both", {"BIRDA_DEPTHWISE": "shifts", "BIRDA_CONV_LAYOUT": "nhwc"}),
    )
    pick = os.environ.get("AB_VARIANTS")
    if pick:
        variants = tuple(v for v in variants if v[0] in pick.split(","))

    ref_scores = None
    out = {}
    for name, env in variants:
        for k in knobs:
            os.environ.pop(k, None)
        os.environ.update(env)
        fn = lower(g.model_bytes, compute_dtype=jnp.bfloat16)
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
            "max_drift_vs_base": float(np.max(np.abs(sc - ref_scores))),
            "top1_agree": float(np.mean(
                np.argmax(sc, -1) == np.argmax(ref_scores, -1))),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
