#!/usr/bin/env python3
"""Benchmark: BirdNET v2.4 inference throughput on the available accelerator.

Measures the device inference path (the jitted mel-frontend -> backbone ->
top-k step) at the flagship batch size in bfloat16, reporting the realtime
factor (seconds of audio classified per wall-clock second). The reference's
best (TensorRT, batch 32, RTX 5080) is 10,767x realtime on BirdNET v2.4
(BASELINE.md), which is the ``vs_baseline`` denominator.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_REALTIME = 10_767.0  # reference best: TensorRT b32 on RTX 5080
SEGMENT_SECS = 3.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from birda_tpu.models.contracts import ModelFamily
    from birda_tpu.models.zoo import native_model

    # Persistent XLA cache: repeat bench runs load the compiled program
    # instead of rebuilding it (the TensorRT engine-cache analogue).
    try:
        from birda_tpu.config.paths import xla_cache_dir
        from birda_tpu.inference.classifier import enable_persistent_cache

        enable_persistent_cache(xla_cache_dir())
    except Exception:
        pass

    platform = jax.default_backend()
    batch = 256 if platform == "tpu" else 16
    iters = 20 if platform == "tpu" else 3

    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    model = native_model(ModelFamily.BIRDNET_V24, dtype=dtype)

    k = 5

    @jax.jit
    def step(x):
        out = model.apply(x)
        return jax.lax.top_k(out["scores"], k)

    rng = np.random.default_rng(0)
    x = rng.normal(0, 0.1, (batch, 144_000)).astype(np.float32)
    x = jax.device_put(x)

    # Warmup / compile.
    vals, idx = step(x)
    jax.block_until_ready((vals, idx))

    start = time.perf_counter()
    for _ in range(iters):
        vals, idx = step(x)
    jax.block_until_ready((vals, idx))
    elapsed = time.perf_counter() - start

    seg_per_sec = batch * iters / elapsed
    realtime = seg_per_sec * SEGMENT_SECS

    print(json.dumps({
        "metric": f"birdnet-v2.4 inference realtime factor ({platform}, batch {batch}, bf16)"
        if dtype == jnp.bfloat16
        else f"birdnet-v2.4 inference realtime factor ({platform}, batch {batch})",
        "value": round(realtime, 1),
        "unit": "x realtime",
        "vs_baseline": round(realtime / BASELINE_REALTIME, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
