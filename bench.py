#!/usr/bin/env python3
"""Benchmark: inference throughput of the shipped model families on the
available accelerator.

**Headline metric**: the ONNX-lowered full-scale BirdNET v2.4 graph —
real op mix at real dimensions with the in-graph spectrogram front-end
(:mod:`birda_tpu.onnx.fullscale`), run through the same ONNX->XLA lowering
that executes the real release assets. This anchors the number to *their*
graph on our compiler, not to a self-designed backbone. ``vs_baseline``
divides by the reference's best published number (TensorRT batch 32 on an
RTX 5080 = 10,767x realtime, BASELINE.md).

The ``extra`` object carries the rest of the suite: the Perch v2-scale
graph (reference best 2,550x), the BirdNET v3.0-scale graph (no published
reference benchmark), and the native flax architecture (synthetic weights —
the framework ceiling, not a parity claim).

**Measurement methodology** (the tunnel lies to naive timers — CLAUDE.md):
distinct fresh-random inputs per step, all uploaded before the clock
starts, executed as a ``lax.scan`` inside ONE jit program, finished by
fetching the results (``np.asarray``) — `block_until_ready` alone is not a
reliable barrier over the remote tunnel and repeated identical executions
are served from a cache.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_BIRDNET_V24 = 10_767.0  # reference best: TensorRT b32, RTX 5080
BASELINE_PERCH_V2 = 2_550.0      # reference best: CUDA b32, RTX 5080


def _measure(step_fn, args, xs_shape, seconds_per_segment, iters):
    """Upload fresh-random inputs, scan once inside jit, fetch results.

    ``BIRDA_BENCH_TRANSPORT=int16`` uploads the inputs as int16 and
    dequantizes in-graph — the production chunk transport
    (``inference/classifier.py``), half the tunnel upload, and the knob
    that makes >1k batches practical over the compressing link. The
    dequant multiply is inside the timed step (honest: production pays
    it too). Default stays float32 for comparability with prior rounds.
    """
    import os

    import jax
    import jax.numpy as jnp
    from jax import lax

    int16_transport = os.environ.get("BIRDA_BENCH_TRANSPORT") == "int16"
    rng = np.random.default_rng(int(time.time() * 1000) % 2**31)
    host = rng.normal(0, 0.1, xs_shape).astype(np.float32)
    if int16_transport:
        xs = jax.device_put(
            np.clip(host * 32767.0, -32768, 32767).astype(np.int16))
    else:
        xs = jax.device_put(host)
    del host
    _ = np.asarray(xs[(0,) * (len(xs_shape) - 1) + (slice(0, 2),)])

    @jax.jit
    def multi(a, stacked):
        def body(carry, x):
            if int16_transport:
                x = x.astype(jnp.float32) * (1.0 / 32768.0)
            vals, idx = step_fn(a, x)
            return carry, (vals, idx)
        return lax.scan(body, jnp.int32(0), stacked)[1]

    vals, idx = multi(args, xs)
    _ = np.asarray(vals)  # compile + warm (persistent cache -> fast repeat)
    t0 = time.perf_counter()
    vals, idx = multi(args, xs)
    _ = np.asarray(vals)
    dt = time.perf_counter() - t0
    batch = xs_shape[1]
    seg_per_sec = batch * iters / dt
    return seg_per_sec * seconds_per_segment


def _bench_onnx(spec, batch, iters, seed=1):
    import jax
    import jax.numpy as jnp

    from birda_tpu.onnx import fullscale as fs
    from birda_tpu.onnx.lowering import lower

    g = fs.cached_build(spec, seed=seed)
    fn = lower(g.model_bytes, compute_dtype=jnp.bfloat16)
    params = {
        k: jax.device_put(np.asarray(v, jnp.bfloat16))
        for k, v in fn.params.items()
    }

    def step(p, x):
        scores = fn(x, params=p)[0].astype(jnp.float32)
        return jax.lax.top_k(scores, 5)

    rt = _measure(
        step, params, (iters, batch, spec.sample_count),
        spec.sample_count / spec.sample_rate, iters,
    )
    return rt, g


def _bench_onnx_int8(spec, batch, iters, seed=1):
    """Calibrated int8 execution (birda_tpu/onnx/quantize.py); calibration
    scales are cached per graph digest, so only the first run pays the
    calibration pass."""
    import jax
    import jax.numpy as jnp

    from birda_tpu.onnx import fullscale as fs
    from birda_tpu.onnx.quantize import cached_calibration, lower_int8

    g = fs.cached_build(spec, seed=seed)
    calib, _ = cached_calibration(g.model_bytes, spec.sample_count)
    fn = lower_int8(g.model_bytes, calib)
    params = {
        k: jax.device_put(
            np.asarray(v, jnp.bfloat16)
            if np.asarray(v).dtype.kind == "f" else np.asarray(v)
        )
        for k, v in fn.params.items()
    }

    def step(p, x):
        scores = fn(x, params=p)[0].astype(jnp.float32)
        return jax.lax.top_k(scores, 5)

    return _measure(
        step, params, (iters, batch, spec.sample_count),
        spec.sample_count / spec.sample_rate, iters,
    )


def _bench_native(batch, iters):
    import jax
    import jax.numpy as jnp

    from birda_tpu.models.contracts import ModelFamily
    from birda_tpu.models.zoo import native_model

    model = native_model(ModelFamily.BIRDNET_V24, dtype=jnp.bfloat16)

    def step(_, x):
        return jax.lax.top_k(model.apply(x)["scores"], 5)

    return _measure(step, 0, (iters, batch, 144_000), 3.0, iters)


def _accel_probe(timeout_s: float = 300.0):
    """Bounded out-of-process accelerator probe.

    In-process backend init retries for ~28 minutes when the tunnel is
    down (CLAUDE.md); a throwaway subprocess with a hard timeout answers
    "is the chip reachable" in bounded time, then exits and frees the
    single-tenant chip for the real run. Returns (ok, note)."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, f"accelerator probe timed out after {timeout_s:.0f}s"
    if r.returncode != 0:
        return False, (r.stderr.strip() or "probe failed")[-200:]
    lines = r.stdout.strip().splitlines()
    return bool(lines) and lines[-1] == "tpu", None


def main() -> None:
    import jax

    try:
        from birda_tpu.config.paths import xla_cache_dir
        from birda_tpu.inference.classifier import enable_persistent_cache

        enable_persistent_cache(xla_cache_dir())
    except Exception:  # noqa: BLE001
        pass

    from birda_tpu.onnx import fullscale as fs

    tunnel_error = None
    # Deliberate tradeoff: a healthy run pays one duplicate backend init
    # (~10-60 s on a warm tunnel) so a dead tunnel costs 5 minutes instead
    # of the ~28-minute in-process retry loop. BIRDA_BENCH_PROBE=0 skips.
    if os.environ.get("BIRDA_BENCH_PROBE", "1") != "0":
        ok, note = _accel_probe()
        if not ok:
            tunnel_error = note or "accelerator not reachable"
            jax.config.update("jax_platforms", "cpu")
    try:
        platform = jax.default_backend()
    except RuntimeError as e:
        # Accelerator plugin failed to initialize (tunnel outage). Confine
        # jax to CPU and report the smoke number with the failure noted —
        # a degraded-but-valid line beats a stack trace in the record.
        tunnel_error = str(e)[:200]
        jax.config.update("jax_platforms", "cpu")
        platform = jax.default_backend()
    on_accel = platform == "tpu"

    if not on_accel:
        # CPU smoke (CI-sized): tiny graph, same code path.
        rt, _ = _bench_onnx(fs.tiny_spec(fs.BIRDNET_V24_SPEC),
                            batch=8, iters=2)
        out = {
            "metric": "birdnet-v2.4 ONNX-lowered realtime (cpu smoke, tiny)",
            "value": round(rt, 1),
            "unit": "x realtime",
            "vs_baseline": round(rt / BASELINE_BIRDNET_V24, 3),
        }
        if tunnel_error:
            out["extra"] = {"accelerator_unavailable": tunnel_error}
        print(json.dumps(out))
        return

    extra = {}

    # Batch choices are measured optima per (graph, precision) on this
    # chip with the fused front-end (docs/performance.md batch scaling):
    # v2.4 bf16 peaks at 768, Perch/v3.0 at 256. v2.4 int8 under the
    # boundary_store="all" traffic cut kept climbing (19,383 at b512 →
    # 20,819 at b1536); b1024 (20,447×) is the bench point — b1536 buys
    # +1.8% but needs a ~7 GB incompressible upload through the tunnel.
    rt_v24, _ = _bench_onnx(fs.BIRDNET_V24_SPEC, batch=768, iters=4)
    try:
        rt_i8 = _bench_onnx_int8(fs.BIRDNET_V24_SPEC, batch=1024, iters=6)
        extra["birdnet_v24_int8_x_realtime"] = round(rt_i8, 0)
        extra["birdnet_v24_int8_vs_baseline"] = round(
            rt_i8 / BASELINE_BIRDNET_V24, 3)
    except Exception as e:  # noqa: BLE001
        extra["birdnet_v24_int8_error"] = str(e)[:200]
    try:
        rt_perch, _ = _bench_onnx(fs.PERCH_V2_SPEC, batch=256, iters=6)
        extra["perch_v2_onnx_x_realtime"] = round(rt_perch, 0)
        extra["perch_v2_vs_its_baseline"] = round(
            rt_perch / BASELINE_PERCH_V2, 2)
    except Exception as e:  # noqa: BLE001
        extra["perch_v2_error"] = str(e)[:200]
    try:
        rt_perch_i8 = _bench_onnx_int8(fs.PERCH_V2_SPEC, batch=256, iters=6)
        extra["perch_v2_int8_x_realtime"] = round(rt_perch_i8, 0)
        extra["perch_v2_int8_vs_its_baseline"] = round(
            rt_perch_i8 / BASELINE_PERCH_V2, 2)
    except Exception as e:  # noqa: BLE001
        extra["perch_v2_int8_error"] = str(e)[:200]
    try:
        rt_v30, _ = _bench_onnx(fs.BIRDNET_V30_SPEC, batch=256, iters=6)
        extra["birdnet_v30_onnx_x_realtime"] = round(rt_v30, 0)
    except Exception as e:  # noqa: BLE001
        extra["birdnet_v30_error"] = str(e)[:200]
    try:
        extra["birdnet_v30_int8_x_realtime"] = round(
            _bench_onnx_int8(fs.BIRDNET_V30_SPEC, batch=256, iters=6), 0)
    except Exception as e:  # noqa: BLE001
        extra["birdnet_v30_int8_error"] = str(e)[:200]
    try:
        extra["native_flax_v24_x_realtime"] = round(
            _bench_native(batch=256, iters=8), 0)
    except Exception as e:  # noqa: BLE001
        extra["native_flax_error"] = str(e)[:200]
    extra["note"] = (
        "ONNX-lowered full-scale graphs (real op mix/dims, bf16 matmuls, "
        "fp32 accum); scan+fetch methodology — round-1 numbers used an "
        "unreliable async barrier and over-reported, see docs/performance.md"
    )

    print(json.dumps({
        "metric": ("birdnet-v2.4 ONNX-lowered full-scale inference realtime "
                   f"({platform}, batch 768, bf16, fused mel front-end)"),
        "value": round(rt_v24, 1),
        "unit": "x realtime",
        "vs_baseline": round(rt_v24 / BASELINE_BIRDNET_V24, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    sys.exit(main())
