#!/usr/bin/env python3
"""Sweep the int8 batch-size optimum per model family on the attached chip.

Round-4 found BirdNET v2.4's int8 optimum moved 512 -> 1536 once
``boundary_store="all"`` cut the fusion-boundary traffic (the regime is
attachment-bandwidth-bound; fewer bytes = deeper batching pays). Perch v2
and BirdNET v3.0 int8 inherited bf16's b256 without a re-sweep — this
script measures whether their optima moved too (VERDICT r4 next-round #4).

Methodology: same scan+fetch measurement as bench.py (the tunnel defeats
naive timing — docs/performance.md "How these were measured"); 6 iters per
point, one JSON line per (family, batch), then a summary line with the
argmax per family.

Usage: python scripts/sweep_int8_batch.py [family ...]
       (default: perch-v2 birdnet-v30)
       BATCHES=256,512,768,1024 overrides the sweep grid.
       STORAGE_ONLY=1 sweeps `--precision mixed` (bf16 compute + int8
       boundary storage) instead of full int8 — the round-5 mode whose
       traffic cut may move its optimum up the way v2.4 int8's did.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax

    try:
        from birda_tpu.config.paths import xla_cache_dir
        from birda_tpu.inference.classifier import enable_persistent_cache

        enable_persistent_cache(xla_cache_dir())
    except Exception:  # noqa: BLE001
        pass

    import bench
    from birda_tpu.onnx import fullscale as fs

    families = sys.argv[1:] or ["perch-v2", "birdnet-v30"]
    on_tpu = jax.default_backend() == "tpu"
    grid = [int(b) for b in os.environ.get(
        "BATCHES", "256,512,768,1024").split(",")]
    if not on_tpu:
        grid = [8, 16]
    iters = 6 if on_tpu else 2
    storage_only = bool(os.environ.get("STORAGE_ONLY"))
    mode = "mixed" if storage_only else "int8"

    best = {}
    for fam in families:
        spec = fs.SPECS[fam] if on_tpu else fs.tiny_spec(fs.SPECS[fam])
        for batch in grid:
            try:
                rt = bench._bench_onnx_int8(spec, batch=batch, iters=iters,
                                            storage_only=storage_only)
            except Exception as e:  # noqa: BLE001 — OOM at big b is data
                print(json.dumps({"family": fam, "batch": batch,
                                  "mode": mode,
                                  "error": f"{type(e).__name__}: {e}"[:200]}),
                      flush=True)
                continue
            print(json.dumps({"family": fam, "batch": batch, "mode": mode,
                              "x_realtime": round(rt, 0)}), flush=True)
            if rt > best.get(fam, (0, 0))[1]:
                best[fam] = (batch, rt)
    print(json.dumps({"best": {f: {"batch": b, "x_realtime": round(rt, 0)}
                               for f, (b, rt) in best.items()}}), flush=True)


if __name__ == "__main__":
    main()
