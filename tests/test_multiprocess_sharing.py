"""Real multi-process work sharing: two concurrent analyze runs on one
directory must partition the files via the advisory locks — every file
processed exactly once across both workers, none twice, none dropped.

The reference tests the lock *contract* through the filesystem only
(SURVEY §4 "multi-process behavior without a cluster"); this drives two
actual processes through the full pipeline, which also exercises the
check-to-use race fold (reference issue #344) under genuine concurrency.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

from fixtures_audio import write_wav

_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
from pathlib import Path
from birda_tpu.config.types import Config, ModelConfig, ModelType
from birda_tpu.orchestrator import AnalyzeOptions, analyze_files

indir, outdir = Path(sys.argv[1]), Path(sys.argv[2])
cfg = Config()
cfg.models["tiny"] = ModelConfig(
    path=Path("synthetic:tiny"), labels=Path("synthetic:tiny"),
    model_type=ModelType.BIRDNET_V24)
cfg.defaults.model = "tiny"
opts = AnalyzeOptions(
    inputs=[indir], output_dir=outdir, device_flags={"cpu": True},
    min_confidence=0.0,
)
code = analyze_files(opts, cfg)
print(json.dumps({"exit": code}))
"""


def test_two_workers_partition_a_directory(tmp_path):
    indir = tmp_path / "audio"
    indir.mkdir()
    rate = 48_000
    n_files = 6
    for i in range(n_files):
        t = np.arange(rate * 3) / rate
        write_wav(indir / f"rec{i}.wav",
                  (0.3 * np.sin(2 * np.pi * (1000 + 200 * i) * t)).astype(
                      np.float32), rate)
    outdir = tmp_path / "out"

    env = dict(os.environ)
    env["XDG_CONFIG_HOME"] = str(tmp_path / "config")
    env["XDG_CACHE_HOME"] = str(tmp_path / "cache")
    env["XDG_DATA_HOME"] = str(tmp_path / "data")
    env["BIRDA_NO_COMPILE_CACHE"] = "1"
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(indir), str(outdir)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=str(Path(__file__).resolve().parent.parent),
        )
        for _ in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]
        outs.append(json.loads(out.decode().strip().splitlines()[-1]))

    # Every file produced exactly one result; no stale locks remain.
    results = sorted(f.name for f in outdir.glob("*.csv"))
    assert results == sorted(
        f"rec{i}.BirdNET.results.csv" for i in range(n_files))
    assert list(outdir.glob("*.birda.lock")) == []
    # Both workers exit clean: locked/raced files fold into skips, never
    # failures (the check-to-use race handling, reference issue #344).
    assert all(o["exit"] == 0 for o in outs)
