"""Child process for the REAL two-process pod test (test_multihost.py).

Run as: python multihost_child.py <process_id>

The pod contract arrives through the production env route
(``BIRDA_COORDINATOR``/``BIRDA_NUM_PROCESSES``/``BIRDA_PROCESS_ID``,
``parallel/mesh.py::initialize_multihost`` — UNMOCKED ``jax.distributed``
over a local TCP coordinator with XLA's Gloo CPU collectives). Each
process contributes 2 virtual CPU devices; the script asserts the global
device view, rank-stamped lock bodies, and that a data-parallel sharded
predict over the 4-device global mesh agrees with a single-process run
of the same ONNX-lowered graph. Prints one ``{"ok": true, ...}`` JSON
line on success; any assert kills the process (nonzero exit)."""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    pid = int(sys.argv[1])
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from birda_tpu.parallel import mesh as pm

    assert pm.initialize_multihost(env=os.environ) is True
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 2
    assert pm.process_index() == pid

    m = pm.make_mesh(backend="cpu")  # the GLOBAL mesh: 2 procs x 2 devs
    assert m.devices.size == 4, m.devices.size

    # Rank-stamped lock bodies (the multi-host work-sharing protocol).
    from birda_tpu.locking.file_lock import FileLock

    lockdir = Path(os.environ["MH_TMP"])
    lock = FileLock.acquire(lockdir / f"f{pid}.wav", lockdir)
    body = json.loads(lock.lock_path.read_text())
    assert body["process_index"] == pid, body
    lock.release()

    # Sharded predict over the global mesh vs a single-process local run
    # of the identical fp32 program (the production ONNX-lowered tiny
    # graph). Both processes feed their addressable shards of the same
    # host batch; the result gathers with a real cross-process collective.
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from birda_tpu.onnx import fullscale as fs
    from birda_tpu.onnx.lowering import lower

    g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)
    fn = lower(g.model_bytes)
    batch = np.random.default_rng(0).normal(
        0, 0.1, (8, g.spec.sample_count)).astype(np.float32)

    sh = NamedSharding(m, P(pm.DATA_AXIS))
    jitted = jax.jit(lambda x: fn(x, params=fn.params)[0],
                     in_shardings=sh, out_shardings=sh)
    garr = jax.make_array_from_callback(batch.shape, sh,
                                        lambda idx: batch[idx])
    out = jitted(garr)

    from jax.experimental import multihost_utils

    got = np.asarray(multihost_utils.process_allgather(out, tiled=True))
    want = np.asarray(fn(batch, params=fn.params)[0])
    assert got.shape == want.shape
    err = float(np.max(np.abs(got - want)))
    assert err < 1e-5, err

    print(json.dumps({"ok": True, "pid": pid, "max_err": err}), flush=True)


if __name__ == "__main__":
    main()
