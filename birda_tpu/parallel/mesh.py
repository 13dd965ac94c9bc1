"""Device mesh construction for data-parallel inference.

The reference's only on-device parallelism is the batch dimension of one
ONNX Runtime session (SURVEY §2.3). The TPU equivalent shards the segment
batch over ICI across chips with ``jax.sharding``: params replicated, batch
split on a 1-D ``data`` axis, XLA inserting the (trivial) collectives.
Multi-host file-level work sharing stays at the lock-file layer
(:mod:`birda_tpu.locking`), which already works across hosts.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

DATA_AXIS = "data"

#: Environment contract for multi-host pods (set by the launcher on every
#: host): coordinator address, world size, this host's rank.
ENV_COORDINATOR = "BIRDA_COORDINATOR"
ENV_NUM_PROCESSES = "BIRDA_NUM_PROCESSES"
ENV_PROCESS_ID = "BIRDA_PROCESS_ID"

_distributed_initialized = False


def initialize_multihost(env: Optional[dict] = None) -> bool:
    """Join a multi-host pod when the ``BIRDA_COORDINATOR`` contract is set.

    Wraps ``jax.distributed.initialize`` — after it, ``jax.devices()``
    returns the pod-global device list and :func:`make_mesh` shards the
    batch over ICI/DCN across hosts. A no-op (returns False) when the env
    contract is absent, so single-host behavior is unchanged. Idempotent.

    The reference scales across hosts only at file granularity via lock
    files (SURVEY §2.3 row 3) — that still works here unchanged; this adds
    the one thing it cannot do: one batch spanning chips on several hosts.
    """
    global _distributed_initialized
    e = env if env is not None else os.environ
    coordinator = e.get(ENV_COORDINATOR)
    if not coordinator:
        return False
    if _distributed_initialized:
        return True
    try:
        num_processes = int(e[ENV_NUM_PROCESSES])
        process_id = int(e[ENV_PROCESS_ID])
    except (KeyError, ValueError) as err:
        from ..errors import ConfigValidation

        raise ConfigValidation(
            f"{ENV_COORDINATOR} is set, so {ENV_NUM_PROCESSES} and "
            f"{ENV_PROCESS_ID} must both be integers (got "
            f"{e.get(ENV_NUM_PROCESSES)!r} / {e.get(ENV_PROCESS_ID)!r})"
        ) from err
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _distributed_initialized = True
    logger.info(
        "joined pod: process %s/%s via %s",
        e[ENV_PROCESS_ID], e[ENV_NUM_PROCESSES], coordinator,
    )
    return True


def process_index() -> int:
    """This host's rank in the pod (0 on single-host) — recorded in file
    locks as the cross-host tie-break/observability field. Never touches
    the jax backend unless a pod was actually joined (lock acquisition must
    stay cheap and side-effect-free on single hosts)."""
    if not _distributed_initialized:
        return 0
    try:
        import jax

        return int(jax.process_index())
    except Exception:  # noqa: BLE001
        return 0


def make_mesh(n_devices: Optional[int] = None, backend: Optional[str] = None):
    """Build a 1-D data-parallel mesh over the available devices.

    ``n_devices=None`` uses every device of the chosen backend. Raises if
    more devices are requested than exist.
    """
    import jax
    from jax.sharding import Mesh

    devices = jax.devices(backend) if backend else jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} present"
            )
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (DATA_AXIS,))


def mesh_over(devices):
    """1-D data mesh over an explicit device list.

    The production analyze path passes the backend selector's
    already-resolved devices here (rather than re-querying by platform
    name through :func:`make_mesh`) so the mesh can never disagree with
    the backend the run actually selected.
    """
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.asarray(devices), (DATA_AXIS,))


def pad_to_multiple(batch_size: int, mesh) -> int:
    """Smallest batch size >= ``batch_size`` divisible by the mesh size."""
    n = mesh.devices.size
    return ((batch_size + n - 1) // n) * n
