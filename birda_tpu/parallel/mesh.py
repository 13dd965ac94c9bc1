"""Device mesh construction for data-parallel inference.

The reference's only on-device parallelism is the batch dimension of one
ONNX Runtime session (SURVEY §2.3). The TPU equivalent shards the segment
batch over ICI across chips with ``jax.sharding``: params replicated, batch
split on a 1-D ``data`` axis, XLA inserting the (trivial) collectives.
Multi-host file-level work sharing stays at the lock-file layer
(:mod:`birda_tpu.locking`), which already works across hosts.
"""

from __future__ import annotations

from typing import Optional

DATA_AXIS = "data"


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


def pad_to_multiple(batch_size: int, mesh) -> int:
    """Smallest batch size >= ``batch_size`` divisible by the mesh size."""
    n = mesh.devices.size
    return ((batch_size + n - 1) // n) * n
