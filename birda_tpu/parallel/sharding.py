"""Sharded execution of the inference step.

``shard_data_parallel`` wraps a pure ``batch -> outputs`` function in a jit
whose input batch is sharded over the mesh's ``data`` axis and whose
batch-major outputs stay sharded (host gathers lazily on ``np.asarray``).
Per-shard top-k needs no cross-chip communication at all — each chip ranks
its own segments — so the only collective XLA inserts is the output gather,
riding ICI.
"""

from __future__ import annotations

from .mesh import DATA_AXIS


def shard_data_parallel(fn, mesh):
    """Jit ``fn`` with the leading (batch) axis sharded over the mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))

    jitted = jax.jit(
        fn,
        in_shardings=batch_sharding,
        out_shardings=batch_sharding,
    )

    def wrapped(x):
        if x.shape[0] % mesh.devices.size != 0:
            raise ValueError(
                f"batch {x.shape[0]} not divisible by mesh size "
                f"{mesh.devices.size}; pad with silence first"
            )
        return jitted(jax.device_put(x, batch_sharding))

    return wrapped
