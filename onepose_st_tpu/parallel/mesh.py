"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's Ray pools + torch.distributed
(SURVEY.md §2.3): one `jax.sharding.Mesh` with a "data" axis for batch /
work-item sharding and an optional "model" axis reserved for sharding the
SfM map (tracks) in distributed BA. XLA inserts all collectives.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, axes: tuple[str, ...] = ("data",)
) -> Mesh:
    """1-D (default) or n-D mesh over the first n_devices devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if len(axes) == 1:
        shape = (n,)
    else:
        # fill trailing axes with 1 except the first
        shape = (n,) + (1,) * (len(axes) - 1)
    return Mesh(np.asarray(devs).reshape(shape), axes)


def shard_batch(mesh: Mesh, axis: str = "data"):
    """NamedSharding splitting the leading dim across `axis`."""
    def spec(x):
        ndim = getattr(x, "ndim", 0)
        if ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))

    return spec


def replicate(mesh: Mesh):
    """Fully-replicated NamedSharding."""
    return NamedSharding(mesh, P())


def shard_pytree(tree, mesh: Mesh, axis: str = "data"):
    """Device-put a host pytree with leading-dim sharding on `axis`."""
    spec = shard_batch(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, spec(x)), tree)


def replicate_pytree(tree, mesh: Mesh):
    rep = replicate(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bootstrap (the reference's SLURM/Ray head-address dance,
    run.py:69-70 + comm.py, as one call): on TPU pods with no args this
    auto-discovers from the environment; explicit args support CPU/GPU
    clusters. Safe to call once per process before building meshes.
    """
    import jax

    # NB: must not touch any backend-initializing jax API here
    # (jax.process_count() would initialize XLA and make
    # jax.distributed.initialize unconditionally fail afterwards)
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:
        if coordinator_address is not None:
            raise
        # single-process run (no coordinator in env): a no-op by design —
        # but surface late calls so silent single-host fallback is visible
        import logging

        logging.getLogger(__name__).warning(
            "jax.distributed not initialized (%s); continuing single-process",
            e,
        )


def global_mesh(axes: tuple[str, ...] = ("data",)) -> Mesh:
    """Mesh over ALL devices across hosts (call initialize_distributed
    first on multi-host)."""
    devs = np.asarray(jax.devices())
    if len(axes) == 1:
        shape = (len(devs),)
    else:
        shape = (len(devs),) + (1,) * (len(axes) - 1)
    return Mesh(devs.reshape(shape), axes)
