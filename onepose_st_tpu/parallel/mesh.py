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
