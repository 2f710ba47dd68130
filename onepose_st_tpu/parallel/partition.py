"""Deterministic host-side work partitioning for multi-host runs.

The role of reference src/utils/ray_utils.py:10-109 (`chunks`,
`chunk_index`, `split_dict` feeding Ray worker pools) without an actor
system: every host computes the same deterministic partition of the work
list (pairs, tracks, objects) and processes its own shard; device-level
results meet through XLA collectives, host-level artifacts through
multihost utils.
"""
from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np


def chunks(seq: Sequence, n_chunks: int) -> list[list]:
    """Split into n_chunks near-equal contiguous chunks (may be fewer if
    len(seq) < n_chunks)."""
    n = len(seq)
    n_chunks = max(1, min(n_chunks, n)) if n else 1
    bounds = np.linspace(0, n, n_chunks + 1).round().astype(int)
    return [list(seq[bounds[i]:bounds[i + 1]]) for i in range(n_chunks)
            if bounds[i] < bounds[i + 1]] or [[]]


def chunk_index(n_items: int, n_parts: int, part: int) -> np.ndarray:
    """Indices of `part`'s shard of range(n_items) — every caller computes
    the same split (contiguous, near-equal)."""
    bounds = np.linspace(0, n_items, n_parts + 1).round().astype(int)
    return np.arange(bounds[part], bounds[part + 1])


def split_dict(d: dict, n_chunks: int) -> list[dict]:
    keys = list(d.keys())
    return [{k: d[k] for k in part} for part in chunks(keys, n_chunks)]


def host_shard(items: Sequence, process_index: int | None = None,
               process_count: int | None = None) -> list:
    """This host's shard of a work list under jax.distributed.

    Single-process runs return the full list, so pipeline code can call it
    unconditionally.
    """
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    idx = chunk_index(len(items), pc, pi)
    return [items[int(i)] for i in idx]


def all_gather_host_lists(local: list) -> list:
    """Concatenate per-host lists across processes (rank order).

    The multihost analogue of the reference's pickle-gather
    (src/utils/comm.py:141-220) built on jax.experimental.multihost_utils;
    single-process runs return `local` unchanged.
    """
    import jax

    if jax.process_count() == 1:
        return list(local)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(local, tiled=False)
    out = []
    for part in gathered:
        out.extend(part)
    return out
