"""Fused dual-softmax match scoring — the matcher's hot kernel.

The XLA path (ops.matching.dual_softmax + extract_matches) materializes the
[B, L, S] confidence matrix (L=7040 points x S=4096 grid cells ~ 115 MB/f32
per sample) and reads it ~10x; measured 225 ms of a 269 ms forward at B=8 on
v5e. At inference only per-row/column reductions of conf are needed, so this
kernel never writes conf to HBM:

  pass A (stats):  flash-style accumulation of row max/sum-exp (exact per
                   tile: the full S axis sits in VMEM) and online col
                   max/sum-exp across L tiles.
  pass B (best):   recompute the similarity tile, form
                   conf = exp(2*sim - rowmax - colmax) / (rowsum*colsum),
                   reduce to per-row best value + argmax and per-col best.

Mutual-NN / threshold / border / top-K then run on [L]-sized arrays in XLA
(ops.pallas_kernels.extract_matches_fused).

Replaces the compute of reference utils/coarse_matching.py:104-174 at
inference; training keeps the differentiable XLA path (the focal loss needs
the dense conf matrix anyway).

Shapes: feat_p [L, C], feat_q [S, C]; L % TILE_L == 0 (wrapper pads),
S, C lane-aligned (4096 / 256 in the flagship config).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..matching import Matches

TILE_L = 128
_NEG = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _sim_tile(fp, fq, mask_row, inv_temp):
    """[TL, C] x [S, C] -> masked sim [TL, S] in f32.

    mask_row [TL, 1] masks padded/invalid 3D points. Image cells are
    deliberately NOT maskable here: the filter-only design (see
    extract_matches_fused docstring) keeps the softmax normalization
    mask-free so masked and unmasked crops share one activation
    distribution; crop-visibility masking happens as a post-filter on the
    [L]-sized outputs.
    """
    sim = jax.lax.dot_general(
        fp,
        fq,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_temp
    return jnp.where(mask_row > 0, sim, _NEG)


def _stats_kernel(
    fp_ref, fq_ref, mask_ref,
    rowmax_ref, rowsum_ref, colmax_ref, colsum_ref,
    *, inv_temp: float,
):
    i = pl.program_id(0)
    sim = _sim_tile(fp_ref[:], fq_ref[:], mask_ref[:].T, inv_temp)  # [TL, S]

    # exact row stats (full S in VMEM)
    rmax = jnp.max(sim, axis=1)                                   # [TL]
    rsum = jnp.sum(jnp.exp(sim - rmax[:, None]), axis=1)          # [TL]
    rowmax_ref[:] = rmax[None, :]
    rowsum_ref[:] = rsum[None, :]

    # online col stats accumulated across L tiles
    tile_cmax = jnp.max(sim, axis=0)[None, :]                     # [1, S]

    @pl.when(i == 0)
    def _init():
        colmax_ref[:] = jnp.full_like(colmax_ref, _NEG)
        colsum_ref[:] = jnp.zeros_like(colsum_ref)

    m_old = colmax_ref[:]
    m_new = jnp.maximum(m_old, tile_cmax)
    tile_sum = jnp.sum(jnp.exp(sim - m_new), axis=0)[None, :]     # [1, S]
    colsum_ref[:] = colsum_ref[:] * jnp.exp(m_old - m_new) + tile_sum
    colmax_ref[:] = m_new


def _best_kernel(
    fp_ref, fq_ref, mask_ref,
    rowmax_ref, rowsum_ref, colmax_ref, colsum_ref,
    rowbest_ref, rowj_ref, colbest_ref,
    *, inv_temp: float,
):
    i = pl.program_id(0)
    sim = _sim_tile(fp_ref[:], fq_ref[:], mask_ref[:].T, inv_temp)  # [TL, S]
    expo = (
        2.0 * sim
        - rowmax_ref[:].T            # [TL, 1]
        - colmax_ref[:]              # [1, S]
    )
    denom = rowsum_ref[:].T * colsum_ref[:]                       # [TL, S] bcast
    conf = jnp.exp(expo) / denom

    rowbest_ref[:] = jnp.max(conf, axis=1)[None, :]
    rowj_ref[:] = jnp.argmax(conf, axis=1).astype(jnp.int32)[None, :]

    tile_colbest = jnp.max(conf, axis=0)[None, :]

    @pl.when(i == 0)
    def _init():
        colbest_ref[:] = jnp.zeros_like(colbest_ref)

    colbest_ref[:] = jnp.maximum(colbest_ref[:], tile_colbest)


@functools.partial(jax.jit, static_argnames=("temperature",))
def _fused_single(feat_p, feat_q, point_mask, temperature: float):
    """Single-sample kernel launch. feat_p [L, C], feat_q [S, C]."""
    L, C = feat_p.shape
    S = feat_q.shape[0]
    assert L % TILE_L == 0, f"L={L} must be a multiple of {TILE_L}"
    n_tiles = L // TILE_L
    # features are normalized by sqrt(d) each (reference 'sqrt_feat_dim'),
    # so combined scale is 1/(C * T)
    inv_temp = 1.0 / (C * (temperature + 1e-4))
    # dtype-preserving: the matcher feeds bf16 activations, so the sim
    # matmul runs at bf16 MXU rate with f32 accumulation (callers must NOT
    # up-cast to f32 first — that halves MXU throughput for zero precision,
    # the information is already bf16); f32 inputs (tests) stay exact.
    fp = feat_p
    fq = feat_q.astype(feat_p.dtype)
    maskf = point_mask.astype(jnp.float32).reshape(1, L)

    row_spec = pl.BlockSpec((1, TILE_L), lambda i: (0, i), memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, S), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((TILE_L, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((S, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        row_spec,
    ]

    rowmax, rowsum, colmax, colsum = pl.pallas_call(
        functools.partial(_stats_kernel, inv_temp=inv_temp),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=[row_spec, row_spec, col_spec, col_spec],
        out_shape=[
            jax.ShapeDtypeStruct((1, L), jnp.float32),
            jax.ShapeDtypeStruct((1, L), jnp.float32),
            jax.ShapeDtypeStruct((1, S), jnp.float32),
            jax.ShapeDtypeStruct((1, S), jnp.float32),
        ],
        interpret=_interpret(),
    )(fp, fq, maskf)

    row_best, row_j, col_best = pl.pallas_call(
        functools.partial(_best_kernel, inv_temp=inv_temp),
        grid=(n_tiles,),
        in_specs=in_specs + [row_spec, row_spec, col_spec, col_spec],
        out_specs=[row_spec, row_spec, col_spec],
        out_shape=[
            jax.ShapeDtypeStruct((1, L), jnp.float32),
            jax.ShapeDtypeStruct((1, L), jnp.int32),
            jax.ShapeDtypeStruct((1, S), jnp.float32),
        ],
        interpret=_interpret(),
    )(fp, fq, maskf, rowmax, rowsum, colmax, colsum)

    return row_best[0], row_j[0], col_best[0]


def fused_match_scores(
    feat_p: jax.Array,       # [B, L, C]
    feat_q: jax.Array,       # [B, S, C]
    temperature: float,
    point_mask: jax.Array | None = None,  # [B, L]
):
    """Batched fused scoring. Returns (row_best [B,L], row_j [B,L], col_best [B,S])."""
    B, L, C = feat_p.shape
    if point_mask is None:
        point_mask = jnp.ones((B, L), dtype=bool)
    pad = (-L) % TILE_L
    if pad:
        feat_p = jnp.pad(feat_p, ((0, 0), (0, pad), (0, 0)))
        point_mask = jnp.pad(point_mask, ((0, 0), (0, pad)))
    row_best, row_j, col_best = jax.vmap(
        lambda p, q, m: _fused_single(p, q, m, temperature)
    )(feat_p, feat_q, point_mask)
    if pad:
        row_best = row_best[:, :L]
        row_j = row_j[:, :L]
    return row_best, row_j, col_best


def extract_matches_fused(
    feat_p: jax.Array,
    feat_q: jax.Array,
    temperature: float,
    threshold: float,
    max_matches: int,
    point_mask: jax.Array | None = None,
    border_mask_cols: jax.Array | None = None,
    col_mask: jax.Array | None = None,
) -> Matches:
    """Drop-in replacement for dual_softmax + extract_matches at inference.

    Semantics match ops.matching.extract_matches: mutual-NN (row best equals
    column best), confidence threshold, optional column border mask, a
    per-sample [B, S] `col_mask` (visibility of crop cells), ranked top-K
    with validity mask. `col_mask` is applied as a POST-FILTER (a match
    whose best cell is masked is dropped, not redirected) — identical to
    the dense path, and it keeps the softmax normalization mask-free so
    masked and unmasked crops share one activation distribution.
    """
    row_best, row_j, col_best = fused_match_scores(
        feat_p, feat_q, temperature, point_mask
    )
    col_best_at_j = jnp.take_along_axis(col_best, row_j, axis=1)
    mutual = row_best >= col_best_at_j * (1.0 - 1e-6)
    ok = mutual & (row_best > threshold)
    if border_mask_cols is not None:
        ok = ok & jnp.take(border_mask_cols, row_j)
    if col_mask is not None:
        ok = ok & jnp.take_along_axis(col_mask, row_j, axis=1)
    if point_mask is not None:
        ok = ok & point_mask
    scores = jnp.where(ok, row_best, 0.0)
    k = min(max_matches, scores.shape[1])
    top_conf, i_ids = jax.lax.top_k(scores, k)
    i_ids = i_ids.astype(jnp.int32)
    j_ids = jnp.take_along_axis(row_j, i_ids, axis=1)
    valid = top_conf > 0.0
    i_ids = jnp.where(valid, i_ids, 0)
    j_ids = jnp.where(valid, j_ids, 0)
    return Matches(i_ids=i_ids, j_ids=j_ids, conf=top_conf, valid=valid)
