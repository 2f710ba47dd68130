"""Learned windowed point tracker (CoTracker-style) in flax.

TPU-native re-design of the reference's CoTracker2 phase (the pinned
submodule consumed at inference.py:256-336 as
``CoTrackerPredictor(video_slice, queries, backward_tracking=True)``):
given a short window of frames and query points born at arbitrary frames
inside the window, predict every point's trajectory across the whole
window (both directions — the reference relies on backward tracking) plus
a per-(frame, point) visibility.

Architecture (CoTracker-style, all static shapes):
  1. a small stride-4 conv encoder over every frame;
  2. per-(frame, point) tokens: multi-scale correlation patches
     (``levels`` average-pooled copies of the feature map, (2r+1)^2 taps
     around the current estimate, dotted with the point's birth-frame
     descriptor), a sinusoidal embedding of the displacement from the
     query location, and the current visibility logit;
  3. an update transformer alternating full attention over the time axis
     (tokens of one track) and over the point axis (tokens of one frame),
     run ``update_iters`` times with shared weights, each iteration
     emitting (Δuv, Δvisibility); positions are stop-gradient'd between
     iterations (RAFT-style) and the query-frame position is clamped to
     the query.

Everything is a pure function of arrays: window length, point count, and
pyramid geometry are static, so one jitted program serves every window of
a video. The chained-correlation tracker in ``infer/tracker.py`` remains
as the zero-training fallback; this model is the learned, occlusion-aware
equivalent of the reference's.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import TrackerConfig
from ..ops.sampling import bilinear_sample
from .transformer import EncoderLayer


class TrackerEncoder(nn.Module):
    """Stride-4 conv feature encoder (the CoTracker BasicEncoder role).

    GroupNorm (not BatchNorm): tracking windows are tiny batches of highly
    correlated frames, a bad fit for batch statistics.
    """

    cfg: TrackerConfig

    @nn.compact
    def __call__(self, x):  # [B, H, W, 1] grayscale in [0, 1]
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        conv = lambda ch, k, s: nn.Conv(  # noqa: E731
            ch, (k, k), strides=s, padding=k // 2, use_bias=False,
            dtype=dt, param_dtype=jnp.float32,
        )
        gn = lambda: nn.GroupNorm(  # noqa: E731
            num_groups=8, dtype=dt, param_dtype=jnp.float32
        )
        x = nn.relu(gn()(conv(c.feat_dim // 2, 7, 2)(x)))
        x = nn.relu(gn()(conv(c.feat_dim // 2, 3, 1)(x)))
        x = nn.relu(gn()(conv(c.feat_dim, 3, 2)(x)))
        x = nn.relu(gn()(conv(c.feat_dim, 3, 1)(x)))
        x = nn.Conv(
            c.feat_dim, (1, 1), dtype=dt, param_dtype=jnp.float32
        )(x)
        return x.astype(jnp.float32)  # [B, H/4, W/4, feat_dim]


def _sinusoidal(x: jax.Array, n_freqs: int, base: float = 1.0) -> jax.Array:
    """[..., D] -> [..., D * 2 * n_freqs] sin/cos embedding."""
    freqs = base * (2.0 ** jnp.arange(n_freqs, dtype=jnp.float32))
    ang = x[..., None] * freqs  # [..., D, F]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return emb.reshape(*x.shape[:-1], -1)


def _corr_features(
    pyramid: list[jax.Array],     # level l: [BT, Hl, Wl, C]
    query_desc: list[jax.Array],  # level l: [B, N, C] (L2-normalized)
    uv: jax.Array,                # [B, T, N, 2] image px
    *,
    B: int,
    T: int,
    stride: int,
    radius: int,
) -> jax.Array:
    """Correlation patches around uv at every pyramid level.

    Returns [B, T, N, levels * (2r+1)^2].
    """
    N = uv.shape[2]
    r = radius
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(offs, offs, indexing="ij")
    grid = jnp.stack([dx, dy], axis=-1).reshape(-1, 2)  # [P, 2] feature units
    P = grid.shape[0]

    feats = []
    for lvl, fmap in enumerate(pyramid):
        s = stride * (2 ** lvl)
        uv_feat = (uv + 0.5) / s - 0.5                       # [B, T, N, 2]
        cand = uv_feat[..., None, :] + grid                  # [B, T, N, P, 2]
        samp = bilinear_sample(
            fmap, cand.reshape(B * T, N * P, 2)
        )                                                    # [BT, NP, C]
        samp = samp.reshape(B, T, N, P, -1)
        samp = samp * jax.lax.rsqrt(
            jnp.sum(samp * samp, axis=-1, keepdims=True) + 1e-8
        )
        corr = jnp.einsum(
            "btnpc,bnc->btnp", samp, query_desc[lvl]
        )                                                    # [B, T, N, P]
        feats.append(corr)
    return jnp.concatenate(feats, axis=-1)


class UpdateTransformer(nn.Module):
    """Alternating time-axis / point-axis full attention blocks."""

    cfg: TrackerConfig

    @nn.compact
    def __call__(self, tokens, point_mask):
        """tokens: [B, T, N, D]; point_mask: [B, N] bool."""
        c = self.cfg
        B, T, N, D = tokens.shape
        dt = jnp.dtype(c.dtype)
        for i in range(c.num_blocks):
            # time attention: tokens of one track attend across the window
            x = tokens.transpose(0, 2, 1, 3).reshape(B * N, T, D)
            x = EncoderLayer(
                d_model=D, nhead=c.nhead, attention="full", dtype=dt,
                name=f"time_{i}",
            )(x, x)
            tokens = x.reshape(B, N, T, D).transpose(0, 2, 1, 3)
            # point attention: tokens of one frame attend across the cloud
            m = jnp.broadcast_to(point_mask[:, None, :], (B, T, N))
            m = m.reshape(B * T, N)
            x = tokens.reshape(B * T, N, D)
            x = EncoderLayer(
                d_model=D, nhead=c.nhead, attention="full", dtype=dt,
                name=f"point_{i}",
            )(x, x, x_mask=m, source_mask=m)
            tokens = x.reshape(B, T, N, D)
        return tokens


class CoTrackerNet(nn.Module):
    """Iterative windowed tracker. See module docstring."""

    cfg: TrackerConfig

    def setup(self):
        c = self.cfg
        self.encoder = TrackerEncoder(c)
        self.token_proj = nn.Dense(c.d_model, param_dtype=jnp.float32)
        self.update = UpdateTransformer(c)
        self.head_norm = nn.LayerNorm(param_dtype=jnp.float32)
        self.delta_head = nn.Dense(
            2, param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(1e-3),
        )
        self.vis_head = nn.Dense(
            1, param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(1e-3),
        )

    def encode(self, frames: jax.Array) -> jax.Array:
        """[B, T, H, W] grayscale -> [B, T, Hf, Wf, C] feature maps."""
        B, T, H, W = frames.shape
        f = self.encoder(frames.reshape(B * T, H, W, 1))
        return f.reshape(B, T, *f.shape[1:])

    def __call__(
        self,
        frames: jax.Array,        # [B, T, H, W] grayscale in [0, 1]
        query_uv: jax.Array,      # [B, N, 2] image px at the birth frame
        query_frame: jax.Array,   # [B, N] int32 window index of birth
        point_mask: jax.Array,    # [B, N] bool (False = padding slot)
    ):
        """Returns dict with:
        coords_per_iter: [M, B, T, N, 2] trajectory after every iteration
        coords:          [B, T, N, 2]    final trajectory
        vis_logit:       [B, T, N]       visibility logits
        """
        c = self.cfg
        B, T, H, W = frames.shape
        N = query_uv.shape[1]

        fmaps = self.encode(frames)                     # [B, T, Hf, Wf, C]
        BT = B * T
        f0 = fmaps.reshape(BT, *fmaps.shape[2:])
        pyramid = [f0]
        for _ in range(c.levels - 1):
            pyramid.append(nn.avg_pool(pyramid[-1], (2, 2), strides=(2, 2)))

        # birth-frame descriptor per level: gather the birth frame's map,
        # then bilinear-sample at the query location
        tgrid = jnp.arange(T)
        birth_onehot = (
            query_frame[:, :, None] == tgrid[None, None, :]
        ).astype(jnp.float32)                           # [B, N, T]
        query_desc = []
        for lvl, fmap in enumerate(pyramid):
            s = c.stride * (2 ** lvl)
            fm = fmap.reshape(B, T, *fmap.shape[1:])
            uv_feat = (query_uv + 0.5) / s - 0.5        # [B, N, 2]
            # sample in every frame, then select the birth frame (avoids a
            # gather of full feature maps per point)
            samp = bilinear_sample(
                fmap, jnp.broadcast_to(
                    uv_feat[:, None], (B, T, N, 2)
                ).reshape(BT, N, 2),
            ).reshape(B, T, N, -1)
            d = jnp.einsum("btnc,bnt->bnc", samp, birth_onehot)
            d = d * jax.lax.rsqrt(jnp.sum(d * d, axis=-1, keepdims=True) + 1e-8)
            query_desc.append(d)

        # init: every frame starts at the query location
        uv = jnp.broadcast_to(query_uv[:, None], (B, T, N, 2))
        vis = jnp.zeros((B, T, N), jnp.float32)
        time_emb = _sinusoidal(
            (tgrid.astype(jnp.float32) / max(T - 1, 1))[:, None], c.flow_freqs
        )                                               # [T, 2F]

        is_birth = birth_onehot.transpose(0, 2, 1)      # [B, T, N]
        coords_iters = []
        for _ in range(c.update_iters):
            uv = jax.lax.stop_gradient(uv)
            corr = _corr_features(
                pyramid, query_desc, uv,
                B=B, T=T, stride=c.stride, radius=c.radius,
            )                                           # [B, T, N, L*P]
            duv_q = (uv - query_uv[:, None]) / 32.0     # window-scale units
            flow_emb = _sinusoidal(duv_q, c.flow_freqs)
            tok = jnp.concatenate(
                [
                    corr,
                    flow_emb,
                    duv_q,
                    vis[..., None],
                    jnp.broadcast_to(
                        time_emb[None, :, None, :], (B, T, N, time_emb.shape[-1])
                    ),
                ],
                axis=-1,
            )
            tok = self.token_proj(tok)                  # [B, T, N, D]
            tok = self.update(tok, point_mask)
            tok = self.head_norm(tok)
            delta = self.delta_head(tok)                # [B, T, N, 2]
            vis = vis + self.vis_head(tok)[..., 0]
            uv = uv + delta * c.stride
            # clamp the birth frame to the query (it is known)
            uv = uv * (1 - is_birth[..., None]) + (
                jnp.broadcast_to(query_uv[:, None], uv.shape) * is_birth[..., None]
            )
            coords_iters.append(uv)

        return {
            "coords_per_iter": jnp.stack(coords_iters),
            "coords": uv,
            "vis_logit": vis,
        }
