"""LoFTR-style self/cross local feature transformer in flax.

Re-design of reference src/models/OnePosePlus/loftr_module/transformer.py:
alternating self/cross attention between two token streams with a single
weight-shared encoder layer per position (the reference deep-copies one
layer per position and applies it to both streams; we keep that weight
sharing). Attention is the elu+1 linear kernel by default (O(N) in tokens —
the reason the reference never needed sequence parallelism), with full
attention available for small sequences (fine stage).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops import attention as att_ops


class EncoderLayer(nn.Module):
    """Pre-projection MHA + concat-MLP block (reference transformer.py:7-96)."""

    d_model: int
    nhead: int
    attention: str = "linear"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, source, x_mask=None, source_mask=None):
        """x: [B, L, C] queries stream; source: [B, S, C] key/value stream."""
        B, L, C = x.shape
        S = source.shape[1]
        H = self.nhead
        D = C // H
        dense = lambda name: nn.Dense(  # noqa: E731
            C, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense("q_proj")(x).reshape(B, L, H, D)
        k = dense("k_proj")(source).reshape(B, S, H, D)
        v = dense("v_proj")(source).reshape(B, S, H, D)
        if self.attention == "linear":
            msg = att_ops.linear_attention(q, k, v, q_mask=x_mask, kv_mask=source_mask)
        else:
            msg = att_ops.full_attention(q, k, v, q_mask=x_mask, kv_mask=source_mask)
        msg = dense("merge")(msg.reshape(B, L, C))
        # epsilon 1e-5 = torch nn.LayerNorm default, so converted reference
        # checkpoints are activation-exact
        msg = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32
        )(msg)
        # feed-forward over [x ‖ message]
        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(2 * C, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Dense(C, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32
        )(y)
        return x + y


class LocalFeatureTransformer(nn.Module):
    """`layer_iter_n` iterations of (self, cross) over two streams.

    Stream 0 is the image grid (maskable); stream 1 is the 3D point set or
    second image. Layer weights are shared between the two streams at each
    position, matching the reference (transformer.py:146-166).
    """

    d_model: int
    nhead: int
    layer_iter_n: int
    attention: str = "linear"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feat0, feat1, mask0=None, mask1=None):
        """feat0: [B, S, C] (image tokens), feat1: [B, L, C]. Returns both."""
        for i in range(self.layer_iter_n):
            self_layer = EncoderLayer(
                self.d_model, self.nhead, self.attention, self.dtype,
                name=f"self_{i}",
            )
            cross_layer = EncoderLayer(
                self.d_model, self.nhead, self.attention, self.dtype,
                name=f"cross_{i}",
            )
            feat0 = self_layer(feat0, feat0, mask0, mask0)
            feat1 = self_layer(feat1, feat1, mask1, mask1)
            f0, f1 = feat0, feat1
            feat0 = cross_layer(f0, f1, mask0, mask1)
            feat1 = cross_layer(f1, f0, mask1, mask0)
        return feat0, feat1
