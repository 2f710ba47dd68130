"""Positional / keypoint encodings.

Sine image-grid encoding and the 3D-keypoint MLP encoding of the reference
(src/models/OnePosePlus/utils/position_encoding.py:8-80). We implement the
*intended* sinusoid frequency schedule — the reference inherits LoFTR's
well-known operator-precedence bug (`-log(10000)/d_model//2` floor-divides
the whole quotient); with no weight conversion there is no reason to
reproduce the bug.
"""
from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import KeypointEncodingConfig


@functools.lru_cache(maxsize=16)
def _sine_pe_np(d_model: int, h: int, w: int) -> np.ndarray:
    """[h, w, d_model] sinusoidal 2D encoding (x in first half pairs, y second)."""
    pe = np.zeros((h, w, d_model), np.float32)
    y_pos = np.arange(1, h + 1, dtype=np.float32)[:, None]
    x_pos = np.arange(1, w + 1, dtype=np.float32)[None, :]
    n_freq = d_model // 4
    div = np.exp(np.arange(n_freq, dtype=np.float32) * (-np.log(10000.0) / n_freq))
    for i in range(n_freq):
        pe[:, :, 4 * i + 0] = np.sin(x_pos * div[i])
        pe[:, :, 4 * i + 1] = np.cos(x_pos * div[i])
        pe[:, :, 4 * i + 2] = np.sin(y_pos * div[i])
        pe[:, :, 4 * i + 3] = np.cos(y_pos * div[i])
    return pe


def sine_positional_encoding(feat: jnp.ndarray) -> jnp.ndarray:
    """Add the 2D sine encoding to an NHWC coarse feature map."""
    B, H, W, C = feat.shape
    pe = jnp.asarray(_sine_pe_np(C, H, W), dtype=feat.dtype)
    return feat + pe[None]


class KeypointEncoding(nn.Module):
    """MLP(3 -> hidden -> d) over normalized 3D points, added to descriptors.

    Mirrors reference KeypointEncoding_linear (position_encoding.py:46-80)
    with per-point feature normalization standing in for the torch
    InstanceNorm1d-on-[B,L,C] quirk (which normalizes each point's feature
    vector, affine-free).
    """

    cfg: KeypointEncodingConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, kpts_normed, descriptors):
        """kpts_normed: [B, L, 3]; descriptors: [B, L, C]. Returns [B, L, C]."""
        x = kpts_normed.astype(self.dtype)
        for width in self.cfg.hidden:
            x = nn.Dense(width, dtype=self.dtype, param_dtype=jnp.float32)(x)
            mu = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
            x = nn.relu(x)
        x = nn.Dense(
            self.cfg.descriptor_dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            bias_init=nn.initializers.zeros,
        )(x)
        return descriptors + x
