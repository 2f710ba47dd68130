"""Positional / keypoint encodings.

Sine image-grid encoding and the 3D-keypoint MLP encoding of the reference
(src/models/OnePosePlus/utils/position_encoding.py:8-80). Two pe variants:

  * "intended" (default): the intended sinusoid frequency schedule — the
    right choice when training from scratch;
  * "loftr_compat": bit-parity with the reference's table, including
    LoFTR's well-known operator-precedence quirk
    (`-log(10000)/d_model//2` floor-divides the whole quotient, collapsing
    the frequency schedule) — REQUIRED when running converted reference
    checkpoints, whose weights were trained against that exact table.
"""
from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import KeypointEncodingConfig


@functools.lru_cache(maxsize=16)
def _sine_pe_np(d_model: int, h: int, w: int, variant: str = "intended") -> np.ndarray:
    """[h, w, d_model] sinusoidal 2D encoding (x/y interleaved in channel
    groups of 4: sin-x, cos-x, sin-y, cos-y per frequency)."""
    pe = np.zeros((h, w, d_model), np.float32)
    y_pos = np.arange(1, h + 1, dtype=np.float32)[:, None]
    x_pos = np.arange(1, w + 1, dtype=np.float32)[None, :]
    n_freq = d_model // 4
    if variant == "intended":
        div = np.exp(
            np.arange(n_freq, dtype=np.float32) * (-np.log(10000.0) / n_freq)
        )
    elif variant == "loftr_compat":
        # exact reproduction of the reference table
        # (position_encoding.py:25-33): the multiplier's `/ d_model // 2`
        # floor-divides the whole quotient (Python left-assoc precedence),
        # and the exponent steps over arange(0, d_model//2, 2)
        steps = np.arange(0, d_model // 2, 2, dtype=np.float64)
        mult = -np.log(10000.0) / d_model // 2
        div = np.exp(steps * mult).astype(np.float32)
    else:
        raise ValueError(f"unknown pe variant {variant!r}")
    for i in range(n_freq):
        pe[:, :, 4 * i + 0] = np.sin(x_pos * div[i])
        pe[:, :, 4 * i + 1] = np.cos(x_pos * div[i])
        pe[:, :, 4 * i + 2] = np.sin(y_pos * div[i])
        pe[:, :, 4 * i + 3] = np.cos(y_pos * div[i])
    return pe


def sine_positional_encoding(
    feat: jnp.ndarray, variant: str = "intended"
) -> jnp.ndarray:
    """Add the 2D sine encoding to an NHWC coarse feature map."""
    B, H, W, C = feat.shape
    pe = jnp.asarray(_sine_pe_np(C, H, W, variant), dtype=feat.dtype)
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
