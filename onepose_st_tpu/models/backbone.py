"""ResNet-FPN 8/2 backbone in flax (NHWC, TPU-native layout).

Re-design of reference src/models/OnePosePlus/backbone/resnet.py:85
(ResNetFPN_8_2): same topology — 7x7 stem /2, three BasicBlock stages to
/8, FPN back up to /2 — with TPU idioms: NHWC, bf16 conv compute with f32
params/batch-stats. Upsampling is bilinear half-pixel by default; set
BackboneConfig.upsample_align_corners for exact torch align_corners parity
when running converted reference checkpoints.

Outputs: coarse [B, H/8, W/8, block_dims[-1]] and fine [B, H/2, W/2,
block_dims[0]].
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import BackboneConfig


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, dtype=self.dtype, param_dtype=jnp.float32
        )
        y = nn.Conv(
            self.planes, (3, 3), strides=self.stride, padding=1, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        y = nn.relu(norm()(y))
        y = nn.Conv(
            self.planes, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(y)
        y = norm()(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(
                self.planes, (1, 1), strides=self.stride, use_bias=False,
                dtype=self.dtype, param_dtype=jnp.float32,
            )(x)
            x = norm()(x)
        return nn.relu(x + y)


def _upsample2x(x: jax.Array, align_corners: bool = False) -> jax.Array:
    B, H, W, C = x.shape
    if not align_corners:
        return jax.image.resize(x, (B, H * 2, W * 2, C), method="bilinear")
    # torch F.interpolate(scale_factor=2, align_corners=True) parity:
    # output coord i samples input at i * (N-1) / (2N-1). Needed when the
    # weights come from a converted reference checkpoint.
    def axis_weights(n):
        src = jnp.arange(2 * n, dtype=jnp.float32) * (n - 1) / (2 * n - 1)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n - 1)
        w = (src - lo).astype(x.dtype)
        return lo, hi, w

    y0, y1, wy = axis_weights(H)
    x0, x1, wx = axis_weights(W)
    rows = x[:, y0] * (1 - wy)[None, :, None, None] + x[:, y1] * wy[None, :, None, None]
    return (
        rows[:, :, x0] * (1 - wx)[None, None, :, None]
        + rows[:, :, x1] * wx[None, None, :, None]
    )


class ResNetFPN(nn.Module):
    cfg: BackboneConfig

    @nn.compact
    def __call__(self, image, train: bool = False):
        """image: [B, H, W, 1] grayscale in [0, 1]; H, W divisible by 8."""
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        x = image.astype(dtype)
        norm = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, dtype=dtype, param_dtype=jnp.float32
        )
        conv = lambda f, k, s=1: nn.Conv(  # noqa: E731
            f, (k, k), strides=s, padding=k // 2, use_bias=False,
            dtype=dtype, param_dtype=jnp.float32,
        )

        x0 = nn.relu(norm()(conv(c.initial_dim, 7, 2)(x)))       # 1/2
        d1, d2, d3 = c.block_dims
        x1 = BasicBlock(d1, 1, dtype)(x0, train)
        x1 = BasicBlock(d1, 1, dtype)(x1, train)                  # 1/2
        x2 = BasicBlock(d2, 2, dtype)(x1, train)
        x2 = BasicBlock(d2, 1, dtype)(x2, train)                  # 1/4
        x3 = BasicBlock(d3, 2, dtype)(x2, train)
        x3 = BasicBlock(d3, 1, dtype)(x3, train)                  # 1/8

        # FPN top-down
        ac = c.upsample_align_corners
        x3_out = conv(d3, 1)(x3)                                  # coarse, 1/8
        x3_up = _upsample2x(x3_out, ac)
        x2_lat = conv(d3, 1)(x2)
        y2 = conv(d3, 3)(x2_lat + x3_up)
        y2 = nn.leaky_relu(norm()(y2))
        x2_out = conv(d2, 3)(y2)                                  # 1/4
        x2_up = _upsample2x(x2_out, ac)
        x1_lat = conv(d2, 1)(x1)
        y1 = conv(d2, 3)(x1_lat + x2_up)
        y1 = nn.leaky_relu(norm()(y1))
        x1_out = conv(d1, 3)(y1)                                  # fine, 1/2

        return x3_out.astype(dtype), x1_out.astype(dtype)
