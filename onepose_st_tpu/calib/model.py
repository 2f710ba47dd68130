"""DenseNet bin-classifier for single-image calibration.

Architecture follows the reference's shape (calib/models/densenet.py:12-114:
torchvision DenseNet trunk + per-head [transition, dense block, BN, pool,
MLP, log-softmax]) but is written as flax modules in NHWC with bf16 compute
— dense blocks are concatenations feeding 1x1/3x3 convs, which XLA fuses
onto the MXU. Default size is DenseNet-121-like; the reference's
DenseNet-161 is reproduced by CalibConfig(growth_rate=48,
block_layers=(6, 12, 36, 24), initial_dim=96).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax.numpy as jnp


@dataclass(frozen=True)
class CalibConfig:
    num_bins: int = 256
    heads: tuple[str, ...] = ("roll", "rho", "vfov", "k1_hat")
    growth_rate: int = 32
    block_layers: tuple[int, ...] = (6, 12, 24, 16)
    initial_dim: int = 64
    bn_size: int = 4            # bottleneck width multiplier
    head_dense_layers: int = 3
    head_growth_rate: int | None = None  # reference heads use 32 even on a
                                         # growth-48 densenet161 trunk
                                         # (densenet.py:72); None = growth_rate
    head_hidden: int = 512
    image_size: int = 224
    dtype: str = "bfloat16"

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)


# ImageNet statistics (reference densenet.py:28-29) — kept so weights
# trained under either framework see identically normalized inputs.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class DenseLayer(nn.Module):
    """BN-ReLU-1x1conv -> BN-ReLU-3x3conv, output concatenated by caller."""

    growth_rate: int
    bn_size: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Conv(
            self.bn_size * self.growth_rate, (1, 1), use_bias=False,
            dtype=self.dtype,
        )(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.growth_rate, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype,
        )(h)
        return h


class DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int
    bn_size: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool):
        for _ in range(self.num_layers):
            y = DenseLayer(self.growth_rate, self.bn_size, self.dtype)(x, train)
            x = jnp.concatenate([x, y], axis=-1)
        return x


class Transition(nn.Module):
    """BN-ReLU-1x1conv (halve channels) + 2x2 avg-pool stride 2."""

    out_dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Conv(self.out_dim, (1, 1), use_bias=False, dtype=self.dtype)(h)
        return nn.avg_pool(h, (2, 2), strides=(2, 2))


class CalibHead(nn.Module):
    """Per-quantity head: transition -> dense block -> GAP -> MLP -> log-softmax."""

    cfg: CalibConfig

    @nn.compact
    def __call__(self, feat, train: bool):
        c = self.cfg
        dt = c.jnp_dtype
        h = Transition(feat.shape[-1] // 2, dt)(feat, train)
        h = DenseBlock(
            c.head_dense_layers, c.head_growth_rate or c.growth_rate,
            c.bn_size, dt,
        )(h, train)
        h = nn.BatchNorm(use_running_average=not train, dtype=dt)(h)
        h = nn.relu(h)
        h = jnp.mean(h, axis=(1, 2))  # global average pool
        h = nn.relu(nn.Dense(c.head_hidden, dtype=dt)(h))
        logits = nn.Dense(c.num_bins, dtype=jnp.float32)(h.astype(jnp.float32))
        return nn.log_softmax(logits, axis=-1)


def densenet161_config(**kw) -> CalibConfig:
    """Exact torchvision densenet161 trunk shape (the reference's vendored
    DeepSingleImageCalibration model, densenet.py:22 'model': 'densenet161')
    so converted reference weights drop in (utils/convert_rules.calibnet_rules)."""
    return CalibConfig(
        growth_rate=48, block_layers=(6, 12, 36, 24), initial_dim=96,
        head_growth_rate=32, **kw,
    )


class CalibNet(nn.Module):
    """Shared DenseNet trunk + one classification head per quantity.

    Input: [B, H, W, 3] RGB in [0, 1] (resized to cfg.image_size).
    Output: {head: [B, num_bins] log-probabilities}.
    """

    cfg: CalibConfig = field(default_factory=CalibConfig)

    @nn.compact
    def __call__(self, image, train: bool = False):
        c = self.cfg
        dt = c.jnp_dtype
        mean = jnp.asarray(IMAGENET_MEAN, image.dtype)
        std = jnp.asarray(IMAGENET_STD, image.dtype)
        x = ((image - mean) / std).astype(dt)

        # stem: 7x7/2 conv + 3x3/2 max-pool
        x = nn.Conv(c.initial_dim, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=dt)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for bi, n_layers in enumerate(c.block_layers):
            x = DenseBlock(n_layers, c.growth_rate, c.bn_size, dt)(x, train)
            if bi != len(c.block_layers) - 1:
                x = Transition(x.shape[-1] // 2, dt)(x, train)
        # (reference drops the trunk's final norm: densenet.py:82
        # `features.norm5 = Identity()`; heads re-normalize themselves)

        return {h: CalibHead(self.cfg, name=f"{h}_head")(x, train)
                for h in c.heads}
