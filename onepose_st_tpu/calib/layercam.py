"""LayerCAM attribution maps for the calibration classifier.

The reference vendors LayerCAM alongside DeepSingleImageCalibration
(src/utils/calib/, used to inspect which image regions drive the
roll/rho/vFoV/k1 bin predictions). Here the map is computed the JAX way:
the trunk features are captured with flax `capture_intermediates`, the
selected head is re-applied standalone on them (plain flax module
surgery — its parameter subtree is the root of a fresh `CalibHead`), and
the activation gradient comes from one `jax.grad` through the head only.

LayerCAM (Jiang et al. 2021): cam = ReLU(sum_k ReLU(dY/dA_k) * A_k).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .model import CalibHead, CalibNet, DenseBlock


def trunk_features(model: CalibNet, variables, image) -> jax.Array:
    """[B, H, W, 3] -> trunk output [B, Hf, Wf, C] (input of every head)."""
    n_blocks = len(model.cfg.block_layers)
    _, inter = model.apply(
        variables,
        image,
        train=False,
        mutable=["intermediates"],
        capture_intermediates=lambda mdl, _: isinstance(mdl, DenseBlock),
    )
    # top-level trunk blocks are DenseBlock_0..N-1; heads' blocks are nested
    return inter["intermediates"][f"DenseBlock_{n_blocks - 1}"]["__call__"][0]


def _head_variables(variables, head: str) -> dict:
    sub = {}
    for col in ("params", "batch_stats"):
        if col in variables and f"{head}_head" in variables[col]:
            sub[col] = variables[col][f"{head}_head"]
    return sub


def layercam(
    model: CalibNet,
    variables,
    image,
    head: str = "vfov",
    target_bin: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Attribution heatmap for one head's predicted (or given) bin.

    Returns (cam [B, Hf, Wf] in [0, 1], log_probs [B, num_bins]).
    """
    feat = trunk_features(model, variables, image)
    head_mod = CalibHead(model.cfg)
    head_vars = _head_variables(variables, head)
    log_probs = head_mod.apply(head_vars, feat, False)
    bins = (
        jnp.argmax(log_probs, axis=-1)
        if target_bin is None
        else jnp.full(log_probs.shape[0], target_bin)
    )

    def score(f):
        lp = head_mod.apply(head_vars, f, False)
        return jnp.sum(jnp.take_along_axis(lp, bins[:, None], axis=-1))

    g = jax.grad(score)(feat)
    cam = nn_relu(jnp.sum(nn_relu(g) * feat, axis=-1))
    peak = jnp.max(cam, axis=(1, 2), keepdims=True)
    return cam / jnp.maximum(peak, 1e-12), log_probs


def upsample(cam: jax.Array, hw: tuple[int, int]) -> jax.Array:
    """Bilinear-resize [B, Hf, Wf] maps to image resolution."""
    return jax.image.resize(cam, (cam.shape[0], *hw), method="bilinear")


def nn_relu(x):
    return jnp.maximum(x, 0.0)
