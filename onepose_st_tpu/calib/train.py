"""Calibration-network training: NLL over bins, data-parallel.

Replaces the reference's calib training scaffold (calib/train.py +
calib/models/densenet.py:117-210 loss): per-head negative log-likelihood of
the bucketized ground-truth bin, summed over heads, AdamW, batch sharded
over the mesh's data axis.

Ground truth per image: roll (rad), rho (normalized), vfov (rad), k1_hat —
the reference trains on the SUN360 panorama crops dataset; any source of
(image, quantities) pairs plugs in here, including `synthetic_calib_batch`
below which renders horizon/gradient cues for smoke training.
"""
from __future__ import annotations

import math
from typing import Iterator, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .calibrate import values_to_bins
from .model import CalibConfig, CalibNet


class CalibBatch(NamedTuple):
    image: np.ndarray      # [B, S, S, 3] RGB in [0,1]
    roll_deg: np.ndarray   # [B]
    rho: np.ndarray        # [B]
    vfov_deg: np.ndarray   # [B]
    k1_hat: np.ndarray     # [B]

    def to_bins(self, num_bins: int) -> dict[str, np.ndarray]:
        return {
            "roll": values_to_bins("roll", self.roll_deg, num_bins),
            "rho": values_to_bins("rho", self.rho, num_bins),
            "vfov": values_to_bins("vfov", self.vfov_deg, num_bins),
            "k1_hat": values_to_bins("k1_hat", self.k1_hat, num_bins),
        }


def nll_loss(log_probs: dict[str, jax.Array], bins: dict[str, jax.Array]) -> jax.Array:
    """Sum over heads of mean NLL (reference densenet.py NLLLoss)."""
    total = 0.0
    for head, lp in log_probs.items():
        total = total + (-jnp.take_along_axis(
            lp, bins[head][:, None].astype(jnp.int32), axis=1
        )[:, 0]).mean()
    return total


def train_step(params, batch_stats, opt_state, image, bins, *, model, tx):
    def loss_fn(p):
        out, mut = model.apply(
            {"params": p, "batch_stats": batch_stats}, image, train=True,
            mutable=["batch_stats"],
        )
        return nll_loss(out, bins), mut["batch_stats"]

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, new_stats, opt_state, loss


def fit_calib(
    cfg: CalibConfig,
    batches: Iterator[CalibBatch],
    n_steps: int,
    lr: float = 1e-4,
    weight_decay: float = 0.01,
    log_every: int = 50,
    log_fn=None,
    ckpt_dir=None,
):
    """Train CalibNet; returns (model, variables, losses)."""
    model = CalibNet(cfg)
    first = next(iter_first := iter(batches))
    tx = optax.adamw(lr, weight_decay=weight_decay)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.key(0), jnp.asarray(first.image), train=True
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    step_fn = jax.jit(lambda p, s, o, im, b: train_step(
        p, s, o, im, b, model=model, tx=tx
    ))

    losses = []

    def run(step, batch):
        nonlocal params, batch_stats, opt_state
        bins = {k: jnp.asarray(v) for k, v in batch.to_bins(cfg.num_bins).items()}
        params, batch_stats, opt_state, loss = step_fn(
            params, batch_stats, opt_state, jnp.asarray(batch.image), bins
        )
        losses.append(float(loss))
        if log_fn and step % log_every == 0:
            log_fn(step, losses[-1])

    run(0, first)
    for step, batch in enumerate(iter_first, start=1):
        if step >= n_steps:
            break
        run(step, batch)
    variables = {"params": params, "batch_stats": batch_stats}
    if ckpt_dir is not None:
        from pathlib import Path

        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(Path(ckpt_dir).absolute())
        mgr.save(
            n_steps,
            args=ocp.args.Composite(
                params=ocp.args.PyTreeSave(params),
                batch_stats=ocp.args.PyTreeSave(batch_stats),
            ),
        )
        mgr.wait_until_finished()
    return model, variables, losses


def perspective_calib_batch(
    rng: np.random.Generator,
    batch: int,
    size: int = 224,
    noise: float = 0.02,
    clutter: int = 60,
) -> CalibBatch:
    """Ground-grid renders whose geometry *exactly* encodes the targets.

    A gravity-aligned grid ground plane (data.synthetic.
    ground_grid_background — the SAME renderer used for wild-scene test
    sequences, so the trained net is in-domain at inference) seen from a
    camera with sampled (vfov -> focal, pitch -> rho, roll): the
    perspective foreshortening, horizon placement and tilt are the physical
    cues DeepSingleImageCalibration learns from SUN360 crops, with ground
    truth known in closed form instead of annotated. Splat clutter plays
    the role of scene content. k1 is fixed at 0 (pinhole); the reference's
    K inference (`data_utils._get_K:293-311`) uses only the focal/vFoV
    heads, which is what the pose pipeline consumes.
    """
    from ..data import synthetic

    H = W = size
    rolls = rng.uniform(-40.0, 40.0, size=batch)
    vfovs = rng.uniform(25.0, 100.0, size=batch)
    rhos = np.zeros(batch)
    imgs = np.zeros((batch, H, W, 3), np.float32)
    for b in range(batch):
        fy = H / 2 / math.tan(math.radians(vfovs[b]) / 2)
        # sample rho uniformly in the valid bin range, derive pitch
        rho_raw = rng.uniform(-0.9, 0.9)
        pitch = math.atan(rho_raw * 0.35 * H / fy)
        rhos[b] = rho_raw
        roll = math.radians(rolls[b])

        # world y points down (look_at convention); plane at y=+h below
        # the camera; base forward +z, pitch about x, roll about optical axis
        h_cam = rng.uniform(1.2, 2.2)
        cp, sp = math.cos(pitch), math.sin(pitch)
        cr, sr = math.cos(roll), math.sin(roll)
        R_pitch = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
        R_roll = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
        R = R_roll @ R_pitch  # world->cam
        eye = np.array([0.0, -h_cam, 0.0])
        t = -R @ eye
        K = np.array([[fy, 0, W / 2], [0, fy, H / 2], [0, 0, 1]])

        img = synthetic.ground_grid_background(
            R, t, K, (H, W), plane_y=0.0,
            grid_step=rng.uniform(0.8, 1.4),
            line_shade=rng.uniform(0.6, 0.95),
        )
        if clutter > 0:
            # splat clutter scattered in front of the camera
            pts = np.stack([
                rng.uniform(-3, 3, clutter),
                rng.uniform(-1.5, 0.5, clutter) - h_cam * 0,
                rng.uniform(0.5, 6.0, clutter),
            ], axis=1)
            pc = pts  # already expressed in a camera-ish frame; project raw
            uv = pc @ K.T
            depth = pc[:, 2]
            uvp = uv[:, :2] / np.clip(uv[:, 2:], 1e-6, None)
            vis = (depth > 0.1) & (uvp[:, 0] > 0) & (uvp[:, 0] < W) \
                & (uvp[:, 1] > 0) & (uvp[:, 1] < H)
            amps = rng.uniform(0.2, 1.0, clutter).astype(np.float32)
            img = synthetic.splat_image(
                uvp.astype(np.float32), depth.astype(np.float32), vis, amps,
                (H, W), sigma_px=rng.uniform(1.5, 3.0), background=img,
            )
        if noise > 0:
            img = np.clip(
                img + rng.normal(size=img.shape).astype(np.float32) * noise,
                0, 1,
            )
        imgs[b] = img[..., None]  # grayscale replicated to RGB
    return CalibBatch(
        image=imgs, roll_deg=rolls, rho=rhos, vfov_deg=vfovs,
        k1_hat=np.zeros(batch),
    )


def synthetic_calib_batch(
    rng: np.random.Generator, batch: int, size: int = 64
) -> CalibBatch:
    """Images whose horizon line + vertical gradient encode roll/rho/vfov.

    A learnable toy distribution for smoke tests: the horizon is drawn at
    angle `roll` through height offset `rho`, with blur scaled by vfov.
    """
    rolls = rng.uniform(-40, 40, size=batch)
    rhos = rng.uniform(-0.9, 0.9, size=batch)
    vfovs = rng.uniform(25, 100, size=batch)
    k1s = rng.uniform(-0.4, 0.0, size=batch)
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32) / size - 0.5
    imgs = np.zeros((batch, size, size, 3), np.float32)
    for b in range(batch):
        th = math.radians(rolls[b])
        d = -xs * math.sin(th) + ys * math.cos(th) - rhos[b] * 0.35
        sharp = 2.0 + (105.0 - vfovs[b]) / 10.0
        sky = 1.0 / (1.0 + np.exp(d * sharp * 8))
        imgs[b, ..., 0] = sky * 0.4 + (1 - sky) * (0.55 + 0.1 * k1s[b])
        imgs[b, ..., 1] = sky * 0.6 + (1 - sky) * 0.4
        imgs[b, ..., 2] = sky * 0.9 + (1 - sky) * (0.25 - 0.3 * k1s[b])
    return CalibBatch(
        image=imgs, roll_deg=rolls, rho=rhos, vfov_deg=vfovs, k1_hat=k1s
    )
