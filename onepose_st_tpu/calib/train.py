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
) -> CalibBatch:
    """Ground-grid renders whose geometry *exactly* encodes the targets.

    A gravity-aligned checker/grid ground plane seen from a camera with
    sampled (vfov -> focal, pitch -> rho, roll) — the same physical cues
    (perspective foreshortening, horizon placement and tilt) that
    DeepSingleImageCalibration learns from SUN360 crops, with ground truth
    known in closed form instead of annotated. k1 is fixed at 0 (pinhole);
    the reference's K inference (`data_utils._get_K:293-311`) uses only the
    focal/vFoV heads, which is what the pose pipeline consumes.
    """
    import cv2

    H = W = size
    rolls = rng.uniform(-40.0, 40.0, size=batch)
    vfovs = rng.uniform(25.0, 100.0, size=batch)
    pitches = np.zeros(batch)
    rhos = np.zeros(batch)
    imgs = np.zeros((batch, H, W, 3), np.float32)
    for b in range(batch):
        fy = H / 2 / math.tan(math.radians(vfovs[b]) / 2)
        # sample rho uniformly in the valid bin range, derive pitch
        rho_raw = rng.uniform(-0.9, 0.9)
        pitch = math.atan(rho_raw * 0.35 * H / fy)
        pitches[b] = pitch
        rhos[b] = rho_raw
        roll = math.radians(rolls[b])

        # camera at height h over the plane y=0 (y points down -> plane
        # below camera is y=+h_cam in world), looking ahead with pitch+roll
        h_cam = rng.uniform(1.2, 2.2)
        cp, sp = math.cos(pitch), math.sin(pitch)
        cr, sr = math.cos(roll), math.sin(roll)
        # camera axes in world: base forward +z, up -y; pitch about x, then
        # roll about the optical axis
        R_pitch = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
        R_roll = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
        R = R_roll @ R_pitch  # world->cam
        eye = np.array([0.0, -h_cam, 0.0])
        t = -R @ eye
        K = np.array([[fy, 0, W / 2], [0, fy, H / 2], [0, 0, 1]])

        img = np.zeros((H, W, 3), np.float32)
        # sky gradient (above horizon) keyed to camera-frame up direction
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
        # horizon: image of the plane's line at infinity: y-cam of direction
        # (x, 0, z): points with depth->inf project to K [R (dx,0,dz)]
        # sky mask = pixels whose backprojected ray never hits the plane
        d_cam = np.stack(
            [(xs - W / 2) / fy, (ys - H / 2) / fy, np.ones_like(xs)], -1
        )
        d_world_y = d_cam @ R[:, 1]  # R^T row -> world y of ray direction
        sky = d_world_y < 0
        img[..., 0] = np.where(sky, 0.45, 0.30)
        img[..., 1] = np.where(sky, 0.62, 0.25)
        img[..., 2] = np.where(sky, 0.92, 0.20)

        # grid lines on the plane: x = i*s and z = j*s, y = 0
        s_grid = rng.uniform(0.8, 1.4)
        shade = rng.uniform(0.6, 1.0)

        def draw_seg(p0, p1):
            pts = np.stack([p0, p1])
            pc = pts @ R.T + t
            if (pc[:, 2] < 0.05).all():
                return
            # clip to z>=0.05 along the segment
            if pc[0, 2] < 0.05 or pc[1, 2] < 0.05:
                a, bb = (pc[0], pc[1]) if pc[0, 2] >= 0.05 else (pc[1], pc[0])
                lam = (0.05 - a[2]) / (bb[2] - a[2])
                bb = a + lam * (bb - a)
                pc = np.stack([a, bb])
            uv = (pc @ K.T)
            uv = uv[:, :2] / uv[:, 2:]
            cv2.line(
                img,
                (int(round(uv[0, 0])), int(round(uv[0, 1]))),
                (int(round(uv[1, 0])), int(round(uv[1, 1]))),
                (0.85 * shade, 0.8 * shade, 0.75 * shade), 1, cv2.LINE_AA,
            )

        ext = 40.0
        for i in range(-int(ext / s_grid), int(ext / s_grid) + 1):
            draw_seg(np.array([i * s_grid, 0, -ext]), np.array([i * s_grid, 0, ext]))
            draw_seg(np.array([-ext, 0, i * s_grid]), np.array([ext, 0, i * s_grid]))
        if noise > 0:
            img = img + rng.normal(size=img.shape).astype(np.float32) * noise
        imgs[b] = np.clip(img, 0, 1)
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
