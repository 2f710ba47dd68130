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


def rpv_from_Rt(R: np.ndarray, K: np.ndarray, height: int) -> tuple[float, float, float]:
    """(roll_deg, rho_raw, vfov_deg) of a world->cam pose under the y-down
    gravity convention — the label extractor for renderer-derived frames.

    roll: in-plane angle of the gravity direction in the image;
    rho_raw: normalized horizon offset in the same scaling the training
    sampler uses (pitch = atan(rho_raw * 0.35 * H / fy));
    vfov: from fy. Validated against the sampler's own construction in
    tests/test_calib.py.
    """
    g_cam = R @ np.array([0.0, 1.0, 0.0])  # gravity (world +y, down) in cam
    roll = math.degrees(math.atan2(-g_cam[0], g_cam[1]))
    pitch = math.asin(max(-1.0, min(1.0, float(g_cam[2]))))
    fy = float(K[1, 1])
    rho_raw = math.tan(pitch) * fy / (0.35 * height)
    vfov = math.degrees(2 * math.atan(height / 2 / fy))
    return roll, rho_raw, vfov


def wild_scene_calib_batch(
    rng: np.random.Generator,
    batch: int,
    size: int = 224,
    render_size: int = 512,
    noise: float = 0.02,
) -> CalibBatch:
    """Single frames in the wild-scene deployment distribution (splat
    object + background shell over the gravity-aligned grid, the renderer
    of examples/full_frame_e2e.py), rendered at deployment resolution and
    downsampled to the net's input size — thin grid lines antialias the
    same way they do at inference. Cameras orbit an object like the wild
    scenes but with explicit roll applied, so all three label heads get
    coverage; labels verified by rpv_from_Rt (tests/test_calib.py)."""
    import cv2

    from ..data import synthetic

    H = W = render_size
    rolls = np.zeros(batch)
    rhos = np.zeros(batch)
    vfovs = np.zeros(batch)
    imgs = np.zeros((batch, size, size, 3), np.float32)
    b = 0
    while b < batch:
        object_size = 0.2
        n_obj = int(rng.integers(150, 400))
        n_bg = int(rng.integers(200, 600))
        pts = rng.uniform(-object_size / 2, object_size / 2, (n_obj, 3))
        d = rng.uniform(object_size * 1.5, object_size * 4.0, size=n_bg)
        dirs = rng.normal(size=(n_bg, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        world = np.concatenate([pts, dirs * d[:, None]])
        amps = rng.uniform(0.3, 1.0, size=len(world)).astype(np.float32)

        focal = rng.uniform(0.55, 2.2) * render_size
        K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]])
        a = rng.uniform(0, 2 * np.pi)
        # pitch range allowed by the rho bin table depends on focal
        # (rho_raw = tan(pitch) * fy / (0.35 H) must stay within +-0.9);
        # pick elevation to land inside it, so the rejection loop below
        # almost never fires
        pmax = math.atan(0.85 * 0.35 * H / focal)
        pitch_want = rng.uniform(-pmax, pmax)
        eye = np.array([
            0.6 * np.cos(a), 0.6 * math.tan(pitch_want), 0.6 * np.sin(a)
        ])
        tgt = rng.uniform(-0.03, 0.03, size=3)
        R0, _ = synthetic.look_at(eye, tgt)
        roll_cam = math.radians(rng.uniform(-38.0, 38.0))
        cr, sr = math.cos(roll_cam), math.sin(roll_cam)
        Rz = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
        R = Rz @ R0
        t = -R @ eye
        roll, rho_raw, vfov = rpv_from_Rt(R, K, render_size)
        if not (-40 <= roll <= 40 and -0.95 <= rho_raw <= 0.95
                and 22 <= vfov <= 103):
            continue
        p_cam = world @ R.T + t
        depth = p_cam[:, 2]
        uvz = p_cam @ K.T
        uv = uvz[:, :2] / np.clip(uvz[:, 2:], 1e-9, None)
        vis = (
            (depth > 0.05)
            & (uv[:, 0] > 0) & (uv[:, 0] < W)
            & (uv[:, 1] > 0) & (uv[:, 1] < H)
        )
        bgim = synthetic.ground_grid_background(R, t, K, (H, W))
        img = synthetic.splat_image(
            uv.astype(np.float32), depth.astype(np.float32), vis, amps,
            (H, W), sigma_px=2.0, background=bgim,
        )
        if noise > 0:
            img = np.clip(
                img + rng.normal(size=img.shape).astype(np.float32) * noise,
                0, 1,
            ).astype(np.float32)
        img = cv2.resize(img, (size, size), interpolation=cv2.INTER_AREA)
        imgs[b] = img[..., None]
        rolls[b], rhos[b], vfovs[b] = roll, rho_raw, vfov
        b += 1
    return CalibBatch(
        image=imgs, roll_deg=rolls, rho=rhos, vfov_deg=vfovs,
        k1_hat=np.zeros(batch),
    )


def perspective_calib_batch(
    rng: np.random.Generator,
    batch: int,
    size: int = 224,
    noise: float = 0.02,
    clutter: int = 60,
    render_size: int | None = None,
    wild_frac: float = 0.0,
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

    render_size: render at this resolution and downsample to `size` so
    thin grid lines antialias the way deployment frames (512 px ->
    resized) do. wild_frac: fraction of the batch drawn from
    wild_scene_calib_batch (the pose pipeline's exact deployment
    distribution).
    """
    import cv2

    from ..data import synthetic

    n_wild = int(round(batch * wild_frac))
    if n_wild > 0:
        wb = wild_scene_calib_batch(
            rng, n_wild, size=size,
            render_size=render_size or 512, noise=noise,
        )
    batch = batch - n_wild

    H = W = render_size or size
    rolls = rng.uniform(-40.0, 40.0, size=batch)
    vfovs = rng.uniform(25.0, 100.0, size=batch)
    rhos = np.zeros(batch)
    imgs = np.zeros((batch, size, size, 3), np.float32)
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
        if H != size:
            img = cv2.resize(img, (size, size), interpolation=cv2.INTER_AREA)
        imgs[b] = img[..., None]  # grayscale replicated to RGB
    out = CalibBatch(
        image=imgs, roll_deg=rolls, rho=rhos, vfov_deg=vfovs,
        k1_hat=np.zeros(batch),
    )
    if n_wild > 0:
        out = CalibBatch(
            image=np.concatenate([out.image, wb.image]),
            roll_deg=np.concatenate([out.roll_deg, wb.roll_deg]),
            rho=np.concatenate([out.rho, wb.rho]),
            vfov_deg=np.concatenate([out.vfov_deg, wb.vfov_deg]),
            k1_hat=np.concatenate([out.k1_hat, wb.k1_hat]),
        )
    return out


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
