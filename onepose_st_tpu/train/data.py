"""Training batch construction from an SfM map + posed images.

Minimal in-memory replacement for the reference's COCO-json dataset stack
(src/datasets/OnePosePlus_dataset.py + datamodule): the padded cloud is
fixed per object; each step samples frames and emits a static-shape Batch.
GT conf matrices are NOT built here — supervision happens on device from
the GT pose (train/supervision.py).
"""
from __future__ import annotations

from typing import Iterator

import numpy as np

from ..config import EngineConfig
from ..sfm.map import SfMMap
from . import step as step_lib


def map_training_batches(
    sfm_map: SfMMap,
    frames: np.ndarray,       # [F, H, W] grayscale [0,1] (object-centered crops)
    poses: np.ndarray,        # [F, 6]
    Ks: np.ndarray,           # [F, 3, 3] intrinsics of the crops
    cfg: EngineConfig,
    rng: np.random.Generator,
    batch_size: int,
    frame_ids: np.ndarray | None = None,
    augment_brightness: float = 0.0,
    homography_prob: float = 0.0,
    photometric: str | None = None,
    valid_quads: np.ndarray | None = None,
) -> Iterator[step_lib.Batch]:
    """Infinite generator of training batches for one object.

    homography_prob: probability of warping a sample with an SAP homography
    (reference "homo warp adaptation"); the sampled H is folded into that
    sample's K (K' = H @ K) so the on-device GT projection stays exact.
    photometric: 'dark' | 'mobile' photometric chain on the query crop.
    valid_quads: optional [F, 4, 2] per-frame quad (crop px) of the region
    backed by real source pixels (data.images.valid_quad_from_affine) —
    jittered crops past the frame edge contain black warp-fill. When given,
    each batch carries the matching coarse-cell `img_mask` (homography
    warps are applied to the quad too) so attention/matching/supervision
    all exclude the dead cells.
    """
    from ..data import images as img_ops
    from . import augment as aug

    pho = aug.PhotometricAug(photometric) if photometric else None
    k, dc, df, s, mask = sfm_map.padded(cfg.matcher.n_points, rng)
    ids = (
        np.asarray(frame_ids)
        if frame_ids is not None
        else np.arange(len(frames))
    )
    import jax.numpy as jnp

    stride = cfg.matcher.backbone.coarse_stride
    crop_hw = frames.shape[1:3]

    # the padded cloud is identical every step: put it on device ONCE.
    # yielding numpy here made every step re-upload ~90 MB of tiled
    # descriptors (measured 1 it/s on the remote-TPU tunnel vs 11 it/s hot)
    kB = jnp.asarray(np.tile(k[None], (batch_size, 1, 1)))
    dcB = jnp.asarray(np.tile(dc[None], (batch_size, 1, 1)))
    dfB = jnp.asarray(np.tile(df[None], (batch_size, 1, 1)))
    maskB = jnp.asarray(np.tile(mask[None], (batch_size, 1)))
    while True:
        sel = rng.choice(ids, batch_size, replace=len(ids) < batch_size)
        imgs = frames[sel][..., None].astype(np.float32)
        K_batch = Ks[sel].astype(np.float32).copy()
        quads = valid_quads[sel].astype(np.float64).copy() \
            if valid_quads is not None else None
        if homography_prob > 0 or pho is not None:
            H_img, W_img = imgs.shape[1:3]
            for b in range(batch_size):
                im = imgs[b, ..., 0]
                if homography_prob > 0 and rng.uniform() < homography_prob:
                    Hmat = aug.sample_homography_sap(rng, H_img, W_img)
                    im = aug.warp_image(im, Hmat)
                    K_batch[b] = (Hmat @ K_batch[b]).astype(np.float32)
                    if quads is not None:
                        qh = np.concatenate(
                            [quads[b], np.ones((4, 1))], axis=1
                        ) @ Hmat.T
                        quads[b] = qh[:, :2] / qh[:, 2:3]
                if pho is not None:
                    im = pho(im, rng)
                imgs[b, ..., 0] = im
        if augment_brightness > 0:
            gains = rng.uniform(
                1 - augment_brightness, 1 + augment_brightness,
                size=(batch_size, 1, 1, 1),
            ).astype(np.float32)
            imgs = np.clip(imgs * gains, 0, 1)
        img_mask = None
        if quads is not None:
            img_mask = np.stack([
                img_ops.cell_mask_from_quad(q, crop_hw, stride)
                for q in quads
            ])
        yield step_lib.Batch(
            query_image=imgs,
            kpts3d=kB,
            desc3d_coarse=dcB,
            desc3d_fine=dfB,
            point_mask=maskB,
            pose_gt=poses[sel].astype(np.float32),
            K_crop=K_batch,
            img_mask=img_mask,
        )


def multi_object_batches(
    objects: list[tuple[SfMMap, np.ndarray, np.ndarray, np.ndarray]],
    cfg: EngineConfig,
    rng: np.random.Generator,
    batch_size: int,
    augment_brightness: float = 0.0,
    homography_prob: float = 0.0,
    photometric: str | None = None,
) -> Iterator[step_lib.Batch]:
    """Batches mixing several objects (the role of the reference's merged
    COCO annotations, merge.py:13-197): each batch element independently
    samples an object and one of its frames. Per-sample point clouds make
    this free — the Batch already carries kpts3d per element.

    `objects`: list of (sfm_map, frames [F,H,W], poses [F,6], Ks [F,3,3]).
    """
    from . import augment as aug

    pho = aug.PhotometricAug(photometric) if photometric else None
    L = cfg.matcher.n_points
    clouds = [m.padded(L, rng) for m, _, _, _ in objects]
    n_obj = len(objects)
    # static-shape batches need homogeneous objects; fail loudly up front
    hw0 = objects[0][1].shape[1:3]
    dims0 = (clouds[0][1].shape[1], clouds[0][2].shape[1])
    for o, (_, frames, _, _) in enumerate(objects):
        dims = (clouds[o][1].shape[1], clouds[o][2].shape[1])
        if frames.shape[1:3] != hw0 or dims != dims0:
            raise ValueError(
                f"object {o}: image {frames.shape[1:3]} / desc dims {dims} "
                f"differ from object 0 ({hw0} / {dims0}); re-parse to a "
                "common crop size for multi-object training"
            )
    import jax.numpy as jnp

    # all clouds device-resident once; per-step selection is an on-device
    # gather driven by the tiny obj_sel array (avoids re-uploading tens of
    # MB of descriptors every step over a remote-TPU link)
    all_k = jnp.asarray(np.stack([c[0] for c in clouds]))
    all_dc = jnp.asarray(np.stack([c[1] for c in clouds]))
    all_df = jnp.asarray(np.stack([c[2] for c in clouds]))
    all_mask = jnp.asarray(np.stack([c[4] for c in clouds]))
    while True:
        obj_sel = rng.integers(0, n_obj, size=batch_size)
        imgs = np.empty(
            (batch_size, *objects[0][1].shape[1:3], 1), np.float32
        )
        poseB = np.empty((batch_size, 6), np.float32)
        KB = np.empty((batch_size, 3, 3), np.float32)
        for b, o in enumerate(obj_sel):
            _, frames, poses, Ks = objects[o]
            f = rng.integers(0, len(frames))
            im = frames[f].astype(np.float32)
            K = Ks[f].astype(np.float32).copy()
            if homography_prob > 0 and rng.uniform() < homography_prob:
                Hmat = aug.sample_homography_sap(rng, *im.shape[:2])
                im = aug.warp_image(im, Hmat)
                K = (Hmat @ K).astype(np.float32)
            if pho is not None:
                im = pho(im, rng)
            imgs[b, ..., 0] = im
            poseB[b] = poses[f]
            KB[b] = K
        if augment_brightness > 0:
            gains = rng.uniform(
                1 - augment_brightness, 1 + augment_brightness,
                size=(batch_size, 1, 1, 1),
            ).astype(np.float32)
            imgs = np.clip(imgs * gains, 0, 1)
        sel = jnp.asarray(obj_sel)
        yield step_lib.Batch(
            query_image=imgs,
            kpts3d=jnp.take(all_k, sel, axis=0),
            desc3d_coarse=jnp.take(all_dc, sel, axis=0),
            desc3d_fine=jnp.take(all_df, sel, axis=0),
            point_mask=jnp.take(all_mask, sel, axis=0),
            pose_gt=poseB, K_crop=KB,
        )
