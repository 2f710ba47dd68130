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
) -> Iterator[step_lib.Batch]:
    """Infinite generator of training batches for one object."""
    k, dc, df, s, mask = sfm_map.padded(cfg.matcher.n_points, rng)
    ids = (
        np.asarray(frame_ids)
        if frame_ids is not None
        else np.arange(len(frames))
    )
    kB = np.tile(k[None], (batch_size, 1, 1))
    dcB = np.tile(dc[None], (batch_size, 1, 1))
    dfB = np.tile(df[None], (batch_size, 1, 1))
    maskB = np.tile(mask[None], (batch_size, 1))
    while True:
        sel = rng.choice(ids, batch_size, replace=len(ids) < batch_size)
        imgs = frames[sel][..., None].astype(np.float32)
        if augment_brightness > 0:
            gains = rng.uniform(
                1 - augment_brightness, 1 + augment_brightness,
                size=(batch_size, 1, 1, 1),
            ).astype(np.float32)
            imgs = np.clip(imgs * gains, 0, 1)
        yield step_lib.Batch(
            query_image=imgs,
            kpts3d=kB,
            desc3d_coarse=dcB,
            desc3d_fine=dfB,
            point_mask=maskB,
            pose_gt=poses[sel].astype(np.float32),
            K_crop=Ks[sel].astype(np.float32),
        )
