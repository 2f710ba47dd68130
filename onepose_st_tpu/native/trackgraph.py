"""ctypes wrapper over the native track-graph engine (trackgraph.cc).

`process_matches` runs merge -> union-find tracks -> greedy keyframe
assignment in one native call and returns the same (Keypoints,
AssignedTracks) structures as the pure-Python path in sfm/tracks.py.
"""
from __future__ import annotations

import ctypes

import numpy as np


def process_matches(
    n_images: int,
    pair_matches,
    quant: float = 1.0,
    min_track_length: int = 2,
    max_track_length: int = 16,
):
    """Native merge+tracks+assignment. Raises RuntimeError if lib missing."""
    from . import get_lib
    from ..sfm.tracks import AssignedTracks, Keypoints

    lib = get_lib()
    if lib is None:
        raise RuntimeError("native trackgraph library unavailable")

    n_pairs = len(pair_matches)
    pair_imgs = np.empty((n_pairs, 2), np.int32)
    offsets = np.zeros(n_pairs + 1, np.int64)
    for p, pm in enumerate(pair_matches):
        pair_imgs[p] = (pm.img_i, pm.img_j)
        offsets[p + 1] = offsets[p] + len(pm.uv_i)
    total = int(offsets[-1])
    uv_i = np.empty((total, 2), np.float32)
    uv_j = np.empty((total, 2), np.float32)
    score = np.empty(total, np.float32)
    for p, pm in enumerate(pair_matches):
        s, e = offsets[p], offsets[p + 1]
        uv_i[s:e] = pm.uv_i
        uv_j[s:e] = pm.uv_j
        score[s:e] = pm.score

    def ptr(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    h = lib.opst_process(
        n_images, n_pairs, ptr(pair_imgs), ptr(offsets), ptr(uv_i),
        ptr(uv_j), ptr(score), float(quant), int(min_track_length),
        int(max_track_length),
    )
    try:
        kpts, scores = [], []
        for img in range(n_images):
            n = lib.opst_n_kpts(h, img)
            uv = np.empty((n, 2), np.float32)
            sc = np.empty(n, np.float32)
            if n:
                lib.opst_get_kpts(h, img, ptr(uv), ptr(sc))
            kpts.append(uv)
            scores.append(sc)
        n_rows = lib.opst_n_match_rows(h)
        rows = np.empty((n_rows, 4), np.int32)
        if n_rows:
            lib.opst_get_match_rows(h, ptr(rows))
        kp = Keypoints(kpts=kpts, scores=scores, matches=rows)

        T = lib.opst_n_tracks(h)
        M = max_track_length
        ref_idx = np.empty(T, np.int32)
        kpt0 = np.empty((T, 2), np.float32)
        obs_idx = np.empty((T, M), np.int32)
        kpt1 = np.empty((T, M, 2), np.float32)
        mask8 = np.empty((T, M), np.uint8)
        obs_kpt_ids = np.empty((T, M), np.int32)
        ref_kpt_ids = np.empty(T, np.int32)
        keyframes = np.empty(lib.opst_n_keyframes(h), np.int32)
        if T:
            lib.opst_get_assigned(
                h, ptr(ref_idx), ptr(kpt0), ptr(obs_idx), ptr(kpt1),
                ptr(mask8), ptr(obs_kpt_ids), ptr(ref_kpt_ids), ptr(keyframes),
            )
        assigned = AssignedTracks(
            ref_idx=ref_idx, kpt0=kpt0, obs_idx=obs_idx, kpt1=kpt1,
            mask=mask8.astype(bool), obs_kpt_ids=obs_kpt_ids,
            ref_kpt_ids=ref_kpt_ids, keyframes=keyframes,
        )
        return kp, assigned
    finally:
        lib.opst_free(h)
