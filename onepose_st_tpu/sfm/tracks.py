"""Keypoint merging, track building and greedy keyframe assignment.

Host-side graph stage of the keypoint-free SfM engine, re-designing:
  * per-image 2D point merging with score aggregation
    (reference KeypointFreeSfM/coarse_match/coarse_match.py:188-214 +
    coarse_match_worker.py:87-117 `points2D_worker`/`agg_groupby_2d`);
  * feature-track building over the match graph (COLMAP does this
    internally during triangulation — here an explicit union-find);
  * the greedy keyframe / track-reference assignment state machine
    (reference post_optimization/dataset/coarse_colmap_dataset.py:220-310:
    iteratively pick the image with the most unassigned keypoints, make it
    the reference view of all its unassigned tracks).

Outputs are packed into the static track-major [T, M] layout consumed by
sfm/ba and sfm/triangulation. A C++ fast path can drop in behind the same
API (this stage is O(matches) pointer-chasing, not MXU work).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np


class PairMatches(NamedTuple):
    """Matches of one image pair in pixel coords (masked slots dropped)."""

    img_i: int
    img_j: int
    uv_i: np.ndarray   # [K, 2]
    uv_j: np.ndarray   # [K, 2]
    score: np.ndarray  # [K]


class Keypoints(NamedTuple):
    kpts: list[np.ndarray]    # per image: [N_i, 2] float32 (merged, sub-px)
    scores: list[np.ndarray]  # per image: [N_i]
    matches: np.ndarray       # [M, 4] int32: (img_i, k_i, img_j, k_j)


def merge_keypoints(
    n_images: int, pair_matches: list[PairMatches], quant: float = 1.0
) -> Keypoints:
    """Merge per-image 2D points on a `quant`-pixel grid, sum scores.

    The reference quantizes matched coords to the int grid and merges
    duplicates by score sum; refined (float) coordinates of merged points
    are averaged score-weighted.
    """
    keys: list[dict[tuple[int, int], int]] = [dict() for _ in range(n_images)]
    acc_uv: list[list[np.ndarray]] = [[] for _ in range(n_images)]
    acc_w: list[list[float]] = [[] for _ in range(n_images)]

    def intern(img, uv, score):
        q = (int(round(float(uv[0]) / quant)), int(round(float(uv[1]) / quant)))
        table = keys[img]
        idx = table.get(q)
        if idx is None:
            idx = len(table)
            table[q] = idx
            acc_uv[img].append(uv * score)
            acc_w[img].append(score)
        else:
            acc_uv[img][idx] = acc_uv[img][idx] + uv * score
            acc_w[img][idx] += score
        return idx

    match_rows = []
    for pm in pair_matches:
        for k in range(len(pm.uv_i)):
            s = float(pm.score[k])
            ki = intern(pm.img_i, pm.uv_i[k].astype(np.float64), s)
            kj = intern(pm.img_j, pm.uv_j[k].astype(np.float64), s)
            match_rows.append((pm.img_i, ki, pm.img_j, kj))

    kpts, scores = [], []
    for img in range(n_images):
        if acc_w[img]:
            w = np.asarray(acc_w[img])
            uv = np.stack(acc_uv[img]) / w[:, None]
            kpts.append(uv.astype(np.float32))
            scores.append(w.astype(np.float32))
        else:
            kpts.append(np.zeros((0, 2), np.float32))
            scores.append(np.zeros((0,), np.float32))
    matches = (
        np.asarray(match_rows, np.int32).reshape(-1, 4)
        if match_rows
        else np.zeros((0, 4), np.int32)
    )
    return Keypoints(kpts=kpts, scores=scores, matches=matches)


class TrackData(NamedTuple):
    """Variable-length tracks over (image, keypoint) nodes."""

    track_imgs: list[np.ndarray]  # per track: observing image ids
    track_kpts: list[np.ndarray]  # per track: keypoint index in that image


def build_tracks(kp: Keypoints, min_track_length: int = 2) -> TrackData:
    """Conflict-aware union-find over the match graph.

    A union that would place two *different* keypoints of the same image in
    one track is rejected (the match edge is dropped) — COLMAP's track
    conflict rule. Without it, quantization collisions chain-merge distinct
    3D points into giant components (observed: a 2000-point scene collapsed
    to 51 tracks with naive unioning).
    """
    offsets = np.cumsum([0] + [len(k) for k in kp.kpts])
    total = offsets[-1]
    parent = np.arange(total, dtype=np.int64)
    # per-root observation dict: image -> global kpt id
    obs: dict[int, dict[int, int]] = {}
    img_of = np.searchsorted(offsets, np.arange(total), side="right") - 1

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return int(root)

    def get_obs(root):
        o = obs.get(root)
        if o is None:
            o = {int(img_of[root]): root}
            obs[root] = o
        return o

    for img_i, ki, img_j, kj in kp.matches:
        a = find(offsets[img_i] + ki)
        b = find(offsets[img_j] + kj)
        if a == b:
            continue
        oa, ob = get_obs(a), get_obs(b)
        if len(oa) < len(ob):
            a, b, oa, ob = b, a, ob, oa
        # reject if any image appears in both sides with different kpts
        conflict = any(
            img in oa and oa[img] != g for img, g in ob.items()
        )
        if conflict:
            continue
        parent[b] = a
        oa.update(ob)
        obs.pop(b, None)

    # collect components: first-seen keypoint per image within each root
    comps: dict[int, dict[int, int]] = {}
    for x in range(total):
        r = find(x)
        d = comps.setdefault(r, {})
        img = int(img_of[x])
        if img not in d:
            d[img] = x

    track_imgs, track_kpts = [], []
    for members in comps.values():
        if len(members) < min_track_length:
            continue
        imgs = np.asarray(sorted(members.keys()), np.int32)
        track_imgs.append(imgs)
        track_kpts.append(
            np.asarray(
                [members[int(i)] - offsets[int(i)] for i in imgs], np.int32
            )
        )
    return TrackData(track_imgs=track_imgs, track_kpts=track_kpts)


class AssignedTracks(NamedTuple):
    """Static track-major layout with a greedy-chosen reference view."""

    ref_idx: np.ndarray    # [T] reference frame per track
    kpt0: np.ndarray       # [T, 2] keypoint in the reference frame
    obs_idx: np.ndarray    # [T, M] other observing frames (padded)
    kpt1: np.ndarray       # [T, M, 2]
    mask: np.ndarray       # [T, M]
    obs_kpt_ids: np.ndarray  # [T, M] keypoint index in the observing image (-1 pad)
    ref_kpt_ids: np.ndarray  # [T]
    keyframes: np.ndarray  # ordered keyframe image ids


def assign_keyframes_greedy(
    kp: Keypoints,
    tracks: TrackData,
    max_track_length: int,
) -> AssignedTracks:
    """Greedy reference-view selection (reference get_keyframes_greedy).

    Repeat: pick the image observing the most unassigned tracks; make it
    the reference view of all of them ("assign"), removing those tracks
    from every other image's count ("robbed").
    """
    T = len(tracks.track_imgs)
    n_images = len(kp.kpts)
    unassigned = np.ones(T, bool)
    # image -> track ids it observes
    img_tracks: list[list[int]] = [[] for _ in range(n_images)]
    for t, imgs in enumerate(tracks.track_imgs):
        for i in imgs:
            img_tracks[int(i)].append(t)

    ref_idx = np.full(T, -1, np.int32)
    keyframes = []
    counts = np.asarray(
        [sum(unassigned[t] for t in lst) for lst in img_tracks], np.int64
    )
    while counts.max(initial=0) > 0:
        img = int(np.argmax(counts))
        keyframes.append(img)
        for t in img_tracks[img]:
            if unassigned[t]:
                unassigned[t] = False
                ref_idx[t] = img
                for i in tracks.track_imgs[t]:
                    counts[int(i)] -= 1

    M = max_track_length
    kpt0 = np.zeros((T, 2), np.float32)
    ref_kpt_ids = np.zeros(T, np.int32)
    obs_idx = np.zeros((T, M), np.int32)
    kpt1 = np.zeros((T, M, 2), np.float32)
    obs_kpt_ids = np.full((T, M), -1, np.int32)
    mask = np.zeros((T, M), bool)
    for t in range(T):
        imgs = tracks.track_imgs[t]
        kids = tracks.track_kpts[t]
        ref = ref_idx[t]
        ref_pos = int(np.nonzero(imgs == ref)[0][0])
        kpt0[t] = kp.kpts[ref][kids[ref_pos]]
        ref_kpt_ids[t] = kids[ref_pos]
        m = 0
        for pos, img in enumerate(imgs):
            if pos == ref_pos or m >= M:
                continue
            obs_idx[t, m] = img
            kpt1[t, m] = kp.kpts[int(img)][kids[pos]]
            obs_kpt_ids[t, m] = kids[pos]
            mask[t, m] = True
            m += 1
    return AssignedTracks(
        ref_idx=ref_idx,
        kpt0=kpt0,
        obs_idx=obs_idx,
        kpt1=kpt1,
        mask=mask,
        obs_kpt_ids=obs_kpt_ids,
        ref_kpt_ids=ref_kpt_ids,
        keyframes=np.asarray(keyframes, np.int32),
    )


def process_matches(
    n_images: int,
    pair_matches: list[PairMatches],
    quant: float = 1.0,
    min_track_length: int = 2,
    max_track_length: int = 16,
    use_native: bool | None = None,
) -> tuple[Keypoints, AssignedTracks]:
    """merge_keypoints + build_tracks + assign_keyframes_greedy in one call.

    Dispatches to the native C++ engine (native/trackgraph.cc) when it is
    available — same outputs, ~100x faster on large match graphs — and to
    the pure-Python stages above otherwise (or when use_native=False).
    """
    if use_native is None or use_native:
        from .. import native

        if native.available():
            from ..native.trackgraph import process_matches as native_process

            return native_process(
                n_images, pair_matches, quant=quant,
                min_track_length=min_track_length,
                max_track_length=max_track_length,
            )
        if use_native:
            raise RuntimeError("native trackgraph requested but unavailable")
    kp = merge_keypoints(n_images, pair_matches, quant=quant)
    trk = build_tracks(kp, min_track_length=min_track_length)
    if not trk.track_imgs:
        M = max_track_length
        return kp, AssignedTracks(
            ref_idx=np.zeros(0, np.int32),
            kpt0=np.zeros((0, 2), np.float32),
            obs_idx=np.zeros((0, M), np.int32),
            kpt1=np.zeros((0, M, 2), np.float32),
            mask=np.zeros((0, M), bool),
            obs_kpt_ids=np.full((0, M), -1, np.int32),
            ref_kpt_ids=np.zeros(0, np.int32),
            keyframes=np.zeros(0, np.int32),
        )
    return kp, assign_keyframes_greedy(kp, trk, max_track_length)
