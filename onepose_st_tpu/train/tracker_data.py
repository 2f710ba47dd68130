"""Synthetic training clips for the learned point tracker.

The reference consumes CoTracker2 as a pretrained black box (its weights
are a pinned submodule checkpoint); since no weights ship with the repo,
we train our tracker from scratch. Supervision comes from procedurally
generated clips with exact ground truth: a richly textured base image is
animated by a smooth random homography walk (so every pixel's trajectory
is known in closed form), photometric jitter and sensor noise are applied
per frame, and a moving opaque occluder provides visibility supervision
beyond image-border exits.

This mirrors how point trackers are actually trained (synthetic videos
with perfect tracks — CoTracker uses TAP-Vid-Kubric) at a fraction of the
complexity, and it is enough for the short 8-frame windows the pose
refinement phase needs.
"""
from __future__ import annotations

from typing import NamedTuple

import cv2
import numpy as np


class TrackingClip(NamedTuple):
    frames: np.ndarray        # [T, H, W] float32 in [0, 1]
    query_uv: np.ndarray      # [N, 2] image px at the birth frame
    query_frame: np.ndarray   # [N] int32
    gt_uv: np.ndarray         # [T, N, 2]
    gt_vis: np.ndarray        # [T, N] bool
    point_mask: np.ndarray    # [N] bool


def _texture(rng: np.random.Generator, H: int, W: int) -> np.ndarray:
    """Multi-scale noise + random shapes: dense, aliasing-free texture."""
    img = np.zeros((H, W), np.float32)
    for scale, amp in ((4, 0.5), (16, 0.3), (64, 0.2)):
        small = rng.uniform(size=(max(H // scale, 2), max(W // scale, 2)))
        img += amp * cv2.resize(
            small.astype(np.float32), (W, H), interpolation=cv2.INTER_CUBIC
        )
    for _ in range(8):
        c = (int(rng.uniform(0, W)), int(rng.uniform(0, H)))
        r = int(rng.uniform(4, max(H, W) / 6))
        cv2.circle(img, c, r, float(rng.uniform(0, 1)), -1)
    img = cv2.GaussianBlur(img, (0, 0), 1.0)
    lo, hi = img.min(), img.max()
    return (img - lo) / (hi - lo + 1e-8)


def _homography_walk(
    rng: np.random.Generator, T: int, H: int, W: int, motion: float
) -> np.ndarray:
    """[T, 3, 3] H_t mapping base-image coords -> frame-t coords, smooth.

    Corner-displacement random walk with momentum: each of the 4 base
    corners drifts with a velocity AR(1) process, and H_t is the exact
    4-point homography — guarantees invertibility-by-construction for the
    ground-truth track math.
    """
    base = np.array(
        [[0, 0], [W - 1, 0], [W - 1, H - 1], [0, H - 1]], np.float32
    )
    vel = rng.normal(size=(4, 2)).astype(np.float32) * motion
    disp = np.zeros((4, 2), np.float32)
    Hs = []
    for _ in range(T):
        Hs.append(cv2.getPerspectiveTransform(base, base + disp))
        vel = 0.9 * vel + rng.normal(size=(4, 2)).astype(np.float32) * motion * 0.5
        disp = disp + vel
    return np.stack(Hs).astype(np.float32)


def _apply_H(Hmat: np.ndarray, uv: np.ndarray) -> np.ndarray:
    p = np.concatenate([uv, np.ones_like(uv[:, :1])], axis=1) @ Hmat.T
    return p[:, :2] / p[:, 2:3]


def make_clip(
    rng: np.random.Generator,
    T: int = 8,
    H: int = 256,
    W: int = 256,
    n_points: int = 128,
    motion: float = 3.0,
    occluder: bool = True,
    noise: float = 0.02,
) -> TrackingClip:
    base = _texture(rng, H + 64, W + 64)  # margin so content slides in/out
    Hs = _homography_walk(rng, T, H, W, motion)
    # offset: render the centre crop of the enlarged base
    off = np.array([[1, 0, -32.0], [0, 1, -32.0], [0, 0, 1]], np.float32)

    frames = np.empty((T, H, W), np.float32)
    for t in range(T):
        M = Hs[t] @ off
        f = cv2.warpPerspective(base, M, (W, H), flags=cv2.INTER_LINEAR)
        gain = rng.uniform(0.8, 1.2)
        bias = rng.uniform(-0.08, 0.08)
        frames[t] = np.clip(f * gain + bias, 0, 1)

    # occluder: a filled rectangle drifting across the clip
    occ_boxes = np.zeros((T, 4), np.float32)  # x0 y0 x1 y1
    if occluder:
        cw, ch = rng.uniform(0.15, 0.35, size=2) * np.array([W, H])
        cx, cy = rng.uniform(0.2, 0.8, size=2) * np.array([W, H])
        vx, vy = rng.normal(size=2) * motion * 1.5
        shade = rng.uniform(0, 1)
        for t in range(T):
            x0, y0 = cx - cw / 2, cy - ch / 2
            occ_boxes[t] = (x0, y0, x0 + cw, y0 + ch)
            cv2.rectangle(
                frames[t], (int(x0), int(y0)), (int(x0 + cw), int(y0 + ch)),
                shade, -1,
            )
            cx, cy = cx + vx, cy + vy

    if noise > 0:
        frames = np.clip(
            frames + rng.normal(size=frames.shape).astype(np.float32) * noise,
            0, 1,
        ).astype(np.float32)

    # queries: birth frames spread over the window (backward tracking needs
    # births > 0); locations sampled where the point is visible at birth
    query_frame = rng.integers(0, T, size=n_points).astype(np.int32)
    query_uv = np.empty((n_points, 2), np.float32)
    margin = 8.0
    for i in range(n_points):
        b = query_frame[i]
        for _ in range(20):
            uv = rng.uniform(margin, [W - margin, H - margin]).astype(np.float32)
            x0, y0, x1, y1 = occ_boxes[b]
            if occluder and x0 <= uv[0] <= x1 and y0 <= uv[1] <= y1:
                continue
            break
        query_uv[i] = uv

    # ground truth: uv_t = H_t (H_b)^-1 uv_b
    gt_uv = np.empty((T, n_points, 2), np.float32)
    for t in range(T):
        for b in np.unique(query_frame):
            sel = query_frame == b
            M = Hs[t] @ np.linalg.inv(Hs[b])
            gt_uv[t, sel] = _apply_H(M, query_uv[sel])
    inb = (
        (gt_uv[..., 0] >= 0) & (gt_uv[..., 0] <= W - 1)
        & (gt_uv[..., 1] >= 0) & (gt_uv[..., 1] <= H - 1)
    )
    occ = (
        (gt_uv[..., 0] >= occ_boxes[:, None, 0])
        & (gt_uv[..., 0] <= occ_boxes[:, None, 2])
        & (gt_uv[..., 1] >= occ_boxes[:, None, 1])
        & (gt_uv[..., 1] <= occ_boxes[:, None, 3])
    )
    gt_vis = inb & ~occ

    return TrackingClip(
        frames=frames,
        query_uv=query_uv,
        query_frame=query_frame,
        gt_uv=gt_uv,
        gt_vis=gt_vis,
        point_mask=np.ones(n_points, bool),
    )


def make_splat_clip(
    rng: np.random.Generator,
    T: int = 8,
    H: int = 256,
    W: int = 256,
    n_points: int = 128,
    deg_per_frame: float = 3.0,
    full_frame: bool = False,
    occluder: bool = True,
    noise: float = 0.02,
) -> TrackingClip:
    """In-domain clip: an orbit-arc segment of a splat object, GT tracks =
    the object points' exact projections.

    The homography clips above cover generic texture motion but are
    out-of-domain for the pose pipeline's renderers (r2 finding: the
    learned tracker's visibility head scored every splat-scene point
    <0.25, zero usable tracks). These clips ARE the deployment domain:
    splat blobs over a flat or ground-grid background, slow orbital
    parallax, queries at blob centers like real PnP-inlier queries.
    full_frame=True renders the wild-scene variant (off-center object,
    background splats, gravity-aligned grid).
    """
    from ..data import synthetic as syn

    n_obj = int(rng.integers(200, 400))
    object_size = 0.2
    radius = 0.6
    pts = rng.uniform(-object_size / 2, object_size / 2, size=(n_obj, 3))
    a0 = rng.uniform(0, 2 * np.pi)
    elev = rng.uniform(-0.2, 0.2)
    step = np.deg2rad(deg_per_frame) * rng.choice([-1.0, 1.0])
    if full_frame:
        focal = 1.4 * min(H, W)
        tgt0 = rng.uniform(-0.1, 0.1, size=3)
    else:
        span = rng.uniform(0.5, 0.8)
        focal = span * min(H, W) * radius / object_size
        tgt0 = np.zeros(3)

    n_bg = int(rng.integers(150, 350)) if full_frame else 0
    if n_bg:
        d = rng.uniform(object_size * 1.5, object_size * 4.0, size=n_bg)
        dirs = rng.normal(size=(n_bg, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        bg = (dirs * d[:, None]).astype(np.float32)
    else:
        bg = np.zeros((0, 3), np.float32)
    world = np.concatenate([pts, bg]).astype(np.float32)
    amps = rng.uniform(0.3, 1.0, size=len(world)).astype(np.float32)
    K = np.array(
        [[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32
    )

    frames = np.empty((T, H, W), np.float32)
    uv_all = np.empty((T, len(world), 2), np.float32)
    vis_all = np.empty((T, len(world)), bool)
    for t in range(T):
        a = a0 + t * step
        eye = np.array([radius * np.cos(a), elev, radius * np.sin(a)])
        R, tr = syn.look_at(eye, tgt0)
        p_cam = world @ R.T + tr
        depth = p_cam[:, 2]
        uvz = p_cam @ K.T
        uv = uvz[:, :2] / np.clip(uvz[:, 2:], 1e-9, None)
        vis = (
            (depth > 0.05)
            & (uv[:, 0] > 0) & (uv[:, 0] < W)
            & (uv[:, 1] > 0) & (uv[:, 1] < H)
        )
        uv_all[t] = uv
        vis_all[t] = vis
        bgim = 0.15
        if full_frame and rng.uniform() < 0.9:
            bgim = syn.ground_grid_background(R, tr, K.astype(np.float64), (H, W))
        frames[t] = syn.splat_image(
            uv, depth, vis, amps, (H, W), sigma_px=2.0, background=bgim
        )

    occ_boxes = np.zeros((T, 4), np.float32)
    if occluder and rng.uniform() < 0.5:
        cw, ch = rng.uniform(0.12, 0.3, size=2) * np.array([W, H])
        cx, cy = rng.uniform(0.2, 0.8, size=2) * np.array([W, H])
        vx, vy = rng.normal(size=2) * 3.0
        shade = rng.uniform(0, 1)
        for t in range(T):
            x0, y0 = cx - cw / 2, cy - ch / 2
            occ_boxes[t] = (x0, y0, x0 + cw, y0 + ch)
            cv2.rectangle(
                frames[t], (int(x0), int(y0)), (int(x0 + cw), int(y0 + ch)),
                shade, -1,
            )
            cx, cy = cx + vx, cy + vy
    if noise > 0:
        frames = np.clip(
            frames + rng.normal(size=frames.shape).astype(np.float32) * noise,
            0, 1,
        ).astype(np.float32)

    # queries: object points visible at a random birth frame, placed at the
    # blob center +- jitter (real queries are PnP inliers on blobs)
    query_frame = rng.integers(0, T, size=n_points).astype(np.int32)
    query_uv = np.empty((n_points, 2), np.float32)
    obj_ids = np.empty(n_points, np.int64)
    for i in range(n_points):
        b = query_frame[i]
        cand = np.nonzero(vis_all[b, :n_obj])[0]
        if len(cand) == 0:
            cand = np.arange(n_obj)
        p = int(rng.choice(cand))
        obj_ids[i] = p
        query_uv[i] = uv_all[b, p] + rng.normal(size=2) * 1.0

    gt_uv = uv_all[:, obj_ids] + (query_uv - uv_all[query_frame, obj_ids])[None]
    inb = vis_all[:, obj_ids]
    occ = (
        (gt_uv[..., 0] >= occ_boxes[:, None, 0])
        & (gt_uv[..., 0] <= occ_boxes[:, None, 2])
        & (gt_uv[..., 1] >= occ_boxes[:, None, 1])
        & (gt_uv[..., 1] <= occ_boxes[:, None, 3])
    )
    gt_vis = inb & ~occ

    return TrackingClip(
        frames=frames,
        query_uv=query_uv,
        query_frame=query_frame,
        gt_uv=gt_uv.astype(np.float32),
        gt_vis=gt_vis,
        point_mask=np.ones(n_points, bool),
    )


def make_batch(
    rng: np.random.Generator,
    batch: int,
    splat_prob: float = 0.0,
    full_frame_prob: float = 0.5,
    **kw,
) -> dict[str, np.ndarray]:
    """Mixed-domain batch: homography clips + splat-scene clips
    (splat_prob fraction; of those, full_frame_prob are wild-frame style)."""
    clips = []
    splat_kw = {
        k: v for k, v in kw.items()
        if k in ("T", "H", "W", "n_points", "occluder", "noise")
    }
    for _ in range(batch):
        if rng.uniform() < splat_prob:
            clips.append(make_splat_clip(
                rng, full_frame=bool(rng.uniform() < full_frame_prob),
                **splat_kw,
            ))
        else:
            clips.append(make_clip(rng, **kw))
    return {
        "frames": np.stack([c.frames for c in clips]),
        "query_uv": np.stack([c.query_uv for c in clips]),
        "query_frame": np.stack([c.query_frame for c in clips]),
        "gt_uv": np.stack([c.gt_uv for c in clips]),
        "gt_vis": np.stack([c.gt_vis for c in clips]),
        "point_mask": np.stack([c.point_mask for c in clips]),
    }


class BatchPrefetcher:
    """Threaded clip generation overlapping the device step.

    Clip synthesis is pure host work (cv2 warps); one or two worker threads
    hide it behind the TPU step entirely (0.16 s/batch at 8x256^2 would
    otherwise serialize with a ~0.1 s device step). Each worker owns an
    independently seeded Generator so the stream is reproducible given
    (seed, workers).
    """

    def __init__(self, seed: int, batch: int, workers: int = 2, depth: int = 4, **kw):
        import queue
        import threading

        self._q = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._threads = []
        for w in range(workers):
            rng = np.random.default_rng([seed, w])

            def run(rng=rng):
                while not self._stop.is_set():
                    b = make_batch(rng, batch, **kw)
                    while not self._stop.is_set():
                        try:
                            self._q.put(b, timeout=0.5)
                            break
                        except Exception:
                            continue

            t = threading.Thread(target=run, daemon=True)
            t.start()
            self._threads.append(t)

    def next(self) -> dict[str, np.ndarray]:
        return self._q.get()

    def close(self) -> None:
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
