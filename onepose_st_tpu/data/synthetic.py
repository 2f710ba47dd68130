"""Synthetic scene generation for tests, benchmarks and e2e validation.

The reference has no automated tests (SURVEY.md §4); this module is our
substitute for its demo data: scenes where every quantity (poses, depths,
tracks, projections) is known by construction, so geometry code is validated
against exact ground truth on CPU and TPU alike.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
from scipy.spatial.transform import Rotation


class Scene(NamedTuple):
    points: np.ndarray    # [P, 3] world points on the object
    poses: np.ndarray     # [F, 6] world->cam (angle-axis ++ t)
    Rs: np.ndarray        # [F, 3, 3]
    ts: np.ndarray        # [F, 3]
    Ks: np.ndarray        # [F, 3, 3]
    uv: np.ndarray        # [F, P, 2] projections
    depth: np.ndarray     # [F, P] camera-frame z
    visible: np.ndarray   # [F, P] bool (in view frustum, in front)
    image_hw: tuple[int, int]


def look_at(eye: np.ndarray, target: np.ndarray, up=(0, -1, 0)) -> tuple[np.ndarray, np.ndarray]:
    """World->cam (R, t) for a camera at `eye` looking at `target` (+z fwd).

    Axis convention: world up is `up` (y points DOWN by default across this
    module); the camera's +y (image down) aligns with world-down, so
    rendered frames have natural orientation — the ground-grid plane at
    +y appears at the image bottom. (An earlier cross-product order made
    image-down equal world-UP: every wild-scene render was upside-down,
    which silently sabotaged gravity-cue consumers like the single-image
    calibration net.)
    """
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    upv = np.asarray(up, np.float64)
    right = np.cross(fwd, upv)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)  # rows = camera axes in world
    t = -R @ eye
    return R, t


def make_scene(
    rng: np.random.Generator,
    n_points: int = 500,
    n_frames: int = 12,
    radius: float = 0.6,
    object_size: float = 0.2,
    image_hw: tuple[int, int] = (512, 512),
    focal: float = 600.0,
    elevation_jitter: float = 0.15,
) -> Scene:
    """Camera ring orbiting a point blob — ARKit-scan-like geometry."""
    H, W = image_hw
    pts = rng.uniform(-object_size / 2, object_size / 2, size=(n_points, 3))
    Rs, ts, poses = [], [], []
    for i in range(n_frames):
        a = 2 * np.pi * i / n_frames
        h = rng.uniform(-elevation_jitter, elevation_jitter)
        eye = np.array([radius * np.cos(a), h, radius * np.sin(a)])
        R, t = look_at(eye, np.zeros(3))
        Rs.append(R)
        ts.append(t)
        poses.append(
            np.concatenate([Rotation.from_matrix(R).as_rotvec(), t])
        )
    Rs = np.stack(Rs).astype(np.float32)
    ts = np.stack(ts).astype(np.float32)
    poses = np.stack(poses).astype(np.float32)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    Ks = np.tile(K, (n_frames, 1, 1))

    p_cam = np.einsum("fij,pj->fpi", Rs, pts) + ts[:, None, :]
    depth = p_cam[..., 2]
    uvz = np.einsum("fij,fpj->fpi", Ks, p_cam)
    uv = uvz[..., :2] / np.clip(uvz[..., 2:], 1e-9, None)
    visible = (
        (depth > 0.05)
        & (uv[..., 0] > 0) & (uv[..., 0] < W)
        & (uv[..., 1] > 0) & (uv[..., 1] < H)
    )
    return Scene(
        points=pts.astype(np.float32),
        poses=poses,
        Rs=Rs,
        ts=ts,
        Ks=Ks,
        uv=uv.astype(np.float32),
        depth=depth.astype(np.float32),
        visible=visible,
        image_hw=image_hw,
    )


class TrackSet(NamedTuple):
    """Track-major observation layout shared by the BA solvers."""

    kpt0: np.ndarray       # [T, 2] reference-view keypoints
    ref_idx: np.ndarray    # [T] reference frame
    obs_idx: np.ndarray    # [T, M] observing frames (padded)
    kpt1: np.ndarray       # [T, M, 2] observed keypoints
    mask: np.ndarray       # [T, M]
    depth_gt: np.ndarray   # [T] GT reference depth
    point_ids: np.ndarray  # [T] index into scene.points


def make_tracks(
    scene: Scene,
    rng: np.random.Generator,
    max_track_length: int = 8,
    noise_px: float = 0.0,
    min_obs: int = 2,
) -> TrackSet:
    """One track per sufficiently-visible point; reference view = first."""
    F, P = scene.visible.shape
    kpt0, ref_idx, obs_idx, kpt1, mask, depth_gt, pids = [], [], [], [], [], [], []
    for p in range(P):
        frames = np.nonzero(scene.visible[:, p])[0]
        if len(frames) < min_obs + 1:
            continue
        ref = frames[0]
        others = frames[1:][: max_track_length]
        m = len(others)
        oi = np.zeros(max_track_length, np.int32)
        k1 = np.zeros((max_track_length, 2), np.float32)
        msk = np.zeros(max_track_length, bool)
        oi[:m] = others
        k1[:m] = scene.uv[others, p]
        if noise_px > 0:
            k1[:m] += rng.normal(size=(m, 2)) * noise_px
        msk[:m] = True
        kpt0.append(scene.uv[ref, p])
        ref_idx.append(ref)
        obs_idx.append(oi)
        kpt1.append(k1)
        mask.append(msk)
        depth_gt.append(scene.depth[ref, p])
        pids.append(p)
    return TrackSet(
        kpt0=np.stack(kpt0).astype(np.float32),
        ref_idx=np.asarray(ref_idx, np.int32),
        obs_idx=np.stack(obs_idx),
        kpt1=np.stack(kpt1),
        mask=np.stack(mask),
        depth_gt=np.asarray(depth_gt, np.float32),
        point_ids=np.asarray(pids, np.int32),
    )


def splat_image(
    uv: np.ndarray,
    depth: np.ndarray,
    visible: np.ndarray,
    point_amps: np.ndarray,
    image_hw: tuple[int, int],
    sigma_px: float = 2.5,
    background: float | np.ndarray = 0.15,
) -> np.ndarray:
    """Gaussian-splat rendering of arbitrary projected points into one view.

    Each 3D point has a fixed random amplitude (its "appearance"), so local
    image content is tied to 3D identity — enough signal for the matchers
    to learn 2D-3D association in end-to-end tests without a mesh renderer.
    Splat size scales inversely with depth (weak perspective cue); painter's
    order (far to near) gives correct occlusion between point sets.
    """
    H, W = image_hw
    if np.ndim(background) == 0:
        img = np.full((H, W), background, np.float32)
    else:
        img = np.array(background, np.float32, copy=True)
    order = np.argsort(-depth)  # far to near: near splats overwrite
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    for p in order:
        if not visible[p]:
            continue
        u, v = uv[p]
        s = sigma_px * 0.5 / max(depth[p], 0.1)
        r = int(max(3 * s, 2))
        x0, x1 = max(int(u) - r, 0), min(int(u) + r + 1, W)
        y0, y1 = max(int(v) - r, 0), min(int(v) + r + 1, H)
        if x0 >= x1 or y0 >= y1:
            continue
        g = np.exp(
            -(((xs[y0:y1, x0:x1] - u) ** 2 + (ys[y0:y1, x0:x1] - v) ** 2)
              / (2 * s * s))
        )
        a = point_amps[p]
        img[y0:y1, x0:x1] = img[y0:y1, x0:x1] * (1 - g) + a * g
    return np.clip(img, 0.0, 1.0)


def render_splats(
    scene: Scene,
    frame_idx: int,
    point_amps: np.ndarray,
    sigma_px: float = 2.5,
    background: float = 0.15,
    seed: int = 0,
) -> np.ndarray:
    """Render one view of a Scene (see splat_image)."""
    return splat_image(
        scene.uv[frame_idx], scene.depth[frame_idx], scene.visible[frame_idx],
        point_amps, scene.image_hw, sigma_px=sigma_px, background=background,
    )


class WildScene(NamedTuple):
    """Full-frame test scenario: off-center wandering object + background.

    `scene` carries the OBJECT geometry (poses/K are the real camera; uv,
    depth, visible are object-point projections into the FULL frame).
    Background points add realistic parallax clutter the detector must
    reject (the reference's in-the-wild videos, inference.py:136-224).
    """

    scene: Scene
    bg_points: np.ndarray   # [B, 3]
    bg_uv: np.ndarray       # [F, B, 2]
    bg_depth: np.ndarray    # [F, B]
    bg_visible: np.ndarray  # [F, B]
    seq_ids: np.ndarray | None = None  # [F] orbit-ring / sequence label


def make_wild_scene(
    rng: np.random.Generator,
    n_points: int = 400,
    n_bg: int = 700,
    n_frames: int = 60,
    radius: float = 0.6,
    object_size: float = 0.2,
    image_hw: tuple[int, int] = (512, 512),
    focal: float | None = None,
    elevation_jitter: float = 0.05,
    wander: float = 0.12,
    points: np.ndarray | None = None,
    bg_points: np.ndarray | None = None,
    elevations: tuple[float, ...] | None = None,
    phase: float = 0.0,
) -> WildScene:
    """Orbit whose look-target drifts (smooth random walk, world units), so
    the object projects off-center and moves around the full frame; uniform
    background points scattered in a shell around the object.

    Pass `points`/`bg_points` to reuse the SAME world geometry across two
    sequences of one experiment (the two-phase in-the-wild protocol: an
    object-centred *scan* builds the map, the wandering sequence is pure
    inference — reference demo.sh:8-24 maps from `*-annotate` scans and
    tests on `*-test`). `wander=0` gives the object-centred annotate-style
    scan. `elevations` splits the frames into len(elevations) orbit rings
    at those heights (the reference captures several annotate sequences at
    different elevations); `phase` offsets the orbit start angle so a scan
    and a test orbit never share viewpoints.
    """
    H, W = image_hw
    focal = focal if focal is not None else 1.4 * min(H, W)
    if points is None:
        points = rng.uniform(
            -object_size / 2, object_size / 2, size=(n_points, 3)
        )
    pts = np.asarray(points, np.float32)
    if bg_points is None:
        # background: shell between 1.5x and 4x the object radius
        d = rng.uniform(object_size * 1.5, object_size * 4.0, size=n_bg)
        dirs = rng.normal(size=(n_bg, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        bg_points = dirs * d[:, None]
    bg = np.asarray(bg_points, np.float32)

    # smooth wandering look-target (AR(1) velocity walk, clipped)
    tgt = np.zeros(3)
    vel = np.zeros(3)
    targets = []
    for _ in range(n_frames):
        if wander > 0:
            vel = 0.85 * vel + rng.normal(size=3) * wander * 0.08
            tgt = np.clip(tgt + vel, -wander, wander)
        targets.append(tgt.copy())

    if elevations is None:
        ring = np.zeros(n_frames, np.int64)
        ring_pos = np.arange(n_frames)
        ring_len = np.full(n_frames, n_frames)
        heights = None
    else:
        n_r = len(elevations)
        ring = np.minimum(np.arange(n_frames) * n_r // n_frames, n_r - 1)
        ring_pos = np.zeros(n_frames, np.int64)
        ring_len = np.zeros(n_frames, np.int64)
        for rg in range(n_r):
            ids = np.nonzero(ring == rg)[0]
            ring_pos[ids] = np.arange(len(ids))
            ring_len[ids] = len(ids)
        heights = np.asarray(elevations, np.float64)

    Rs, ts, poses = [], [], []
    for i in range(n_frames):
        a = 2 * np.pi * ring_pos[i] / max(ring_len[i], 1) + phase
        if heights is None:
            h = rng.uniform(-elevation_jitter, elevation_jitter)
        else:
            h = heights[ring[i]] + rng.uniform(
                -elevation_jitter, elevation_jitter
            )
        eye = np.array([radius * np.cos(a), h, radius * np.sin(a)])
        R, t = look_at(eye, targets[i])
        Rs.append(R)
        ts.append(t)
        poses.append(np.concatenate([Rotation.from_matrix(R).as_rotvec(), t]))
    Rs = np.stack(Rs).astype(np.float32)
    ts = np.stack(ts).astype(np.float32)
    poses = np.stack(poses).astype(np.float32)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    Ks = np.tile(K, (n_frames, 1, 1))

    def project(world):
        p_cam = np.einsum("fij,pj->fpi", Rs, world) + ts[:, None, :]
        depth = p_cam[..., 2]
        uvz = np.einsum("fij,fpj->fpi", Ks, p_cam)
        uv = uvz[..., :2] / np.clip(uvz[..., 2:], 1e-9, None)
        vis = (
            (depth > 0.05)
            & (uv[..., 0] > 0) & (uv[..., 0] < W)
            & (uv[..., 1] > 0) & (uv[..., 1] < H)
        )
        return uv.astype(np.float32), depth.astype(np.float32), vis

    uv, depth, vis = project(pts)
    bg_uv, bg_depth, bg_vis = project(bg)
    scene = Scene(
        points=pts.astype(np.float32), poses=poses, Rs=Rs, ts=ts, Ks=Ks,
        uv=uv, depth=depth, visible=vis, image_hw=image_hw,
    )
    return WildScene(
        scene=scene, bg_points=bg.astype(np.float32), bg_uv=bg_uv,
        bg_depth=bg_depth, bg_visible=bg_vis, seq_ids=ring,
    )


def ground_grid_background(
    R: np.ndarray,
    t: np.ndarray,
    K: np.ndarray,
    image_hw: tuple[int, int],
    plane_y: float = 0.45,
    grid_step: float = 1.0,
    line_shade: float = 0.8,
    sky: float = 0.55,
    ground: float = 0.25,
) -> np.ndarray:
    """Grayscale gravity-aligned ground-grid + horizon background.

    World convention: y points down (look_at up=(0,-1,0)); the plane sits at
    y=plane_y below the object. The horizon placement/tilt and the grid's
    perspective foreshortening encode the camera's intrinsics + gravity
    orientation exactly — the physical cues single-image calibration learns
    (calib/train.perspective_calib_batch uses this same renderer, so the
    trained net is in-domain on wild-scene sequences rendered with
    ground_grid=True).
    """
    import cv2

    H, W = image_hw
    fy = K[1, 1]
    fx = K[0, 0]
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    d_cam = np.stack(
        [(xs - K[0, 2]) / fx, (ys - K[1, 2]) / fy, np.ones_like(xs)], -1
    )
    d_world_y = d_cam @ R[:, 1]
    img = np.where(d_world_y < 0, sky, ground).astype(np.float32)

    cam_y = (np.linalg.inv(R) @ -t)[1]
    if cam_y >= plane_y:  # camera below the plane: no grid visible
        return img

    def draw_seg(p0, p1):
        pts = np.stack([p0, p1])
        pc = pts @ R.T + t
        if (pc[:, 2] < 0.05).all():
            return
        if pc[0, 2] < 0.05 or pc[1, 2] < 0.05:
            a, b = (pc[0], pc[1]) if pc[0, 2] >= 0.05 else (pc[1], pc[0])
            lam = (0.05 - a[2]) / (b[2] - a[2])
            b = a + lam * (b - a)
            pc = np.stack([a, b])
        uv = pc @ K.T
        uv = uv[:, :2] / uv[:, 2:]
        cv2.line(
            img,
            (int(round(uv[0, 0])), int(round(uv[0, 1]))),
            (int(round(uv[1, 0])), int(round(uv[1, 1]))),
            float(line_shade), 1, cv2.LINE_AA,
        )

    ext = 40.0
    n = int(ext / grid_step)
    for i in range(-n, n + 1):
        draw_seg(
            np.array([i * grid_step, plane_y, -ext]),
            np.array([i * grid_step, plane_y, ext]),
        )
        draw_seg(
            np.array([-ext, plane_y, i * grid_step]),
            np.array([ext, plane_y, i * grid_step]),
        )
    return img


def render_wild_sequence(
    wild: WildScene,
    rng: np.random.Generator,
    sigma_px: float = 2.0,
    background: float = 0.15,
    noise: float = 0.01,
    ground_grid: bool = False,
    amps: np.ndarray | None = None,
) -> np.ndarray:
    """Render full frames: object + background splats, correct occlusion.

    ground_grid=True composites the splats over a gravity-aligned grid
    background (ground_grid_background) so single-image calibration has its
    physical cues in-frame (reference inference.py:121-123 infer_K path).
    Pass `amps` ([n_obj + n_bg] splat amplitudes) to share point appearance
    across sequences rendered from the same world geometry (scan + test
    phases of one object)."""
    scene = wild.scene
    n_obj = len(scene.points)
    if amps is None:
        amps = rng.uniform(0.3, 1.0, size=n_obj + len(wild.bg_points)).astype(
            np.float32
        )
    frames = []
    for f in range(len(scene.poses)):
        uv = np.concatenate([scene.uv[f], wild.bg_uv[f]])
        depth = np.concatenate([scene.depth[f], wild.bg_depth[f]])
        vis = np.concatenate([scene.visible[f], wild.bg_visible[f]])
        bg = background
        if ground_grid:
            bg = ground_grid_background(
                np.asarray(scene.Rs[f], np.float64),
                np.asarray(scene.ts[f], np.float64),
                np.asarray(scene.Ks[f], np.float64),
                scene.image_hw,
            )
        img = splat_image(
            uv, depth, vis, amps, scene.image_hw,
            sigma_px=sigma_px, background=bg,
        )
        if noise > 0:
            img = np.clip(
                img + rng.normal(size=img.shape).astype(np.float32) * noise,
                0, 1,
            ).astype(np.float32)
        frames.append(img)
    return np.stack(frames)


def render_sequence(
    scene: Scene,
    rng: np.random.Generator,
    sigma_px: float = 2.5,
    background: float = 0.15,
) -> np.ndarray:
    """Render every frame; per-point amplitudes fixed across views."""
    amps = rng.uniform(0.3, 1.0, size=len(scene.points)).astype(np.float32)
    return np.stack(
        [
            render_splats(
                scene, f, amps, sigma_px=sigma_px, background=background
            )
            for f in range(len(scene.poses))
        ]
    )
