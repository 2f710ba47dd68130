"""Per-frame pose estimation pipeline.

Re-design of reference inference.py:96-235 (`inference_core`'s POSE
ESTIMATION loop): detect (or track via the previous pose), crop, run the
2D-3D matcher against the SfM map, RANSAC-PnP, and re-detect when the
inlier count collapses (<min_inliers, reference inference.py:150-173).

The device work per frame is ONE fused jitted program (matcher forward +
RANSAC PnP in a single dispatch — match tensors never leave the device;
fusing the two programs saved ~29 ms/frame of dispatch+transfer over the
tunnel, EXPERIMENTS.md roofline notes); the detect/track state machine
and cropping stay on host. Temporal refinement lives in infer/tracker.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig
from ..core import camera
from ..data import images as img_ops
from ..sfm.map import SfMMap
from ..solvers import ransac_pnp
from .detector import Detection, ObjectDetector


def make_fwd_pnp(matcher_model, cfg: EngineConfig):
    """Build the fused per-frame device program: matcher forward + RANSAC
    PnP (+ optional fine re-centering rounds) in ONE dispatch.

    With cfg.pnp.recenter_iters > 0, each round reprojects the matched 3D
    points with the current pose, re-runs the fine stage with windows
    centered on the reprojected cells (the original windows sit on the
    matched coarse cell — a true correspondence near the cell corner lands
    at the heatmap boundary where the softmax expectation is biased
    center-ward), and re-runs PnP on the re-centered sub-pixel points.
    The re-centered result is kept only when its consensus is at least as
    large. Mirrors the map-side iterative refinement win
    (sfm/pipeline.py refine_iters, reproj 1.24 -> 1.05 px).
    """
    import jax.tree_util as jtu

    from ..models.matcher2d3d import OnePoseMatcher

    pnp_cfg = cfg.pnp
    stride = cfg.matcher.backbone.coarse_stride

    def fwd_pnp(variables, img, kpts, dc, df, mask, K_crop, rng,
                img_mask=None):
        if jnp.issubdtype(img.dtype, jnp.integer):
            # uint8 camera path: crops upload at 1/4 the bytes of f32 and
            # normalize on device (the tunnel upload is a per-frame cost)
            img = img.astype(jnp.float32) / 255.0
        if rng.dtype == jnp.int32:  # seed scalar -> key on device (saves a
            rng = jax.random.key(rng[0])  # host-side key-creation op/frame
        out = matcher_model.apply(
            variables, img, kpts, dc, df, mask, img_mask=img_mask
        )
        mk3d = out["mkpts3d"][0]
        mk2d = out["mkpts_query_f"][0]
        valid = out["matches"].valid
        res = ransac_pnp(rng, mk3d, mk2d, K_crop, valid[0], pnp_cfg)
        Hc, Wc = out["coarse_hw"]
        for it in range(pnp_cfg.recenter_iters):
            uv_proj, depth = camera.project(mk3d, res.pose6, K_crop)
            xc = jnp.clip(
                jnp.floor(uv_proj[:, 0] / stride), 0, Wc - 1
            ).astype(jnp.int32)
            yc = jnp.clip(
                jnp.floor(uv_proj[:, 1] / stride), 0, Hc - 1
            ).astype(jnp.int32)
            j2 = yc * Wc + xc
            inb = (
                (uv_proj[:, 0] >= 0) & (uv_proj[:, 0] < Wc * stride)
                & (uv_proj[:, 1] >= 0) & (uv_proj[:, 1] < Hc * stride)
                & (depth > 0)
            )
            if img_mask is not None:
                inb = inb & jnp.take(img_mask[0], j2)
            fine2 = matcher_model.apply(
                variables, out["feat_f"], df,
                out["i_ids"], j2[None], (Hc, Wc),
                method=OnePoseMatcher.fine,
            )
            # Per-point agreement gate: re-center ONLY where the original
            # fine estimate and the reprojection roughly agree (both near
            # the truth -> the re-centered window certainly contains it and
            # removes the window-edge expectation bias). Where they
            # disagree the pose error dominates: a window centered at the
            # reprojection would not contain the true correspondence and
            # its expectation collapses onto the reprojection itself —
            # manufacturing self-confirming inliers (measured: proj2D@5px
            # 1.0 -> 0.375 with ungated re-centering, logs/r4_recenter1).
            agree = jnp.linalg.norm(uv_proj - mk2d, axis=-1) <= stride / 2.0
            mk2d_rc = jnp.where(
                (agree & inb)[:, None], fine2["mkpts_query_f"][0], mk2d
            )
            res2 = ransac_pnp(
                jax.random.fold_in(rng, it + 1), mk3d, mk2d_rc, K_crop,
                valid[0], pnp_cfg,
            )
            take = res2.n_inliers >= res.n_inliers
            res = jtu.tree_map(lambda a, b: jnp.where(take, a, b), res2, res)
            mk2d = jnp.where(take, mk2d_rc, mk2d)
        return mk3d, mk2d, valid, res

    return jax.jit(fwd_pnp)


class FrameResult(NamedTuple):
    pose6: np.ndarray        # [6] world->cam
    T44: np.ndarray          # [4, 4]
    n_inliers: int
    n_matches: int
    tracked: bool            # False = detector ran on this frame
    success: bool
    mkpts3d: np.ndarray      # [K, 3] inlier 3D points (full precision)
    mkpts2d_full: np.ndarray # [K, 2] inlier 2D points in FULL image coords


class PoseEstimator:
    def __init__(
        self,
        cfg: EngineConfig,
        matcher_model,
        matcher_variables,
        sfm_map: SfMMap,
        detector: ObjectDetector | None = None,
    ):
        self.cfg = cfg
        self.model = matcher_model
        self.variables = matcher_variables
        self.detector = detector
        k, dc, df, s, mask = sfm_map.padded(cfg.matcher.n_points)
        self._cloud = (
            jnp.asarray(k)[None],
            jnp.asarray(dc)[None],
            jnp.asarray(df)[None],
            jnp.asarray(mask)[None],
        )
        self.box_corners3d = sfm_map.box_corners
        self._prev_pose: np.ndarray | None = None
        self._lost = True
        self._stale = 0   # frames since the last successful pose
        # host-time instrumentation: set to a defaultdict(list) to record
        # per-segment wall times (bench.py closed_loop_profile)
        self._timers: dict | None = None

        # fused matcher forward + RANSAC PnP: per-frame latency pays a
        # single dispatch (the tunnel's dispatch floor is ~2.5 ms,
        # comparable to the compute itself) and the match tensors never
        # round-trip to the host. `img_mask` [1, S] marks crop cells backed
        # by real frame pixels (truncated-object crops contain black
        # warp-fill that must not vote or match).
        self._fwd_pnp = make_fwd_pnp(matcher_model, cfg)

    def reset(self):
        self._prev_pose = None
        self._lost = True
        self._stale = 0

    def _account(self, r: FrameResult) -> FrameResult:
        """Once-per-FRAME staleness accounting (`_stale` = consecutive
        frames without a successful pose, feeds the retry-box pad growth).
        Kept separate from _drain, which runs once per ATTEMPT: a frame
        whose first pass and previous-pose retry both fail must count as
        ONE lost frame, and a prep-failure frame (no detection at all)
        must count too (advisor r4 finding)."""
        self._stale = 0 if r.success else self._stale + 1
        return r

    def estimate(
        self, frame: np.ndarray, K: np.ndarray, frame_idx: int = 0,
        crop_affine: np.ndarray | None = None,
        src_frame_hw: tuple[int, int] | None = None,
    ) -> FrameResult:
        """frame: [H, W] grayscale [0,1]; K: [3,3] full-image intrinsics.

        With no detector configured, frames are treated as pre-cropped
        (object-centered, divisor-8 sized) and K as the crop intrinsics;
        `crop_affine`/`src_frame_hw` (the A3 and source-frame size the crop
        was made with) then enable the warp-fill visibility mask.
        """
        det: Detection | None = None
        tracked = False
        if self.detector is None:
            # pre-cropped input mode (reference batch-eval path,
            # inference dataset images already object-centered): the whole
            # frame is the crop and K is already the crop intrinsics
            crop, K_crop = frame, K
            A3 = (np.eye(3, dtype=np.float32)
                  if crop_affine is None else crop_affine)
            return self._account(self._match_and_pnp(
                crop, K_crop, A3, tracked=False, frame_idx=frame_idx,
                frame_hw=src_frame_hw,
            ))
        if (
            not self._lost
            and self._prev_pose is not None
            and self.box_corners3d is not None
        ):
            det = self.detector.previous_pose_detect(
                self._prev_pose, K, self.box_corners3d,
                frame_hw=frame.shape[:2],
            )
            tracked = det.success
        if det is None or not det.success:
            det = self.detector.detect(frame, rng_seed=frame_idx)
            tracked = False
        r = None
        if det.success:
            crop, K_crop, A3 = self.detector.crop(frame, det, K)
            r = self._match_and_pnp(
                crop, K_crop, A3, tracked, frame_idx, frame_hw=frame.shape[:2]
            )
        # Lost-frame second attempt: a transient loss (blur, corruption,
        # momentary occlusion) leaves the last good pose nearly valid, but
        # the cold detector can fail on hard viewpoints exactly where the
        # track was lost — so a failed re-detect used to strand the loop
        # for many frames (r3/r4 wild logs: "0 re-detections after loss").
        # Retry with the STALE previous-pose box, padded wider the longer
        # the track has been lost. Costs one extra device call on failed
        # frames only. (Reference analogue: its re-detect loop
        # inference.py:150-173 + the CoTracker temporal rescue :256-336.)
        if (
            (r is None or not r.success)
            and not tracked
            and self._prev_pose is not None
            and self.box_corners3d is not None
        ):
            pad = 1.1 * (1.12 ** min(self._stale, 6))
            det2 = self.detector.previous_pose_detect(
                self._prev_pose, K, self.box_corners3d,
                frame_hw=frame.shape[:2], pad=pad,
            )
            if det2.success:
                crop, K_crop, A3 = self.detector.crop(frame, det2, K)
                r2 = self._match_and_pnp(
                    crop, K_crop, A3, False, frame_idx,
                    frame_hw=frame.shape[:2],
                )
                if r2.success or r is None:
                    r = r2
        if r is None:
            r = FrameResult(
                pose6=np.zeros(6, np.float32), T44=np.eye(4, dtype=np.float32),
                n_inliers=0, n_matches=0, tracked=False, success=False,
                mkpts3d=np.zeros((0, 3), np.float32),
                mkpts2d_full=np.zeros((0, 2), np.float32),
            )
        return self._account(r)

    def _dispatch(
        self,
        crop: np.ndarray,
        K_crop: np.ndarray,
        A3: np.ndarray,
        tracked: bool,
        frame_idx: int,
        frame_hw: tuple[int, int] | None = None,
    ):
        """Launch the fused device program for one frame (async) and return
        the pending handle; `_drain` completes it."""
        import time as _time

        cfg = self.cfg
        kpts, dc, df, mask = self._cloud
        _t0 = _time.perf_counter() if self._timers is not None else 0.0
        img_mask = None
        if frame_hw is not None:
            # visibility of crop cells: crops hanging past the frame edge
            # carry black warp-fill; dead cells are excluded from matching.
            # Fast path: a crop box fully inside the frame is fully valid —
            # reuse one cached device-resident all-true mask instead of
            # paying a per-frame host mask build + upload (the common case:
            # tracked frames with the object inside the frame).
            stride = cfg.matcher.backbone.coarse_stride
            quad = img_ops.valid_quad_from_affine(A3, frame_hw)
            Hc_px, Wc_px = crop.shape[:2]
            # fully-valid test: min/max bounds of the quad only imply
            # containment when the quad is an axis-aligned rectangle — a
            # rotated/sheared crop affine could cover the crop's bounding
            # box without covering its corners (advisor r4 finding), so the
            # fast path additionally requires an axis-aligned A3 (the
            # detector only produces scale+shift affines, so tracked frames
            # still take it).
            axis_aligned = abs(A3[0, 1]) < 1e-6 and abs(A3[1, 0]) < 1e-6
            if (axis_aligned
                    and quad[:, 0].min() <= 0 and quad[:, 1].min() <= 0
                    and quad[:, 0].max() >= Wc_px and quad[:, 1].max() >= Hc_px):
                S = (Hc_px // stride) * (Wc_px // stride)
                cache = getattr(self, "_ones_mask", None)
                if cache is None or cache.shape[1] != S:
                    cache = jnp.ones((1, S), bool)
                    self._ones_mask = cache
                img_mask = cache
            else:
                img_mask = img_ops.cell_mask_from_quad(
                    quad, crop.shape[:2], stride
                )[None]
        # ONE batched host->device put for the frame's inputs: separate
        # jnp.asarray calls each pay the tunnel round trip, and the seed
        # rides as a scalar (the key is built inside the program)
        if self._timers is not None:
            _t1 = _time.perf_counter()
            self._timers["mask_build"].append(_t1 - _t0)
        crop_dev, K_dev, seed_dev, img_mask = jax.device_put((
            crop[None, ..., None], np.asarray(K_crop),
            np.asarray([frame_idx], np.int32), img_mask,
        ))
        if self._timers is not None:
            _t2 = _time.perf_counter()
            self._timers["device_put"].append(_t2 - _t1)
        out_dev = self._fwd_pnp(
            self.variables, crop_dev, kpts, dc, df, mask,
            K_dev, seed_dev, img_mask=img_mask,
        )
        # Enqueue the device->host copy NOW (non-blocking): PJRT starts the
        # transfer as soon as the program finishes, so the later _drain
        # device_get finds the data already on host instead of paying the
        # tunnel round trip serially inside the frame loop (~10 ms/frame on
        # the axon tunnel, EXPERIMENTS.md roofline notes). In the pipelined
        # driver the transfer of frame t overlaps host prep of frame t+1.
        try:
            for leaf in jax.tree_util.tree_leaves(out_dev):
                leaf.copy_to_host_async()
        except (AttributeError, NotImplementedError):  # backend w/o async D2H
            pass
        if self._timers is not None:
            self._timers["dispatch"].append(_time.perf_counter() - _t2)
        return (out_dev, A3, tracked)

    def _drain(self, pending) -> FrameResult:
        """Fetch a dispatched frame's result, update the tracking state."""
        from scipy.spatial.transform import Rotation

        out_dev, A3, tracked = pending
        # ONE batched device->host fetch for everything this frame needs:
        # separate np.asarray() calls are separate transfers, each paying
        # the tunnel round trip (~10 ms apiece)
        if self._timers is not None:
            import time as _time

            _t0 = _time.perf_counter()
        mk3d, mk2d, valid, res = jax.device_get(out_dev)
        if self._timers is not None:
            self._timers["drain_fetch"].append(_time.perf_counter() - _t0)
        n_inl = int(res.n_inliers)
        n_match = int(valid.sum())
        success = bool(res.success) and n_inl >= self.cfg.pnp.min_inliers
        pose6 = np.asarray(res.pose6)

        if success:
            self._prev_pose = pose6
            self._lost = False
        else:
            self._lost = True  # re-detect next frame (reference :150-163)
        # NOTE: _stale is NOT touched here — _drain runs once per ATTEMPT
        # (a frame's first pass and its previous-pose retry both drain),
        # while the retry-pad growth needs once-per-FRAME accounting; see
        # _account (advisor r4 finding).

        T44 = np.eye(4, dtype=np.float32)
        T44[:3, :3] = Rotation.from_rotvec(
            np.asarray(pose6[:3], np.float64)
        ).as_matrix()
        T44[:3, 3] = pose6[3:6]

        inl = np.asarray(res.inliers)
        mk3d_np = mk3d[inl]
        mk2d_crop = mk2d[inl]
        # map crop coords back to full-image coords for the tracker
        mk2d_full = img_ops.warp_points_h(img_ops.invert_affine(A3), mk2d_crop)
        return FrameResult(
            pose6=pose6, T44=T44, n_inliers=n_inl, n_matches=n_match,
            tracked=tracked, success=success,
            mkpts3d=mk3d_np, mkpts2d_full=mk2d_full.astype(np.float32),
        )

    def _match_and_pnp(
        self,
        crop: np.ndarray,
        K_crop: np.ndarray,
        A3: np.ndarray,
        tracked: bool,
        frame_idx: int,
        frame_hw: tuple[int, int] | None = None,
    ) -> FrameResult:
        return self._drain(self._dispatch(
            crop, K_crop, A3, tracked, frame_idx, frame_hw
        ))

    def self_calibrate(
        self,
        frames: np.ndarray,
        K0: np.ndarray,
        sample_stride: int = 8,
        min_inliers: int = 12,
        rounds: int = 1,
        method: str = "joint",
    ) -> tuple[np.ndarray, dict]:
        """Refine an approximate focal (e.g. the calib-net's 8-12%-error K)
        from the object itself. Two estimators:

        * ``method="joint"`` (default): collect every sampled frame's 2D-3D
          matches + a loose-gate RANSAC pose, then ONE joint Gauss-Newton
          over (all poses, one shared log focal-scale)
          (solvers.joint_focal_refine). The multi-frame baseline breaks the
          per-frame f/tz near-degeneracy that biased the median estimator
          (3.8% residual, compounding to 7.1% over 2 rounds —
          logs/ffe_r4a_calib2.log).
        * ``method="median"``: the r4 estimator — per-frame
          (pose, focal-scale) RANSAC+GN (solvers.ransac_pnp_focal),
          inlier-weighted median scale over frames.

        Returns (K_refined, info). The estimated scale transfers from crop
        to full image exactly because the crop affine is a uniform
        scale+shift.

        This is the engine-side answer to the reference's infer_K trust
        (inference.py:121-123): a deep-calibration K seeds the pipeline and
        the 2D-3D matches finish the job.
        """
        if method == "joint":
            return self._self_calibrate_joint(
                frames, K0, sample_stride, min_inliers, rounds
            )
        from ..solvers import ransac_pnp_focal

        if getattr(self, "_fwd_pnp_focal", None) is None:
            model, pnp_cfg = self.model, self.cfg.pnp

            def fwd(variables, img, kpts, dc, df, mask, K_crop, rng,
                    img_mask=None):
                out = model.apply(
                    variables, img, kpts, dc, df, mask, img_mask=img_mask
                )
                res, s = ransac_pnp_focal(
                    rng, out["mkpts3d"][0], out["mkpts_query_f"][0], K_crop,
                    out["matches"].valid[0], pnp_cfg,
                )
                return res.n_inliers, res.success, s

            self._fwd_pnp_focal = jax.jit(fwd)

        kpts, dc, df, mask = self._cloud
        stride = self.cfg.matcher.backbone.coarse_stride
        K_cur = np.asarray(K0, np.float64).copy()
        s_total = 1.0
        info: dict = {"n_frames_used": 0, "scale": 1.0}
        # one round by default: round 1 takes the calib-net error 12% -> ~4%
        # (logs/ffe_r4a_calib.log); the per-frame estimator carries a small
        # consistent positive bias on this scene (f/tz near-degeneracy vs
        # the map's 3D error), so a second round COMPOUNDS it instead of
        # polishing (measured 3.8% -> 7.1%, logs/ffe_r4a_calib2.log)
        for rnd in range(max(rounds, 1)):
            scales, weights = [], []
            for f in range(0, len(frames), max(1, sample_stride)):
                det = self.detector.detect(frames[f], rng_seed=f)
                if not det.success:
                    continue
                crop, K_crop, A3 = self.detector.crop(
                    frames[f], det, K_cur.astype(np.float32)
                )
                img_mask = jnp.asarray(img_ops.valid_cell_mask(
                    A3, frames[f].shape[:2], crop.shape[:2], stride
                )[None])
                n_inl, ok, s = jax.device_get(self._fwd_pnp_focal(
                    self.variables, jnp.asarray(crop[None, ..., None]),
                    kpts, dc, df, mask, jnp.asarray(K_crop),
                    jax.random.key(1000 * rnd + f),
                    img_mask=img_mask,
                ))
                if bool(ok) and int(n_inl) >= min_inliers:
                    scales.append(float(s))
                    weights.append(float(n_inl))
            if not scales:
                break
            order = np.argsort(scales)
            cw = np.cumsum(np.asarray(weights)[order])
            s_med = float(np.asarray(scales)[order][
                np.searchsorted(cw, cw[-1] / 2.0)
            ])
            K_cur[0, 0] *= s_med
            K_cur[1, 1] *= s_med
            s_total *= s_med
            info = {
                "n_frames_used": len(scales), "scale": s_total,
                "last_round_scale": s_med, "rounds_run": rnd + 1,
                "scales": scales, "weights": weights,
            }
        return K_cur.astype(np.float32), info

    def _self_calibrate_joint(
        self,
        frames: np.ndarray,
        K0: np.ndarray,
        sample_stride: int,
        min_inliers: int,
        rounds: int,
    ) -> tuple[np.ndarray, dict]:
        import dataclasses

        from ..solvers import joint_focal_refine, ransac_pnp

        if getattr(self, "_fwd_calib_joint", None) is None:
            model, pnp_cfg = self.model, self.cfg.pnp
            cfg_loose = dataclasses.replace(
                pnp_cfg,
                reproj_threshold_px=3.0 * pnp_cfg.reproj_threshold_px,
                tight_refine_px=0.0, recenter_iters=0,
            )

            def fwd(variables, img, kpts, dc, df, mask, K_crop, rng,
                    img_mask=None):
                out = model.apply(
                    variables, img, kpts, dc, df, mask, img_mask=img_mask
                )
                pts3d = out["mkpts3d"][0]
                uv = out["mkpts_query_f"][0]
                v = out["matches"].valid[0]
                res = ransac_pnp(rng, pts3d, uv, K_crop, v, cfg_loose)
                return (
                    pts3d, uv, v & res.inliers, res.pose6,
                    res.n_inliers, res.success,
                )

            self._fwd_calib_joint = jax.jit(fwd)

        kpts, dc, df, mask = self._cloud
        stride = self.cfg.matcher.backbone.coarse_stride
        K_cur = np.asarray(K0, np.float64).copy()
        s_total = 1.0
        info: dict = {"n_frames_used": 0, "scale": 1.0, "method": "joint"}
        for rnd in range(max(rounds, 1)):
            P3, UV, V, P6, KC = [], [], [], [], []
            for f in range(0, len(frames), max(1, sample_stride)):
                det = self.detector.detect(frames[f], rng_seed=f)
                if not det.success:
                    continue
                crop, K_crop, A3 = self.detector.crop(
                    frames[f], det, K_cur.astype(np.float32)
                )
                img_mask = jnp.asarray(img_ops.valid_cell_mask(
                    A3, frames[f].shape[:2], crop.shape[:2], stride
                )[None])
                pts3d, uv, v, pose6, n_inl, ok = jax.device_get(
                    self._fwd_calib_joint(
                        self.variables, jnp.asarray(crop[None, ..., None]),
                        kpts, dc, df, mask, jnp.asarray(K_crop),
                        jax.random.key(1000 * rnd + f),
                        img_mask=img_mask,
                    )
                )
                if bool(ok) and int(n_inl) >= min_inliers:
                    P3.append(pts3d); UV.append(uv); V.append(v)
                    P6.append(pose6); KC.append(K_crop)
            if len(P3) < 2:
                break   # the joint estimator needs >= 2 views for leverage
            _, s_j, inl = jax.device_get(joint_focal_refine(
                jnp.asarray(np.stack(P3)), jnp.asarray(np.stack(UV)),
                jnp.asarray(np.stack(V)), jnp.asarray(np.stack(P6)),
                jnp.asarray(np.stack(KC)),
                reproj_threshold_px=float(
                    self.cfg.pnp.reproj_threshold_px
                ),
            ))
            s_med = float(s_j)
            K_cur[0, 0] *= s_med
            K_cur[1, 1] *= s_med
            s_total *= s_med
            info = {
                "n_frames_used": len(P3), "scale": s_total,
                "last_round_scale": s_med, "rounds_run": rnd + 1,
                "method": "joint",
                "joint_inliers": int(np.asarray(inl).sum()),
            }
        return K_cur.astype(np.float32), info

    def _prep(self, frame: np.ndarray, K: np.ndarray, frame_idx: int):
        """Host half of `estimate`: box decision + crop. Returns None when
        detection failed outright."""
        det: Detection | None = None
        tracked = False
        if (
            not self._lost
            and self._prev_pose is not None
            and self.box_corners3d is not None
        ):
            det = self.detector.previous_pose_detect(
                self._prev_pose, K, self.box_corners3d,
                frame_hw=frame.shape[:2],
            )
            tracked = det.success
        if det is None or not det.success:
            det = self.detector.detect(frame, rng_seed=frame_idx)
            tracked = False
        if not det.success:
            return None
        crop, K_crop, A3 = self.detector.crop(frame, det, K)
        return crop, K_crop, A3, tracked, det.box

    @staticmethod
    def _box_diverged(box_used: np.ndarray, box_fresh: np.ndarray,
                      pad: float = 1.1) -> bool:
        """True when the fresh-pose crop box has moved enough that the
        stale crop may clip the object: center shift beyond the detector's
        padding margin (size * (1 - 1/pad) / 2 per side), or scale change
        > 9%."""
        su = float(box_used[2] - box_used[0])
        sf = float(box_fresh[2] - box_fresh[0])
        if su <= 0 or sf <= 0:
            return True
        margin = su * (1.0 - 1.0 / pad) * 0.5
        cu = np.array([box_used[0] + box_used[2], box_used[1] + box_used[3]])
        cf = np.array([box_fresh[0] + box_fresh[2], box_fresh[1] + box_fresh[3]])
        shift = float(np.max(np.abs(cu - cf))) * 0.5
        return shift > margin or not (0.92 < sf / su < 1.09)

    def run_sequence(
        self, frames, Ks, start_idx: int = 0
    ) -> list[FrameResult]:
        """Closed-loop pose estimation over a frame sequence with
        ONE-FRAME-LAG pipelining: frame t+1's host prep + dispatch overlap
        frame t's device execution and fetch, hiding the host/tunnel share
        of the frame budget (r3: 32 ms host vs 15 ms device per frame).

        Frame t+1's crop box uses a stale pose (staler than the sequential
        loop) — the detector box already pads 1.1x, so small inter-frame
        motion stays inside the margin. Two guards keep pipelining
        accuracy-neutral (r4 measured a 0.05 AP staleness cost ungated):

        * lost-track contract: when a drained frame fails while its
          successor was dispatched from a (now stale) tracked box, the
          successor is re-estimated synchronously with the detector, so a
          corrupted frame's successor still recovers (reference re-detect
          loop, inference.py:150-173);
        * box-divergence re-dispatch: after draining frame t, the box the
          in-flight frame t+1 was dispatched with is compared against the
          box the FRESH pose would produce; if the center moved beyond the
          detector's padding margin (or the scale changed >9%), the object
          may be clipped in the stale crop, so frame t+1 is re-dispatched
          from the fresh box. Costs one extra device call on fast-motion
          frames only.
        """
        if self.detector is None:
            return [
                self.estimate(frames[f], Ks[f], frame_idx=start_idx + f)
                for f in range(len(frames))
            ]
        results: list[FrameResult] = []
        pending = None         # (frame_idx, handle, box_used)
        for f in range(len(frames)):
            idx = start_idx + f
            prep = self._prep(frames[f], Ks[f], idx)
            handle, box_used = None, None
            if prep is not None:
                crop, K_crop, A3, tracked, box_used = prep
                handle = self._dispatch(
                    crop, K_crop, A3, tracked, idx, frames[f].shape[:2]
                )
            if pending is not None:
                pf, ph, _ = pending
                r = self._account(self._drain(ph))
                results.append(r)
                if not r.success and handle is not None and handle[2]:
                    # The in-flight successor used a tracked box from a pose
                    # that just turned out lost. Its result is already
                    # computed — drain it first (free): the box came from
                    # the pose BEFORE the failed frame, which is usually
                    # still valid for the successor (a corrupted frame does
                    # not move the object). Only when that attempt also
                    # fails, redo via the detector + retry ladder
                    # (r5 pipelined default: the drop-and-redo version lost
                    # frame 53 by one inlier where the discarded in-flight
                    # attempt had succeeded, logs/r5_pipelined_default.log).
                    self._lost = True
                    r_if = self._drain(handle)
                    if r_if.success:
                        results.append(self._account(r_if))
                    else:
                        r2 = self.estimate(frames[f], Ks[f], frame_idx=idx)
                        results.append(r2)
                    pending = None
                    handle = None
                    continue
                if (
                    r.success and handle is not None and handle[2]
                    and self.box_corners3d is not None
                ):
                    fresh = self.detector.previous_pose_detect(
                        r.pose6, Ks[f], self.box_corners3d,
                        frame_hw=frames[f].shape[:2],
                    )
                    if fresh.success and self._box_diverged(
                        box_used, fresh.box
                    ):
                        crop, K_crop, A3 = self.detector.crop(
                            frames[f], fresh, Ks[f]
                        )
                        handle = self._dispatch(
                            crop, K_crop, A3, True, idx, frames[f].shape[:2]
                        )
                        box_used = fresh.box
            if handle is not None:
                pending = (idx, handle, box_used)
            else:
                results.append(self._account(FrameResult(
                    pose6=np.zeros(6, np.float32),
                    T44=np.eye(4, dtype=np.float32),
                    n_inliers=0, n_matches=0, tracked=False, success=False,
                    mkpts3d=np.zeros((0, 3), np.float32),
                    mkpts2d_full=np.zeros((0, 2), np.float32),
                )))
                pending = None
        if pending is not None:
            results.append(self._account(self._drain(pending[1])))
        return results


def save_results(path, results: list[FrameResult]) -> None:
    """Pose-estimation stage cache (role of the reference's
    pose_estimation_cache.pkl + MKPT pickle, inference.py:128-135,233-235):
    the temporal-refinement pass can rerun without re-estimating."""
    import numpy as np

    np.savez_compressed(
        path,
        pose6=np.stack([r.pose6 for r in results]) if results else np.zeros((0, 6)),
        T44=np.stack([r.T44 for r in results]) if results else np.zeros((0, 4, 4)),
        n_inliers=np.asarray([r.n_inliers for r in results], np.int32),
        n_matches=np.asarray([r.n_matches for r in results], np.int32),
        tracked=np.asarray([r.tracked for r in results], bool),
        success=np.asarray([r.success for r in results], bool),
        offsets=np.cumsum([0] + [len(r.mkpts3d) for r in results]).astype(np.int64),
        mkpts3d=(
            np.concatenate([r.mkpts3d for r in results])
            if results else np.zeros((0, 3), np.float32)
        ),
        mkpts2d_full=(
            np.concatenate([r.mkpts2d_full for r in results])
            if results else np.zeros((0, 2), np.float32)
        ),
    )


def load_results(path) -> list[FrameResult]:
    import numpy as np

    z = np.load(path)
    off = z["offsets"]
    return [
        FrameResult(
            pose6=z["pose6"][f], T44=z["T44"][f],
            n_inliers=int(z["n_inliers"][f]), n_matches=int(z["n_matches"][f]),
            tracked=bool(z["tracked"][f]), success=bool(z["success"][f]),
            mkpts3d=z["mkpts3d"][off[f]:off[f + 1]],
            mkpts2d_full=z["mkpts2d_full"][off[f]:off[f + 1]],
        )
        for f in range(len(z["pose6"]))
    ]
