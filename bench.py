"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: full-size 2D-3D matcher forward throughput on one chip
(frames/s). The reference publishes no numbers (BASELINE.md), so
vs_baseline reports the fraction of single-chip speed-of-light: measured
FLOP rate / peak bf16 FLOP rate (v5e ~= 394 TFLOP/s), using XLA's own cost
analysis for the FLOP count. >1 is impossible; closer to 1 is better.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

PEAK_FLOPS = {
    "v5e": 394e12,  # bf16
    "v5": 394e12,
    "cpu": 1e12,    # nominal, for CPU smoke runs
}


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "cpu").lower()
    for key, val in PEAK_FLOPS.items():
        if key in kind:
            return val
    return PEAK_FLOPS["cpu"]


def bench_matcher(batch: int = 8, iters: int = 30) -> dict:
    import jax

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.models import OnePoseMatcher

    cfg = cfg_lib.MatcherConfig()
    model = OnePoseMatcher(cfg)
    rng = np.random.default_rng(0)
    B, H, W, L = batch, 512, 512, cfg.n_points
    import jax.numpy as jnp

    img = jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32))
    kpts = jnp.asarray(rng.uniform(-0.1, 0.1, size=(B, L, 3)).astype(np.float32))
    dc = jnp.asarray(rng.normal(size=(B, L, 256)).astype(np.float32))
    df = jnp.asarray(rng.normal(size=(B, L, 128)).astype(np.float32))
    mask = jnp.ones((B, L), dtype=bool)

    variables = jax.jit(model.init)(jax.random.key(0), img, kpts, dc, df, mask)

    def fwd(variables, img, kpts, dc, df, mask):
        out = model.apply(variables, img, kpts, dc, df, mask)
        # reduce to a scalar checksum on device: on the tunneled axon
        # platform block_until_ready does not reliably block, and fetching
        # large outputs over the tunnel dominates; a scalar device_get is
        # an honest sync point with ~0.1 ms overhead.
        return (
            jnp.sum(out["mkpts_query_f"])
            + jnp.sum(out["matches"].conf)
            + jnp.sum(out["mkpts3d"])
        )

    fwd_jit = jax.jit(fwd)
    lowered = fwd_jit.lower(variables, img, kpts, dc, df, mask)
    compiled = lowered.compile()
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = float("nan")

    # warmup
    float(fwd_jit(variables, img, kpts, dc, df, mask))
    t0 = time.perf_counter()
    for _ in range(iters):
        cs = fwd_jit(variables, img, kpts, dc, df, mask)
    float(cs)  # sync
    dt = (time.perf_counter() - t0) / iters
    fps = B / dt
    peak = _peak_flops(jax.devices()[0])
    sol_fraction = (flops / dt) / peak if np.isfinite(flops) else 0.0
    return {
        "metric": "matcher2d3d_forward_fps_1chip_b8_512px_7040pts",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(sol_fraction, 4),
    }


def bench_train(batch: int = 8, image: int = 256, iters: int = 20) -> dict:
    """Full-size matcher training-step throughput (fwd+bwd+optimizer)."""
    import jax
    import jax.numpy as jnp

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.models import OnePoseMatcher
    from onepose_st_tpu.train import step as step_lib

    cfg = cfg_lib.EngineConfig()
    model = OnePoseMatcher(cfg.matcher)
    rng = np.random.default_rng(0)
    B, H, W, L = batch, image, image, cfg.matcher.n_points
    kpts = rng.uniform(-0.1, 0.1, size=(B, L, 3)).astype(np.float32)
    kpts[..., 2] += 1.5
    K = np.tile(
        np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], np.float32),
        (B, 1, 1),
    )
    batch_dev = jax.device_put(step_lib.Batch(
        query_image=jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32)),
        kpts3d=jnp.asarray(kpts),
        desc3d_coarse=jnp.asarray(rng.normal(size=(B, L, 256)).astype(np.float32)),
        desc3d_fine=jnp.asarray(rng.normal(size=(B, L, 128)).astype(np.float32)),
        point_mask=jnp.ones((B, L), bool),
        pose_gt=jnp.zeros((B, 6), jnp.float32),
        K_crop=jnp.asarray(K),
    ))
    tx = step_lib.make_optimizer(cfg.train, world_size=1, steps_per_epoch=1000)
    state = step_lib.init_state(jax.random.key(0), model, tx, batch_dev)
    jitted = jax.jit(step_lib.train_step, static_argnames=("model", "tx", "cfg"))
    state, scalars = jitted(
        state, batch_dev, jax.random.key(1), model=model, tx=tx, cfg=cfg
    )
    float(scalars["loss"])  # warmup sync
    t0 = time.perf_counter()
    for i in range(iters):
        state, scalars = jitted(
            state, batch_dev, jax.random.key(2 + i), model=model, tx=tx, cfg=cfg
        )
    float(scalars["loss"])
    dt = (time.perf_counter() - t0) / iters
    return {
        "metric": f"matcher_train_step_its_1chip_b{batch}_{image}px",
        "value": round(1.0 / dt, 2),
        "unit": "it/s",
        "vs_baseline": 0.0,
    }


def bench_depth_ba(n_tracks: int = 15000, track_len: int = 16, iters: int = 10) -> dict:
    """Depth-only LM BA at the reference's 15k-point map scale
    (the DeepLM workload, SURVEY.md §2.2)."""
    import jax.numpy as jnp

    from onepose_st_tpu.data import synthetic
    from onepose_st_tpu.sfm.ba.depth_ba import DepthBAProblem, solve_depth_ba

    rng = np.random.default_rng(0)
    scene = synthetic.make_scene(rng, n_points=n_tracks, n_frames=48)
    tracks = synthetic.make_tracks(
        scene, rng, max_track_length=track_len, noise_px=0.5
    )
    T = len(tracks.depth_gt)
    prob = DepthBAProblem(
        kpt0=jnp.asarray(tracks.kpt0),
        ref_idx=jnp.asarray(tracks.ref_idx),
        obs_idx=jnp.asarray(tracks.obs_idx),
        kpt1=jnp.asarray(tracks.kpt1),
        mask=jnp.asarray(tracks.mask),
        poses=jnp.asarray(scene.poses),
        Ks=jnp.asarray(scene.Ks),
    )
    depth0 = jnp.asarray(tracks.depth_gt * (1.0 + 0.05 * rng.normal(size=T).astype(np.float32)))
    depth, info = solve_depth_ba(depth0, prob, max_iters=32)
    float(info["final_cost"])  # warmup + compile
    t0 = time.perf_counter()
    for _ in range(iters):
        depth, info = solve_depth_ba(depth0, prob, max_iters=32)
    fc = float(info["final_cost"])
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(fc)
    return {
        "metric": f"depth_ba_solve_tracks_per_s_T{T}_M{track_len}",
        "value": round(T / dt, 1),
        "unit": "tracks/s",
        "vs_baseline": 0.0,
    }


def bench_pipeline(iters: int = 50) -> dict:
    """Closed-loop per-frame pose estimation latency: the fused
    matcher-forward + RANSAC-PnP device program of infer/pipeline.py
    (B=1, 512 px crop, full-size cloud), blocking on the pose each frame
    as real tracking must (the pose feeds the next frame's crop)."""
    import jax
    import jax.numpy as jnp

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.models import OnePoseMatcher
    from onepose_st_tpu.solvers import ransac_pnp

    cfg = cfg_lib.EngineConfig()
    model = OnePoseMatcher(cfg.matcher)
    rng = np.random.default_rng(0)
    H = W = 512
    L = cfg.matcher.n_points
    img = jnp.asarray(rng.uniform(size=(1, H, W, 1)).astype(np.float32))
    kpts = jnp.asarray(rng.uniform(-0.1, 0.1, size=(1, L, 3)).astype(np.float32))
    dc = jnp.asarray(rng.normal(size=(1, L, 256)).astype(np.float32))
    df = jnp.asarray(rng.normal(size=(1, L, 128)).astype(np.float32))
    mask = jnp.ones((1, L), dtype=bool)
    K = jnp.asarray(
        np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], np.float32)
    )
    variables = jax.jit(model.init)(jax.random.key(0), img, kpts, dc, df, mask)
    pnp_cfg = cfg.pnp

    def fwd_pnp(variables, img, kpts, dc, df, mask, K, rng):
        out = model.apply(variables, img, kpts, dc, df, mask)
        res = ransac_pnp(
            rng, out["mkpts3d"][0], out["mkpts_query_f"][0], K,
            out["matches"].valid[0], pnp_cfg,
        )
        return res.pose6, res.n_inliers

    jitted = jax.jit(fwd_pnp)
    np.asarray(jitted(variables, img, kpts, dc, df, mask, K, jax.random.key(0))[0])
    t0 = time.perf_counter()
    for i in range(iters):
        pose6, _ = jitted(
            variables, img, kpts, dc, df, mask, K, jax.random.key(i)
        )
        np.asarray(pose6)  # the host needs the pose before the next frame
    dt = (time.perf_counter() - t0) / iters
    return {
        "metric": "closed_loop_pose_fps_1chip_b1_512px",
        "value": round(1.0 / dt, 2),
        "unit": "frames/s",
        "vs_baseline": 0.0,
    }


def main():
    from onepose_st_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "matcher"
    if which == "matcher":
        result = bench_matcher()
    elif which == "train":
        result = bench_train()
    elif which == "depth_ba":
        result = bench_depth_ba()
    elif which == "pipeline":
        result = bench_pipeline()
    elif which == "all":
        for r in (
            bench_matcher(), bench_train(), bench_depth_ba(), bench_pipeline()
        ):
            print(json.dumps(r))
        return
    else:
        raise SystemExit(f"unknown bench: {which}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
