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
    # nominal bf16 peak per chip; matched as substrings of device_kind,
    # most-specific first (dict order is the match order). Real JAX
    # device_kind spellings: v5e reports "TPU v5 lite", v5p reports
    # "TPU v5", v6e/Trillium reports "TPU v6 lite" (hence explicit
    # "lite" keys BEFORE the bare-version keys).
    "v6 lite": 918e12,  # v6e (Trillium)
    "v6e": 918e12,
    "v6": 918e12,
    "v5 lite": 394e12,  # v5e
    "v5e": 394e12,
    "v5p": 459e12,
    "v5": 459e12,       # bare "TPU v5" is v5p
    "v4": 275e12,
    "v3": 123e12,  # bf16
    "v2": 46e12,
    "cpu": 1e12,    # nominal, for CPU smoke runs
}


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "cpu").lower()
    for key, val in PEAK_FLOPS.items():
        if key in kind:
            return val
    if getattr(device, "platform", "cpu") == "tpu":
        print(
            f"WARNING: unknown TPU device_kind {kind!r}; falling back to the "
            "CPU peak figure — utilization numbers will be meaningless",
            file=sys.stderr,
        )
    return PEAK_FLOPS["cpu"]


_ACHIEVABLE = None
_CONTAMINATED: str | None = None
_CALIB_PATH = ".bench_calib.json"


def _host_load_check() -> tuple[float, str | None]:
    """(1-min load average, contamination reason or None).

    The MXU GEMM probe cannot see HOST contention: round 4's final bench
    ran while an 8000-step retrain queued at 23:26 ate the host CPUs — the
    probe passed (-5.5%) while depth-BA throughput halved and the closed
    loop's host share ballooned 27.6 -> 43.5 ms. Host-bound metrics
    (closed_loop_real, depth_ba's fetch path, train input prep) are only
    meaningful on an idle host, so any run with significant background
    load is ANNOTATED as contaminated.
    """
    import os

    try:
        load = os.getloadavg()[0]
        ncpu = os.cpu_count() or 1
    except OSError:
        return 0.0, None
    # this process plus the device runtime legitimately keep ~1 core busy;
    # sustained load beyond that means a concurrent job is competing for
    # the host (the r4 failure mode: a background training process)
    if load > max(1.5, 0.5 * ncpu):
        return load, (
            f"host 1-min load {load:.1f} on {ncpu} CPUs: concurrent "
            "host work is competing with the benchmark"
        )
    return load, None


def _load_calib(kind: str) -> float | None:
    import os

    try:
        with open(os.path.join(os.path.dirname(__file__) or ".", _CALIB_PATH)) as f:
            return json.load(f).get(kind)
    except Exception:
        return None


def _store_calib(kind: str, tflops: float) -> None:
    import os

    path = os.path.join(os.path.dirname(__file__) or ".", _CALIB_PATH)
    try:
        try:
            with open(path) as f:
                d = json.load(f)
        except Exception:
            d = {}
        # running max: the cleanest run ever seen on this device kind is the
        # ceiling record (a loaded chip can only measure lower)
        d[kind] = max(tflops, d.get(kind, 0.0))
        with open(path, "w") as f:
            json.dump(d, f, indent=1)
    except OSError:
        pass


def _achievable_flops() -> float:
    """Measured pure-GEMM bf16 rate on THIS device (TF/s -> FLOP/s).

    The tunneled chip delivers ~26% of nominal peak regardless of kernel
    (EXPERIMENTS.md calibration); nominal-peak rooflines flatter nobody and
    mislead everybody, so every mode reports vs_achievable against this
    measured ceiling alongside vs_baseline (nominal).

    Load-contamination guard (round-3 lesson: BENCH_r03 was captured while
    background training was running and understated the engine by 40%):
    the probe re-runs up to 3 attempts when (a) the 5-shot timing spread
    exceeds 10% of the median, or (b) the measured rate sits >20% below
    the persisted per-device-kind calibration (.bench_calib.json, a
    running max of clean runs). If every attempt fails both checks, the
    run is ANNOTATED with "contaminated" in every roofline dict rather
    than silently reported.
    """
    global _ACHIEVABLE, _CONTAMINATED
    if _ACHIEVABLE is not None:
        return _ACHIEVABLE
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    kind = getattr(dev, "device_kind", "cpu")
    # reps amortize the one host sync per timed call: over the tunnel the
    # device->host scalar fetch costs ~10 ms RTT, which at 8 reps (~10 ms
    # of GEMM work) halves the apparent rate — 64 reps push that below 5%.
    n, reps = (4096, 64) if on_tpu else (1024, 4)
    dt_ = jnp.bfloat16 if on_tpu else jnp.float32
    a = jnp.ones((n, n), dt_)
    b = jnp.ones((n, n), dt_)

    @jax.jit
    def gemm_loop(a, b):
        def body(_, x):
            return jnp.tanh(x @ b)  # tanh breaks trivial CSE

        return jax.lax.fori_loop(0, reps, body, a)

    float(jnp.sum(gemm_loop(a, b).astype(jnp.float32)))  # compile+warm
    persisted = _load_calib(kind)
    best_ach, best_reason = 0.0, None
    for attempt in range(3):
        # Median of 5 timed runs: a single shot over the tunnel swings up
        # to 3x run-to-run (BENCH_r02 measured 34 TF/s vs EXPERIMENTS.md's
        # 102 TF/s for the same probe).
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = gemm_loop(a, b)
            float(jnp.sum(out.astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        spread = (max(times) - min(times)) / med
        ach = (2 * n**3 * reps) / med
        reason = None
        if spread > 0.10:
            reason = f"gemm-probe timing spread {spread:.0%} (>10%): " \
                     "concurrent load on the chip"
        elif persisted is not None and ach < 0.8 * persisted * 1e12:
            reason = (
                f"measured {ach/1e12:.1f} TF/s is {1 - ach/(persisted*1e12):.0%} "
                f"below the persisted calibration {persisted:.1f} TF/s"
            )
        if ach > best_ach:
            best_ach, best_reason = ach, reason
        if reason is None:
            best_ach, best_reason = ach, None
            break
        time.sleep(2.0)
    load, host_reason = _host_load_check()
    if best_reason is None and host_reason is None and on_tpu:
        _store_calib(kind, best_ach / 1e12)
    _CONTAMINATED = best_reason or host_reason
    if best_reason is not None:
        print(f"WARNING: bench contaminated: {best_reason}", file=sys.stderr)
        # report against the persisted clean ceiling, not the depressed
        # probe — vs_achievable then honestly shows the (contaminated)
        # workload against the chip's true capability
        if persisted is not None:
            best_ach = max(best_ach, persisted * 1e12)
    # Sanity bound: a measured GEMM cannot beat the chip's nominal peak.
    peak = _peak_flops(dev)
    _ACHIEVABLE = min(best_ach, peak)
    return _ACHIEVABLE


def _roofline(flops: float, dt: float) -> dict:
    """vs_baseline (nominal peak) + vs_achievable (measured GEMM ceiling).

    The calibration value itself is persisted into the JSON
    (achievable_tflops) so the roofline is auditable from the artifact. If
    a real workload measures faster than the GEMM probe, the probe run was
    the bad sample — the ceiling is raised to the workload's own rate
    (recorded via calib_raised) so vs_achievable <= 1 by construction.
    """
    global _ACHIEVABLE
    import jax

    peak = _peak_flops(jax.devices()[0])
    rate = flops / dt if np.isfinite(flops) and flops > 0 else 0.0
    ach = _achievable_flops()
    raised = False
    if rate > ach:
        _ACHIEVABLE = ach = min(rate, peak)
        raised = True
    out = {
        "tflops": round(rate / 1e12, 2),
        "vs_baseline": round(rate / peak, 4),
        "vs_achievable": round(rate / ach, 4) if ach > 0 else 0.0,
        "achievable_tflops": round(ach / 1e12, 2),
    }
    if raised:
        out["calib_raised"] = True
    if _CONTAMINATED is not None:
        out["contaminated"] = _CONTAMINATED
    assert out["vs_achievable"] <= 1.05, out
    return out


def _cost_flops(compiled) -> float:
    try:
        return float(compiled.cost_analysis()["flops"])
    except Exception:
        return float("nan")


def bench_matcher(batch: int = 8, iters: int = 30) -> dict:
    import jax

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.models import OnePoseMatcher

    cfg = cfg_lib.adapt_dtypes(cfg_lib.MatcherConfig())
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
    return {
        "metric": f"matcher2d3d_forward_fps_1chip_b{batch}_512px_7040pts",
        "value": round(fps, 2),
        "unit": "frames/s",
        **_roofline(flops, dt),
    }


def bench_train(batch: int = 8, image: int = 256, iters: int = 20) -> dict:
    """Full-size matcher training-step throughput (fwd+bwd+optimizer)."""
    import jax
    import jax.numpy as jnp

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.models import OnePoseMatcher
    from onepose_st_tpu.train import step as step_lib

    cfg = cfg_lib.adapt_dtypes(cfg_lib.EngineConfig())
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
    flops = _cost_flops(
        jitted.lower(
            state, batch_dev, jax.random.key(1), model=model, tx=tx, cfg=cfg
        ).compile()
    )
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
        **_roofline(flops, dt),
    }


def bench_train_profile(batch: int = 8, image: int = 256, iters: int = 20) -> dict:
    """Segment attribution for the train step (VERDICT r3 weak #4: MFU 0.30
    — name where the other 70% goes before writing kernels).

    Times three jitted programs:
      full        — the real train step (fwd+bwd+optimizer);
      tokens      — fwd+bwd of backbone + encodings + coarse transformer
                    only (model.coarse_tokens seam);
      dsmax_focal — fwd+bwd of dual-softmax + focal loss alone, on fixed
                    token-shaped inputs (grad wrt tokens) — the segment a
                    fused Pallas custom-VJP kernel would replace.
    """
    import jax
    import jax.numpy as jnp

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.models import OnePoseMatcher
    from onepose_st_tpu.models.matcher2d3d import OnePoseMatcher as OPM
    from onepose_st_tpu.ops import matching as match_ops
    from onepose_st_tpu.train import losses, step as step_lib

    cfg = cfg_lib.adapt_dtypes(cfg_lib.EngineConfig())
    model = OnePoseMatcher(cfg.matcher)
    rng = np.random.default_rng(0)
    B, H, W, L = batch, image, image, cfg.matcher.n_points
    S = (H // cfg.matcher.backbone.coarse_stride) ** 2
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

    def timed(fn, *args, **kw):
        """Queue `iters` dispatches, then fetch ONE scalar: on the tunneled
        axon platform block_until_ready does not reliably block, so every
        timed program must end in a device scalar that the host fetches
        (the established pattern in this harness)."""
        float(fn(*args, **kw))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            cs = fn(*args, **kw)
        float(cs)
        return (time.perf_counter() - t0) / iters

    # 1. full step (fixed inputs; the returned scalar forces the whole
    # step including the optimizer update via the loss fetch plus a
    # parameter checksum)
    jitted0 = jax.jit(step_lib.train_step, static_argnames=("model", "tx", "cfg"))

    @jax.jit
    def full_step_cs(state, batch, key):
        new_state, scalars = jitted0(state, batch, key, model=model, tx=tx, cfg=cfg)
        leaves = jax.tree.leaves(new_state.params)
        return scalars["loss"] + sum(
            jnp.sum(x.astype(jnp.float32)) for x in leaves[:4]
        )

    t_full = timed(full_step_cs, state, batch_dev, jax.random.key(1))

    # 2. tokens-only fwd+bwd
    def tokens_loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch_dev.query_image, batch_dev.kpts3d, batch_dev.desc3d_coarse,
            batch_dev.point_mask,
            train=True, mutable=["batch_stats"],
            method=OPM.coarse_tokens,
        )
        q, p, ff, _hw = out
        return (
            jnp.sum(q.astype(jnp.float32)) + jnp.sum(p.astype(jnp.float32))
            + jnp.sum(ff.astype(jnp.float32))
        )

    @jax.jit
    def tokens_cs(params):
        g = jax.grad(tokens_loss)(params)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g)[:8])

    t_tokens = timed(tokens_cs, state.params)

    # 3. dual-softmax + focal alone (token-shaped inputs, grad wrt tokens)
    dt_tok = jnp.dtype(cfg.matcher.coarse.dtype)
    p_tok = jnp.asarray(rng.normal(size=(B, L, 256)), dt_tok)
    q_tok = jnp.asarray(rng.normal(size=(B, S, 256)), dt_tok)
    gt_j = jnp.asarray(rng.integers(0, S, size=(B, L)), jnp.int32)
    gt_valid = jnp.asarray(rng.uniform(size=(B, L)) < 0.3)
    pmask = jnp.ones((B, L), bool)

    def ds_focal(p, q):
        conf = match_ops.dual_softmax(
            p, q, temperature=cfg.matcher.coarse_matching.temperature,
            mask0=pmask,
        )
        return losses.coarse_focal_loss(
            conf, gt_j, gt_valid, pmask, cfg.train.loss
        )

    @jax.jit
    def ds_cs(p, q):
        gp, gq = jax.grad(ds_focal, argnums=(0, 1))(p, q)
        return jnp.sum(gp.astype(jnp.float32)) + jnp.sum(gq.astype(jnp.float32))

    t_ds = timed(ds_cs, p_tok, q_tok)

    return {
        "metric": f"train_profile_b{batch}_{image}px",
        "value": round(t_full * 1e3, 2),
        "unit": "ms/step",
        "full_ms": round(t_full * 1e3, 2),
        "tokens_fwd_bwd_ms": round(t_tokens * 1e3, 2),
        "dsmax_focal_fwd_bwd_ms": round(t_ds * 1e3, 2),
        "rest_ms": round((t_full - t_tokens - t_ds) * 1e3, 2),
        "vs_baseline": 0.0,
    }


def bench_fwd_profile(batch: int = 8, image: int = 512, iters: int = 30) -> dict:
    """Stage attribution for the INFERENCE forward (VERDICT r4 weak #7:
    vs_achievable plateaued at 0.66-0.72 with no analysis of the rest).

    Times four jitted programs at flagship geometry and reports each
    stage's FLOP rate against the measured-achievable GEMM ceiling:
      backbone      — ResNet-FPN alone
      coarse_tokens — backbone + encodings + coarse transformer
      coarse_full   — + fused dual-softmax extraction
      full          — + fine stage (the shipped forward)
    """
    import jax
    import jax.numpy as jnp

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.models import OnePoseMatcher
    from onepose_st_tpu.models.matcher2d3d import OnePoseMatcher as OPM

    cfg = cfg_lib.adapt_dtypes(cfg_lib.MatcherConfig())
    model = OnePoseMatcher(cfg)
    rng = np.random.default_rng(0)
    B, H, W, L = batch, image, image, cfg.n_points
    img = jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32))
    kpts = jnp.asarray(rng.uniform(-0.1, 0.1, size=(B, L, 3)).astype(np.float32))
    dc = jnp.asarray(rng.normal(size=(B, L, 256)).astype(np.float32))
    df = jnp.asarray(rng.normal(size=(B, L, 128)).astype(np.float32))
    mask = jnp.ones((B, L), dtype=bool)
    variables = jax.jit(model.init)(jax.random.key(0), img, kpts, dc, df, mask)

    def timed_flops(fn, *args):
        jitted = jax.jit(fn)
        flops = _cost_flops(jitted.lower(*args).compile())
        float(jitted(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            cs = jitted(*args)
        float(cs)
        return (time.perf_counter() - t0) / iters, flops

    def backbone_only(v, im):
        fc, ff = model.apply(v, im, train=False,
                             method=lambda m, i, train: m.backbone(i, train))
        return jnp.sum(fc.astype(jnp.float32)) + jnp.sum(ff.astype(jnp.float32))

    def tokens(v, im, k_, dc_, m_):
        q, p, ff, _hw = model.apply(v, im, k_, dc_, m_,
                                    method=OPM.coarse_tokens)
        return (jnp.sum(q.astype(jnp.float32)) + jnp.sum(p.astype(jnp.float32))
                + jnp.sum(ff.astype(jnp.float32)))

    def coarse_full(v, im, k_, dc_, m_):
        out = model.apply(v, im, k_, dc_, m_, method=OPM.coarse)
        m = out["matches"]
        return (jnp.sum(m.conf) + jnp.sum(m.i_ids)
                + jnp.sum(out["feat_f"].astype(jnp.float32)))

    def full(v, im, k_, dc_, df_, m_):
        out = model.apply(v, im, k_, dc_, df_, m_)
        return (jnp.sum(out["mkpts_query_f"]) + jnp.sum(out["matches"].conf)
                + jnp.sum(out["mkpts3d"]))

    t_bb, f_bb = timed_flops(backbone_only, variables, img)
    t_tok, f_tok = timed_flops(tokens, variables, img, kpts, dc, mask)
    t_cf, f_cf = timed_flops(coarse_full, variables, img, kpts, dc, mask)
    t_full, f_full = timed_flops(full, variables, img, kpts, dc, df, mask)

    ach = _achievable_flops()
    def row(t, f):
        return {
            "ms": round(t * 1e3, 2),
            "tflops": round(f / t / 1e12, 1) if np.isfinite(f) else None,
            "vs_achievable": round(f / t / ach, 3) if np.isfinite(f) else None,
        }

    out = {
        "metric": f"fwd_profile_b{batch}_{image}px",
        "value": round(t_full * 1e3, 2),
        "unit": "ms/fwd",
        "backbone": row(t_bb, f_bb),
        "coarse_tokens": row(t_tok, f_tok),
        "coarse_full": row(t_cf, f_cf),
        "full": row(t_full, f_full),
        "attn_ms": round((t_tok - t_bb) * 1e3, 2),
        "dsmax_extract_ms": round((t_cf - t_tok) * 1e3, 2),
        "fine_ms": round((t_full - t_cf) * 1e3, 2),
        "achievable_tflops": round(ach / 1e12, 2),
        "vs_baseline": 0.0,
    }
    if _CONTAMINATED is not None:
        out["contaminated"] = _CONTAMINATED
    return out


def bench_conv_ceiling(batch: int = 8, iters: int = 50) -> dict:
    """Per-shape conv ceiling probe for the backbone roofline argument
    (VERDICT r4 weak #7 follow-up to fwd_profile).

    fwd_profile attributes the forward's 0.67 vs_achievable to the
    ResNet-FPN (24.9 of 36.1 ms at 0.681, while the coarse transformer
    stage runs at 0.808). This mode times ISOLATED lax convs at the
    backbone's dominant shapes (b8/512 px flagship geometry,
    backbone.py:94-117) in the same bf16-compute/f32-param regime, plus
    an iso-FLOP bf16 GEMM as the MXU reference. If the isolated convs
    match the full backbone's rate, the gap to the GEMM ceiling is XLA's
    conv lowering at these shapes — a compiler ceiling, not a graph
    inefficiency we can fuse away.
    """
    import jax
    import jax.numpy as jnp

    B = batch
    d1, d2, d3 = 128, 196, 256
    shapes = [
        # (name, H, W, Cin, Cout, k, stride)
        ("stem_7x7_1to128_s2", 512, 512, 1, 128, 7, 2),
        ("s1_3x3_128_at256", 256, 256, d1, d1, 3, 1),
        ("s2_3x3_196_at128", 128, 128, d2, d2, 3, 1),
        ("s3_3x3_256_at64", 64, 64, d3, d3, 3, 1),
        ("fpn_3x3_196_at256", 256, 256, d2, d2, 3, 1),
        ("fpn_3x3_196to128_at256", 256, 256, d2, d1, 3, 1),
    ]
    rng = np.random.default_rng(0)
    rows = {}
    total_t, total_f = 0.0, 0.0

    def timed(fn, *args):
        jitted = jax.jit(fn)
        flops = _cost_flops(jitted.lower(*args).compile())
        jitted(*args).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jitted(*args)
        out.block_until_ready()
        return (time.perf_counter() - t0) / iters, flops

    ach = _achievable_flops()
    for name, H, W, cin, cout, k, stride in shapes:
        # bf16-resident inputs, like the real backbone's inter-layer
        # activations (an f32 input would double the HBM read traffic and
        # unfairly depress these bandwidth-capped shapes)
        x = jnp.asarray(rng.normal(size=(B, H, W, cin)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        w = jnp.asarray(
            rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16)

        def conv(x_, w_):
            y = jax.lax.conv_general_dilated(
                x_, w_,
                window_strides=(stride, stride), padding=[(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jnp.maximum(y, 0)  # keep the fused epilogue realistic

        t, f = timed(conv, x, w)
        rows[name] = {
            "ms": round(t * 1e3, 3),
            "tflops": round(f / t / 1e12, 1),
            "vs_achievable": round(f / t / ach, 3),
        }
        total_t += t
        total_f += f

    # iso-FLOP GEMM reference: same total FLOPs as one s1 conv
    M = B * 256 * 256
    K = 9 * d1
    gA = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
    gB = jnp.asarray(rng.normal(size=(K, d1)).astype(np.float32)).astype(jnp.bfloat16)

    def gemm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.bfloat16)

    tg, fg = timed(gemm, gA, gB)
    rows["iso_gemm_im2col_s1"] = {
        "ms": round(tg * 1e3, 3),
        "tflops": round(fg / tg / 1e12, 1),
        "vs_achievable": round(fg / tg / ach, 3),
    }

    out = {
        "metric": f"conv_ceiling_b{batch}_512px",
        "value": round(total_f / total_t / 1e12, 1),
        "unit": "TFLOP/s (flop-weighted over backbone conv shapes)",
        "vs_achievable": round(total_f / total_t / ach, 3),
        "achievable_tflops": round(ach / 1e12, 2),
        "vs_baseline": 0.0,
        **rows,
    }
    if _CONTAMINATED is not None:
        out["contaminated"] = _CONTAMINATED
    return out


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
    import jax

    jitted_ba = jax.jit(solve_depth_ba, static_argnames=("max_iters",))
    flops = _cost_flops(
        jitted_ba.lower(depth0, prob, max_iters=32).compile()
    )
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
        **_roofline(flops, dt),
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

    cfg = cfg_lib.adapt_dtypes(cfg_lib.EngineConfig())
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
    flops = _cost_flops(
        jitted.lower(
            variables, img, kpts, dc, df, mask, K, jax.random.key(0)
        ).compile()
    )
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
        **_roofline(flops, dt),
    }


def bench_closed_loop_real(n_frames: int = 40, image: int = 512) -> dict:
    """The ACTUAL closed-loop path: PoseEstimator.estimate per frame —
    previous-pose box projection, host crop/warp, fused matcher+PnP device
    program, single batched result fetch. bench_pipeline measures only the
    fused device program; this drives the full state machine the way
    examples/full_frame_e2e.py does (detector tracking path re-seeded with
    the GT pose each frame so random weights cannot derail the path under
    test). Also reports the detector cold-start latency and the host/device
    time split per tracked frame.
    """
    import jax
    import jax.numpy as jnp

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.core import camera
    from onepose_st_tpu.data import synthetic
    from onepose_st_tpu.infer.detector import DetectorDB, ObjectDetector
    from onepose_st_tpu.infer.pipeline import PoseEstimator
    from onepose_st_tpu.models import LoFTRMatcher, OnePoseMatcher
    from onepose_st_tpu.sfm.map import SfMMap

    rng = np.random.default_rng(0)
    cfg = cfg_lib.adapt_dtypes(cfg_lib.EngineConfig())
    wild = synthetic.make_wild_scene(
        rng, n_points=200, n_bg=200, n_frames=n_frames,
        image_hw=(image, image),
    )
    frames = synthetic.render_wild_sequence(wild, rng, sigma_px=2.0)
    scene = wild.scene
    ext = np.array([0.22, 0.22, 0.22], np.float32)
    corners = np.asarray(camera.box3d_corners(jnp.asarray(ext)))

    n_map = 2000
    sfm_map = SfMMap(
        keypoints3d=rng.uniform(-0.1, 0.1, size=(n_map, 3)).astype(np.float32),
        desc_coarse=rng.normal(size=(n_map, 256)).astype(np.float32),
        desc_fine=rng.normal(size=(n_map, 128)).astype(np.float32),
        scores=np.ones(n_map, np.float32),
        box_corners=corners,
    )
    model = OnePoseMatcher(cfg.matcher)
    crop_hw = (256, 256)
    L = cfg.matcher.n_points
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, *crop_hw, 1)),
        jnp.zeros((1, L, 3)), jnp.zeros((1, L, 256)), jnp.zeros((1, L, 128)),
        jnp.ones((1, L), bool),
    )
    loftr = LoFTRMatcher(cfg_lib.adapt_dtypes(cfg_lib.LoFTRConfig()))
    db_ids = np.arange(0, n_frames, max(1, n_frames // 8))[:8]
    boxes = []
    for f in db_ids:
        uv, _ = camera.project(
            jnp.asarray(corners), jnp.asarray(scene.poses[f]),
            jnp.asarray(scene.Ks[f]),
        )
        boxes.append(np.asarray(camera.bbox_from_points(uv)))
    db = DetectorDB(images=frames[db_ids], boxes=np.stack(boxes).astype(np.float32))
    lvars = jax.jit(loftr.init)(
        jax.random.key(1), jnp.asarray(frames[:1, ..., None]),
        jnp.asarray(frames[:1, ..., None]),
    )
    detector = ObjectDetector(loftr, lvars, db, crop_hw=crop_hw)
    est = PoseEstimator(cfg, model, variables, sfm_map, detector)

    # warm both paths (compiles the fused program + the detector batch)
    est.estimate(frames[0], scene.Ks[0], frame_idx=0)
    est._prev_pose = scene.poses[0].copy()
    est._lost = False
    est.estimate(frames[0], scene.Ks[0], frame_idx=0)

    # cold-start latency (detector.detect path)
    est.reset()
    t0 = time.perf_counter()
    est.estimate(frames[0], scene.Ks[0], frame_idx=0)
    cold_ms = (time.perf_counter() - t0) * 1e3

    # tracked-path frames/s (the dominant path: 70/80 frames in the e2e
    # log). Frames arrive as uint8, as a real camera delivers them — the
    # crop then uploads at 1/4 the f32 bytes and normalizes on device.
    frames = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    # warm pass: every jit signature the loop can hit (uint8 crop x
    # {cached all-true, per-frame} visibility mask) compiles here, not in
    # the timed pass
    for f in range(n_frames):
        est._prev_pose = scene.poses[f].copy()
        est._lost = False
        est.estimate(frames[f], scene.Ks[f], frame_idx=f)
    t0 = time.perf_counter()
    for f in range(n_frames):
        est._prev_pose = scene.poses[f].copy()
        est._lost = False
        est.estimate(frames[f], scene.Ks[f], frame_idx=f)
    dt = (time.perf_counter() - t0) / n_frames

    # host-side breakdown (separate pass so instrumentation cannot perturb
    # the timed loop): where do the ~31 host ms/frame go?
    from collections import defaultdict

    est._timers = defaultdict(list)
    t_prep = []
    for f in range(n_frames):
        est._prev_pose = scene.poses[f].copy()
        est._lost = False
        t0p = time.perf_counter()
        prep = est._prep(frames[f], scene.Ks[f], f)
        t_prep.append(time.perf_counter() - t0p)
        crop, K_crop, A3, tracked, _ = prep
        est._drain(est._dispatch(
            crop, K_crop, A3, tracked, f, frames[f].shape[:2]
        ))
    breakdown = {
        k: round(float(np.median(v)) * 1e3, 2)
        for k, v in est._timers.items()
    }
    breakdown["prep_detect_crop"] = round(float(np.median(t_prep)) * 1e3, 2)
    est._timers = None

    # one-frame-lag pipelined sequence driver (host prep + dispatch of t+1
    # overlap device exec + fetch of t). Random bench weights would fail
    # every frame and trigger the loss-recovery redo path each time, so the
    # drain is pinned to the tracked path — exactly like the sequential
    # loop above force-seeds the GT pose per frame.
    orig_drain = est._drain
    fidx = {"i": 0}

    def drain_pinned(pending):
        r = orig_drain(pending)
        pose = scene.poses[min(fidx["i"], n_frames - 1)].copy()
        est._prev_pose = pose
        fidx["i"] += 1
        est._lost = False
        # pin pose6 too: the box-divergence guard compares the box the
        # in-flight frame used against the box THIS pose would give — a
        # garbage random-weights pose would force a re-dispatch every
        # frame and measure the worst case instead of the tracked path
        return r._replace(success=True, pose6=pose)

    est._drain = drain_pinned
    est._prev_pose = scene.poses[0].copy()
    est._lost = False
    est.run_sequence(frames[:4], scene.Ks[:4])  # warm
    est._prev_pose = scene.poses[0].copy()
    est._lost = False
    fidx["i"] = 0
    t0 = time.perf_counter()
    est.run_sequence(frames, scene.Ks)
    dt_pipe = (time.perf_counter() - t0) / n_frames
    est._drain = orig_drain

    # device-only time of the same fused program (host share = rest)
    det = detector.previous_pose_detect(
        scene.poses[0], scene.Ks[0], corners
    )
    crop, K_crop, _ = detector.crop(frames[0], det, scene.Ks[0])
    kpts, dc, df, mask = est._cloud
    args = (variables, jnp.asarray(crop[None, ..., None]), kpts, dc, df,
            mask, jnp.asarray(K_crop), jax.random.key(0))
    jax.device_get(est._fwd_pnp(*args))
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = est._fwd_pnp(*args)
    jax.device_get(out)
    dev_ms = (time.perf_counter() - t0) / reps * 1e3

    out = {
        "metric": f"closed_loop_real_fps_1chip_{image}px_tracked",
        "value": round(1.0 / dt, 2),
        "unit": "frames/s",
        "pipelined_fps": round(1.0 / dt_pipe, 2),
        "device_ms": round(dev_ms, 1),
        "host_ms": round(dt * 1e3 - dev_ms, 1),
        "host_breakdown_ms": breakdown,
        "cold_start_ms": round(cold_ms, 1),
        "vs_baseline": round(1.0 / dt / 21.5, 4),  # vs the fused-program-only
                                                   # bench_pipeline fps
    }
    _achievable_flops()  # runs the contamination probe if not yet run
    # re-check host load NOW: in `all` mode the probe ran minutes ago, and
    # this metric is the most host-bound one
    load, host_reason = _host_load_check()
    out["host_load"] = round(load, 2)
    reason = _CONTAMINATED or host_reason
    if reason is not None:
        out["contaminated"] = reason
    return out


def bench_scaling(batch_per_dev: int = 8, iters: int = 20) -> list[dict]:
    """Multi-device scaling: matcher forward + sharded depth-BA over a
    1..N-device mesh, at FLAGSHIP model dims (d=256, 3x(self,cross),
    L=7040 points — reduced batch/image is fine, toy dims are not).

    Efficiency definition depends on the platform:
      * real multi-chip TPU: weak scaling — fps(n) / (n * fps(1)) with
        batch_per_dev per device (BASELINE.md >=80% target at N>=2 hosts);
      * CPU proxy (8 virtual devices on a shared host, tests/dryrun): the
        virtual devices share the same physical cores, so aggregate
        throughput CANNOT scale with n and weak-scaling efficiency would
        be bounded by n_cores/n regardless of the code. What the proxy CAN
        honestly measure is SHARDING OVERHEAD: the same total batch run on
        a 1-device mesh vs sharded over n devices — efficiency =
        fps_sharded(n) / fps_single at fixed total work. Collectives,
        partitioning and per-shard dispatch are the only difference.
    """
    import jax
    import jax.numpy as jnp

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.data import synthetic
    from onepose_st_tpu.models import OnePoseMatcher
    from onepose_st_tpu.parallel import make_mesh, mesh as mesh_lib
    from onepose_st_tpu.sfm.ba.distributed import solve_bundle_sharded

    n_dev_all = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev_all]
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        batch_per_dev = min(batch_per_dev, 1)
        iters = min(iters, 2)
    # flagship dims on every platform; image reduced off-TPU to bound the
    # 2-core proxy wall clock
    cfg = cfg_lib.adapt_dtypes(cfg_lib.MatcherConfig())
    model = OnePoseMatcher(cfg)
    rng = np.random.default_rng(0)
    H = W = 512 if on_tpu else 128
    L = cfg.n_points
    out: list[dict] = []

    # --- matcher forward scaling ------------------------------------------
    # fixed TOTAL batch across mesh sizes on CPU (sharding-overhead proxy);
    # per-device batch on TPU (weak scaling)
    B_fixed = batch_per_dev * max(sizes)
    base_fps = None
    variables0 = None
    for n in sizes:
        mesh = make_mesh(n)
        B = batch_per_dev * n if on_tpu else B_fixed
        img = rng.uniform(size=(B, H, W, 1)).astype(np.float32)
        kpts = rng.uniform(-0.1, 0.1, size=(B, L, 3)).astype(np.float32)
        dc = rng.normal(size=(B, L, cfg.coarse.d_model)).astype(np.float32)
        df = rng.normal(size=(B, L, cfg.fine.d_model)).astype(np.float32)
        mask = np.ones((B, L), bool)
        if variables0 is None:
            variables0 = jax.jit(model.init)(
                jax.random.key(0), jnp.asarray(img[:1]), jnp.asarray(kpts[:1]),
                jnp.asarray(dc[:1]), jnp.asarray(df[:1]), jnp.asarray(mask[:1]),
            )
        variables = mesh_lib.replicate_pytree(variables0, mesh)
        spec = mesh_lib.shard_batch(mesh)
        args = [
            jax.device_put(jnp.asarray(a), spec(a))
            for a in (img, kpts, dc, df, mask)
        ]

        def fwd(v, img, kpts, dc, df, mask):
            o = model.apply(v, img, kpts, dc, df, mask)
            return (
                jnp.sum(o["mkpts_query_f"]) + jnp.sum(o["matches"].conf)
            )

        fwd_jit = jax.jit(fwd)
        float(fwd_jit(variables, *args))
        t0 = time.perf_counter()
        for _ in range(iters):
            cs = fwd_jit(variables, *args)
        float(cs)
        dt = (time.perf_counter() - t0) / iters
        fps = B / dt
        if base_fps is None:
            base_fps = fps
        eff = fps / (n * base_fps) if on_tpu else fps / base_fps
        out.append({
            "metric": f"scaling_matcher_fwd_fps_{n}dev_B{B}",
            "value": round(fps, 2),
            "unit": "frames/s",
            "n_devices": n,
            "efficiency": round(eff, 4),
            "efficiency_def": "weak_scaling" if on_tpu else "sharding_overhead_fixed_work",
            "vs_baseline": round(eff, 4),
        })

    # --- no-collectives per-device control (CPU proxy only) ---------------
    # Attributes the sharded-run efficiency by measurement (round-3 weak #6):
    # the same total work is run as n SEQUENTIAL single-device jit calls of
    # batch B_fixed/n — no mesh, no collectives, no concurrent shards. If
    # this control's efficiency matches the sharded run's, the loss is the
    # small-batch kernel effect on the shared-core proxy, not sharding
    # overhead; any gap between control and sharded IS the sharding cost.
    if not on_tpu:
        mesh1 = make_mesh(1)
        for n in sizes:
            if B_fixed % n:
                continue
            Bc = B_fixed // n
            img = rng.uniform(size=(Bc, H, W, 1)).astype(np.float32)
            kpts = rng.uniform(-0.1, 0.1, size=(Bc, L, 3)).astype(np.float32)
            dc = rng.normal(size=(Bc, L, cfg.coarse.d_model)).astype(np.float32)
            df = rng.normal(size=(Bc, L, cfg.fine.d_model)).astype(np.float32)
            mask = np.ones((Bc, L), bool)
            args = [jnp.asarray(a) for a in (img, kpts, dc, df, mask)]

            def fwd(v, img, kpts, dc, df, mask):
                o = model.apply(v, img, kpts, dc, df, mask)
                return (
                    jnp.sum(o["mkpts_query_f"]) + jnp.sum(o["matches"].conf)
                )

            fwd_jit = jax.jit(fwd)
            float(fwd_jit(variables0, *args))
            t0 = time.perf_counter()
            for _ in range(iters):
                cs = [fwd_jit(variables0, *args) for _ in range(n)]
            float(sum(float(c) for c in cs))
            dt = (time.perf_counter() - t0) / iters
            fps = B_fixed / dt
            eff = fps / base_fps
            out.append({
                "metric": f"scaling_matcher_fwd_CONTROL_seq_{n}x_b{Bc}",
                "value": round(fps, 2),
                "unit": "frames/s",
                "n_devices": 1,
                "chunks": n,
                "efficiency": round(eff, 4),
                "efficiency_def": "no_collectives_sequential_chunks_fixed_work",
                "vs_baseline": round(eff, 4),
            })

    # --- sharded bundle-adjustment scaling --------------------------------
    # reference map scale (15k tracks, sfm_demo.yaml:17) on every platform
    n_ba = 15000
    scene = synthetic.make_scene(rng, n_points=n_ba, n_frames=32)
    tracks = synthetic.make_tracks(scene, rng, max_track_length=8, noise_px=0.5)
    T = len(tracks.depth_gt)
    obs_frame = np.concatenate(
        [tracks.ref_idx[:, None], tracks.obs_idx], axis=1
    )
    obs_uv = np.concatenate([tracks.kpt0[:, None], tracks.kpt1], axis=1)
    obs_mask = np.concatenate([np.ones((T, 1), bool), tracks.mask], axis=1)
    pts0 = scene.points + rng.normal(size=scene.points.shape).astype(np.float32) * 0.002
    fixed = np.zeros(len(scene.poses), bool)
    fixed[:2] = True
    from onepose_st_tpu.sfm.ba.bundle import BundleProblem

    prob = BundleProblem(
        Ks=jnp.asarray(scene.Ks),
        obs_frame=jnp.asarray(obs_frame),
        obs_uv=jnp.asarray(obs_uv),
        obs_mask=jnp.asarray(obs_mask),
        fixed_pose=jnp.asarray(fixed),
        huber_px=4.0,
    )
    base_tps = None
    for n in sizes:
        mesh = make_mesh(n)
        t_sol = None
        for rep in range(3 if on_tpu else 2):
            t0 = time.perf_counter()
            poses_new, pts_new, info = solve_bundle_sharded(
                jnp.asarray(scene.poses), jnp.asarray(pts0), prob,
                mesh, max_iters=10,
            )
            float(info.final_cost)
            dt = time.perf_counter() - t0
            t_sol = dt if t_sol is None else min(t_sol, dt)
        tps = T / t_sol
        if base_tps is None:
            base_tps = tps
        # fixed problem size: strong scaling on real chips; on the shared-
        # core CPU proxy the honest number is sharding overhead (flat ideal)
        eff = tps / (n * base_tps) if on_tpu else tps / base_tps
        out.append({
            "metric": f"scaling_sharded_ba_tracks_per_s_{n}dev_T{T}",
            "value": round(tps, 1),
            "unit": "tracks/s",
            "n_devices": n,
            "efficiency": round(eff, 4),
            "efficiency_def": "strong_scaling" if on_tpu else "sharding_overhead_fixed_work",
            "vs_baseline": round(eff, 4),
        })
    return out


def main():
    import os

    if os.environ.get("BENCH_CPU_PROXY"):
        # the container's sitecustomize imports jax at interpreter start, so
        # JAX_PLATFORMS in the env is too late — force the CPU proxy here
        # (same mechanism as tests/conftest.py)
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    from onepose_st_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "matcher"
    if which == "matcher":
        result = bench_matcher()
    elif which == "matcher16":
        result = bench_matcher(batch=16)
    elif which == "train":
        result = bench_train()
    elif which == "train_profile":
        result = bench_train_profile()
    elif which == "fwd_profile":
        result = bench_fwd_profile()
    elif which == "conv_ceiling":
        result = bench_conv_ceiling()
    elif which == "depth_ba":
        result = bench_depth_ba()
    elif which == "pipeline":
        result = bench_pipeline()
    elif which == "closed_loop_real":
        result = bench_closed_loop_real()
    elif which == "scaling":
        for r in bench_scaling():
            print(json.dumps(r))
        return
    elif which == "all":
        for r in (
            bench_matcher(), bench_matcher(batch=16), bench_train(),
            bench_depth_ba(), bench_pipeline(), bench_closed_loop_real(),
        ):
            print(json.dumps(r))
        return
    else:
        raise SystemExit(f"unknown bench: {which}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
