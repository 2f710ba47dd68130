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


def main():
    from onepose_st_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "matcher"
    if which == "matcher":
        result = bench_matcher()
    else:
        raise SystemExit(f"unknown bench: {which}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
