"""Profiling: named wall-time scopes + jax device traces.

TPU-native replacement for reference src/utils/profiler.py (Lightning
PassThroughProfiler / SimpleProfiler / PyTorchProfiler): the same
"record scopes, print a summary" workflow, with `device_trace` producing a
TensorBoard-loadable XPlane trace via jax.profiler instead of NVTX.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PassThroughProfiler:
    """No-op profiler (default), matching the reference's interface."""

    @contextlib.contextmanager
    def scope(self, name: str):
        yield

    def summary(self) -> str:
        return ""


class SimpleProfiler(PassThroughProfiler):
    """Wall-time per named scope, host side.

    Blocks on outstanding device work at scope exit so device time is
    attributed to the scope that launched it.
    """

    def __init__(self, sync_device: bool = True):
        self.times: dict[str, list[float]] = defaultdict(list)
        self.sync = sync_device

    @contextlib.contextmanager
    def scope(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                try:
                    (jax.device_put(0.0) + 0).block_until_ready()
                except Exception:
                    pass
            self.times[name].append(time.perf_counter() - t0)

    def summary(self) -> str:
        rows = ["| scope | calls | total s | mean ms |", "|---|---|---|---|"]
        for name, ts in sorted(
            self.times.items(), key=lambda kv: -sum(kv[1])
        ):
            rows.append(
                f"| {name} | {len(ts)} | {sum(ts):.3f} | "
                f"{1000 * sum(ts) / len(ts):.2f} |"
            )
        return "\n".join(rows)


class AdvancedProfiler(PassThroughProfiler):
    """cProfile per named scope (reference src/utils/profiler.py:196 —
    Lightning AdvancedProfiler). Host-side Python cost only; pair with
    `device_trace` for device time."""

    def __init__(self, top: int = 20):
        import cProfile

        self._cProfile = cProfile
        self.profilers: dict = {}
        self.top = top

    @contextlib.contextmanager
    def scope(self, name: str):
        pr = self.profilers.setdefault(name, self._cProfile.Profile())
        pr.enable()
        try:
            yield
        finally:
            pr.disable()

    def summary(self) -> str:
        import io
        import pstats

        parts = []
        for name, pr in self.profilers.items():
            buf = io.StringIO()
            stats = pstats.Stats(pr, stream=buf)
            stats.sort_stats("cumulative").print_stats(self.top)
            parts.append(f"Profile of scope '{name}':\n{buf.getvalue()}")
        return "\n".join(parts)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax/XLA profiler trace (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation  # named host scope inside traces
