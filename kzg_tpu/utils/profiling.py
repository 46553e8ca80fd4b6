"""Per-kernel timing metrics and profiler hooks (SURVEY.md §5 observability:
the reference only has Criterion benches; here kernels self-report).

Usage:
    from kzg_tpu.utils.profiling import timed, report
    with timed("commit_msm"):
        out = msm_g1(...)
    ...
    report()   # logs aggregate timings

Enable JAX profiler traces with KZG_TPU_TRACE_DIR=/path (viewable in
TensorBoard / Perfetto).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from collections import defaultdict

log = logging.getLogger("kzg_tpu.profiling")

_STATS: dict[str, list[float]] = defaultdict(list)
_TRACE_DIR = os.environ.get("KZG_TPU_TRACE_DIR")


@contextlib.contextmanager
def timed(name: str, sync=None):
    """Time a block; pass `sync=arrays` to block on device results first."""
    ctx = contextlib.nullcontext()
    if _TRACE_DIR:
        import jax

        ctx = jax.profiler.TraceAnnotation(name)
    t0 = time.perf_counter()
    with ctx:
        yield
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
    dt = time.perf_counter() - t0
    _STATS[name].append(dt)
    log.debug("kernel %s: %.3f ms", name, dt * 1e3)


@contextlib.contextmanager
def trace_session(name: str = "kzg_tpu"):
    """Whole-session profiler trace when KZG_TPU_TRACE_DIR is set."""
    if not _TRACE_DIR:
        yield
        return
    import jax

    with jax.profiler.trace(_TRACE_DIR):
        yield


def stats() -> dict[str, dict[str, float]]:
    out = {}
    for name, xs in _STATS.items():
        out[name] = {
            "calls": len(xs),
            "total_s": sum(xs),
            "mean_ms": 1e3 * sum(xs) / len(xs),
            "min_ms": 1e3 * min(xs),
        }
    return out


def report(level: int = logging.INFO):
    for name, s in sorted(stats().items()):
        log.log(level, "%-24s calls=%-5d mean=%8.2fms min=%8.2fms total=%6.2fs",
                name, s["calls"], s["mean_ms"], s["min_ms"], s["total_s"])


def reset():
    _STATS.clear()
