"""Per-stage pipeline instrumentation (VERDICT r1 item 7; SURVEY §5.1).

The reference has no tracer (SURVEY §5.1: ad-hoc scripts under external
profilers); here every streamed pipeline stage can be timed in place so
regressions in the parse/pack/H2D/kernel/D2H split are visible without
editing code.

    from bionumpy_tpu.instrument import stage, report, reset
    with stage("inflate"):
        ...
    print(report())        # {"inflate": {"seconds": ..., "calls": ...}}

Thread-safe (stages accumulate under a lock; the streamed pipelines time
work on worker threads).  `jax_profile` wraps a block in the JAX
profiler (Perfetto trace) when a trace directory is given.
"""
from __future__ import annotations

import threading
import time
from collections import defaultdict
from contextlib import contextmanager

_lock = threading.Lock()
_times = defaultdict(float)
_calls = defaultdict(int)
_bytes = defaultdict(int)
ENABLED = True


@contextmanager
def stage(name: str, n_bytes: int = 0):
    """Accumulate wall time (and optional byte volume) under `name`."""
    if not ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            _times[name] += dt
            _calls[name] += 1
            _bytes[name] += n_bytes


def add(name: str, seconds: float, n_bytes: int = 0) -> None:
    """Record an externally measured duration."""
    with _lock:
        _times[name] += seconds
        _calls[name] += 1
        _bytes[name] += n_bytes


def report() -> dict:
    """{"stage": {"seconds", "calls", "bytes"}} snapshot."""
    with _lock:
        return {name: {"seconds": round(_times[name], 4),
                       "calls": _calls[name],
                       **({"bytes": _bytes[name]} if _bytes[name] else {})}
                for name in _times}


def summary(total: float = None) -> str:
    """One-line 'stage=1.23s(45%)' split for bench output."""
    rep = report()
    parts = []
    for name, r in sorted(rep.items(), key=lambda kv: -kv[1]["seconds"]):
        s = r["seconds"]
        pct = f"({100 * s / total:.0f}%)" if total else ""
        parts.append(f"{name}={s:.2f}s{pct}")
    return " ".join(parts)


def reset() -> None:
    with _lock:
        _times.clear()
        _calls.clear()
        _bytes.clear()


@contextmanager
def jax_profile(trace_dir: str = None):
    """Wrap a block in the JAX profiler when `trace_dir` is set (e.g. from
    a BNP_TPU_TRACE env var); no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield
