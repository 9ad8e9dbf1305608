"""Tracing / profiling utilities — replaces CTF's ``Timer`` /
``Timer_epoch`` scopes (common.cxx:136-137, test_ALS.cxx:349-350) with
named host-side timers plus optional ``jax.profiler`` device traces.

Usage:

    with timer("SVD_solve"):
        ...
    print(report())

    with device_trace("/tmp/tensorboard"):   # XProf trace for one region
        run_sweep()
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


_times: Dict[str, float] = defaultdict(float)
_counts: Dict[str, int] = defaultdict(int)
_enabled: bool = False


def enable(on: bool = True) -> None:
    """Turn profiling scopes on (the CLI's ``-profile 1``)."""
    global _enabled
    _enabled = on


def enabled() -> bool:
    return _enabled


@contextlib.contextmanager
def timer(name: str) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _times[name] += time.perf_counter() - t0
        _counts[name] += 1


def timed(name: str, fn, *args, **kwargs):
    """Dispatch ``fn`` under a named timer scope when profiling is enabled.

    This is how the solvers instrument their jitted phases (DT sweep, PP
    cache build, PP sweep, diagnostics) — the equivalent of the
    reference's CTF ``Timer`` scopes around primitives (common.cxx:136-137,
    712-724). JAX dispatch is async, so the result is synchronized inside
    the scope: profile mode trades a per-call sync for true per-phase wall
    times. When disabled this is a plain call with zero overhead.
    """
    if not _enabled:
        return fn(*args, **kwargs)
    import jax
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    out = jax.block_until_ready(out)
    _times[name] += time.perf_counter() - t0
    _counts[name] += 1
    return out


def report() -> str:
    """CTF-style dump of accumulated timer scopes."""
    lines = ["%-30s %10s %10s" % ("timer", "calls", "seconds")]
    for name in sorted(_times, key=lambda n: -_times[n]):
        lines.append("%-30s %10d %10.4f" % (name, _counts[name], _times[name]))
    return "\n".join(lines)


def reset() -> None:
    _times.clear()
    _counts.clear()


@contextlib.contextmanager
def device_trace(logdir: str, host_tracer_level: int = 2) -> Iterator[None]:
    """jax.profiler trace for a region (view with tensorboard/xprof)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region that shows up in device traces."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
