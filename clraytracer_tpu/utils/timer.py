"""Scope timers and a profiler-stat sink.

TPU-native equivalent of the reference's RAII ``Timer`` / ``CSTIMER`` macro
(Timer.hpp:7-44) and the ``Engine_UpdateProfilerStats`` sink
(Engine.cpp:36-39): a context manager / decorator that blocks on device
results before reading the clock, plus a process-global stats dict that the
CLI / bench harness can render (the reference rendered these in an ImGui
panel, Engine.cpp:41-50).
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Any, Callable, Iterator, TypeVar

import jax

from clraytracer_tpu.utils.logging import get_logger

_F = TypeVar("_F", bound=Callable[..., Any])

#: Last-seen timings keyed by stat name, in milliseconds. The analogue of the
#: reference's ``ProfilerSpeeds`` array (Engine.cpp:34-38).
profiler_stats: dict[str, float] = {}


def update_profiler_stat(name: str, ms: float) -> None:
    profiler_stats[name] = ms


@contextlib.contextmanager
def ScopeTimer(name: str, log: bool = True) -> Iterator[None]:
    """Measure a scope in ms; record into :data:`profiler_stats`."""
    start = time.perf_counter()
    try:
        yield
    finally:
        ms = (time.perf_counter() - start) * 1e3
        update_profiler_stat(name, ms)
        if log:
            get_logger().info("%s took %.2f ms", name, ms)


def timed(name: str | None = None) -> Callable[[_F], _F]:
    """Decorator form of :func:`ScopeTimer`, blocking on JAX outputs."""

    def deco(fn: _F) -> _F:
        label = name or fn.__qualname__

        @functools.wraps(fn)
        def wrapper(*args: Any, **kwargs: Any) -> Any:
            start = time.perf_counter()
            out = fn(*args, **kwargs)
            out = jax.block_until_ready(out)
            ms = (time.perf_counter() - start) * 1e3
            update_profiler_stat(label, ms)
            return out

        return wrapper  # type: ignore[return-value]

    return deco
