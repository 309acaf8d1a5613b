"""Tracing / profiling / rate-limited debug logging.

Mirrors reference behavior (SURVEY §5.1): `tracing` spans gated by
AwsmRendererLogging { render_timings } (crates/renderer/src/debug.rs:9-63,
spans in render.rs:56-356) and debug_once/debug_n rate-limited logging.
TPU-native: spans emit both wall-clock timings and
jax.profiler.TraceAnnotation so passes show up in XLA profiles.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, List

logger = logging.getLogger("awsm_renderer_tpu")


class RenderTimings:
    """Per-pass wall timings (reference: render_timings spans)."""

    def __init__(self, enabled: bool = False):
        self.enabled = enabled
        self.frames: List[Dict[str, float]] = []
        self._current: Dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        if not self.enabled:
            yield
            return
        import jax.profiler

        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
        self._current[name] = self._current.get(name, 0.0) + (time.perf_counter() - t0)

    def note(self, msg: str) -> None:
        """One-line event attached to the current frame (e.g.
        'retrace: msaa, bloom' when a static shading specialization
        changed and the frame will stall on a compile)."""
        logger.info(msg)
        if self.enabled:
            self._current[msg] = self._current.get(msg, 0.0)

    def end_frame(self) -> Dict[str, float]:
        frame = self._current
        self._current = {}
        if self.enabled:
            self.frames.append(frame)
            logger.info("frame timings: %s",
                        {k: f"{v*1000:.2f}ms" for k, v in frame.items()})
        return frame

    def summary(self) -> Dict[str, float]:
        """Mean seconds per span over recorded frames."""
        if not self.frames:
            return {}
        acc: Dict[str, float] = defaultdict(float)
        for f in self.frames:
            for k, v in f.items():
                acc[k] += v
        return {k: v / len(self.frames) for k, v in acc.items()}


_debug_counts: Dict[object, int] = defaultdict(int)


def debug_once(key, message: str) -> None:
    """Log a message only the first time `key` is seen (debug.rs:33)."""
    debug_n(key, message, 1)


def debug_n(key, message: str, n: int) -> None:
    """Log a message at most n times per key (debug.rs:43)."""
    if _debug_counts[key] < n:
        _debug_counts[key] += 1
        logger.warning(message)


def debug_unique_string(key, message: str) -> None:
    """Log when the message for `key` changes (debug.rs:53)."""
    if _debug_counts.get(("str", key)) != message:
        _debug_counts[("str", key)] = message
        logger.warning(message)
