"""Tracing / profiling hooks.

The reference's only instrumentation is wall-clock RTF per utterance
(``sr/inference.py:67-76``) and seconds-per-batch prints
(``sr/train.py:127-136``).  Here the same accounting is a reusable
:class:`RTFMeter`, plus an opt-in ``jax.profiler`` trace wrapper
(``DISSC_TPU_TRACE_DIR=/path`` environment variable) that captures
XLA-level timelines viewable in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, List


class RTFMeter:
    """Accumulate (compute seconds, audio seconds) -> real-time factor."""

    def __init__(self, sampling_rate: int = 16000):
        self.sampling_rate = sampling_rate
        self.compute_s: float = 0.0
        self.audio_s: float = 0.0
        self.per_item: List[float] = []

    @contextlib.contextmanager
    def measure(self, n_samples: int) -> Iterator[None]:
        start = time.time()
        yield
        dt = time.time() - start
        dur = n_samples / self.sampling_rate
        self.compute_s += dt
        self.audio_s += dur
        self.per_item.append(dt / max(dur, 1e-9))

    @property
    def rtf(self) -> float:
        return self.compute_s / max(self.audio_s, 1e-9)


@contextlib.contextmanager
def trace_if_enabled(name: str = "trace") -> Iterator[None]:
    """jax.profiler trace when DISSC_TPU_TRACE_DIR is set; no-op otherwise."""
    trace_dir = os.environ.get("DISSC_TPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, name)):
        yield
