"""Profiling hooks — SURVEY.md T4: jax.profiler trace capture around hot
epochs; inert unless a trace directory is configured."""

from __future__ import annotations

import contextlib

import jax

__all__ = ["maybe_trace"]


@contextlib.contextmanager
def maybe_trace(trace_dir=None):
    """Wrap an epoch (or bench run) in a jax.profiler trace when trace_dir
    is set; no-op otherwise. Output is perfetto/tensorboard-compatible."""
    if trace_dir is None:
        yield
        return
    with jax.profiler.trace(str(trace_dir)):
        yield
