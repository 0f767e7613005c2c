"""Profiling hooks (SURVEY.md section 5.1 — ABSENT in the reference; here:
jax.profiler traces viewable in Perfetto/XProf, opt-in via env var or
context manager)."""

from __future__ import annotations

import os
from contextlib import contextmanager

import jax

ENV_VAR = "MELLOW_TPU_PROFILE"  # set to a directory to capture a trace


@contextmanager
def trace(trace_dir: str | None = None):
    """Capture a device trace for the enclosed block.

    with profiling.trace("/tmp/mellow_trace"):
        wrapper.generate(...)
    """
    trace_dir = trace_dir or os.environ.get(ENV_VAR)
    if not trace_dir:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """jax.named_scope alias used across model code so traces group by
    layer (encoder/stage1, decoder/layer_scan, frontend/logmel...)."""
    return jax.named_scope(name)
