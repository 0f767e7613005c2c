"""Debug mode (SURVEY.md section 5.2 — the reference suppresses all warnings
globally, wrapper.py:4-5; we do the opposite on demand)."""

from __future__ import annotations

import jax


def enable_debug(nans: bool = True, infs: bool = True, disable_jit: bool = False) -> None:
    """Turn on numeric tripwires: any NaN/Inf produced under jit raises with
    a traceback to the producing op."""
    if nans:
        jax.config.update("jax_debug_nans", True)
    if infs:
        jax.config.update("jax_debug_infs", True)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)


def disable_debug() -> None:
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_debug_infs", False)
    jax.config.update("jax_disable_jit", False)
