"""Fused whole-Swin-block kernel (LN1+attn+proj+residual+LN2+MLP+residual)
vs the XLA `htsat.swin_block` oracle (interpret mode on CPU), W-MSA and
SW-MSA (shifted mask) variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mellow_tpu.models import htsat
from mellow_tpu.ops.pallas_swin_block import swin_block_fused


def _block_params(rng, C, H):
    def lin(i, o):
        return {
            "kernel": jnp.asarray(rng.randn(i, o) * 0.05, jnp.float32),
            "bias": jnp.asarray(rng.randn(o) * 0.02, jnp.float32),
        }

    return {
        "norm1": {
            "scale": jnp.asarray(rng.randn(C) * 0.1 + 1.0, jnp.float32),
            "bias": jnp.asarray(rng.randn(C) * 0.02, jnp.float32),
        },
        "qkv": lin(C, 3 * C),
        "rel_bias_table": jnp.asarray(
            rng.randn((2 * 8 - 1) ** 2, H) * 0.05, jnp.float32
        ),
        "proj": lin(C, C),
        "norm2": {
            "scale": jnp.asarray(rng.randn(C) * 0.1 + 1.0, jnp.float32),
            "bias": jnp.asarray(rng.randn(C) * 0.02, jnp.float32),
        },
        "fc1": lin(C, 4 * C),
        "fc2": lin(4 * C, C),
    }


def _run_fused(x, p, R, H, ws, shift, interpret=True):
    """Mirror of the htsat.swin_block fused-path dispatch (roll outside,
    kernel on the (B, R, R, C) view)."""
    B, L, C = x.shape
    N = ws * ws
    idx = htsat.relative_position_index(ws)
    bias = p["rel_bias_table"][idx.reshape(-1)].reshape(N, N, H)
    bias_h = jnp.transpose(bias, (2, 0, 1)).reshape(H * N, N)
    mask = htsat.shifted_window_mask(R, ws, shift) if shift > 0 else None

    x4 = x.reshape(B, R, R, C)
    if shift > 0:
        x4 = jnp.roll(x4, shift=(-shift, -shift), axis=(1, 2))
    out = swin_block_fused(
        x4,
        p["norm1"]["scale"], p["norm1"]["bias"],
        p["qkv"]["kernel"], p["qkv"]["bias"],
        p["proj"]["kernel"], p["proj"]["bias"],
        p["norm2"]["scale"], p["norm2"]["bias"],
        p["fc1"]["kernel"], p["fc1"]["bias"],
        p["fc2"]["kernel"], p["fc2"]["bias"],
        bias_h, mask,
        num_heads=H, window_size=ws, interpret=interpret,
    )
    if shift > 0:
        out = jnp.roll(out, shift=(shift, shift), axis=(1, 2))
    return out.reshape(B, L, C)


@pytest.mark.parametrize(
    "R,C,H,shift",
    [
        (16, 96, 4, 0),   # W-MSA, two window rows
        (16, 96, 4, 4),   # SW-MSA with mask
        (8, 64, 2, 0),    # single window (mask-free degenerate)
        (32, 96, 4, 4),   # stage-1-like grid (many windows/row)
    ],
)
def test_matches_swin_block_oracle(R, C, H, shift):
    rng = np.random.RandomState(0)
    B, ws = 2, 8
    L = R * R
    p = _block_params(rng, C, H)
    x = jnp.asarray(rng.randn(B, L, C) * 0.5, jnp.float32)

    ref = htsat.swin_block(x, p, R, H, ws, shift)
    out = _run_fused(x, p, R, H, ws, shift)
    # atol covers the kernel's tanh-GELU vs the oracle's exact erf
    # (max ~3e-4 pre-fc2; an order below the bf16 rounding the perf
    # path carries) plus fp32 accumulation-order drift.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_single_window_collapses_shift_like_oracle():
    """When the window covers the whole resolution the oracle collapses
    shift to 0 (htsat.py:368-371) — the fused dispatch in htsat must do
    the same; here we check the kernel's mask-free path equals the
    oracle called WITH a shift that collapses."""
    rng = np.random.RandomState(1)
    B, R, C, H, ws = 2, 8, 64, 2, 8
    p = _block_params(rng, C, H)
    x = jnp.asarray(rng.randn(B, R * R, C) * 0.5, jnp.float32)
    ref = htsat.swin_block(x, p, R, H, ws, shift=4)  # collapses to 0
    out = _run_fused(x, p, R, H, ws, shift=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)
