"""Fused MLP-block kernel (norm+gate/up+silu·mul+down+residual) vs the jnp
oracle (interpret mode on CPU), bf16 and W8A8 variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mellow_tpu.models.llama import quantize_weight
from mellow_tpu.ops.pallas_mlp_block import (
    fused_mlp_block,
    fused_mlp_block_w8a8,
    reference_mlp_block,
)


def _mats(rng, B, S, D, I, dtype=jnp.float32):
    x = jnp.asarray(rng.randn(B, S, D) * 0.5, dtype)
    ln = jnp.asarray(rng.randn(D) * 0.1 + 1.0, dtype)
    wg = jnp.asarray(rng.randn(D, I) * 0.05, dtype)
    wu = jnp.asarray(rng.randn(D, I) * 0.05, dtype)
    wd = jnp.asarray(rng.randn(I, D) * 0.05, dtype)
    return x, ln, wg, wu, wd


@pytest.mark.parametrize(
    "B,S,D,I",
    [
        (2, 99, 576, 1536),   # partial block (SP pad)
        (2, 389, 576, 1536),  # real SmolLM2 prefill shape
        (1, 64, 64, 128),     # tiny
    ],
)
def test_matches_oracle_fp32(B, S, D, I):
    rng = np.random.RandomState(1)
    x, ln, wg, wu, wd = _mats(rng, B, S, D, I)
    out = fused_mlp_block(x, ln, wg, wu, wd, eps=1e-5, interpret=True)
    ref = reference_mlp_block(x, ln, wg, wu, wd, eps=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_w8a8_close_to_fp32_oracle():
    """W8A8 is a lossy perf mode; against the fp32 oracle it must stay
    within the quantization error envelope (per-row activations + per-col
    weights at 127 levels -> relative error ~1%)."""
    rng = np.random.RandomState(2)
    B, S, D, I = 2, 99, 576, 1536
    x, ln, wg, wu, wd = _mats(rng, B, S, D, I)
    qg, qu, qd = quantize_weight(wg), quantize_weight(wu), quantize_weight(wd)
    out = fused_mlp_block_w8a8(
        x, ln,
        qg["q"], qg["scale"], qu["q"], qu["scale"], qd["q"], qd["scale"],
        eps=1e-5, interpret=True,
    )
    ref = reference_mlp_block(x, ln, wg, wu, wd, eps=1e-5)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    # residual passes through exactly; error comes from the MLP delta only
    delta = np.abs(np.asarray(ref) - np.asarray(x)) + 1e-3
    assert np.median(err / delta) < 0.05
    # Row-scaled quantization makes per-element tolerances the wrong
    # frame (a row's absolute error scales with its amax); bound the
    # relative Frobenius error of the MLP delta instead.
    ref_delta = np.asarray(ref) - np.asarray(x)
    rel_fro = np.linalg.norm(err) / np.linalg.norm(ref_delta)
    assert rel_fro < 0.05, rel_fro  # measured 0.028 on this seed


def test_w8a8_matches_xla_int8_formulation():
    """Bit-level contract: the kernel's quantize-dot-rescale chain must
    match the same math expressed in plain jnp (llama.quantize_kv row
    quant + int32 dot + scale folds)."""
    rng = np.random.RandomState(3)
    B, S, D, I = 1, 40, 64, 128
    x, ln, wg, wu, wd = _mats(rng, B, S, D, I)
    qg, qu, qd = quantize_weight(wg), quantize_weight(wu), quantize_weight(wd)
    out = fused_mlp_block_w8a8(
        x, ln,
        qg["q"], qg["scale"], qu["q"], qu["scale"], qd["q"], qd["scale"],
        eps=1e-5, interpret=True,
    )

    from mellow_tpu.models.llama import rms_norm

    def rowq(h):
        amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
        sc = jnp.maximum(amax, 1e-8) / 127.0
        return jnp.clip(jnp.round(h / sc), -127, 127).astype(jnp.int8), sc

    h = rms_norm(x, ln, 1e-5).astype(jnp.float32)
    h8, hs = rowq(h)

    def dot8(a8, wq):
        return jax.lax.dot_general(
            a8, wq, (((a8.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)

    gate = jax.nn.silu(dot8(h8, qg["q"]) * hs * qg["scale"])
    up = dot8(h8, qu["q"]) * hs * qu["scale"]
    g8, gs = rowq(gate * up)
    want = x + (dot8(g8, qd["q"]) * gs * qd["scale"]).astype(x.dtype)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), atol=2e-5
    )
