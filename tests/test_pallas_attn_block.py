"""Fused attention-block kernel (norm+qkv+rope+attn+o+residual) vs the jnp
oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mellow_tpu.models.llama import rope_tables
from mellow_tpu.config import LlamaConfig
from mellow_tpu.ops.pallas_attn_block import (
    fused_attn_block,
    fused_attn_block_w8a8,
    reference_attn_block,
    rotate_half_matrix,
)


def test_rotate_half_matrix():
    from mellow_tpu.models.llama import _rotate_half

    rng = np.random.RandomState(0)
    x = rng.randn(5, 3 * 64).astype(np.float32)
    P = rotate_half_matrix(3, 64)
    want = _rotate_half(x.reshape(5, 3, 64)).reshape(5, 192)
    np.testing.assert_allclose(x @ P, want, atol=1e-6)


@pytest.mark.parametrize(
    "B,S,H,KV,hd,D",
    [
        (2, 99, 9, 3, 64, 576),   # partial block
        (2, 389, 9, 3, 64, 576),  # real SmolLM2 prefill shape
        (1, 64, 4, 4, 16, 64),    # MHA tiny
    ],
)
def test_matches_oracle_fp32(B, S, H, KV, hd, D):
    cfg = LlamaConfig()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, S, D) * 0.5, jnp.float32)
    ln = jnp.asarray(rng.randn(D) * 0.1 + 1.0, jnp.float32)
    wq = jnp.asarray(rng.randn(D, H * hd) * 0.05, jnp.float32)
    wk = jnp.asarray(rng.randn(D, KV * hd) * 0.05, jnp.float32)
    wv = jnp.asarray(rng.randn(D, KV * hd) * 0.05, jnp.float32)
    wo = jnp.asarray(rng.randn(H * hd, D) * 0.05, jnp.float32)
    cos_t, sin_t = rope_tables(cfg, S, jnp.float32)
    cos, sin = jnp.asarray(cos_t[:, :hd]), jnp.asarray(sin_t[:, :hd])
    kw = dict(num_heads=H, num_kv_heads=KV, head_dim=hd, eps=1e-5)
    out, k, v = fused_attn_block(
        x, ln, wq, wk, wv, wo, cos, sin, interpret=True, **kw
    )
    ro, rk, rv = reference_attn_block(x, ln, wq, wk, wv, wo, cos, sin, **kw)
    np.testing.assert_allclose(np.asarray(v), np.asarray(rv), atol=2e-5)
    np.testing.assert_allclose(np.asarray(k), np.asarray(rk), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ro), atol=5e-5)


@pytest.mark.parametrize("B,S", [(2, 99), (2, 389)])
def test_w8a8_close_to_oracle(B, S):
    """The W8A8 block is a lossy opt-in mode: assert it tracks the fp32
    oracle within int8-quantization-level error (every dot quantized —
    weights per-column, activations per-row, k/v per-group scalar, softmax
    weights at the fixed 127 scale)."""
    from mellow_tpu.models.llama import quantize_weight

    cfg = LlamaConfig()
    H, KV, hd, D = 9, 3, 64, 576
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, S, D) * 0.5, jnp.float32)
    ln = jnp.asarray(rng.randn(D) * 0.1 + 1.0, jnp.float32)
    ws = {}
    for name, shape in (
        ("wq", (D, H * hd)), ("wk", (D, KV * hd)), ("wv", (D, KV * hd)),
        ("wo", (H * hd, D)),
    ):
        ws[name] = jnp.asarray(rng.randn(*shape) * 0.05, jnp.float32)
    qd = {name: quantize_weight(w) for name, w in ws.items()}
    cos_t, sin_t = rope_tables(cfg, S, jnp.float32)
    cos, sin = jnp.asarray(cos_t[:, :hd]), jnp.asarray(sin_t[:, :hd])
    kw = dict(num_heads=H, num_kv_heads=KV, head_dim=hd, eps=1e-5)
    out, k, v = fused_attn_block_w8a8(
        x, ln,
        qd["wq"]["q"], qd["wq"]["scale"], qd["wk"]["q"], qd["wk"]["scale"],
        qd["wv"]["q"], qd["wv"]["scale"], qd["wo"]["q"], qd["wo"]["scale"],
        cos, sin, interpret=True, **kw,
    )
    ro, rk, rv = reference_attn_block(
        x, ln, ws["wq"], ws["wk"], ws["wv"], ws["wo"], cos, sin, **kw
    )

    def rel(a, b):
        return float(
            np.linalg.norm(np.asarray(a, np.float64) - np.asarray(b, np.float64))
            / np.linalg.norm(np.asarray(b, np.float64))
        )

    # k/v carry one weight+activation quantization; the residual output
    # additionally carries the int8 attention core and o-projection.
    assert rel(k, rk) < 0.03, rel(k, rk)
    assert rel(v, rv) < 0.03, rel(v, rv)
    assert rel(out, ro) < 0.05, rel(out, ro)


@pytest.mark.parametrize("S", [99, 389])
def test_kv_quant_matches_quantize_kv(S):
    """kv_quant=True must return exactly quantize_kv(k), quantize_kv(v) of
    the bf16-mode outputs (same formula, in-kernel), with scales in lane
    layout — the int8-cache prefill commit depends on this equivalence."""
    from mellow_tpu.models.llama import quantize_kv

    cfg = LlamaConfig()
    B, H, KV, hd, D = 2, 9, 3, 64, 576
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(B, S, D) * 0.5, jnp.float32)
    ln = jnp.asarray(rng.randn(D) * 0.1 + 1.0, jnp.float32)
    wq = jnp.asarray(rng.randn(D, H * hd) * 0.05, jnp.float32)
    wk = jnp.asarray(rng.randn(D, KV * hd) * 0.05, jnp.float32)
    wv = jnp.asarray(rng.randn(D, KV * hd) * 0.05, jnp.float32)
    wo = jnp.asarray(rng.randn(H * hd, D) * 0.05, jnp.float32)
    cos_t, sin_t = rope_tables(cfg, S, jnp.float32)
    cos, sin = jnp.asarray(cos_t[:, :hd]), jnp.asarray(sin_t[:, :hd])
    kw = dict(num_heads=H, num_kv_heads=KV, head_dim=hd, eps=1e-5)
    out, k, v = fused_attn_block(
        x, ln, wq, wk, wv, wo, cos, sin, interpret=True, **kw
    )
    out_q, k8, v8, ksc, vsc = fused_attn_block(
        x, ln, wq, wk, wv, wo, cos, sin, interpret=True, kv_quant=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(out_q), np.asarray(out))
    want_k8, want_ksc = quantize_kv(k)
    want_v8, want_vsc = quantize_kv(v)
    np.testing.assert_array_equal(np.asarray(k8), np.asarray(want_k8))
    np.testing.assert_array_equal(np.asarray(v8), np.asarray(want_v8))
    np.testing.assert_allclose(
        np.asarray(ksc)[:, 0, :S], np.asarray(want_ksc), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(vsc)[:, 0, :S], np.asarray(want_vsc), rtol=1e-6
    )
