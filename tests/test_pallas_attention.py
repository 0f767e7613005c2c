"""Fused GQA prefill attention kernel vs the jnp oracle (interpret mode on
CPU; the real-TPU timing comparison lives in benchmarks/exp_prefill_attn.py).
Reference behavior: HF Llama causal SDPA driven by mellow/wrapper.py:217."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mellow_tpu.ops.pallas_attention import flash_gqa_prefill, reference_gqa_prefill


@pytest.mark.parametrize(
    "B,S,H,KV,hd",
    [
        (2, 99, 9, 3, 64),    # GQA, S needs padding
        (1, 128, 12, 12, 64),  # MHA (gpt2 family shape), exact tile
        (2, 389, 9, 3, 64),   # real SmolLM2 prefill shape
    ],
)
def test_matches_oracle_fp32(B, S, H, KV, hd):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, S, H * hd) * 0.5, jnp.float32)
    k = jnp.asarray(rng.randn(B, S, KV * hd) * 0.5, jnp.float32)
    v = jnp.asarray(rng.randn(B, S, KV * hd) * 0.5, jnp.float32)
    out = flash_gqa_prefill(
        q, k, v, num_heads=H, num_kv_heads=KV, head_dim=hd, interpret=True
    )
    ref = reference_gqa_prefill(q, k, v, num_heads=H, num_kv_heads=KV, head_dim=hd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_variants_agree():
    rng = np.random.RandomState(1)
    B, S, H, KV, hd = 2, 200, 9, 3, 64
    q = jnp.asarray(rng.randn(B, S, H * hd) * 0.5, jnp.float32)
    k = jnp.asarray(rng.randn(B, S, KV * hd) * 0.5, jnp.float32)
    v = jnp.asarray(rng.randn(B, S, KV * hd) * 0.5, jnp.float32)
    a = flash_gqa_prefill(
        q, k, v, num_heads=H, num_kv_heads=KV, head_dim=hd,
        interpret=True, variant="square",
    )
    b = flash_gqa_prefill(
        q, k, v, num_heads=H, num_kv_heads=KV, head_dim=hd,
        interpret=True, variant="tri",
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_bf16_tolerance():
    rng = np.random.RandomState(2)
    B, S, H, KV, hd = 2, 129, 9, 3, 64
    q = jnp.asarray(rng.randn(B, S, H * hd) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, S, KV * hd) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, S, KV * hd) * 0.3, jnp.bfloat16)
    out = flash_gqa_prefill(
        q, k, v, num_heads=H, num_kv_heads=KV, head_dim=hd, interpret=True
    )
    ref = reference_gqa_prefill(q, k, v, num_heads=H, num_kv_heads=KV, head_dim=hd)
    err = float(
        jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
    )
    assert err < 0.02, err


def test_prefill_uses_kernel_only_on_tpu_bf16():
    """On CPU the prefill path must keep the einsum (use_fused gate)."""
    assert jax.default_backend() == "cpu"
    from mellow_tpu.config import LlamaConfig
    from mellow_tpu.models import llama

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 32)) * 0.1
    cache = llama.KVCache.create(cfg, 2, 16)
    h, new_cache = llama.prefill(params, cfg, x, cache)
    assert h.shape == (2, 32)
    assert int(new_cache.length) == 7
