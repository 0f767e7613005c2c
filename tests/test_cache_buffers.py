"""Donated persistent KV-cache buffers (generate ``cache_buffers`` +
``alloc_cache_buffers``): the opt-in recycling protocol must be
token-exact, safe against stale contents, and fall back silently on any
shape mismatch. (The path is default-OFF: on the axon TPU it measured
SLOWER than the zeros-create — benchmarks/README.md r5 — but remains
the documented API for platforms where XLA input-output aliasing
behaves.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mellow_tpu.config import LlamaConfig
from mellow_tpu.models import generate as gen
from mellow_tpu.models import llama

CFG = LlamaConfig(
    vocab_size=256, hidden_size=64, intermediate_size=128, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=16,
)


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.PRNGKey(0), CFG)


def _gen(params, prefix, bufs=None, **kw):
    return gen.generate(
        params, CFG, prefix, max_len=10, stop_token_id=-1, greedy=True,
        cache_dtype="int8", cache_buffers=bufs, **kw,
    )


def test_recycle_protocol_token_exact(params):
    prefix = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64)) * 0.1
    r0 = _gen(params, prefix)
    assert r0.cache is None  # no buffers passed -> none returned

    bufs = gen.alloc_cache_buffers(
        CFG, 2, 8, max_len=10, cache_dtype="int8", dtype=prefix.dtype
    )
    assert all(a.ndim == 1 for a in jax.tree.leaves(bufs))  # flat boundary
    r1 = _gen(params, prefix, bufs)
    assert r1.cache is not None
    r2 = _gen(params, prefix, r1.cache)
    assert r0.tokens.tolist() == r1.tokens.tolist() == r2.tokens.tolist()

    # Stale contents from a previous request must not leak into a new one.
    prefix_b = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 64)) * 0.1
    rb0 = _gen(params, prefix_b)
    rb1 = _gen(params, prefix_b, r2.cache)
    assert rb0.tokens.tolist() == rb1.tokens.tolist()


def test_mismatched_buffers_fall_back(params):
    prefix = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64)) * 0.1
    want = _gen(params, prefix).tokens.tolist()
    # Wrong max_len -> wrong cache size: silently uses a fresh cache.
    bad = gen.alloc_cache_buffers(
        CFG, 2, 8, max_len=50, cache_dtype="int8", dtype=prefix.dtype
    )
    assert _gen(params, prefix, bad).tokens.tolist() == want


def test_packed_cache_buffers(params):
    """The fused-decode (PackedKVCache) variant of the same protocol,
    on CPU via the interpret-mode kill switch."""
    import os

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=9, num_kv_heads=3, head_dim=64,
    )
    p = llama.init_params(jax.random.PRNGKey(0), cfg)
    prefix = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64)) * 0.1
    os.environ["MELLOW_TPU_FORCE_FUSED_DECODE"] = "interpret"
    try:
        def g(bufs=None):
            return gen.generate(
                p, cfg, prefix, max_len=10, stop_token_id=-1, greedy=True,
                cache_dtype="int8", fused_decode=True, cache_buffers=bufs,
            )

        r0 = g()
        bufs = gen.alloc_cache_buffers(
            cfg, 2, 8, max_len=10, cache_dtype="int8", fused_decode=True,
            dtype=prefix.dtype,
        )
        assert isinstance(bufs, llama.PackedKVCache)
        r1 = g(bufs)
        r2 = g(r1.cache)
        assert r0.tokens.tolist() == r1.tokens.tolist() == r2.tokens.tolist()
    finally:
        os.environ.pop("MELLOW_TPU_FORCE_FUSED_DECODE", None)
