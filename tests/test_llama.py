"""Decoder parity: JAX Llama vs the HF LlamaForCausalLM oracle (the exact
architecture the reference uses, mellow/model/decoder.py:25). Uses a small
config for speed; the full SmolLM2-135M shape is exercised in test_e2e."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mellow_tpu.config import LlamaConfig
from mellow_tpu.models import generate as gen
from mellow_tpu.models import llama

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.convert_ckpt import convert_llama  # noqa: E402
from tests.oracles.hf_llama import build_hf_model, reference_greedy_decode  # noqa: E402

SMALL = LlamaConfig(
    vocab_size=512,
    hidden_size=64,
    intermediate_size=128,
    num_layers=4,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    rope_theta=100000.0,
)


@pytest.fixture(scope="module")
def small_pair():
    hf = build_hf_model(SMALL, seed=0)
    params = convert_llama(hf.state_dict(), SMALL.num_layers)
    return hf, jax.tree.map(jnp.asarray, params)


def test_forward_logits_match(small_pair):
    import torch

    hf, params = small_pair
    rng = np.random.RandomState(0)
    x = rng.randn(2, 11, SMALL.hidden_size).astype(np.float32) * 0.1

    with torch.no_grad():
        ref = hf(inputs_embeds=torch.from_numpy(x)).logits.numpy()

    ours = np.asarray(llama.forward(params, SMALL, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_prefill_plus_decode_matches_full_forward(small_pair):
    """KV-cache incremental decode must be mathematically identical to the
    reference's full recompute (SURVEY.md section 3.4 Q3)."""
    _, params = small_pair
    rng = np.random.RandomState(1)
    B, P, extra = 2, 7, 3
    emb_dim = SMALL.hidden_size
    full = jnp.asarray(rng.randn(B, P + extra, emb_dim).astype(np.float32) * 0.1)

    # Oracle: full forward over the whole sequence.
    full_logits = llama.forward(params, SMALL, full)

    # Incremental: prefill P, then 'extra' single steps.
    cache = llama.KVCache.create(SMALL, B, P + extra)
    hidden, cache = llama.prefill(params, SMALL, full[:, :P], cache)
    cos_np, sin_np = llama.rope_tables(SMALL, P + extra)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

    step_logits = [llama.logits_from_hidden(params, SMALL, hidden)]
    pending = None
    for t in range(extra):
        hidden, cache, pending = llama.decode_step(
            params, SMALL, full[:, P + t], cache, cos, sin, pending
        )
        step_logits.append(llama.logits_from_hidden(params, SMALL, hidden))

    for i, sl in enumerate(step_logits):
        np.testing.assert_allclose(
            np.asarray(sl), np.asarray(full_logits[:, P - 1 + i]), atol=1e-4, rtol=1e-4
        )


def test_greedy_generate_token_parity(small_pair):
    import torch

    hf, params = small_pair
    rng = np.random.RandomState(2)
    B, P = 3, 9
    prefix = rng.randn(B, P, SMALL.hidden_size).astype(np.float32) * 0.1
    max_len, stop = 20, 0

    ref_tokens = reference_greedy_decode(
        hf, torch.from_numpy(prefix), max_len, stop
    ).numpy()

    res = gen.generate(
        params,
        SMALL,
        jnp.asarray(prefix),
        max_len=max_len,
        stop_token_id=stop,
        greedy=True,
    )
    n = int(res.num_steps)
    assert n == ref_tokens.shape[1]
    np.testing.assert_array_equal(np.asarray(res.tokens)[:, :n], ref_tokens)


def test_batch_row_independence(small_pair):
    """B=1 rows must decode identically inside a larger batch (guards the
    reference's squeeze quirk + no-early-exit semantics, SURVEY.md section 4.3)."""
    _, params = small_pair
    rng = np.random.RandomState(3)
    rows = rng.randn(3, 6, SMALL.hidden_size).astype(np.float32) * 0.1

    batched = gen.generate(
        params, SMALL, jnp.asarray(rows), max_len=12, stop_token_id=0, greedy=True
    )
    for i in range(3):
        single = gen.generate(
            params, SMALL, jnp.asarray(rows[i : i + 1]), max_len=12,
            stop_token_id=0, greedy=True,
        )
        n = int(single.num_steps)
        np.testing.assert_array_equal(
            np.asarray(batched.tokens)[i, :n], np.asarray(single.tokens)[0, :n]
        )


def test_topp_sampling_respects_nucleus(small_pair):
    """Non-parity feature: real top-p must only emit tokens inside the
    nucleus of the step distribution."""
    _, params = small_pair
    rng = np.random.RandomState(4)
    prefix = jnp.asarray(rng.randn(1, 5, SMALL.hidden_size).astype(np.float32) * 0.1)
    res = gen.generate(
        params, SMALL, prefix, max_len=5, stop_token_id=0, greedy=False,
        top_p=0.9, temperature=1.0, rng=jax.random.PRNGKey(7),
    )
    assert res.tokens.shape == (1, 5)
    assert (np.asarray(res.tokens) >= 0).all()
    assert (np.asarray(res.tokens) < SMALL.vocab_size).all()
