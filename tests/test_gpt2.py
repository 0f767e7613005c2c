"""GPT-2 decoder family parity vs HF GPT2LMHeadModel (the reference's
alternate text decoder, mellow/model/decoder.py:26-27)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from mellow_tpu.models import gpt2

SMALL = gpt2.GPT2Config(
    vocab_size=300, hidden_size=48, num_layers=3, num_heads=4,
    max_position_embeddings=64,
)


@pytest.fixture(scope="module")
def pair():
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    torch.manual_seed(0)
    hf = GPT2LMHeadModel(
        HFConfig(
            vocab_size=SMALL.vocab_size,
            n_embd=SMALL.hidden_size,
            n_layer=SMALL.num_layers,
            n_head=SMALL.num_heads,
            n_positions=SMALL.max_position_embeddings,
            attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
        )
    ).eval()
    params = jax.tree.map(
        jnp.asarray, gpt2.convert_hf_gpt2(hf.state_dict(), SMALL.num_layers)
    )
    return hf, params


def test_forward_logits_match(pair):
    hf, params = pair
    rng = np.random.RandomState(0)
    x = (rng.randn(2, 9, SMALL.hidden_size) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = hf(inputs_embeds=torch.from_numpy(x)).logits.numpy()
    ours = np.asarray(gpt2.forward(params, SMALL, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_prefill_decode_matches_forward(pair):
    _, params = pair
    rng = np.random.RandomState(1)
    B, P, extra = 2, 6, 3
    full = jnp.asarray((rng.randn(B, P + extra, SMALL.hidden_size) * 0.1).astype(np.float32))
    full_logits = gpt2.forward(params, SMALL, full)

    cache = gpt2.GPT2Cache.create(SMALL, B, P + extra)
    hidden, cache = gpt2.prefill(params, SMALL, full[:, :P], cache)
    logits = [gpt2.logits_from_hidden(params, SMALL, hidden)]
    pending = None
    for t in range(extra):
        hidden, cache, pending = gpt2.decode_step(
            params, SMALL, full[:, P + t], cache, pending
        )
        logits.append(gpt2.logits_from_hidden(params, SMALL, hidden))
        if t == 0:  # exercise a mid-stream window flush
            cache = gpt2.flush_pending(SMALL, cache, pending)
            pending = None
    for i, sl in enumerate(logits):
        np.testing.assert_allclose(
            np.asarray(sl), np.asarray(full_logits[:, P - 1 + i]),
            atol=1e-4, rtol=1e-4,
        )


def test_gpt2_greedy_generate_parity(pair):
    """Family-dispatched generate loop vs the reference decode semantics
    with a GPT-2 decoder (wrapper.py:234-235 uses transformer.wte)."""
    from mellow_tpu.models import generate as gen

    hf, params = pair
    rng = np.random.RandomState(2)
    B, P, max_len, stop = 2, 5, 10, 0
    prefix = (rng.randn(B, P, SMALL.hidden_size) * 0.1).astype(np.float32)

    generated = torch.from_numpy(prefix)
    tokens = None
    with torch.no_grad():
        for _ in range(max_len):
            logits = hf(inputs_embeds=generated).logits[:, -1, :]
            nxt = torch.argmax(logits, -1).unsqueeze(1)
            emb = hf.transformer.wte(nxt)
            tokens = nxt if tokens is None else torch.cat([tokens, nxt], 1)
            generated = torch.cat([generated, emb], dim=1)
            if ((tokens == stop).sum(dim=-1) > 0).all():
                break

    res = gen.generate(
        params, SMALL, jnp.asarray(prefix), max_len=max_len,
        stop_token_id=stop, greedy=True, family="gpt2",
    )
    n = int(res.num_steps)
    assert n == tokens.shape[1]
    np.testing.assert_array_equal(np.asarray(res.tokens)[:, :n], tokens.numpy())


def test_quantized_gpt2_matches_dequantized(pair):
    """int8-weight mode vs a manually-dequantized float model. The kernels
    match exactly (_mm folds scales after the dot); the deq model's
    EMBEDDING gather also changes (the quantized model keeps the float
    wte for gathers), so streams may diverge after step 0 — the first
    token must match exactly, the rest mostly."""
    import numpy as np

    from mellow_tpu.models import generate as gen

    _, params = pair
    qparams = gpt2.quantize_gpt2(params, SMALL)

    # manual dequantization back to plain float kernels
    deq = dict(params)
    layers = dict(params["layers"])
    for k in ("w_qkv", "w_o", "w_fc", "w_proj"):
        qd = qparams["layers"][k]
        layers[k] = np.asarray(qd["q"], np.float32) * np.asarray(qd["scale"])[:, None, :]
    deq["layers"] = layers
    hq = qparams["wte_head_q"]
    wte_deq = (np.asarray(hq["q"], np.float32) * np.asarray(hq["scale"])[None, :]).T
    deq["wte"] = wte_deq  # logits head AND embedding table change together

    rng = np.random.RandomState(3)
    prefix = jnp.asarray(rng.randn(2, 6, SMALL.hidden_size).astype(np.float32) * 0.1)
    r_q = gen.generate(
        qparams, SMALL, prefix, max_len=8, stop_token_id=-1, greedy=True,
        family="gpt2",
    )
    r_d = gen.generate(
        deq, SMALL, prefix, max_len=8, stop_token_id=-1, greedy=True,
        family="gpt2",
    )
    # the deq model uses the dequantized head via wte.T; the embedding
    # gather differs (quantized model keeps the FLOAT wte for gathers), so
    # compare only the first token (same hidden input) exactly, then check
    # stream agreement loosely.
    tq, td = np.asarray(r_q.tokens), np.asarray(r_d.tokens)
    assert (tq[:, 0] == td[:, 0]).all()
    assert (tq == td).mean() >= 0.75


def test_fullsize_gpt2_small_shape_parity():
    """gpt2-small production shape (12L/768/12h/50257, the reference's
    'gpt2-base' decoder option, mellow/model/decoder.py:26-31, 41-45):
    HF-oracle logits parity + greedy decode steps at B=1. Catches bugs
    specific to the production dims that the 3L/48 toy shape cannot
    (VERDICT r2 item 6)."""
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel
    from mellow_tpu.models import generate as gen

    cfg = gpt2.GPT2Config()  # production defaults = gpt2-small shape
    assert (cfg.num_layers, cfg.hidden_size, cfg.num_heads,
            cfg.vocab_size) == (12, 768, 12, 50257)
    torch.manual_seed(0)
    hf = GPT2LMHeadModel(
        HFConfig(attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0)
    ).eval()
    params = jax.tree.map(
        jnp.asarray, gpt2.convert_hf_gpt2(hf.state_dict(), cfg.num_layers)
    )

    rng = np.random.RandomState(4)
    B, P = 1, 8
    prefix = (rng.randn(B, P, cfg.hidden_size) * 0.1).astype(np.float32)

    with torch.no_grad():
        ref_logits = hf(inputs_embeds=torch.from_numpy(prefix)).logits.numpy()
    ours = np.asarray(gpt2.forward(params, cfg, jnp.asarray(prefix)))
    np.testing.assert_allclose(ours, ref_logits, atol=2e-3, rtol=2e-3)

    # greedy decode token parity through prefill + cache decode_step
    max_len, stop = 4, 0
    generated = torch.from_numpy(prefix)
    tokens = None
    with torch.no_grad():
        for _ in range(max_len):
            logits = hf(inputs_embeds=generated).logits[:, -1, :]
            nxt = torch.argmax(logits, -1).unsqueeze(1)
            tokens = nxt if tokens is None else torch.cat([tokens, nxt], 1)
            generated = torch.cat([generated, hf.transformer.wte(nxt)], dim=1)
    res = gen.generate(
        params, cfg, jnp.asarray(prefix), max_len=max_len,
        stop_token_id=stop, greedy=True, family="gpt2",
    )
    n = int(res.num_steps)
    assert n == tokens.shape[1]
    np.testing.assert_array_equal(np.asarray(res.tokens)[:, :n], tokens.numpy())
