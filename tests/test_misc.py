"""Cross-cutting tests: compile-count stability (SURVEY.md section 4.4),
bf16 perf mode, params npz roundtrip, and a gpt2-family Mellow E2E."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mellow_tpu.config import HTSATConfig, MellowConfig, register_config
from mellow_tpu.io.tokenizer import ByteTokenizer
from mellow_tpu.models import mellow as jmellow
from mellow_tpu.models.gpt2 import GPT2Config
from mellow_tpu.utils.params_io import load_params, save_params
from mellow_tpu.wrapper import MellowWrapper
from tests.test_wrapper import SMALL

REF_WAV1 = "/root/reference/resource/1.wav"


def test_no_recompilation_across_same_shape_calls():
    """Same (B, max_len) bucket must hit the jit cache (the reference
    recompiled nothing because it never compiled; for us recompiles are the
    perf hazard)."""
    params = jmellow.init_params(jax.random.PRNGKey(0), SMALL)
    rng = np.random.RandomState(0)
    wave = jnp.asarray((rng.randn(2, 320000) * 0.1).astype(np.float32))
    text = jnp.asarray(rng.randint(2, 500, (2, 8)), jnp.int32)

    jmellow.generate_tokens(params, SMALL, wave, wave, text, max_len=4)
    n0 = jmellow.generate_tokens._cache_size()
    for _ in range(3):
        jmellow.generate_tokens(params, SMALL, wave, wave, text, max_len=4)
    assert jmellow.generate_tokens._cache_size() == n0
    # a different max_len is a new bucket -> exactly one more entry
    jmellow.generate_tokens(params, SMALL, wave, wave, text, max_len=5)
    assert jmellow.generate_tokens._cache_size() == n0 + 1


def test_bf16_perf_mode_runs():
    params = jmellow.init_params(jax.random.PRNGKey(0), SMALL)
    w = MellowWrapper(
        "test_small", "v0", 0, params=params, tokenizer=ByteTokenizer(),
        compute_dtype="bfloat16",
    )
    preds = w.generate([[REF_WAV1, REF_WAV1, "caption"]], max_len=4,
                       top_p=0.8, temperature=1.0)
    assert len(preds) == 1 and isinstance(preds[0], str)


def test_params_npz_roundtrip(tmp_path):
    params = jmellow.init_params(jax.random.PRNGKey(0), SMALL)
    path = str(tmp_path / "params.npz")
    save_params(jax.device_get(params), path)
    loaded = load_params(path)
    a, b = jax.tree.leaves(params), jax.tree.leaves(loaded)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), y)
    # wrapper loads it through params_path
    w = MellowWrapper(
        "test_small", "v0", 0, params_path=path, tokenizer=ByteTokenizer()
    )
    assert jmellow.count_params(w.params) == jmellow.count_params(params)


GPT2_MELLOW = MellowConfig(
    name="test_gpt2",
    encoder=HTSATConfig(embed_dim=8, out_emb=64),
    decoder=GPT2Config(
        vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
        max_position_embeddings=512,
    ),
    decoder_family="gpt2",
    text_decoder="gpt2",
    d_proj=64,
    text_tokenization_len=8,
    prefix_length=268,
    sep_token_id=50,  # stands in for gpt2's 50256 at the test vocab size
)
register_config("test_gpt2", GPT2_MELLOW)


def test_gpt2_mellow_end_to_end():
    """Full Mellow pipeline with the gpt2 decoder family (reference
    decoder.py:41-45 branch)."""
    params = jmellow.init_params(jax.random.PRNGKey(0), GPT2_MELLOW)
    w = MellowWrapper(
        "test_gpt2", "v0", 0, params=params, tokenizer=ByteTokenizer()
    )
    preds = w.generate([[REF_WAV1, REF_WAV1, "caption"]], max_len=4,
                       top_p=0.8, temperature=1.0)
    assert len(preds) == 1 and isinstance(preds[0], str)


def test_flush_window_invariance():
    """Token streams are identical for any flush_window in float-cache
    modes (the windowed KV flush is a pure scheduling change; see
    llama.decode_step docstring)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mellow_tpu.config import LlamaConfig
    from mellow_tpu.models import generate as gen, llama

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    prefix = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 32)) * 0.3
    outs = {}
    for W in (1, 3, 8, 16):
        r = gen.generate(
            params, cfg, prefix, max_len=11, stop_token_id=-1,
            greedy=True, flush_window=W,
        )
        outs[W] = np.asarray(r.tokens)
        assert int(r.num_steps) == 11
    for W in (3, 8, 16):
        np.testing.assert_array_equal(outs[1], outs[W])


def test_sampling_extras_top_k_and_repetition_penalty():
    """top_k restricts to the k best logits; repetition_penalty discourages
    already-emitted tokens (HF/CTRL convention). Both additive, off by
    default (parity unaffected)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mellow_tpu.config import LlamaConfig
    from mellow_tpu.models import generate as gen, llama

    cfg = LlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    prefix = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 32)) * 0.3

    # top_k=1 sampling must equal greedy regardless of temperature/seed.
    r_greedy = gen.generate(
        params, cfg, prefix, max_len=8, stop_token_id=-1, greedy=True
    )
    r_k1 = gen.generate(
        params, cfg, prefix, max_len=8, stop_token_id=-1, greedy=False,
        top_p=1.0, temperature=5.0, top_k=1, rng=jax.random.PRNGKey(7),
    )
    np.testing.assert_array_equal(
        np.asarray(r_greedy.tokens), np.asarray(r_k1.tokens)
    )

    # A strong repetition penalty must reduce immediate repeats vs none.
    def repeats(result):
        t = np.asarray(result.tokens)
        return int((t[:, 1:] == t[:, :-1]).sum())

    r_plain = gen.generate(
        params, cfg, prefix, max_len=24, stop_token_id=-1, greedy=True,
    )
    r_pen = gen.generate(
        params, cfg, prefix, max_len=24, stop_token_id=-1, greedy=True,
        repetition_penalty=1000.0,
    )
    assert repeats(r_pen) <= repeats(r_plain)
    # with an extreme penalty, no token may appear twice in a row
    t = np.asarray(r_pen.tokens)
    assert not (t[:, 1:] == t[:, :-1]).any()
