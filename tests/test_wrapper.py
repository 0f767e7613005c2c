"""MellowWrapper API tests: constructor validation, preprocessing semantics
(repeat-pad / random-crop, channel flatten, tokenizer padding), full
generate() flow with a small model, and batch bucketing."""

import numpy as np
import pytest
import jax

from mellow_tpu.config import (
    HTSATConfig,
    LlamaConfig,
    MellowConfig,
    get_config,
    register_config,
)
from mellow_tpu.io.tokenizer import ByteTokenizer
from mellow_tpu.models import mellow as jmellow
from mellow_tpu.wrapper import MellowWrapper

REF_WAV1 = "/root/reference/resource/1.wav"
REF_WAV2 = "/root/reference/resource/2.wav"

# Small-but-complete config for wrapper tests.
SMALL = MellowConfig(
    name="test_small",
    encoder=HTSATConfig(embed_dim=8, out_emb=64),
    decoder=LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16,
    ),
    d_proj=64,
    text_tokenization_len=8,
    prefix_length=268,
)
register_config("test_small", SMALL)


@pytest.fixture(scope="module")
def wrapper():
    params = jmellow.init_params(jax.random.PRNGKey(0), SMALL)
    return MellowWrapper(
        "test_small", "v0", 0, params=params, tokenizer=ByteTokenizer()
    )


def test_rejects_unknown_model():
    with pytest.raises(ValueError, match="not supported"):
        MellowWrapper("v0", "v99", 0, params={})


def test_missing_weights_raise_informatively():
    with pytest.raises(RuntimeError, match="No weights available"):
        MellowWrapper("test_small", "v0", 0)


def test_audio_repeat_pad(wrapper):
    """Short clips are tile-repeated to 10 s (reference wrapper.py:154-160)."""
    x = wrapper.load_audio_into_array(REF_WAV1, 10)
    assert x.shape == (320000,)
    # 1.wav resampled is 292865 samples -> repeated then truncated.
    np.testing.assert_array_equal(x[292865:], x[: 320000 - 292865])


def test_audio_crop_pinned(wrapper):
    """>10 s audio: crop_start pins the reference's random crop
    (wrapper.py:161-167, SURVEY.md section 7.3 item 6)."""
    x0 = wrapper.load_audio_into_array(REF_WAV2, 10, crop_start=0)
    x1 = wrapper.load_audio_into_array(REF_WAV2, 10, crop_start=100)
    assert x0.shape == x1.shape == (320000,)
    np.testing.assert_array_equal(x0[100:200], x1[0:100])


def test_text_padding(wrapper):
    ids = wrapper.preprocess_text(["hi", "a much longer prompt than eight"])
    assert ids.shape == (2, 8)
    assert ids[0, -1] == ByteTokenizer.pad_token_id  # padded
    assert (ids[1] != ByteTokenizer.pad_token_id).all()  # truncated


def test_generate_end_to_end(wrapper):
    preds = wrapper.generate(
        examples=[
            [REF_WAV1, REF_WAV2, "caption the audio."],
            [REF_WAV2, REF_WAV1, "what changed?"],
        ],
        max_len=6,
        top_p=0.8,
        temperature=1.0,
    )
    assert len(preds) == 2
    assert all(isinstance(p, str) for p in preds)


def test_generate_bucketing_row_consistency(wrapper):
    """B=3 buckets to 4 with a padding row; real rows must match the B=1
    results (guards the no-early-exit + padding-done semantics)."""
    ex = [
        [REF_WAV1, REF_WAV1, "one"],
        [REF_WAV1, REF_WAV1, "two"],
        [REF_WAV1, REF_WAV1, "three"],
    ]
    batch = wrapper.generate(ex, max_len=5, top_p=0.8, temperature=1.0)
    singles = [
        wrapper.generate([e], max_len=5, top_p=0.8, temperature=1.0)[0]
        for e in ex
    ]
    assert batch == singles


def test_sampling_mode_runs(wrapper):
    preds = wrapper.generate(
        [[REF_WAV1, REF_WAV2, "caption"]], max_len=5, top_p=0.9,
        temperature=0.7, sample=True, seed=3,
    )
    assert len(preds) == 1


def test_generate_e2e_through_real_bpe(tmp_path):
    """Wrapper e2e on the REAL byte-level BPE path (VERDICT r2 item 5):
    encode prompt -> generate -> decode -> split at the literal
    '<|endoftext|>' stop string — the reference flow at wrapper.py:181-195,
    251-254 — instead of the ByteTokenizer fallback gibberish."""
    from mellow_tpu.io.bpe import BPETokenizer
    from tests.test_bpe import _handcrafted_files

    d, vocab, _ = _handcrafted_files(tmp_path)
    tok = BPETokenizer.from_dir(d)
    # Prompt round-trips through the real merges before any model runs.
    assert tok.decode(tok.encode("hello world")) == "hello world"

    params = jmellow.init_params(jax.random.PRNGKey(1), SMALL)
    w = MellowWrapper("test_small", "v0", 0, params=params, tokenizer=tok)
    # Tokenized prompt feeds the decoder: multi-char merges in play.
    ids = w.preprocess_text(["hello world in hell"])
    assert ids.shape == (1, SMALL.text_tokenization_len)
    assert vocab["hello"] in ids[0] and vocab["Ġworld"] in ids[0]

    preds = w.generate(
        [[REF_WAV1, REF_WAV2, "hello world"],
         [REF_WAV1, REF_WAV1, "in the world"]],
        max_len=6, top_p=0.8, temperature=1.0, stop_token="<|endoftext|>",
    )
    assert len(preds) == 2
    for p in preds:
        assert isinstance(p, str)
        # Output was split at the stop string (wrapper.py:254).
        assert "<|endoftext|>" not in p

    # The stop id the jitted loop used is the real BPE special id.
    assert tok.encode("<|endoftext|>")[0] == vocab["<|endoftext|>"]


def test_generate_stream_matches_generate(wrapper):
    """Streaming yields one partial batch per flush window and its final
    snapshot equals generate()'s output (same jitted window body)."""
    examples = [[REF_WAV1, REF_WAV1, "caption"], [REF_WAV1, REF_WAV1, "x"]]
    full = wrapper.generate(examples, max_len=8, stop_token="\x00",
                            crop_start=0)
    chunks = list(
        wrapper.generate_stream(examples, max_len=8, stop_token="\x00",
                                crop_start=0)
    )
    assert len(chunks) >= 1
    # Each chunk is the batch's texts so far; prefixes must be monotone.
    for earlier, later in zip(chunks, chunks[1:]):
        for a, b in zip(earlier, later):
            assert b.startswith(a)
    assert chunks[-1] == full
