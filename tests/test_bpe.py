"""Vendored byte-level BPE vs the HF slow GPT2Tokenizer oracle (same
algorithm family as the SmolLM2 tokenizer the reference loads,
mellow/wrapper.py:84-85). The oracle is constructed offline from the same
handcrafted vocab.json/merges.txt files — no network needed."""

import json

import numpy as np
import pytest

from mellow_tpu.io.bpe import BPETokenizer, bytes_to_unicode


def _handcrafted_files(tmp_path):
    """A complete byte-level vocab (all 256 byte units + specials + merges)
    written as a standard HF export."""
    b2u = bytes_to_unicode()
    units = [b2u[b] for b in range(256)]
    merges = [
        ("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
        ("Ġ", "w"), ("Ġw", "o"), ("Ġwo", "r"), ("Ġwor", "ld"),
        ("l", "d"), ("i", "n"), ("Ġ", "in"),
    ]
    vocab = {u: i for i, u in enumerate(units)}
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vocab["<|im_start|>"] = len(vocab)

    vpath = tmp_path / "vocab.json"
    mpath = tmp_path / "merges.txt"
    vpath.write_text(json.dumps(vocab), encoding="utf-8")
    # NB trailing newline: transformers parses merges.txt as
    # split("\n")[1:-1] and silently drops the last line without it.
    mpath.write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n",
        encoding="utf-8",
    )
    return str(tmp_path), vocab, merges


SAMPLES = [
    "hello world",
    "hello, world! in the world",
    "  double  spaces\tand\nnewlines ",
    "unicode: café 日本語 \U0001f600",
    "numbers 12345 mixed2text",
    "it's we're I'll don't",
    "",
]


def test_bpe_matches_hf_gpt2_oracle(tmp_path):
    from transformers import GPT2Tokenizer

    d, vocab, merges = _handcrafted_files(tmp_path)
    ours = BPETokenizer.from_dir(d)
    oracle = GPT2Tokenizer(
        vocab_file=f"{d}/vocab.json", merges_file=f"{d}/merges.txt",
        unk_token=None, bos_token=None, eos_token="<|endoftext|>",
    )
    for text in SAMPLES:
        expect = oracle.encode(text)
        got = ours.encode(text)
        assert got == expect, (text, got, expect)


def test_bpe_merge_order():
    b2u = bytes_to_unicode()
    units = [b2u[b] for b in range(256)]
    vocab = {u: i for i, u in enumerate(units)}
    for tok in ("he", "ll", "hell", "hello", "<|endoftext|>"):
        vocab.setdefault(tok, len(vocab))
    vocab["!"] = vocab[b2u[ord("!")]]
    tok = BPETokenizer(
        vocab, [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o")]
    )
    # merges applied by rank: h+e, l+l, he+ll, hell+o -> one token
    assert tok.encode("hello") == [vocab["hello"]]
    # partial word only merges what the table contains
    assert tok.encode("hell") == [vocab["hell"]]
    assert tok.encode("heg") == [vocab["he"], vocab[b2u[ord("g")]]]


def test_bpe_roundtrip_and_specials(tmp_path):
    d, vocab, _ = _handcrafted_files(tmp_path)
    tok = BPETokenizer.from_dir(d)
    for text in SAMPLES:
        assert tok.decode(tok.encode(text)) == text
    # special tokens are split out as single ids, not byte-tokenized
    ids = tok.encode("hello<|endoftext|>world")
    assert vocab["<|endoftext|>"] in ids
    assert tok.decode(ids) == "hello<|endoftext|>world"
    assert tok.encode("<|endoftext|>") == [vocab["<|endoftext|>"]]
    assert tok.eos_token_id == vocab["<|endoftext|>"]


def test_bpe_encode_padded(tmp_path):
    d, vocab, _ = _handcrafted_files(tmp_path)
    tok = BPETokenizer.from_dir(d)
    row = tok.encode_padded("hello", 8)
    assert len(row) == 8
    assert row[0] == vocab["hello"]
    # pad is the EXISTING '!' token, like the reference (wrapper.py:85)
    assert set(row[1:]) == {tok.pad_token_id}
    assert tok.pad_token_id == vocab[bytes_to_unicode()[ord("!")]]
    # truncation
    long_row = tok.encode_padded("hello world in the world hello", 3)
    assert len(long_row) == 3


def test_wrapper_accepts_bpe_tokenizer(tmp_path):
    """The wrapper runs end-to-end with the vendored BPE (real text in/out,
    VERDICT r1 missing #2)."""
    import jax

    from mellow_tpu.models import mellow as jm
    from mellow_tpu.wrapper import MellowWrapper
    from tests.test_wrapper import SMALL

    d, vocab, _ = _handcrafted_files(tmp_path)
    tok = BPETokenizer.from_dir(d)
    params = jm.init_params(jax.random.PRNGKey(0), SMALL)
    w = MellowWrapper("test_small", "v0", 0, params=params, tokenizer=tok)
    out = w.generate(
        [["/root/reference/resource/1.wav", "/root/reference/resource/1.wav",
          "hello world"]],
        max_len=4,
    )
    assert len(out) == 1 and isinstance(out[0], str)
