"""Exact cross-checks of the sampling stack against HuggingFace's logits
processors (VERDICT r2 item 3).

The reference's decode path carries (dead) top-p code at
/root/reference/mellow/wrapper.py:219-232 whose keep-rule matches HF's
``TopPLogitsWarper``; our serving knobs (``top_k``, ``repetition_penalty``,
``temperature``) follow the HF conventions exactly. transformers is
installed offline, so the REAL HF implementations serve as oracles:
``warp_logits`` must reproduce their filtered logits bit-position-exactly
(-inf in the same slots, identical values elsewhere).
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from transformers.generation.logits_process import (
    RepetitionPenaltyLogitsProcessor,
    TemperatureLogitsWarper,
    TopKLogitsWarper,
    TopPLogitsWarper,
)

from mellow_tpu.models.generate import seen_mask, warp_logits


def hf_warp(logits_np, input_ids, *, top_p=1.0, temperature=1.0, top_k=0,
            repetition_penalty=1.0):
    """The HF stack in GenerationMixin's default order: processors
    (repetition penalty) then warpers (temperature, top-k, top-p)."""
    scores = torch.from_numpy(logits_np.copy())
    ids = torch.as_tensor(input_ids, dtype=torch.long)
    if repetition_penalty != 1.0:
        scores = RepetitionPenaltyLogitsProcessor(repetition_penalty)(ids, scores)
    if temperature != 1.0:
        scores = TemperatureLogitsWarper(temperature)(ids, scores)
    if top_k:
        scores = TopKLogitsWarper(top_k)(ids, scores)
    if top_p < 1.0:
        scores = TopPLogitsWarper(top_p)(ids, scores)
    return scores.numpy()


def ours(logits_np, seen_np=None, **kw):
    seen = None if seen_np is None else jnp.asarray(seen_np)
    out = warp_logits(jnp.asarray(logits_np), seen=seen, **kw)
    return np.asarray(out)


def assert_same_filter(got, want):
    """Same -inf pattern AND identical finite values."""
    got_inf, want_inf = np.isneginf(got), np.isneginf(want)
    np.testing.assert_array_equal(got_inf, want_inf)
    np.testing.assert_allclose(
        got[~got_inf], want[~want_inf], rtol=0, atol=0
    )


def rand_logits(seed, B=5, V=257):
    return np.random.default_rng(seed).normal(0, 3, (B, V)).astype(np.float32)


@pytest.mark.parametrize("top_p", [0.8, 0.3, 0.95])
def test_top_p_exact(top_p):
    logits = rand_logits(0)
    want = hf_warp(logits, np.zeros((5, 1), np.int64), top_p=top_p)
    assert_same_filter(ours(logits, top_p=top_p), want)


def test_top_p_one_keeps_everything():
    logits = rand_logits(1)
    got = ours(logits, top_p=1.0)
    assert not np.isneginf(got).any()
    np.testing.assert_array_equal(got, logits)


def test_top_p_nucleus_of_size_one():
    logits = rand_logits(2, B=3, V=64)
    logits[:, 7] = 50.0  # one token holds ~all the mass
    want = hf_warp(logits, np.zeros((3, 1), np.int64), top_p=0.5)
    got = ours(logits, top_p=0.5)
    assert_same_filter(got, want)
    assert (np.isneginf(got).sum(-1) == logits.shape[-1] - 1).all()


@pytest.mark.parametrize("top_k", [1, 10, 50, 10_000])
def test_top_k_exact(top_k):
    logits = rand_logits(3)
    want = hf_warp(logits, np.zeros((5, 1), np.int64), top_k=top_k)
    assert_same_filter(ours(logits, top_k=top_k), want)


@pytest.mark.parametrize("temperature", [0.5, 0.7, 2.0])
def test_temperature_then_top_p(temperature):
    logits = rand_logits(4)
    want = hf_warp(
        logits, np.zeros((5, 1), np.int64), temperature=temperature, top_p=0.8
    )
    got = ours(logits, temperature=temperature, top_p=0.8)
    assert_same_filter(got, want)


@pytest.mark.parametrize("penalty", [1.3, 2.0])
def test_repetition_penalty_exact(penalty):
    # Includes negative logits among the penalized ids (HF multiplies those).
    logits = rand_logits(5, B=4, V=97)
    ids = np.random.default_rng(6).integers(0, 97, (4, 12))
    want = hf_warp(logits, ids, repetition_penalty=penalty)
    seen = np.asarray(seen_mask(jnp.asarray(ids), jnp.ones(ids.shape, bool), 97))
    got = ours(logits, seen_np=seen, repetition_penalty=penalty)
    np.testing.assert_array_equal(got, want)


def test_full_stack_combined():
    logits = rand_logits(7, B=4, V=193)
    ids = np.random.default_rng(8).integers(0, 193, (4, 9))
    kw = dict(repetition_penalty=1.4, temperature=0.7, top_k=40, top_p=0.8)
    want = hf_warp(logits, ids, **kw)
    seen = np.asarray(seen_mask(jnp.asarray(ids), jnp.ones(ids.shape, bool), 193))
    got = ours(logits, seen_np=seen, **kw)
    assert_same_filter(got, want)


def test_seen_mask_respects_validity():
    ids = np.array([[3, 5, 5, 0], [1, 2, 3, 4]])
    valid = np.array([[True, True, False, False], [True, False, False, False]])
    m = np.asarray(seen_mask(jnp.asarray(ids), jnp.asarray(valid), 8))
    assert m[0].tolist() == [False, False, False, True, False, True, False, False]
    assert m[1].tolist() == [False, True, False, False, False, False, False, False]


def test_greedy_matches_hf_argmax_under_penalty():
    from mellow_tpu.models.generate import _sample_token

    logits = rand_logits(9, B=6, V=129)
    prev = np.random.default_rng(10).integers(0, 129, (6, 8))
    want = hf_warp(logits, prev, repetition_penalty=1.8).argmax(-1)
    got = _sample_token(
        jnp.asarray(logits), greedy=True, top_p=0.8, temperature=1.0,
        rng=None, repetition_penalty=1.8,
        prev_tokens=jnp.asarray(prev), step=jnp.asarray(8),
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_sampled_ids_come_from_hf_kept_set():
    """Sampling draws only tokens HF's warpers would keep."""
    import jax

    from mellow_tpu.models.generate import _sample_token

    logits = rand_logits(11, B=8, V=65)
    want = hf_warp(logits, np.zeros((8, 1), np.int64), top_p=0.6, top_k=20,
                   temperature=0.7)
    kept = ~np.isneginf(want)
    for seed in range(5):
        tok = np.asarray(_sample_token(
            jnp.asarray(logits), greedy=False, top_p=0.6, temperature=0.7,
            top_k=20, rng=jax.random.PRNGKey(seed),
        ))
        assert kept[np.arange(8), tok].all()


def _fast_kept_check(logits, *, top_p, seeds=6, **kw):
    """_fast_sample's draws must land in HF's exact kept set."""
    import jax

    from mellow_tpu.models.generate import _fast_sample

    want = hf_warp(logits, np.zeros((logits.shape[0], 1), np.int64),
                   top_p=top_p, **kw)
    kept = ~np.isneginf(want)
    B = logits.shape[0]
    for seed in range(seeds):
        tok = np.asarray(_fast_sample(
            jnp.asarray(logits), top_p=top_p, rng=jax.random.PRNGKey(seed),
            temperature=kw.get("temperature", 1.0), top_k=kw.get("top_k", 0),
        ))
        assert kept[np.arange(B), tok].all(), (seed, tok)


def test_fast_sample_peaked_takes_covered_branch():
    """Peaked logits: the top-64 prefilter covers the nucleus; draws stay
    inside HF's kept set (the fast branch of the lax.cond)."""
    logits = rand_logits(21, B=6, V=513) * 8.0  # sharp: tiny nucleus
    _fast_kept_check(logits, top_p=0.8)


def test_fast_sample_uniform_takes_fallback_branch():
    """Near-uniform logits: top-64 mass < top_p, so the exact full-sort
    fallback branch must fire — draws still inside HF's kept set."""
    logits = rand_logits(22, B=6, V=513) * 0.01  # flat: nucleus >> 64
    # Sanity: the nucleus really is wider than the prefilter.
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    top64 = np.sort(probs, -1)[:, ::-1][:, :64].sum(-1)
    assert (top64 < 0.9).all()
    _fast_kept_check(logits, top_p=0.9)


def test_fast_sample_topk_within_prefilter():
    """Explicit top_k <= 64 confines the nucleus: no fallback exists and
    draws match HF's combined top-k+top-p kept set."""
    logits = rand_logits(23, B=6, V=513)
    _fast_kept_check(logits, top_p=0.7, top_k=16, temperature=0.9)


def test_fast_sample_no_filters_is_plain_categorical():
    """top_p>=1, top_k=0: no sort at all — any in-vocab id is legal, and
    temperature scaling stays bit-compatible with warp_logits."""
    import jax

    from mellow_tpu.models.generate import _fast_sample

    logits = rand_logits(24, B=4, V=97)
    tok = np.asarray(_fast_sample(
        jnp.asarray(logits), top_p=1.0, temperature=0.5, top_k=0,
        rng=jax.random.PRNGKey(0),
    ))
    assert ((tok >= 0) & (tok < 97)).all()


def test_fast_sample_large_topk_path():
    """top_k > 64 widens the prefilter to k=top_k (still no fallback)."""
    logits = rand_logits(25, B=4, V=257)
    _fast_kept_check(logits, top_p=0.85, top_k=100)


def test_reject_sample_membership_flat_and_peaked():
    """_reject_sample (the sort-free fallback) draws only from HF's exact
    kept set, for flat AND peaked logits."""
    import jax

    from mellow_tpu.models.generate import _reject_sample

    for scale, top_p in ((0.01, 0.9), (3.0, 0.8), (8.0, 0.5)):
        logits = rand_logits(31, B=6, V=513) * scale
        want = hf_warp(logits, np.zeros((6, 1), np.int64), top_p=top_p)
        kept = ~np.isneginf(want)
        for seed in range(6):
            tok = np.asarray(_reject_sample(
                jnp.asarray(logits), top_p, jax.random.PRNGKey(seed)
            ))
            assert kept[np.arange(6), tok].all(), (scale, top_p, seed, tok)


def test_reject_sample_distribution_matches_nucleus():
    """Acceptance-conditioned draws follow the renormalized kept-set
    distribution (chi-square-style frequency check on a small vocab)."""
    import jax

    from mellow_tpu.models.generate import _reject_sample

    V = 16
    logits = np.array([np.linspace(0, 2.0, V)], np.float32)  # (1, V)
    top_p = 0.7
    want = hf_warp(logits, np.zeros((1, 1), np.int64), top_p=top_p)[0]
    kept = ~np.isneginf(want)
    p = np.exp(logits[0] - logits[0].max())
    p /= p.sum()
    expect = np.where(kept, p, 0.0)
    expect /= expect.sum()

    n = 4000
    batched = jnp.tile(jnp.asarray(logits), (n, 1))
    tok = np.asarray(
        _reject_sample(batched, top_p, jax.random.PRNGKey(0))
    )
    freq = np.bincount(tok, minlength=V) / n
    assert kept[tok].all()
    # 4000 draws: generous 4-sigma-ish tolerance on each kept frequency.
    np.testing.assert_allclose(freq, expect, atol=4 * np.sqrt(0.25 / n) + 0.01)
