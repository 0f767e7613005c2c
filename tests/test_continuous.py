"""Continuous batching (models/continuous.py): slot admission mid-flight.

The contract under test (VERDICT r3 item 3 semantics, reference
wrapper.py:247-256): every request's GREEDY token output is identical to
a solo ``generate`` run of the same prefix — raggedness (per-row start
columns, local RoPE, start masks) must be invisible to each row's math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mellow_tpu.config import LlamaConfig
from mellow_tpu.models import continuous as cb
from mellow_tpu.models import generate as gen
from mellow_tpu.models import llama

CFG = LlamaConfig(
    vocab_size=257, hidden_size=64, intermediate_size=128, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=16,
)
P = 8


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.PRNGKey(0), CFG)


def _prefixes(n, seed=1):
    r = np.random.RandomState(seed)
    return (r.randn(n, P, CFG.hidden_size) * 0.1).astype(np.float32)


def _solo(params, prefix_row, max_new, stop):
    res = gen.generate(
        params, CFG, jnp.asarray(prefix_row)[None], max_len=max_new,
        stop_token_id=stop, greedy=True, cache_dtype="float32",
        fused_decode=False,
    )
    return gen.tokens_to_lists(res, stop)[0]


def test_matches_solo_runs_with_staggered_admission(params):
    """6 requests through 4 slots: the last two are admitted into freed
    slots mid-flight (start > 0, ragged rows) and must still match their
    solo runs token-for-token."""
    prefixes = _prefixes(6)
    budgets = [6, 3, 9, 4, 7, 5]
    sched = cb.ContinuousScheduler(
        params, CFG, slots=4, prefix_len=P, horizon=32,
        stop_token_id=-1, W=4,
    )
    rids = [sched.submit(prefixes[i], budgets[i]) for i in range(6)]
    results = sched.run_to_completion()
    assert set(results) == set(rids)
    for i, rid in enumerate(rids):
        want = _solo(params, prefixes[i], budgets[i], -1)
        assert results[rid] == want, f"request {i} diverged"
    assert sched.resets == 0


def test_stop_token_rows_match_solo(params):
    """Rows that finish via a real stop token (probed from a solo run)
    trim identically to generate's tokens_to_lists semantics."""
    prefixes = _prefixes(3, seed=2)
    # Probe: token row 0 emits at step 2 becomes the stop id, so request 0
    # stops after 2 tokens while the others (different prefixes) mostly
    # run their full budgets.
    probe = _solo(params, prefixes[0], 8, -1)
    stop = probe[2]
    sched = cb.ContinuousScheduler(
        params, CFG, slots=2, prefix_len=P, horizon=32,
        stop_token_id=stop, W=4,
    )
    rids = [sched.submit(prefixes[i], 8) for i in range(3)]
    results = sched.run_to_completion()
    for i, rid in enumerate(rids):
        assert results[rid] == _solo(params, prefixes[i], 8, stop), i


def test_capacity_reset(params):
    """When the decode window is spent, the scheduler resets to a fresh
    window and keeps going; late requests still match solo runs."""
    prefixes = _prefixes(3, seed=3)
    sched = cb.ContinuousScheduler(
        params, CFG, slots=2, prefix_len=P, horizon=16,
        stop_token_id=-1, W=4,
    )
    rids = [sched.submit(prefixes[i], 10) for i in range(3)]
    results = sched.run_to_completion()
    assert sched.resets >= 1
    for i, rid in enumerate(rids):
        assert results[rid] == _solo(params, prefixes[i], 10, -1), i


def test_submit_over_horizon_rejected(params):
    sched = cb.ContinuousScheduler(
        params, CFG, slots=2, prefix_len=P, horizon=16, stop_token_id=-1,
    )
    with pytest.raises(ValueError, match="exceeds horizon"):
        sched.submit(_prefixes(1)[0], 17)


def test_int8_cache_slots_run(params):
    """int8 slot cache: admission splices quantized blocks + scales; the
    engine completes and emits in-vocab tokens (int8 is lossy, so no
    solo-equality claim — same caveat as generate's int8 mode)."""
    prefixes = _prefixes(2, seed=4)
    sched = cb.ContinuousScheduler(
        params, CFG, slots=2, prefix_len=P, horizon=16,
        stop_token_id=-1, W=4, cache_dtype="int8",
    )
    rids = [sched.submit(prefixes[i], 6) for i in range(2)]
    results = sched.run_to_completion()
    for rid in rids:
        assert len(results[rid]) == 6
        assert all(0 <= t < CFG.vocab_size for t in results[rid])
