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


def test_rolling_window_no_starvation(params):
    """VERDICT r4 item 5: one long-running row must not starve queued
    admissions. Two shorts drain first, then a LONG row admitted at
    start>0 is still live when a queued short stalls on capacity — the
    scheduler must ROLL the window (reclaiming the drained columns before
    the long row) and keep admitting: zero resets, >=1 roll, and every
    request (including the rolled-mid-life long row) matches its solo
    run token-for-token."""
    prefixes = _prefixes(5, seed=5)
    sched = cb.ContinuousScheduler(
        params, CFG, slots=2, prefix_len=P, horizon=16,
        stop_token_id=-1, W=4,
    )
    # [short, short] at t=0; long(12) admitted at t=4 (start 4); short(8)
    # beside it; the LAST short stalls at t=12 (12+8 > 16) while the long
    # row is live -> roll by 4 -> admissible again.
    budgets = [4, 4, 12, 8, 8]
    rids = [sched.submit(prefixes[i], budgets[i]) for i in range(5)]
    results = sched.run_to_completion()
    assert sched.rolls >= 1, "window never rolled"
    assert sched.resets == 0, "roll should have made the reset unnecessary"
    for i, rid in enumerate(rids):
        assert results[rid] == _solo(params, prefixes[i], budgets[i], -1), i


def test_roll_window_state_invariants(params):
    """roll_window is a pure left-shift of the window: cache columns,
    token columns, t, length, start and deadline all shift together."""
    prefixes = _prefixes(2, seed=6)
    sched = cb.ContinuousScheduler(
        params, CFG, slots=2, prefix_len=P, horizon=16,
        stop_token_id=-1, W=4,
    )
    sched.submit(prefixes[0], 8)
    sched.submit(prefixes[1], 8)
    sched.step()
    st = sched.state
    delta = 4
    rolled = cb.roll_window(st, jnp.asarray(delta, jnp.int32))
    assert int(rolled.t) == int(st.t) - delta
    assert int(rolled.cache.length) == int(st.cache.length) - delta
    np.testing.assert_array_equal(
        np.asarray(rolled.tokens[:, : 16 - delta]),
        np.asarray(st.tokens[:, delta:]),
    )
    np.testing.assert_array_equal(
        np.asarray(rolled.cache.k[:, :, : st.cache.k.shape[2] - delta]),
        np.asarray(st.cache.k[:, :, delta:]),
    )
    live = ~np.asarray(st.done)
    np.testing.assert_array_equal(
        np.asarray(rolled.start)[live], np.asarray(st.start)[live] - delta
    )
    np.testing.assert_array_equal(
        np.asarray(rolled.deadline), np.asarray(st.deadline) - delta
    )


def test_per_request_sampling_knobs(params):
    """per_request=True: greedy rows (gmask) must still match solo greedy
    runs token-exactly while sampled rows draw in-vocab tokens with their
    own temperature/top_p; top_p below the rejection range is rejected."""
    prefixes = _prefixes(3, seed=7)
    sched = cb.ContinuousScheduler(
        params, CFG, slots=2, prefix_len=P, horizon=32,
        stop_token_id=-1, W=4, greedy=False, top_p=0.9,
        per_request=True,
    )
    r_greedy = sched.submit(prefixes[0], 6, greedy=True)
    r_hot = sched.submit(prefixes[1], 6, temperature=1.5, top_p=0.8)
    r_def = sched.submit(prefixes[2], 6)
    results = sched.run_to_completion()
    assert results[r_greedy] == _solo(params, prefixes[0], 6, -1)
    for rid in (r_hot, r_def):
        assert len(results[rid]) == 6
        assert all(0 <= t < CFG.vocab_size for t in results[rid])
    with pytest.raises(ValueError, match="below the supported"):
        sched.submit(prefixes[0], 4, top_p=0.1)
    plain = cb.ContinuousScheduler(
        params, CFG, slots=2, prefix_len=P, horizon=16, stop_token_id=-1,
    )
    with pytest.raises(ValueError, match="per_request=True"):
        plain.submit(prefixes[0], 4, temperature=2.0)


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
