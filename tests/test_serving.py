"""Serving engine: concurrent submissions coalesce into batches and return
the same strings as direct wrapper calls; mixed parameter keys don't mix."""

import time

import pytest
import jax

from mellow_tpu.io.tokenizer import ByteTokenizer
from mellow_tpu.models import mellow as jmellow
from mellow_tpu.serving import BatchingEngine
from mellow_tpu.wrapper import MellowWrapper
from tests.test_wrapper import SMALL

REF_WAV1 = "/root/reference/resource/1.wav"
REF_WAV2 = "/root/reference/resource/2.wav"


@pytest.fixture(scope="module")
def wrapper():
    params = jmellow.init_params(jax.random.PRNGKey(0), SMALL)
    return MellowWrapper(
        "test_small", "v0", 0, params=params, tokenizer=ByteTokenizer()
    )


def test_concurrent_requests_match_direct(wrapper):
    engine = BatchingEngine(wrapper, max_batch_size=4, max_wait_ms=200)
    prompts = ["alpha", "beta", "gamma"]
    futures = [
        engine.submit(REF_WAV1, REF_WAV2, p, max_len=4) for p in prompts
    ]
    results = [f.result(timeout=600) for f in futures]
    direct = wrapper.generate(
        [[REF_WAV1, REF_WAV2, p] for p in prompts], max_len=4,
        top_p=0.8, temperature=1.0,
    )
    assert results == direct
    engine.shutdown()


def test_mixed_keys_do_not_cross(wrapper):
    engine = BatchingEngine(wrapper, max_batch_size=4, max_wait_ms=50)
    f1 = engine.submit(REF_WAV1, REF_WAV1, "short", max_len=3)
    f2 = engine.submit(REF_WAV1, REF_WAV1, "short", max_len=5)
    r1, r2 = f1.result(timeout=600), f2.result(timeout=600)
    assert isinstance(r1, str) and isinstance(r2, str)
    engine.shutdown()


def test_shutdown_rejects_new_work(wrapper):
    engine = BatchingEngine(wrapper, max_batch_size=2, max_wait_ms=1)
    engine.shutdown()
    with pytest.raises(RuntimeError):
        engine.submit(REF_WAV1, REF_WAV1, "x", max_len=2)


class _RecordingWrapper:
    """Fake wrapper: records batch compositions, simulates device time."""

    def __init__(self):
        import threading
        self.lock = threading.Lock()
        self.batches = []

    def generate(self, examples, **kw):
        time.sleep(0.02)
        with self.lock:
            self.batches.append((kw["max_len"], len(examples)))
        return [f"{e[2]}|{kw['max_len']}" for e in examples]


def test_concurrent_load_mixed_keys_no_starvation():
    """N threads, 3 interleaved keys: every request completes with its own
    key's parameters (FIFO per-key fairness — no request starves behind a
    stream of other-key arrivals), batches never mix keys, clean shutdown."""
    import threading

    w = _RecordingWrapper()
    engine = BatchingEngine(w, max_batch_size=4, max_wait_ms=10)
    results = {}
    lock = threading.Lock()

    def client(i):
        key_len = 10 + (i % 3)
        r = engine.generate("a.wav", "b.wav", f"p{i}", max_len=key_len,
                            timeout=30)
        with lock:
            results[i] = (r, key_len)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(24)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
        assert not t.is_alive(), "request starved"
    assert len(results) == 24
    for i, (r, key_len) in results.items():
        assert r == f"p{i}|{key_len}"
    # Every dispatched batch was single-key and bounded.
    assert all(n <= 4 for _, n in w.batches)
    engine.shutdown()
    assert not engine._thread.is_alive()


def test_continuous_engine_per_request_knobs(wrapper):
    """per_request=True engine: a greedy request still matches the solo
    wrapper string exactly while a sampled one (own temperature/top_p)
    returns a decodable string; sampled submit without per_request is
    rejected."""
    from mellow_tpu.serving import ContinuousBatchingEngine

    engine = ContinuousBatchingEngine(
        wrapper, slots=2, horizon=16, flush_window=4, per_request=True
    )
    f_greedy = engine.submit(REF_WAV1, REF_WAV2, "alpha", max_len=6)
    f_samp = engine.submit(
        REF_WAV1, REF_WAV2, "beta", max_len=6, sample=True,
        temperature=1.3, top_p=0.8,
    )
    got = f_greedy.result(timeout=600)
    direct = wrapper.generate([[REF_WAV1, REF_WAV2, "alpha"]], max_len=6)
    assert got == direct[0]
    assert isinstance(f_samp.result(timeout=600), str)
    engine.shutdown()

    plain = ContinuousBatchingEngine(wrapper, slots=2, horizon=16)
    with pytest.raises(ValueError, match="per_request=True"):
        plain.submit(REF_WAV1, REF_WAV2, "x", max_len=4, sample=True)
    plain.shutdown()


def test_timeout_expires_queued_request():
    w = _RecordingWrapper()
    engine = BatchingEngine(w, max_batch_size=2, max_wait_ms=1)
    fut = engine.submit("a.wav", "b.wav", "late", max_len=5, timeout=0.0)
    with pytest.raises(TimeoutError):
        fut.result(timeout=30)
    engine.shutdown()


def test_continuous_engine_matches_direct(wrapper):
    """ContinuousBatchingEngine: staggered submissions (the second wave
    lands while the first is decoding, so it is ADMITTED into freed slots
    of the live batch) return exactly the solo wrapper.generate strings."""
    from mellow_tpu.serving import ContinuousBatchingEngine

    engine = ContinuousBatchingEngine(
        wrapper, slots=2, horizon=16, flush_window=4
    )
    prompts = ["alpha", "beta", "gamma", "delta"]
    futs = [
        engine.submit(REF_WAV1, REF_WAV2, prompts[0], max_len=6),
        engine.submit(REF_WAV1, REF_WAV2, prompts[1], max_len=4),
    ]
    time.sleep(0.2)  # first wave in flight
    futs += [
        engine.submit(REF_WAV1, REF_WAV2, prompts[2], max_len=5),
        engine.submit(REF_WAV1, REF_WAV2, prompts[3], max_len=6),
    ]
    results = [f.result(timeout=600) for f in futs]
    for p, got, ml in zip(prompts, results, (6, 4, 5, 6)):
        direct = wrapper.generate([[REF_WAV1, REF_WAV2, p]], max_len=ml)
        assert got == direct[0], p
    engine.shutdown()
    assert not engine._thread.is_alive()


def test_continuous_engine_rejects_mesh_and_gpt2(wrapper):
    from mellow_tpu.parallel import sharding as shd
    from mellow_tpu.serving import ContinuousBatchingEngine

    params = jmellow.init_params(jax.random.PRNGKey(0), SMALL)
    w_mesh = MellowWrapper(
        "test_small", "v0", 0, params=params, tokenizer=ByteTokenizer(),
        mesh=shd.make_mesh(8),
    )
    with pytest.raises(ValueError, match="single-device"):
        ContinuousBatchingEngine(w_mesh)


def test_shutdown_drains_prior_submissions():
    """Requests accepted before shutdown() sit ahead of the shutdown
    sentinel, so the dispatcher drains them (every accepted Future
    resolves) and join() returns promptly."""
    import threading

    class _Blocker:
        ev = threading.Event()

        def generate(self, examples, **kw):
            self.ev.wait(10)
            return ["x" for _ in examples]

    w = _Blocker()
    engine = BatchingEngine(w, max_batch_size=1, max_wait_ms=1)
    first = engine.submit("a", "b", "runs", max_len=3)
    time.sleep(0.1)  # dispatcher is now blocked inside generate
    queued = engine.submit("a", "b", "queued", max_len=4)
    shut = threading.Thread(target=engine.shutdown)
    shut.start()
    w.ev.set()
    shut.join(timeout=30)
    assert not shut.is_alive()
    assert first.result(10) == "x" and queued.result(10) == "x"
    assert not engine._thread.is_alive()
