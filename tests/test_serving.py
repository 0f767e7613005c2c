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
