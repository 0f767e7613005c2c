"""int8 KV cache (perf option): quantization fidelity and decode agreement
with the float cache."""

import numpy as np
import jax
import jax.numpy as jnp

from mellow_tpu.config import LlamaConfig
from mellow_tpu.models import generate as gen, llama
from tests.test_llama import SMALL, small_pair  # noqa: F401


def test_quantize_roundtrip_error():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 7, 256).astype(np.float32))
    q, s = llama.quantize_kv(x)
    deq = q.astype(jnp.float32) * s[..., None]
    rel = float(jnp.max(jnp.abs(deq - x)) / jnp.max(jnp.abs(x)))
    assert rel < 1e-2, rel
    # requantization of already-quantized values is exact
    q2, s2 = llama.quantize_kv(deq)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q2))


def test_int8_decode_close_to_fp32(small_pair):
    _, params = small_pair
    rng = np.random.RandomState(1)
    prefix = jnp.asarray((rng.randn(2, 9, SMALL.hidden_size) * 0.1).astype(np.float32))

    r_fp = gen.generate(params, SMALL, prefix, max_len=8, stop_token_id=-1,
                        greedy=True, cache_dtype="float32")
    r_i8 = gen.generate(params, SMALL, prefix, max_len=8, stop_token_id=-1,
                        greedy=True, cache_dtype="int8")
    a, b = np.asarray(r_fp.tokens), np.asarray(r_i8.tokens)
    # int8 is a lossy perf mode: require high (not perfect) token agreement.
    agree = (a == b).mean()
    assert agree >= 0.75, (agree, a, b)
