"""Bench-frame A/B of prefill chunking: time gen.generate at SHORT=16
decode steps (B=256 int8/int8) for chunk in {0, 128, 64, 32} — the same
frame bench.py derives its prefill number from. Single-dispatch timing is
fine here (~350 ms >> tunnel RTT); min over reps.

Usage: python benchmarks/exp_prefill_chunk2.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mellow_tpu.utils.compile_cache import enable as enable_cache

enable_cache()

from mellow_tpu.config import get_config
from mellow_tpu.models import generate as gen
from mellow_tpu.models import llama, mellow as mellow_model


def main():
    cfg = get_config("v0")
    dtype = jnp.bfloat16
    B, SHORT = 256, 16
    params = mellow_model.init_params(jax.random.PRNGKey(0), cfg, dtype)
    dec = llama.quantize_decoder(params["decoder"], cfg.decoder)
    rng = np.random.RandomState(0)
    prefix = jnp.asarray(rng.randn(B, cfg.prefix_length, cfg.d_proj) * 0.02, dtype)

    base = None
    for chunk in (0, 128, 64, 32):
        def run():
            return gen.generate(
                dec, cfg.decoder, prefix, max_len=SHORT, stop_token_id=-1,
                greedy=True, cache_dtype="int8", prefill_chunk=chunk,
            )

        t0 = time.time()
        jax.block_until_ready(run().tokens)
        comp = time.time() - t0
        ts = []
        for _ in range(4):
            t0 = time.time()
            jax.block_until_ready(run().tokens)
            ts.append(time.time() - t0)
        t = min(ts)
        if base is None:
            base = t
        print(
            f"chunk={chunk or 'off':>4}: {t*1e3:7.1f} ms (prefill+16 steps) "
            f"[{base/t:.2f}x vs off, compile {comp:.0f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
