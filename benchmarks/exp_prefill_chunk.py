"""Experiment: batch-chunked prefill vs the monolithic layer scan.

benchmarks/README.md (r2): XLA flips the scan carry's activation layout to
batch-minor at B=256 (profiled {0,2,1} + repair copies; B<=128 keeps the
standard layout), dropping large-batch prefill to ~40% MFU. VERDICT r2 #1
candidate fix: run the scan as sequential chunks of <=128 rows inside the
same program and concatenate into the cache.

Measures prefill-only time at B=256 (int8 weights, int8 cache — the bench
headline mode) for chunk in {off, 128, 64}, plus B=128 monolithic as the
per-chunk reference. Timing: R chained reps inside one jit (fori_loop),
completion forced by a dependent scalar fetch (tunneled-chip methodology).

Run: python benchmarks/exp_prefill_chunk.py
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
from mellow_tpu.models import llama, mellow as mellow_model

cfg = get_config("v0")
P = cfg.prefix_length
LONG = 144
S_max = P + LONG
R = 3


def make_fn(B, chunk):
    @jax.jit
    def f(dec, prefix):
        def body(i, acc):
            cache = llama.KVCache.create(cfg.decoder, B, S_max, jnp.int8)
            x, c2 = llama.prefill(
                dec, cfg.decoder, prefix + (acc * 0).astype(prefix.dtype), cache,
                chunk=chunk
            )
            # Consume the WHOLE cache so the write cannot be elided; the
            # ~1.5 ms extra read is identical across variants.
            return (
                jnp.sum(x.astype(jnp.float32)) * 1e-9
                + jnp.sum(c2.k.astype(jnp.float32)) * 1e-12
            )

        return jax.lax.fori_loop(0, R, body, jnp.float32(0))

    return f


def main():
    print(f"devices: {jax.devices()}", flush=True)
    dtype = jnp.bfloat16
    params = mellow_model.init_params(jax.random.PRNGKey(0), cfg, dtype)
    dec = llama.quantize_decoder(params["decoder"], cfg.decoder)
    rng = np.random.RandomState(0)

    prefixes = {
        B: jnp.asarray(rng.randn(B, P, cfg.d_proj) * 0.02, dtype)
        for B in (128, 256)
    }

    for B, chunk in [(256, 0), (256, 128), (256, 64), (128, 0)]:
        fn = make_fn(B, chunk)
        t0 = time.time()
        float(fn(dec, prefixes[B]))
        compile_s = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(fn(dec, prefixes[B]))
            ts.append(time.time() - t0)
        per = min(ts) / R
        print(
            f"B={B} chunk={chunk or 'off'}: {per*1e3:7.1f} ms/prefill "
            f"({B*P/per/1e3:7.1f}k tok/s) [compile {compile_s:.0f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
