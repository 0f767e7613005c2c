"""Capture a per-op TPU trace of prefill-only at a given batch/chunking.

Usage: python benchmarks/profile_prefill.py [B] [chunk] [top_n]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(B=256, chunk=0, top_n=30, logdir=None):
    import jax
    import jax.numpy as jnp

    from mellow_tpu.config import get_config
    from mellow_tpu.models import llama, mellow as mellow_model
    from benchmarks.xplane_tool import load_xspace, tpu_op_totals

    logdir = logdir or f"/tmp/jaxprof_prefill_{B}_{chunk}"
    cfg = get_config("v0")
    dtype = jnp.bfloat16
    params = mellow_model.init_params(jax.random.PRNGKey(0), cfg, dtype)
    dec = llama.quantize_decoder(params["decoder"], cfg.decoder)
    rng = np.random.RandomState(0)
    prefix = jnp.asarray(rng.randn(B, cfg.prefix_length, cfg.d_proj) * 0.02, dtype)
    S_max = cfg.prefix_length + 144

    @jax.jit
    def run(dec, prefix):
        cache = llama.KVCache.create(cfg.decoder, B, S_max, jnp.int8)
        x, c2 = llama.prefill(dec, cfg.decoder, prefix, cache, chunk=chunk)
        return jnp.sum(x.astype(jnp.float32)), c2.k, c2.length

    s, k, _ = run(dec, prefix)
    float(s)
    t0 = time.time()
    float(run(dec, prefix)[0])
    print(f"prefill B={B} chunk={chunk}: {time.time()-t0:.3f}s", file=sys.stderr)

    jax.profiler.start_trace(logdir)
    float(run(dec, prefix)[0])
    jax.profiler.stop_trace()

    xs = load_xspace(logdir)
    for line_name, ops in tpu_op_totals(xs).items():
        total_ms = sum(v[0] for v in ops.values()) / 1e9
        print(f"\n== {line_name}  (sum {total_ms:.2f} ms, {len(ops)} ops)")
        for name, (ps, cnt) in sorted(ops.items(), key=lambda kv: -kv[1][0])[:top_n]:
            print(f"  {ps/1e9:9.3f} ms  x{cnt:<6} {name[:110]}")


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    main(B, chunk, top_n)
