"""Per-op TPU trace of the HTSAT encoder pass (mel frontend + Swin trunk +
TSCAM head) at a given batch — the evidence base for the encoder
bandwidth-bound analysis (VERDICT r2 item 2).

Usage: python benchmarks/profile_encoder.py [B] [top_n]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(B=32, top_n=40, logdir=None):
    import jax
    import jax.numpy as jnp

    from mellow_tpu.config import get_config
    from mellow_tpu.models import htsat, mellow as mellow_model
    from benchmarks.xplane_tool import load_xspace, tpu_op_totals

    logdir = logdir or f"/tmp/jaxprof_encoder_{B}"
    cfg = get_config("v0")
    dtype = jnp.bfloat16
    params = mellow_model.init_params(jax.random.PRNGKey(0), cfg, dtype)
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(B, 320000) * 0.1, dtype)

    @jax.jit
    def run(p, w):
        return htsat.encode_audio(w, p, cfg.frontend, cfg.encoder)

    jax.block_until_ready(run(params, wave))
    t0 = time.time()
    jax.block_until_ready(run(params, wave))
    dt = time.time() - t0
    print(f"encoder B={B}: {dt*1e3:.1f} ms/pass -> {B/dt:,.0f} clips/s",
          file=sys.stderr)

    jax.profiler.start_trace(logdir)
    jax.block_until_ready(run(params, wave))
    jax.profiler.stop_trace()

    xs = load_xspace(logdir)
    for line_name, ops in tpu_op_totals(xs).items():
        total_ms = sum(v[0] for v in ops.values()) / 1e9
        print(f"\n== {line_name}  (sum {total_ms:.2f} ms, {len(ops)} ops)")
        for name, (ps, cnt) in sorted(ops.items(), key=lambda kv: -kv[1][0])[:top_n]:
            print(f"  {ps/1e9:9.3f} ms  x{cnt:<6} {name[:120]}")


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    main(B, top_n)
