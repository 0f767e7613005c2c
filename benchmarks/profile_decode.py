"""Capture a jax.profiler trace of the jitted decode loop on the real chip
and print the per-op time breakdown (parsed from the xplane proto with
tensorboard_plugin_profile). Usage:

    python benchmarks/profile_decode.py [cache_dtype] [weight_dtype] [B]
"""

import glob
import gzip
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(cache_dtype="int8", weight_dtype="int8", B=64, logdir="/tmp/jaxprof"):
    import jax
    import jax.numpy as jnp

    from mellow_tpu.config import get_config
    from mellow_tpu.models import generate as gen
    from mellow_tpu.models import llama, mellow as mellow_model

    cfg = get_config("v0")
    dtype = jnp.bfloat16
    params = mellow_model.init_params(jax.random.PRNGKey(0), cfg, dtype)
    dec = params["decoder"]
    if weight_dtype == "int8":
        dec = llama.quantize_decoder(dec, cfg.decoder)
    rng = np.random.RandomState(0)
    prefix = jnp.asarray(rng.randn(B, cfg.prefix_length, cfg.d_proj) * 0.02, dtype)

    def run():
        return gen.generate(
            dec, cfg.decoder, prefix, max_len=128, stop_token_id=-1,
            greedy=True, cache_dtype=cache_dtype,
        )

    run().tokens.block_until_ready()  # compile
    t0 = time.time()
    r = run(); r.tokens.block_until_ready()
    print(f"uninstrumented run: {time.time()-t0:.3f}s for 128 steps "
          f"({(time.time()-t0)/128*1e3:.2f} ms/step)", file=sys.stderr)

    jax.profiler.start_trace(logdir)
    r = run()
    r.tokens.block_until_ready()
    jax.profiler.stop_trace()
    return logdir


def parse(logdir):
    """Aggregate op durations from the captured .xplane.pb."""
    paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not paths:
        print("no xplane captured", file=sys.stderr)
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([paths[-1]], "framework_op_stats", {})
    # Returned as gzipped json or csv depending on version; just try json
    try:
        import json
        if isinstance(data, bytes):
            try:
                data = gzip.decompress(data)
            except OSError:
                pass
        rows = json.loads(data)
        print(json.dumps(rows)[:4000])
    except Exception as e:  # fall back to raw dump
        print(f"parse fallback ({e}); raw head:", file=sys.stderr)
        print(data[:4000])


if __name__ == "__main__":
    cache = sys.argv[1] if len(sys.argv) > 1 else "int8"
    weight = sys.argv[2] if len(sys.argv) > 2 else "int8"
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    logdir = capture(cache, weight, B)
    parse(logdir)
