"""Experiment: whole-attention-half fused Pallas block vs the split path.

Measures B=256 chunk=32 prefill (the bench headline mode: int8 weights,
int8 cache) with llama._layer's attention half either as the r2 split
path (rms_norm + projections + pallas_attention GQA kernel) or the r3
fused_attn_block kernel (now DEFAULT-ON; disable with
MELLOW_TPU_DISABLE_FUSED_BLOCK=1 — trace-time env, so run once per
process). Measured: split 232.5 ms, fused 228.8 ms (stable A/B).

Run: python benchmarks/exp_fused_block.py                         # fused
     MELLOW_TPU_DISABLE_FUSED_BLOCK=1 python benchmarks/exp_fused_block.py
"""

import os
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
S_max = P + 144
R = 3
B = 256


def main():
    mode = (
        "split" if os.environ.get("MELLOW_TPU_DISABLE_FUSED_BLOCK")
        else "fused-block"
    )
    print(f"devices: {jax.devices()}  mode={mode}", flush=True)
    dtype = jnp.bfloat16
    params = mellow_model.init_params(jax.random.PRNGKey(0), cfg, dtype)
    dec = llama.quantize_decoder(params["decoder"], cfg.decoder)
    rng = np.random.RandomState(0)
    prefix = jnp.asarray(rng.randn(B, P, cfg.d_proj) * 0.02, dtype)

    @jax.jit
    def f(dec, prefix):
        def body(i, acc):
            cache = llama.KVCache.create(cfg.decoder, B, S_max, jnp.int8)
            x, c2 = llama.prefill(
                dec, cfg.decoder, prefix + (acc * 0).astype(prefix.dtype),
                cache,
            )
            return (
                jnp.sum(x.astype(jnp.float32)) * 1e-9
                + jnp.sum(c2.k.astype(jnp.float32)) * 1e-12
            )

        return jax.lax.fori_loop(0, R, body, jnp.float32(0))

    t0 = time.time()
    float(f(dec, prefix))
    compile_s = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(f(dec, prefix))
        ts.append(time.time() - t0)
    per = min(ts) / R
    print(
        f"{mode}: B={B} {per*1e3:7.1f} ms/prefill "
        f"({B*P/per/1e3:7.1f}k tok/s) [compile {compile_s:.0f}s]",
        flush=True,
    )


if __name__ == "__main__":
    main()
