"""Experiment: fused Pallas MLP block vs the XLA MLP half at the real
chunked-prefill shape (chunk=32 rows x S=389, 30 layers).

Variants:
  A. XLA path (rms_norm + 3 matmuls + silu, int8 weights dequantized by
     _mm's fused convert) — what llama._layer runs today
  B. fused_mlp_block bf16 (norm+residual inside the program)
  C. fused_mlp_block_w8a8 (int8 weights resident + in-kernel activation
     quant -> native int8 MXU dots; exp_w8a8_prefill measured the raw
     int8 dot 1.51x bf16 at this shape)

Run: python benchmarks/exp_mlp_block.py   (real TPU)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mellow_tpu.models import llama
from mellow_tpu.ops.pallas_mlp_block import fused_mlp_block, fused_mlp_block_w8a8

B, S, D, I = 32, 389, 576, 1536
L, REPS = 30, 8
EPS = 1e-5


def timed(name, fn, *args, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(fn(*args))
        ts.append(time.time() - t0)
    t = min(ts)
    print(f"{name}: {t*1e3:8.2f} ms total  {t/(REPS*L)*1e3:6.3f} ms/layer",
          flush=True)
    return t


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(B, S, D) * 0.5, dt)
    ln = jnp.asarray(rng.randn(L, D) * 0.1 + 1.0, dt)
    wg = jnp.asarray(rng.randn(L, D, I) * 0.05, dt)
    wu = jnp.asarray(rng.randn(L, D, I) * 0.05, dt)
    wd = jnp.asarray(rng.randn(L, I, D) * 0.05, dt)
    qg = jax.vmap(llama.quantize_weight)(wg)
    qu = jax.vmap(llama.quantize_weight)(wu)
    qd = jax.vmap(llama.quantize_weight)(wd)

    def xla_mlp(x, lnl, g, u, d):
        h = llama.rms_norm(x, lnl, EPS)
        gate = jax.nn.silu(llama._mm(h, g))
        up = llama._mm(h, u)
        return x + llama._mm(gate * up, d)

    def stream(layer_fn, *wtrees):
        def run(x, *ws):
            def rep(x, _):
                def body(x, wl):
                    return layer_fn(x, *wl), None
                x, _ = jax.lax.scan(body, x, ws)
                return x, None
            x, _ = jax.lax.scan(rep, x, None, length=REPS)
            return jnp.sum(x.astype(jnp.float32))
        return jax.jit(run)

    print(f"== {REPS} reps x {L} layers of MLP half on ({B},{S},{D}), I={I}")
    timed("A XLA int8-w ", stream(xla_mlp), x, ln, qg, qu, qd)
    timed("A' XLA bf16-w", stream(xla_mlp), x, ln, wg, wu, wd)
    timed(
        "B fused bf16 ",
        stream(lambda x, lnl, g, u, d: fused_mlp_block(
            x, lnl, g, u, d, eps=EPS)),
        x, ln, wg, wu, wd,
    )
    timed(
        "C fused W8A8 ",
        stream(lambda x, lnl, gq, gs, uq, us, dq, ds: fused_mlp_block_w8a8(
            x, lnl, gq, gs, uq, us, dq, ds, eps=EPS)),
        x, ln, qg["q"], qg["scale"], qu["q"], qu["scale"], qd["q"],
        qd["scale"],
    )


if __name__ == "__main__":
    main()
