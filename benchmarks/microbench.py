"""Per-component microbenchmarks (SURVEY.md section 7.1 `benchmarks/`).

`bench.py` at the repo root prints the single headline JSON line the driver
records; this harness breaks the pipeline into its stages so regressions can
be localised:

    python benchmarks/microbench.py --component melspec --batch 32
    python benchmarks/microbench.py --component encoder --batch 32
    python benchmarks/microbench.py --component decode --batch 64 --steps 128
    python benchmarks/microbench.py --component prefill --batch 8
    python benchmarks/microbench.py --component all

Each component reports wall time per pass and the derived rate. Work is
chained inside one jitted fori_loop and completion is forced by fetching a
dependent SCALAR — on a tunneled chip the per-dispatch RTT (tens of ms)
otherwise dominates, and large device->host transfers crawl (see
CLAUDE.md "Environment gotchas").

Run on the real chip by default; pass --cpu to force the CPU backend (for
smoke-testing the harness itself, not for numbers).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_loop(fn, reps: int, warmup: int = 1):
    """Median wall seconds per pass of `fn` (fn must force completion)."""
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(3):
        t0 = time.time()
        fn()
        times.append((time.time() - t0) / reps)
    return sorted(times)[len(times) // 2]


def bench_melspec(cfg, B: int, reps: int, dtype):
    """Log-mel front-end: jnp reference vs fused Pallas kernel (TPU only)."""
    import jax
    import jax.numpy as jnp

    from mellow_tpu.ops import frontend
    from mellow_tpu.ops.pallas_melspec import log_mel_spectrogram_pallas

    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(B, 320000) * 0.1, dtype)
    results = {}
    impls = {"jnp": frontend.log_mel_spectrogram}
    if jax.devices()[0].platform != "cpu":
        impls["pallas"] = log_mel_spectrogram_pallas

    for name, impl in impls.items():
        @jax.jit
        def loop(w, impl=impl):
            def body(i, acc):
                m = impl(w + (acc * 0).astype(w.dtype), cfg.frontend)
                return jnp.sum(m.astype(jnp.float32)) * 1e-12
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        dt = timed_loop(lambda: float(loop(wave)), reps)
        rate = B / dt
        log(f"melspec[{name}]: {dt*1e3:.2f} ms/pass (B={B}) -> {rate:,.0f} clips/s")
        results[f"melspec_{name}_clips_per_s"] = round(rate, 1)
    return results


def bench_encoder(cfg, B: int, reps: int, dtype):
    """Full HTSAT encode (mel -> swin -> tscam -> c2l -> projection)."""
    import jax
    import jax.numpy as jnp

    from mellow_tpu.models import htsat, mellow as mellow_model

    params = mellow_model.init_params(jax.random.PRNGKey(0), cfg, dtype)
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(B, 320000) * 0.1, dtype)

    @jax.jit
    def loop(p, w):
        def body(i, acc):
            r = htsat.encode_audio(w + (acc * 0).astype(w.dtype), p, cfg.frontend, cfg.encoder)
            return jnp.sum(r.astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    dt = timed_loop(lambda: float(loop(params, wave)), reps)
    rate = B / dt
    log(f"encoder: {dt*1e3:.2f} ms/pass (B={B}) -> {rate:,.0f} clips/s")
    return {"encoder_clips_per_s": round(rate, 1)}


def bench_prefill(cfg, B: int, reps: int, dtype):
    """LM prefill: one teacher-forced forward over the 389-token prefix."""
    import jax
    import jax.numpy as jnp

    from mellow_tpu.models import llama, mellow as mellow_model

    params = mellow_model.init_params(jax.random.PRNGKey(0), cfg, dtype)
    rng = np.random.RandomState(0)
    seq = jnp.asarray(rng.randn(B, cfg.prefix_length, cfg.d_proj) * 0.02, dtype)

    # params must be a jit ARGUMENT: closed-over arrays are inlined into the
    # serialized HLO, and the 135M-param decoder exceeds the remote-compile
    # tunnel's request-size limit (HTTP 413).
    @jax.jit
    def loop(p, s):
        def body(i, acc):
            logits = llama.forward(p, cfg.decoder, s + (acc * 0).astype(s.dtype))
            return jnp.sum(logits[:, -1, :].astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    dec = params["decoder"]
    dt = timed_loop(lambda: float(loop(dec, seq)), reps)
    toks = B * cfg.prefix_length / dt
    log(f"prefill: {dt*1e3:.2f} ms/pass (B={B}, S={cfg.prefix_length}) "
        f"-> {toks:,.0f} tok/s")
    return {"prefill_tokens_per_s": round(toks, 1)}


def bench_decode(cfg, B: int, steps: int, dtype, cache_dtype: str,
                 weight_dtype: str = "bfloat16"):
    """Batched greedy decode with the packed KV cache; weight_dtype="int8"
    runs the quantize_decoder path (per-channel int8 matmul weights)."""
    import jax
    import jax.numpy as jnp

    from mellow_tpu.models import generate as gen, llama, mellow as mellow_model
    from mellow_tpu.utils import roofline as rf

    params = mellow_model.init_params(jax.random.PRNGKey(0), cfg, dtype)
    dec = params["decoder"]
    if weight_dtype == "int8":
        dec = llama.quantize_decoder(dec, cfg.decoder)
    rng = np.random.RandomState(0)
    prefix = jnp.asarray(rng.randn(B, cfg.prefix_length, cfg.d_proj) * 0.02, dtype)

    def run():
        res = gen.generate(
            dec, cfg.decoder, prefix,
            max_len=steps, stop_token_id=-1, greedy=True,
            cache_dtype=cache_dtype,
        )
        res.tokens.block_until_ready()
        return res

    run()
    times = []
    for _ in range(3):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    tps = B * steps / min(times)
    s_max = cfg.prefix_length + steps
    bw = (steps / min(times)) * rf.decode_step_bytes(
        cfg.decoder, B, s_max, cache_dtype, weight_dtype
    )
    log(f"decode[cache={cache_dtype},w={weight_dtype}]: B={B} steps={steps} "
        f"time={min(times):.3f}s -> {tps:,.0f} tok/s | {bw/1e9:.0f} GB/s "
        f"({rf.pct(bw/rf.PEAK_HBM_BYTES)} of streaming roofline)")
    return {f"decode_{cache_dtype}_w{weight_dtype}_tokens_per_s": round(tps, 1)}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--component", default="all",
                    choices=["melspec", "encoder", "prefill", "decode", "all"])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=128, help="decode steps")
    ap.add_argument("--reps", type=int, default=10, help="passes per timing loop")
    ap.add_argument("--cache-dtype", default="bfloat16",
                    choices=["float32", "bfloat16", "int8"])
    ap.add_argument("--weight-dtype", default="bfloat16",
                    choices=["bfloat16", "int8"],
                    help="decoder matmul weights (int8 = quantize_decoder)")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU backend (harness smoke test only)")
    ap.add_argument("--fp32", action="store_true",
                    help="parity dtype instead of bf16 perf mode")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mellow_tpu.config import get_config

    cfg = get_config("v0")
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    log(f"devices: {jax.devices()}  dtype={dtype.__name__}")

    out = {}
    if args.component in ("melspec", "all"):
        out.update(bench_melspec(cfg, args.batch, args.reps, dtype))
    if args.component in ("encoder", "all"):
        out.update(bench_encoder(cfg, args.batch, args.reps, dtype))
    if args.component in ("prefill", "all"):
        out.update(bench_prefill(cfg, min(args.batch, 8), args.reps, dtype))
    if args.component in ("decode", "all"):
        B = args.batch if args.component == "decode" else 64
        out.update(bench_decode(cfg, B, args.steps, dtype, args.cache_dtype,
                                args.weight_dtype))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
