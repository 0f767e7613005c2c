"""Benchmark harness — runs on the real TPU chip (axon platform).

Measures the BASELINE.json north-star metrics:
  * decode tokens/sec/chip (batched, static KV cache, bf16 perf mode)
  * mel+encoder clips/sec/chip (batched clip pairs)
  * p50 end-to-end generate latency

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with the
primary metric (decode tokens/sec/chip; baseline target 5000 from
BASELINE.md). Additional metrics go to stderr for humans.

The reference publishes no numbers (BASELINE.md); targets are the driver's
north-star floors. Random weights are used (no checkpoint reachable
offline) — throughput is weight-value independent.
"""

import json
import sys
import time

import numpy as np

DECODE_BASELINE_TOKSPS = 5000.0  # BASELINE.md target floor
ENCODER_BASELINE_CLIPS = 100.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mellow_tpu.config import get_config
    from mellow_tpu.models import generate as gen
    from mellow_tpu.models import htsat, mellow as mellow_model

    cfg = get_config("v0")
    dtype = jnp.bfloat16
    log(f"devices: {jax.devices()}")

    params = mellow_model.init_params(jax.random.PRNGKey(0), cfg, dtype)

    # ------------------------------------------------------------------
    # 1) decode tokens/sec/chip: batched greedy decode with KV cache.
    # ------------------------------------------------------------------
    B, max_len = 64, 128
    rng = np.random.RandomState(0)
    prefix = jnp.asarray(
        rng.randn(B, cfg.prefix_length, cfg.d_proj) * 0.02, dtype
    )

    def run_decode(cache_dtype):
        return gen.generate(
            params["decoder"], cfg.decoder, prefix,
            max_len=max_len, stop_token_id=-1,  # never fires: fixed-length run
            greedy=True, cache_dtype=cache_dtype,
        )

    best = (0.0, None)
    for cache_dtype in ("bfloat16", "int8"):
        t0 = time.time()
        res = run_decode(cache_dtype)
        res.tokens.block_until_ready()
        log(f"decode[{cache_dtype}] compile+first run: {time.time() - t0:.1f}s")
        times = []
        for _ in range(3):
            t0 = time.time()
            res = run_decode(cache_dtype)
            res.tokens.block_until_ready()
            times.append(time.time() - t0)
        steps = int(res.num_steps)
        tps = B * steps / min(times)
        log(f"decode[{cache_dtype}]: B={B} steps={steps} "
            f"time={min(times):.3f}s -> {tps:,.0f} tok/s")
        if tps > best[0]:
            best = (tps, cache_dtype)
    tokens_per_s, best_mode = best
    log(f"decode best mode: {best_mode}")

    # ------------------------------------------------------------------
    # 2) encoder clips/sec/chip
    # ------------------------------------------------------------------
    Be, reps = 32, 10
    wave = jnp.asarray(rng.randn(Be, 320000) * 0.1, dtype)

    @jax.jit
    def enc_loop(w):
        # reps chained encoder passes inside ONE program: amortizes the
        # host<->device dispatch RTT that dominates single-call timing on
        # a tunneled chip.
        def body(i, acc):
            r = htsat.encode_audio(w + acc * 0, params, cfg.frontend, cfg.encoder)
            return jnp.sum(r.astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    float(enc_loop(wave))
    t0 = time.time()
    float(enc_loop(wave))
    dt = (time.time() - t0) / reps
    clips_per_s = Be / dt
    log(f"encoder: B={Be} time={dt:.3f}s/pass -> {clips_per_s:,.0f} clips/s")

    # ------------------------------------------------------------------
    # 3) p50 end-to-end generate latency (single example pair, 32 tokens)
    # ------------------------------------------------------------------
    wave1 = jnp.asarray(rng.randn(1, 320000) * 0.1, dtype)
    text = jnp.asarray(rng.randint(2, 49000, (1, cfg.text_tokenization_len)), jnp.int32)

    def run_e2e():
        return mellow_model.generate_tokens(
            params, cfg, wave1, wave1, text, max_len=32, cache_dtype="bfloat16"
        )

    run_e2e().tokens.block_until_ready()
    lat = []
    for _ in range(5):
        t0 = time.time()
        run_e2e().tokens.block_until_ready()
        lat.append(time.time() - t0)
    p50 = sorted(lat)[len(lat) // 2]
    log(f"e2e generate (1 pair, 32 tok): p50 {p50*1000:.0f} ms")
    log(f"encoder clips/s vs baseline {ENCODER_BASELINE_CLIPS}: "
        f"{clips_per_s / ENCODER_BASELINE_CLIPS:.2f}x")

    print(json.dumps({
        "metric": "decode tokens/sec/chip",
        "value": round(tokens_per_s, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tokens_per_s / DECODE_BASELINE_TOKSPS, 3),
    }))


if __name__ == "__main__":
    main()
