"""Benchmark harness — runs on the real TPU chip (axon platform).

Measures the BASELINE.json north-star metrics:
  * decode tokens/sec/chip, swept over (batch, kv-cache dtype, weight dtype)
    — int8 weights via llama.quantize_decoder (decode is weight+cache
    streaming bound, so the sweep targets HBM bytes/step);
  * mel+encoder clips/sec/chip (batched clip pairs);
  * p50 end-to-end generate latency.

Every rate is reported next to its roofline position (% of the chip's
measured 530 GB/s streaming or 158 TFLOP/s bf16 — mellow_tpu/utils/
roofline.py), plus the bf16-vs-quantized token divergence, so the numbers
show where each stage sits vs the hardware, not just vs the driver floor.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with the
primary metric (decode tokens/sec/chip; baseline target 5000 from
BASELINE.md). Additional metrics go to stderr for humans.

The reference publishes no numbers (BASELINE.md); targets are the driver's
north-star floors. Random weights are used (no checkpoint reachable
offline) — throughput is weight-value independent.
"""

import functools
import json
import os
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

    from mellow_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()  # persistent XLA cache: 2-3x faster re-runs

    from mellow_tpu.config import get_config
    from mellow_tpu.models import generate as gen
    from mellow_tpu.models import htsat, llama, mellow as mellow_model
    from mellow_tpu.utils import roofline as rf

    cfg = get_config("v0")
    dtype = jnp.bfloat16
    log(f"devices: {jax.devices()}")

    params = mellow_model.init_params(jax.random.PRNGKey(0), cfg, dtype)
    dec_bf16 = params["decoder"]
    dec_int8w = llama.quantize_decoder(dec_bf16, cfg.decoder)

    # ------------------------------------------------------------------
    # 1) decode tokens/sec/chip: (B, cache dtype, weight dtype) sweep.
    #
    # Steady-state decode rate is measured as the SLOPE between two
    # generation lengths: per_step = (t_long - t_short)/(LONG - SHORT).
    # This cancels prefill + dispatch overhead (a profile showed the old
    # fixed-length timing charged the 86 ms B=64 prefill to every 128-step
    # window, understating decode by ~1.6x). Prefill and e2e rates are
    # reported alongside.
    # ------------------------------------------------------------------
    SHORT, LONG = 16, 144
    P = cfg.prefix_length
    s_max = P + LONG
    rng = np.random.RandomState(0)

    def run_decode(dec, B, cache_dtype, prefix, max_len, w8a8=False):
        return gen.generate(
            dec, cfg.decoder, prefix,
            max_len=max_len, stop_token_id=-1,  # never fires: fixed-length
            greedy=True, cache_dtype=cache_dtype, w8a8=w8a8,
        )

    def time_decode(dec, B, cache_dtype, prefix, max_len, w8a8=False, reps=3):
        # Force completion by FETCHING a dependent scalar (num_steps is
        # an output of the same jitted program as the tokens).
        # block_until_ready alone returned EARLY on the axon runtime in
        # this session (sub-RTT "timings", 141M tok/s nonsense) — the
        # same flake CLAUDE.md records for microbench loops; a scalar
        # fetch costs one tunnel RTT which the slope methodology
        # cancels (it is identical for the SHORT and LONG runs).
        t0 = time.time()
        res = run_decode(dec, B, cache_dtype, prefix, max_len, w8a8)
        assert int(res.num_steps) == max_len
        compile_s = time.time() - t0
        times = []
        for _ in range(reps):
            t0 = time.time()
            res = run_decode(dec, B, cache_dtype, prefix, max_len, w8a8)
            int(res.num_steps)
            times.append(time.time() - t0)
        return min(times), compile_s, res

    sweep = [
        # (B, cache_dtype, weight_dtype)  -- weight int8 = quantize_decoder;
        # int8-w8a8 additionally quantizes prefill MLP ACTIVATIONS in-kernel
        # (native int8 MXU dots, ops/pallas_mlp_block.py) — decode is
        # unchanged (bandwidth-bound; int8 dots measured no faster there).
        (64, "bfloat16", "bfloat16"),
        (64, "int8", "bfloat16"),
        (64, "int8", "int8"),
        (64, "int8", "int8-w8a8"),
        (128, "int8", "int8"),
        (256, "int8", "int8"),
        (256, "int8", "int8-w8a8"),
        # B=512 amortizes prefill + dispatch harder: the decode step stays
        # bandwidth/compute-proportional (~2x the B=256 step) while the
        # prefill runs at its ~634k tok/s rate, so the INCL-PREFILL number
        # crosses the r3 verdict's 40k bar here (measured r4: 50.3k steady
        # / 41.5k incl-prefill). Cache 4.2 GB int8 — fits v5e HBM.
        (512, "int8", "int8-w8a8"),
        # B=768 keeps scaling (r5 probe: 53.3k steady / 43.5k
        # incl-prefill, cache ~6.6 GB); B=1024 REGRESSES to 51.3k
        # (~8.8 GB cache crowds HBM) — 768 is the headline batch.
        (768, "int8", "int8-w8a8"),
    ]
    results = {}
    best = (0.0, None)
    prefixes = {}
    for B, cache_dtype, weight_dtype in sweep:
        if B not in prefixes:
            prefixes[B] = jnp.asarray(
                rng.randn(B, P, cfg.d_proj) * 0.02, dtype
            )
        dec = dec_bf16 if weight_dtype == "bfloat16" else dec_int8w
        w8a8 = weight_dtype == "int8-w8a8"
        key = (B, cache_dtype, weight_dtype)
        t_short, c1, _ = time_decode(dec, B, cache_dtype, prefixes[B], SHORT, w8a8)
        t_long, c2, res = time_decode(dec, B, cache_dtype, prefixes[B], LONG, w8a8)
        log(f"decode{key} compiles: {c1:.1f}s + {c2:.1f}s")
        per_step = (t_long - t_short) / (LONG - SHORT)
        tps = B / per_step
        prefill_s = max(t_short - SHORT * per_step, 1e-9)
        e2e_tps = B * LONG / t_long
        # Match the window generate() actually ran (batch-adaptive default;
        # W feeds the fused-decode gate, hence the roofline denominator).
        W = gen._effective_window(None, LONG, True, B)
        byts = rf.decode_step_bytes(
            cfg.decoder, B, s_max, cache_dtype,
            "int8" if w8a8 else weight_dtype,  # weights stream int8 either way
            fused_decode=gen._fused_decode_auto(
                cfg.decoder, "llama", dtype, cache_dtype, B, s_max, W
            ),
        )
        flops = rf.decode_step_flops(cfg.decoder, B, s_max)
        bw = byts / per_step
        fl = flops / per_step
        log(
            f"decode{key}: {per_step*1e3:.2f} ms/step -> {tps:,.0f} tok/s "
            f"steady-state ({e2e_tps:,.0f} tok/s incl. the {prefill_s*1e3:.0f} ms "
            f"prefill over {LONG} steps) | {byts/1e6:.0f} MB/step -> "
            f"{bw/1e9:.0f} GB/s ({rf.pct(bw/rf.PEAK_HBM_BYTES)} of streaming "
            f"roofline), {fl/1e12:.2f} TFLOP/s ({rf.pct(fl/rf.PEAK_BF16_FLOPS)} MFU) | "
            f"prefill {B*P/prefill_s/1e3:,.0f}k tok/s"
        )
        results[key] = (tps, np.asarray(res.tokens))
        if tps > best[0]:
            best = (tps, key)
    tokens_per_s, best_key = best
    log(f"decode best mode: B={best_key[0]} cache={best_key[1]} weights={best_key[2]}")

    # bf16-vs-quantized token divergence at B=64 (same prefix, greedy)
    t_ref = results[(64, "bfloat16", "bfloat16")][1]
    t_q = results[(64, "int8", "int8")][1]
    agree = float((t_ref == t_q).mean())
    first_div = int(np.argmax((t_ref != t_q).any(axis=0))) if (t_ref != t_q).any() else LONG
    log(f"quantized-vs-bf16 token agreement: {agree:.3f} "
        f"(first divergent step: {first_div}/{LONG}; random weights — "
        f"real-checkpoint agreement is typically higher)")
    t_w8 = results[(64, "int8", "int8-w8a8")][1]
    agree_w8 = float((t_ref == t_w8).mean())
    log(f"w8a8-vs-bf16 token agreement: {agree_w8:.3f} "
        f"(w8a8-vs-int8: {float((t_q == t_w8).mean()):.3f}; same caveat)")

    # ------------------------------------------------------------------
    # 1b) SAMPLED decode (VERDICT r3 item 2 / r4 item 8): top_p=0.8 via
    # the sort-free exact rejection sampler (generate._reject_sample), at
    # B=64 (r4 continuity) AND the B=256 headline batch — the sampler's
    # (B, V, R) acceptance reduce scales with B, so the ratio must be
    # shown to hold at the batch the headline quotes.
    # ------------------------------------------------------------------
    sampled_ratios = {}
    for Bs in (64, 256):
        def run_s(max_len, greedy, Bs=Bs):
            return gen.generate(
                dec_int8w, cfg.decoder, prefixes[Bs], max_len=max_len,
                stop_token_id=-1, greedy=greedy, top_p=0.8, temperature=1.0,
                rng=jax.random.PRNGKey(0), cache_dtype="int8",
            )

        def slope(greedy, Bs=Bs, run_s=run_s):
            # Same-moment A/B: the greedy DENOMINATOR is re-timed right
            # next to the sampled run (already compiled by the sweep)
            # instead of reusing the sweep row — single sweep rows on
            # the tunneled chip occasionally carry 10-20% outliers
            # (observed r5), which corrupt a ratio taken across runs.
            int(run_s(SHORT, greedy).num_steps)
            int(run_s(LONG, greedy).num_steps)
            ts_s = ts_l = 1e9
            for _ in range(3):
                t0 = time.time()
                int(run_s(SHORT, greedy).num_steps)
                ts_s = min(ts_s, time.time() - t0)
                t0 = time.time()
                int(run_s(LONG, greedy).num_steps)
                ts_l = min(ts_l, time.time() - t0)
            return Bs / ((ts_l - ts_s) / (LONG - SHORT))

        samp_tps = slope(False)
        greedy_tps = slope(True)
        sampled_ratios[Bs] = (samp_tps, samp_tps / greedy_tps)
        log(f"decode SAMPLED (B={Bs} int8/int8 top_p=0.8): {samp_tps:,.0f} "
            f"tok/s steady-state = {samp_tps / greedy_tps:.2f}x of greedy "
            f"({greedy_tps:,.0f}, re-timed same-moment)")

    # ------------------------------------------------------------------
    # 1c) cascade compaction on the 50% short-answer mix (the serving
    # engine's dynamic_batch default — exp_cascade.py's construction:
    # half the rows are copies of a row whose step-2 token becomes the
    # stop id, so they finish after 3 steps while the rest run on).
    # ------------------------------------------------------------------
    Bc = 256
    r0 = gen.generate(
        dec_int8w, cfg.decoder, prefixes[Bc], max_len=LONG,
        stop_token_id=-1, greedy=True, cache_dtype="int8",
    )
    stop = int(np.asarray(r0.tokens)[0, 2])
    mix = jnp.concatenate(
        [jnp.tile(prefixes[Bc][:1], (Bc // 2, 1, 1)), prefixes[Bc][Bc // 2:]],
        axis=0,
    )

    def run_mix(cascade):
        fn = gen.generate_cascade if cascade else gen.generate
        kw = {"min_batch": 32} if cascade else {}
        return fn(
            dec_int8w, cfg.decoder, mix, max_len=LONG, stop_token_id=stop,
            greedy=True, cache_dtype="int8", **kw,
        )

    times = {}
    for cascade in (False, True):
        int(run_mix(cascade).num_steps)  # compile (scalar-fetch completion)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            int(run_mix(cascade).num_steps)
            best = min(best, time.time() - t0)
        times[cascade] = best
    cascade_ratio = times[False] / times[True]
    log(f"cascade (B={Bc} int8/int8, 50% short-answer mix, {LONG} steps): "
        f"static {times[False]*1e3:.0f} ms vs cascade {times[True]*1e3:.0f} ms "
        f"-> {cascade_ratio:.2f}x (serving dynamic_batch default)")

    # ------------------------------------------------------------------
    # 1c2) CONTINUOUS batching on a Poisson-arrival mix at the SERVING
    # level (VERDICT r4 items 3+5: r4 shipped the engine with no
    # recorded number): benchmarks/exp_serving.py's threaded A/B on a
    # compact trace — ContinuousBatchingEngine vs
    # BatchingEngine(dynamic_batch=True), identical arrivals, real
    # preprocess+encode, greedy outputs cross-checked (24/24 must
    # agree). Two decoder-level constructions were tried first and
    # REJECTED as baselines (recorded in benchmarks/README.md r5): an
    # offline-saturated two-full-batches run (the batch engine's best
    # case, no arrival dynamics, and realization-sensitive: 0.63-0.86x
    # across stop-token draws) and a step-clock Poisson sim against an
    # idealized single-queue cascade coalescer no serving engine
    # implements (0.61x); both are also tunnel-RTT-dominated per
    # continuous stage exit on this rig. The serving-level A/B compares
    # the two REAL engines on the reference's serving workload.
    # Full-size trace (N=64, 32 slots): 1.53x, benchmarks/README.md.
    # ------------------------------------------------------------------
    import contextlib

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmarks import exp_serving

    with contextlib.redirect_stdout(sys.stderr):  # keep the JSON line
        # as this process's ONLY stdout (build_wrapper prints a banner)
        serving_ab = exp_serving.main(N=24, rate=12.0, slots=16, short=8,
                                      long_=64)
    cont_speedup = serving_ab["speedup"]
    assert serving_ab["agreement"] == 1.0, serving_ab
    log(f"continuous POISSON serving mix (N=24, 12 req/s, 16 slots): "
        f"{cont_speedup:.2f}x of BatchingEngine(dynamic_batch=True) "
        f"(full-size trace 1.53x, benchmarks/README.md)")

    # ------------------------------------------------------------------
    # 1d) GPT-2 family decode at the full 12L/768 shape (VERDICT r3 item
    # 7: 'both families' needs perf evidence, reference decoder.py:26-31).
    # ------------------------------------------------------------------
    from mellow_tpu.models import gpt2 as gpt2_mod

    gcfg = gpt2_mod.GPT2Config()
    gp = gpt2_mod.init_params(jax.random.PRNGKey(1), gcfg, dtype)
    gprefix = jnp.asarray(rng.randn(64, P, gcfg.hidden_size) * 0.02, dtype)

    def run_gpt2(max_len):
        return gen.generate(
            gp, gcfg, gprefix, max_len=max_len, stop_token_id=-1,
            greedy=True, cache_dtype="bfloat16", family="gpt2",
        )

    int(run_gpt2(SHORT).num_steps)
    int(run_gpt2(LONG).num_steps)
    tg_s = tg_l = 1e9
    for _ in range(3):
        t0 = time.time()
        int(run_gpt2(SHORT).num_steps)
        tg_s = min(tg_s, time.time() - t0)
        t0 = time.time()
        int(run_gpt2(LONG).num_steps)
        tg_l = min(tg_l, time.time() - t0)
    gpt2_tps = 64 / ((tg_l - tg_s) / (LONG - SHORT))
    log(f"decode GPT-2 (B=64 12L/768 bf16 cache): {gpt2_tps:,.0f} tok/s "
        f"steady-state")

    # ------------------------------------------------------------------
    # 2) encoder clips/sec/chip
    # ------------------------------------------------------------------
    Be = 32
    wave = jnp.asarray(rng.randn(Be, 320000) * 0.1, dtype)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def enc_loop(p, w, reps):
        # reps chained encoder passes inside ONE program: amortizes the
        # host<->device dispatch RTT that dominates single-call timing on
        # a tunneled chip. Params travel as a jit ARGUMENT — closing over
        # them inlines ~28M floats into the serialized HLO and trips the
        # remote-compile request-size limit (CLAUDE.md).
        def body(i, acc):
            # NB: the chaining term must be cast back to w's dtype — a bare
            # f32 acc promotes the whole wave to f32, silently benchmarking
            # the f32 encoder with the bf16-gated Pallas window-attention
            # kernel DISABLED (caught by an r3 in-loop profile; r2's
            # 1,250 clips/s was that f32 path).
            r = htsat.encode_audio(
                w + (acc * 0).astype(w.dtype), p, cfg.frontend, cfg.encoder
            )
            return jnp.sum(r.astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    # Slope between two chained lengths, min of 3 — the same methodology
    # as decode (a single fixed-length sample carries the tunnel RTT and
    # any one-time weight prefetches, ±7% run-to-run).
    float(enc_loop(params, wave, 2))
    float(enc_loop(params, wave, 10))
    b2 = b10 = 1e9
    for _ in range(3):
        t0 = time.time()
        float(enc_loop(params, wave, 2))
        b2 = min(b2, time.time() - t0)
        t0 = time.time()
        float(enc_loop(params, wave, 10))
        b10 = min(b10, time.time() - t0)
    dt = (b10 - b2) / 8
    clips_per_s = Be / dt
    enc_fl = clips_per_s * rf.encoder_flops(cfg)
    log(f"encoder: B={Be} time={dt:.3f}s/pass -> {clips_per_s:,.0f} clips/s | "
        f"{rf.encoder_flops(cfg)/1e9:.1f} GFLOP/clip -> {enc_fl/1e12:.1f} "
        f"TFLOP/s ({rf.pct(enc_fl/rf.PEAK_BF16_FLOPS)} MFU)")

    # ------------------------------------------------------------------
    # 3) p50 end-to-end generate latency (single example pair, 32 tokens)
    # ------------------------------------------------------------------
    wave1 = jnp.asarray(rng.randn(1, 320000) * 0.1, dtype)
    text = jnp.asarray(rng.randint(2, 49000, (1, cfg.text_tokenization_len)), jnp.int32)

    def run_e2e():
        return mellow_model.generate_tokens(
            params, cfg, wave1, wave1, text, max_len=32, cache_dtype="bfloat16"
        )

    int(run_e2e().num_steps)
    lat = []
    for _ in range(5):
        t0 = time.time()
        int(run_e2e().num_steps)
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
        # Secondary metrics as PARSED fields (VERDICT r4 item 3: headline
        # docs restate from this artifact, not from same-day side runs).
        "extra": {
            "encoder_clips_per_s": round(clips_per_s, 1),
            "sampled_tok_per_s_b64": round(sampled_ratios[64][0], 1),
            "sampled_vs_greedy_b64": round(sampled_ratios[64][1], 3),
            "sampled_tok_per_s_b256": round(sampled_ratios[256][0], 1),
            "sampled_vs_greedy_b256": round(sampled_ratios[256][1], 3),
            "cascade_speedup": round(cascade_ratio, 3),
            "continuous_vs_batch_poisson": round(cont_speedup, 3),
            "gpt2_tok_per_s_b64": round(gpt2_tps, 1),
            "e2e_p50_ms": round(p50 * 1e3, 1),
        },
    }))


if __name__ == "__main__":
    main()
