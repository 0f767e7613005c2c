"""Experiment: W8A8 native int8 MXU dots at PREFILL shapes.

exp_int8_dots.py measured native int8 dots NO faster than
int8-load+convert+bf16-dot — but at DECODE shapes (B=64 token rows),
where the weight stream is bandwidth-bound and the MXU idles either way.
Prefill is the opposite regime: (chunk*S, D) @ (D, I) with ~12.5k token
rows is compute-bound, and v5e's MXU runs int8 x int8 -> int32 at 2x the
bf16 rate (394 vs 197 TOPS peak). If XLA lowers the int8 dot natively,
W8A8 should approach 2x on the MLP matmuls that benchmarks/README.md
shows are AT the bf16 roofline (0.131 ms vs 0.139 ideal per 1536-wide
matmul).

Times the MLP triple (gate/up in one fused (D, 2I) kernel the way
llama._layer lays it out, then down) over the real chunked-prefill token
count, three formulations:

  A. bf16 weights, bf16 dot                 (perf-mode baseline)
  B. int8 weights + astype + bf16 dot       (current int8-weight mode)
  C. per-token dynamic activation quant + native int8 dot + rescale

Run: python benchmarks/exp_w8a8_prefill.py   (real TPU)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

# Real chunked-prefill geometry: chunk=32 rows x S=389 positions.
CHUNK, S, D, I = 32, 389, 576, 1536
L = 30          # layers; scan-streamed like _prefill_scan
REPS = 8


def timed(name, fn, *args, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(fn(*args))
        ts.append(time.time() - t0)
    t = min(ts)
    # per-layer-pass time across REPS chained passes
    per_layer = t / (REPS * L) * 1e3
    flops = 2 * CHUNK * S * (D * 2 * I + I * D)  # gate+up + down
    print(
        f"{name}: {t*1e3:8.2f} ms total  {per_layer:6.3f} ms/layer  "
        f"{flops / (t / (REPS * L)) / 1e12:6.1f} TFLOP/s-equiv",
        flush=True,
    )
    return t


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)
    T = CHUNK * S
    x = jnp.asarray(rng.randn(T, D) * 0.1, jnp.bfloat16)

    w1_bf = jnp.asarray(rng.randn(L, D, 2 * I) * 0.02, jnp.bfloat16)
    w2_bf = jnp.asarray(rng.randn(L, I, D) * 0.02, jnp.bfloat16)
    w1_i8 = jnp.asarray(rng.randint(-127, 128, (L, D, 2 * I)), jnp.int8)
    w2_i8 = jnp.asarray(rng.randint(-127, 128, (L, I, D)), jnp.int8)
    s1 = jnp.asarray(np.abs(rng.randn(L, 2 * I)) * 0.01, jnp.float32)
    s2 = jnp.asarray(np.abs(rng.randn(L, D)) * 0.01, jnp.float32)

    def mlp_bf16(x, wl):
        w1, w2 = wl
        gu = x @ w1
        h = jax.nn.silu(gu[:, :I]) * gu[:, I:]
        return (h @ w2).astype(x.dtype)

    def mlp_int8_convert(x, wl):
        w1, sl1, w2, sl2 = wl
        gu = (x @ w1.astype(x.dtype)) * sl1.astype(x.dtype)
        h = jax.nn.silu(gu[:, :I]) * gu[:, I:]
        y = (h @ w2.astype(x.dtype)) * sl2.astype(x.dtype)
        return y.astype(x.dtype)

    def quant_rows(x):
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
        sc = jnp.maximum(amax, 1e-8) / 127.0
        x8 = jnp.clip(
            jnp.round(x.astype(jnp.float32) / sc), -127, 127
        ).astype(jnp.int8)
        return x8, sc

    def mlp_w8a8(x, wl):
        w1, sl1, w2, sl2 = wl
        x8, xs = quant_rows(x)
        gu32 = jax.lax.dot_general(
            x8, w1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        gu = (gu32.astype(jnp.float32) * xs * sl1[None, :]).astype(x.dtype)
        h = jax.nn.silu(gu[:, :I]) * gu[:, I:]
        h8, hs = quant_rows(h)
        y32 = jax.lax.dot_general(
            h8, w2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (y32.astype(jnp.float32) * hs * sl2[None, :]).astype(x.dtype)
        return y

    def stream(mlp):
        def run(x, *ws):
            def rep(x, _):
                def layer(x, wl):
                    return mlp(x, wl), None
                x, _ = jax.lax.scan(layer, x, ws)
                return x, None
            x, _ = jax.lax.scan(rep, x, None, length=REPS)
            return jnp.sum(x.astype(jnp.float32))
        return jax.jit(run)

    # D: isolate the raw dot rate — pre-quantized int8 activations, no
    # in-loop quantize, int32 accumulate, minimal rescale. If this is not
    # ~2x A, XLA/Mosaic is not hitting the int8 MXU rate at all and W8A8
    # is dead regardless of quantize cost.
    x8_const = jnp.asarray(rng.randint(-127, 128, (T, D)), jnp.int8)

    def dot_bf16_only(x, w1):
        return x @ w1

    def dot_int8_only(x8, w1):
        return jax.lax.dot_general(
            x8, w1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def stream_d(dot):
        # Consume EVERY output column (a column-sum into the carry) — a
        # first attempt carried y[:, :D] forward and XLA dead-code-
        # eliminated 81% of the matmul, reporting an impossible
        # 400 TFLOP/s. Both variants pay the same epilogue reduction.
        def run(x, w):
            def rep(acc, _):
                def layer(acc, w1):
                    y = dot(x, w1)
                    return acc + y.astype(jnp.float32).sum(axis=0), None
                acc, _ = jax.lax.scan(layer, acc, w)
                return acc, None
            acc0 = jnp.zeros((2 * I,), jnp.float32)
            acc, _ = jax.lax.scan(rep, acc0, None, length=REPS)
            return jnp.sum(acc)
        return jax.jit(run)

    print(f"== {REPS} reps x {L} layers of MLP on ({T},{D}), I={I}")
    timed("A bf16        ", stream(mlp_bf16), x, w1_bf, w2_bf)
    timed("B int8+convert", stream(mlp_int8_convert), x, w1_i8, s1, w2_i8, s2)
    timed("C W8A8 native ", stream(mlp_w8a8), x, w1_i8, s1, w2_i8, s2)
    print("== raw dot isolation ((T,D)@(D,2I) + column-sum epilogue)")
    fl_dot = 2 * T * D * 2 * I
    tA = timed("A' bf16 dot   ", stream_d(dot_bf16_only), x, w1_bf)
    tD = timed("D int8 dot    ", stream_d(dot_int8_only), x8_const, w1_i8)
    print(f"   int8/bf16 dot speedup: {tA/tD:.2f}x "
          f"(int8 {fl_dot/(tD/(REPS*L))/1e12:.0f} TOP/s)")


if __name__ == "__main__":
    main()
