"""Experiment: is the int8 decode path VPU-convert bound, and do native
int8 MXU dots fix it?

BENCH r2 observation: int8 cache+weights decode reads 651 MB/step but runs
at only 252 GB/s effective (vs 390 GB/s for the bf16 path) — the bytes
saved are eaten by int8->bf16 converts (`.astype` before every dot). This
times three formulations of the two dominant decode dots at real shapes:

  A. bf16 operand streamed from HBM, bf16 dot          (the fast baseline)
  B. int8 operand + .astype(bf16) + bf16 dot           (current int8 mode)
  C. int8 x int8 -> int32 native MXU dot, scales after (proposed W8A8)

Shapes: per-layer weight matmul aggregate (B=64 tokens x the 7 decoder
kernels ~ (64, 576) @ (576, ~9.4k equiv)) approximated by the MLP triple,
and the attention cache dot (64, 9, 256) @ (64, 517, 256)^T.

Run: python benchmarks/exp_int8_dots.py  (real TPU)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, *args, reps=3):
    # Force completion by FETCHING the scalar result — on the tunneled axon
    # platform block_until_ready returns before compute finishes (CLAUDE.md).
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1e3:8.2f} ms")
    return min(ts)


def main():
    rng = np.random.RandomState(0)
    L, B, D, I = 30, 64, 576, 1536
    STEPS = 64

    w_bf16 = jnp.asarray(rng.randn(L, D, I), jnp.bfloat16)
    w_int8 = jnp.asarray(rng.randint(-127, 128, (L, D, I)), jnp.int8)
    w_scale = jnp.asarray(np.abs(rng.randn(L, I)) * 0.01, jnp.float32)
    x = jnp.asarray(rng.randn(B, D), jnp.bfloat16)

    # --- weight-streaming matmul: scan over layers, STEPS iterations ---
    def run_A(x, w):
        def step(x, _):
            def layer(x, wl):
                y = x @ wl
                return jnp.tanh(y[:, :D]), None
            x, _ = jax.lax.scan(layer, x, w)
            return x, None
        x, _ = jax.lax.scan(step, x, None, length=STEPS)
        return jnp.sum(x.astype(jnp.float32))

    def run_B(x, w, s):
        def step(x, _):
            def layer(x, ws):
                wl, sl = ws
                y = (x @ wl.astype(x.dtype)) * sl.astype(x.dtype)
                return jnp.tanh(y[:, :D]), None
            x, _ = jax.lax.scan(layer, x, (w, s))
            return x, None
        x, _ = jax.lax.scan(step, x, None, length=STEPS)
        return jnp.sum(x.astype(jnp.float32))

    def run_C(x, w, s):
        def step(x, _):
            def layer(x, ws):
                wl, sl = ws
                amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
                xs = jnp.maximum(amax, 1e-8) / 127.0
                x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127, 127).astype(jnp.int8)
                y32 = jax.lax.dot_general(
                    x8, wl, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                y = (y32.astype(jnp.float32) * xs * sl[None, :]).astype(x.dtype)
                return jnp.tanh(y[:, :D]), None
            x, _ = jax.lax.scan(layer, x, (w, s))
            return x, None
        x, _ = jax.lax.scan(step, x, None, length=STEPS)
        return jnp.sum(x.astype(jnp.float32))

    gb_bf16 = L * D * I * 2 * STEPS / 1e9
    gb_int8 = L * D * I * 1 * STEPS / 1e9
    print(f"== weight matmul stream: {STEPS} steps x {L} layers of ({B},{D})@({D},{I})")
    tA = timed("A bf16", jax.jit(run_A), x, w_bf16)
    print(f"   -> {gb_bf16/tA:6.0f} GB/s effective")
    tB = timed("B int8+astype", jax.jit(run_B), x, w_int8, w_scale)
    print(f"   -> {gb_int8/tB:6.0f} GB/s effective")
    tC = timed("C int8 native", jax.jit(run_C), x, w_int8, w_scale)
    print(f"   -> {gb_int8/tC:6.0f} GB/s effective")

    # --- attention cache dot: (B, H, P) @ (B, S, P)^T per layer ---
    H, S, P = 9, 517, 256
    k_bf16 = jnp.asarray(rng.randn(L, B, S, P), jnp.bfloat16)
    k_int8 = jnp.asarray(rng.randint(-127, 128, (L, B, S, P)), jnp.int8)
    k_sc = jnp.asarray(np.abs(rng.randn(L, B, S)) * 0.01, jnp.float32)
    q = jnp.asarray(rng.randn(B, H, P), jnp.bfloat16)

    def att_A(q, k):
        def step(q, _):
            def layer(q, kl):
                s = jnp.einsum("bqd,bsd->bqs", q, kl)
                o = jnp.einsum("bqs,bsd->bqd", jax.nn.softmax(s, axis=-1), kl)
                return (q + 0.001 * o).astype(q.dtype), None
            q, _ = jax.lax.scan(layer, q, k)
            return q, None
        q, _ = jax.lax.scan(step, q, None, length=STEPS)
        return jnp.sum(q.astype(jnp.float32))

    def att_B(q, k, sc):
        def step(q, _):
            def layer(q, ks):
                kl, scl = ks
                s = jnp.einsum("bqd,bsd->bqs", q, kl.astype(q.dtype))
                s = s * scl[:, None, :].astype(s.dtype)
                e = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
                ev = e * scl[:, None, :].astype(e.dtype)
                o = jnp.einsum("bqs,bsd->bqd", ev, kl.astype(q.dtype))
                return (q + 0.001 * o).astype(q.dtype), None
            q, _ = jax.lax.scan(layer, q, (k, sc))
            return q, None
        q, _ = jax.lax.scan(step, q, None, length=STEPS)
        return jnp.sum(q.astype(jnp.float32))

    def att_C(q, k, sc):
        def step(q, _):
            def layer(q, ks):
                kl, scl = ks
                amax = jnp.max(jnp.abs(q.astype(jnp.float32)), axis=-1, keepdims=True)
                qs = jnp.maximum(amax, 1e-8) / 127.0
                q8 = jnp.clip(jnp.round(q.astype(jnp.float32) / qs), -127, 127).astype(jnp.int8)
                s32 = jax.lax.dot_general(
                    q8, kl, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                )  # (B, H, S)
                s = s32.astype(jnp.float32) * qs * scl[:, None, :]
                e = jax.nn.softmax(s, axis=-1)
                ev = e * scl[:, None, :]
                evmax = jnp.max(ev, axis=-1, keepdims=True)
                es = jnp.maximum(evmax, 1e-20) / 127.0
                e8 = jnp.round(ev / es).astype(jnp.int8)
                o32 = jax.lax.dot_general(
                    e8, kl, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                )  # (B, H, P)
                o = o32.astype(jnp.float32) * es
                return (q + 0.001 * o).astype(q.dtype), None
            q, _ = jax.lax.scan(layer, q, (k, sc))
            return q, None
        q, _ = jax.lax.scan(step, q, None, length=STEPS)
        return jnp.sum(q.astype(jnp.float32))

    gbk_bf16 = L * B * S * P * 2 * STEPS / 1e9
    gbk_int8 = L * B * S * P * 1 * STEPS / 1e9
    print(f"== cache attention stream: {STEPS} steps x {L} layers of ({B},{H},{P})@({B},{S},{P})^T")
    tA = timed("A bf16", jax.jit(att_A), q, k_bf16)
    print(f"   -> {gbk_bf16/tA:6.0f} GB/s effective")
    tB = timed("B int8+astype", jax.jit(att_B), q, k_int8, k_sc)
    print(f"   -> {gbk_int8/tB:6.0f} GB/s effective")
    tC = timed("C int8 native", jax.jit(att_C), q, k_int8, k_sc)
    print(f"   -> {gbk_int8/tC:6.0f} GB/s effective")


if __name__ == "__main__":
    main()


def unroll_exp():
    """Per-scan-iteration overhead test: same attention stream, scan
    unroll=1/2/4/8 plus a fully unrolled Python loop."""
    rng = np.random.RandomState(0)
    L, B, H, S, P = 30, 64, 9, 517, 256
    STEPS = 64
    k_int8 = jnp.asarray(rng.randint(-127, 128, (L, B, S, P)), jnp.int8)
    k_bf16 = jnp.asarray(rng.randn(L, B, S, P), jnp.bfloat16)
    sc = jnp.asarray(np.abs(rng.randn(L, B, S)) * 0.01, jnp.float32)
    q = jnp.asarray(rng.randn(B, H, P), jnp.bfloat16)

    def make(dtype_int8, unroll):
        def run(q, k, sc):
            def step(q, _):
                def layer(q, ks):
                    kl, scl = ks
                    kq = kl.astype(q.dtype) if dtype_int8 else kl
                    s = jnp.einsum("bqd,bsd->bqs", q, kq)
                    if dtype_int8:
                        s = s * scl[:, None, :].astype(s.dtype)
                    e = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
                    o = jnp.einsum("bqs,bsd->bqd", e, kq)
                    return (q + 0.001 * o).astype(q.dtype), None
                q, _ = jax.lax.scan(layer, q, (k, sc), unroll=unroll)
                return q, None
            q, _ = jax.lax.scan(step, q, None, length=STEPS)
            return jnp.sum(q.astype(jnp.float32))
        return jax.jit(run)

    gb8 = L * B * S * P * STEPS / 1e9
    gb16 = 2 * gb8
    for unroll in (1, 2, 4, 8):
        t = timed(f"int8 unroll={unroll}", make(True, unroll), q, k_int8, sc)
        print(f"   -> {gb8/t:6.0f} GB/s effective")
    for unroll in (1, 4, 8):
        t = timed(f"bf16 unroll={unroll}", make(False, unroll), q, k_bf16, sc)
        print(f"   -> {gb16/t:6.0f} GB/s effective")


if __name__ == "__main__" and len(__import__("sys").argv) > 1:
    unroll_exp()
