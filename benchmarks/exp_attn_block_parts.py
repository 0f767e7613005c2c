"""Attribute the fused attention block's time to its pieces (r4).

The r4 per-op profile showed `fused_attn_block` at 0.84 ms/call at
B=64/S=389 — ~2x its ~0.42 ms useful-FLOP bound — and removing the rope
permutation matmul's 22% FLOPs changed NOTHING, so the block is not
MXU-FLOP-bound. This harness times ablated kernel variants (same
operands, same grid, pieces deleted) to find the wall:

    full        the shipped kernel
    noattn      qkv + rope + o-proj + residual (attention loop deleted;
                o_s holds garbage — timing only)
    attnonly    attention loop over PRE-SET scratches + residual (the
                qkv/rope/o matmuls deleted)
    nosoftmax   full, but softmax replaced by a scale (dots kept)
    bare        flash_gqa_prefill (the standalone GQA kernel) on
                matching-shape inputs, for the 2.2 us/row claim

Timing: chained fori_loop inside one jit, dependent-scalar fetch
(CLAUDE.md tunneled-chip methodology).
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mellow_tpu.ops import pallas_attn_block as blk
from mellow_tpu.ops.pallas_attention import flash_gqa_prefill

B, S, D = 64, 389, 576
H, KV, hd = 9, 3, 64
EPS = 1e-5
REPS = 30


def make_variant(which):
    """Return a kernel fn with the same signature as blk._kernel."""

    def kern(
        x_ref, ln_ref, wq_ref, wk_ref, wv_ref, wo_ref,
        cos_ref, sin_ref, p_ref,
        out_ref, k_ref, v_ref,
        q_s, k_s, v_s, o_s,
        *, H, KV, hd, eps, scale, SP, S_real, kv_quant=False,
    ):
        f32 = jnp.float32
        x = x_ref[0]
        xf = x.astype(f32)
        var = jnp.mean(xf * xf, axis=1, keepdims=True)
        h = (xf * jax.lax.rsqrt(var + eps) * ln_ref[...].astype(f32)).astype(
            x.dtype
        )

        def mm(a, b_ref):
            return jax.lax.dot_general(
                a, b_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            ).astype(a.dtype)

        if which != "attnonly":
            q_s[...] = mm(h, wq_ref)
            k_s[...] = mm(h, wk_ref)
            v_s[...] = mm(h, wv_ref)
            cos, sin = cos_ref[...], sin_ref[...]
            blk._rope_heads(q_s, H, hd, cos, sin, p_ref, mm)
            blk._rope_heads(k_s, KV, hd, cos, sin, p_ref, mm)
        if which != "noattn":
            rep = H // KV
            rows = jax.lax.broadcasted_iota(jnp.int32, (SP, SP), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (SP, SP), 1)
            causal = rows >= cols
            for g in range(KV):
                k_g = k_s[:, g * hd : (g + 1) * hd]
                v_g = v_s[:, g * hd : (g + 1) * hd]
                for r in range(rep):
                    hh = g * rep + r
                    q_h = q_s[:, hh * hd : (hh + 1) * hd]
                    s = jax.lax.dot_general(
                        q_h, k_g, (((1,), (1,)), ((), ())),
                        preferred_element_type=f32,
                    ) * scale
                    if which == "nosoftmax":
                        e = s * 1e-3
                    else:
                        s = jnp.where(causal, s, blk._NEG)
                        m = jnp.max(s, axis=1, keepdims=True)
                        e = jnp.exp(s - m)
                    denom = jnp.sum(e, axis=1, keepdims=True)
                    o = jax.lax.dot_general(
                        e.astype(x.dtype), v_g, (((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    )
                    o_s[:, hh * hd : (hh + 1) * hd] = (o / denom).astype(
                        x.dtype
                    )
        out_ref[0] = x + mm(o_s[...], wo_ref)
        k_ref[0] = k_s[...]
        v_ref[0] = v_s[...]

    return kern


def timed(fn, *args):
    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(reps, *a):
        def body(i, carry):
            x = a[0] + (carry * 0).astype(a[0].dtype)
            out = fn(x, *a[1:])
            out = out[0] if isinstance(out, (tuple, list)) else out
            return jnp.sum(out.astype(jnp.float32)) * 1e-9

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    float(loop(2, *args))
    float(loop(2 + REPS, *args))
    t2 = t2b = 1e9
    for _ in range(3):
        t0 = time.time()
        float(loop(2, *args))
        t2 = min(t2, time.time() - t0)
        t0 = time.time()
        float(loop(2 + REPS, *args))
        t2b = min(t2b, time.time() - t0)
    return (t2b - t2) / REPS


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(B, S, D) * 0.1, dt)
    ln = jnp.ones((D,), dt)
    wq = jnp.asarray(rng.randn(D, H * hd) * 0.02, dt)
    wk = jnp.asarray(rng.randn(D, KV * hd) * 0.02, dt)
    wv = jnp.asarray(rng.randn(D, KV * hd) * 0.02, dt)
    wo = jnp.asarray(rng.randn(H * hd, D) * 0.02, dt)
    from mellow_tpu.models.llama import rope_tables
    from mellow_tpu.config import get_config

    cfg = get_config("v0").decoder
    cos_np, sin_np = rope_tables(cfg, S, np.float32)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

    orig = blk._kernel
    for which in ("full", "noattn", "attnonly", "nosoftmax"):
        blk._kernel = make_variant(which)
        fused = functools.partial(
            blk.fused_attn_block.__wrapped__,  # un-jitted; re-jit per variant
            num_heads=H, num_kv_heads=KV, head_dim=hd, eps=EPS,
        )
        dt_s = timed(
            lambda *a: fused(*a), x, ln, wq, wk, wv, wo, cos, sin
        )
        print(
            f"{which:10s}: {dt_s*1e3:7.3f} ms/call  "
            f"({dt_s/B*1e6:5.2f} us/row)", flush=True,
        )
    blk._kernel = orig

    q = jnp.asarray(rng.randn(B, S, H * hd) * 0.1, dt)
    k = jnp.asarray(rng.randn(B, S, KV * hd) * 0.1, dt)
    v = jnp.asarray(rng.randn(B, S, KV * hd) * 0.1, dt)
    bare = functools.partial(
        flash_gqa_prefill, num_heads=H, num_kv_heads=KV, head_dim=hd
    )
    dt_s = timed(lambda qq, kk, vv: bare(qq, kk, vv), q, k, v)
    print(f"{'bare':10s}: {dt_s*1e3:7.3f} ms/call  ({dt_s/B*1e6:5.2f} us/row)")


if __name__ == "__main__":
    main()


def main_w8a8():
    """Timing A/B: bf16 block vs the w8a8 block (r4)."""
    from mellow_tpu.models.llama import quantize_weight, rope_tables
    from mellow_tpu.config import get_config

    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(B, S, D) * 0.1, dt)
    ln = jnp.ones((D,), dt)
    ws = {
        "wq": jnp.asarray(rng.randn(D, H * hd) * 0.02, jnp.float32),
        "wk": jnp.asarray(rng.randn(D, KV * hd) * 0.02, jnp.float32),
        "wv": jnp.asarray(rng.randn(D, KV * hd) * 0.02, jnp.float32),
        "wo": jnp.asarray(rng.randn(H * hd, D) * 0.02, jnp.float32),
    }
    qd = {n: quantize_weight(w) for n, w in ws.items()}
    cfg = get_config("v0").decoder
    cos_np, sin_np = rope_tables(cfg, S, np.float32)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
    kw = dict(num_heads=H, num_kv_heads=KV, head_dim=hd, eps=EPS)

    dt_s = timed(
        lambda *a: blk.fused_attn_block(*a, **kw),
        x, ln, *(ws[n].astype(dt) for n in ("wq", "wk", "wv", "wo")),
        cos, sin,
    )
    print(f"{'bf16 blk':10s}: {dt_s*1e3:7.3f} ms/call  ({dt_s/B*1e6:5.2f} us/row)")
    dt_s = timed(
        lambda *a: blk.fused_attn_block_w8a8(*a, **kw),
        x, ln,
        qd["wq"]["q"], qd["wq"]["scale"], qd["wk"]["q"], qd["wk"]["scale"],
        qd["wv"]["q"], qd["wv"]["scale"], qd["wo"]["q"], qd["wo"]["scale"],
        cos, sin,
    )
    print(f"{'w8a8 blk':10s}: {dt_s*1e3:7.3f} ms/call  ({dt_s/B*1e6:5.2f} us/row)")
