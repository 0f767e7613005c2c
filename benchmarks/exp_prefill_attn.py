"""Experiment: prefill GQA attention formulations at Mellow shapes
(B=64, S=389, H=9, KV=3, hd=64, bf16).

Profile of the r2 decode trace showed prefill at 86 ms for 30 layers, with
~0.8 ms/layer spent materializing fp32 (B,3,3,389,389) scores and
~0.6 ms/layer on a broadcast-transpose of K. Candidates:

  A. current: einsum bqhrd,bkhd->bhrqk, mask fp32, softmax in fp32
  B. bf16 scores: mask in bf16, softmax in bf16 (perf mode only)
  C. grouped layout: q pre-transposed to (B,KV,rep*S,hd), plain batched
     dots, no rep-broadcast of K
  D. pallas splash attention kernel (GQA-native), S padded to 512

Run: python benchmarks/exp_prefill_attn.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

B, S, H, KV, hd = 64, 389, 9, 3, 64
rep = H // KV
L = 30  # scan over layers like real prefill
scale = 1.0 / np.sqrt(hd)


def timed(name, fn, *args, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(fn(*args))
        ts.append(time.time() - t0)
    per_layer = min(ts) / L * 1e3
    print(f"{name}: {min(ts)*1e3:8.2f} ms total, {per_layer:6.3f} ms/layer")
    return min(ts)


def scanned(attn_fn):
    def run(q, k, v):
        def body(acc, _):
            o = attn_fn(q + (acc * 0).astype(q.dtype), k, v)
            return jnp.mean(o.astype(jnp.float32)) * 1e-6, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=L)
        return acc
    return jax.jit(run)


def attn_A(q, k, v):
    causal = jnp.tril(jnp.ones((S, S), bool))
    mask = jnp.where(causal, 0.0, -jnp.inf).astype(jnp.float32)[None, None]
    qg = q.reshape(B, S, KV, rep, hd)
    attn = jnp.einsum("bqhrd,bkhd->bhrqk", qg, k) * scale
    attn = attn + mask[:, :, None]
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhrqk,bkhd->bqhrd", attn, v).reshape(B, S, H * hd)


def attn_B(q, k, v):
    causal = jnp.tril(jnp.ones((S, S), bool))
    mask = jnp.where(causal, 0.0, -jnp.inf).astype(q.dtype)[None, None]
    qg = q.reshape(B, S, KV, rep, hd)
    attn = jnp.einsum("bqhrd,bkhd->bhrqk", qg, k) * scale
    attn = attn + mask[:, :, None]
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhrqk,bkhd->bqhrd", attn, v).reshape(B, S, H * hd)


def attn_C(q, k, v):
    causal = jnp.tril(jnp.ones((S, S), bool))
    mask = jnp.where(causal, 0.0, -jnp.inf).astype(q.dtype)
    # (B, S, KV, rep, hd) -> (B, KV, rep, S, hd): group q rows per KV head
    qg = jnp.transpose(q.reshape(B, S, KV, rep, hd), (0, 2, 3, 1, 4))
    kg = jnp.transpose(k, (0, 2, 1, 3))  # (B, KV, S, hd)
    vg = jnp.transpose(v, (0, 2, 1, 3))
    attn = jnp.einsum("bgrqd,bgkd->bgrqk", qg, kg) * scale
    attn = attn + mask[None, None, None]
    attn = jax.nn.softmax(attn, axis=-1)
    o = jnp.einsum("bgrqk,bgkd->bgrqd", attn, vg)
    return jnp.transpose(o, (0, 3, 1, 2, 4)).reshape(B, S, H * hd)


def attn_D(q, k, v):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    SP = 512
    pad = SP - S
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    qt = jnp.transpose(qp, (0, 2, 1, 3))  # (B, H, S, hd)
    kt = jnp.transpose(kp, (0, 2, 1, 3))  # (B, KV, S, hd)
    vt = jnp.transpose(vp, (0, 2, 1, 3))
    mask = sm.MultiHeadMask([sm.CausalMask((SP, SP)) for _ in range(H)])
    kernel = sk.make_splash_mqa_single_device(
        mask=mask, head_shards=1, q_seq_shards=1
    )
    # splash MQA expects q (H, S, hd) grouped so that q head h uses kv head
    # h // rep: reshape q heads to (KV, rep) blocks -> kv index = h // rep
    def one(qb, kb, vb):
        qq = qb.reshape(KV, rep, SP, hd)
        out = jax.vmap(lambda qh, kh, vh: kernel(qh * scale, kh, vh))(
            qq, kb, vb
        )
        return out.reshape(H, SP, hd)

    o = jax.vmap(one)(qt, kt, vt)  # (B, H, SP, hd)
    return jnp.transpose(o, (0, 2, 1, 3))[:, :S].reshape(B, S, H * hd)


def main():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, S, H, hd) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, S, KV, hd) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, S, KV, hd) * 0.3, jnp.bfloat16)

    oA = attn_A(q, k, v)
    for name, fn in [("B bf16-scores", attn_B), ("C grouped", attn_C), ("D splash", attn_D)]:
        try:
            o = fn(q, k, v)
            err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - oA.astype(jnp.float32))))
            print(f"{name}: max|delta| vs A = {err:.4f}")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")

    timed("A fp32-scores (current)", scanned(attn_A), q, k, v)
    timed("B bf16-scores", scanned(attn_B), q, k, v)
    timed("C grouped", scanned(attn_C), q, k, v)
    try:
        timed("D splash", scanned(attn_D), q, k, v)
    except Exception as e:
        print(f"D splash: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
