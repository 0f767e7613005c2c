"""A/B: the REAL decode step — einsum attention over separate padded K/V
cache buffers (llama.decode_step) vs a variant whose cache attention runs
in the fused packed-KV Pallas kernel (ops/pallas_decode_attention.py).

Decision being measured: the einsum formulation streams two
(L, B, S, 256) int8 buffers per step — 25% of those lanes are explicit
pad (KVCache.packed_dim) — while the kernel streams one (L, B, S8, 384)
buffer with zero pad (706 GB/s with 8-row manual double-buffered DMA) and
runs native int8 MXU dots in-kernel (compute, not DMA, limits the kernel;
see the kernel module docstring for the measured design history).

Both variants run the FULL layer stack (weights, MLP; logits excluded
equally), chained ``reps`` steps inside one jit so tunnel RTT cancels.

Run on the TPU:  python benchmarks/exp_decode_attn.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

B, S = 256, 533
S8 = 536  # packed cache rounds S up to a sublane multiple
FLUSHED = 500
REPS = 32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _cfg():
    from mellow_tpu.config import get_config

    return get_config("v0").decoder


def decode_step_packed(params, cfg, token_embed, kv, scale_kv, cos_full,
                       sin_full, flushed):
    """llama.decode_step with the cache attention swapped for the fused
    packed kernel; the current token rides as the kernel's single `extra`
    position. Mirrors models/llama.py decode_step structure."""
    from mellow_tpu.models import llama
    from mellow_tpu.ops.pallas_decode_attention import (
        HEAD_PAD, flash_gqa_decode,
    )

    B_, D = token_embed.shape
    L = cfg.num_layers
    KV, H, hd = cfg.num_kv_heads, cfg.num_heads, cfg.head_dim
    rep = H // KV
    P2 = KV * 2 * hd
    x = token_embed[:, None, :]
    pos = flushed
    cos = jax.lax.dynamic_slice_in_dim(cos_full, pos, 1, axis=0)
    sin = jax.lax.dynamic_slice_in_dim(sin_full, pos, 1, axis=0)
    eye = jnp.eye(KV, dtype=token_embed.dtype)
    # One placement einsum builds q_dense directly in its final (B, H, P2)
    # shape — the stack/reshape construction left XLA a batch-minor
    # intermediate plus two (256, 9, 384) relayout copies per layer
    # (profiled ~9 us/layer).
    place = np.zeros((KV, hd, P2), np.float32)
    for g in range(KV):
        place[g, :, g * 2 * hd: g * 2 * hd + hd] = np.eye(hd)
    place = jnp.asarray(place, token_embed.dtype)

    def body(carry, scanned):
        (x,) = carry
        lp, l_idx = scanned
        h = llama.rms_norm(x, lp["ln_attn"], cfg.rms_norm_eps)
        q = llama._mm(h, lp["wq"]).reshape(B_, 1, H, hd)
        k = llama._mm(h, lp["wk"]).reshape(B_, 1, KV, hd)
        v = llama._mm(h, lp["wv"]).reshape(B_, 1, KV, hd)
        q = llama.apply_rope(q, cos, sin)
        k = llama.apply_rope(k, cos, sin)

        qg = q.reshape(B_, KV, rep, hd)
        q_dense = jnp.einsum("bgrd,gdp->bgrp", qg, place).reshape(B_, H, P2)
        q_dense = jnp.pad(q_dense, ((0, 0), (0, HEAD_PAD - H), (0, 0)))
        kvpair = jnp.stack(
            [k.reshape(B_, 1, KV, hd), v.reshape(B_, 1, KV, hd)], axis=-2
        ).reshape(B_, 1, P2)
        extra = jnp.pad(kvpair, ((0, 0), (0, 7), (0, 0)))  # EP = 8

        o_pk = flash_gqa_decode(
            q_dense, kv, scale_kv, extra, l_idx, flushed,
            jnp.asarray(1, jnp.int32), head_dim=hd,
        )[:, :H, :]  # (B, H, P2)
        o = jnp.einsum(
            "bgrkd,gk->bgrd",
            o_pk.reshape(B_, KV, rep, KV, 2, hd)[..., 1, :], eye,
        ).reshape(B_, 1, H * hd)
        x = x + llama._mm(o, lp["wo"])
        h = llama.rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps)
        gate = jax.nn.silu(llama._mm(h, lp["w_gate"]))
        up = llama._mm(h, lp["w_up"])
        x = x + llama._mm(gate * up, lp["w_down"])
        return (x,), None

    (x,), _ = jax.lax.scan(
        body, (x,), (params["layers"], jnp.arange(L, dtype=jnp.int32))
    )
    x = llama.rms_norm(x, params["norm_f"], cfg.rms_norm_eps)
    return x[:, 0, :]


@functools.partial(jax.jit, static_argnames=("reps", "cfg"))
def run_current(params, cfg, cache, cos, sin, tok0, reps: int):
    from mellow_tpu.models import llama

    def rep(i, carry):
        acc, emb = carry
        hidden, _, _ = llama.decode_step(params, cfg, emb, cache, cos, sin, ())
        emb = (tok0 + hidden.astype(tok0.dtype) * 1e-3).astype(tok0.dtype)
        return acc + jnp.sum(hidden.astype(jnp.float32)) * 1e-9, emb

    acc, _ = jax.lax.fori_loop(0, reps, rep, (jnp.float32(0), tok0))
    return acc


@functools.partial(jax.jit, static_argnames=("reps", "cfg"))
def run_packed(params, cfg, kv, scale_kv, cos, sin, tok0, reps: int):
    flushed = jnp.asarray(FLUSHED, jnp.int32)

    def rep(i, carry):
        acc, emb = carry
        hidden = decode_step_packed(
            params, cfg, emb, kv, scale_kv, cos, sin, flushed
        )
        emb = (tok0 + hidden.astype(tok0.dtype) * 1e-3).astype(tok0.dtype)
        return acc + jnp.sum(hidden.astype(jnp.float32)) * 1e-9, emb

    acc, _ = jax.lax.fori_loop(0, reps, rep, (jnp.float32(0), tok0))
    return acc


@functools.partial(jax.jit, static_argnames=("cfg",))
def _make_cache(key, cfg):
    from mellow_tpu.models.llama import KVCache
    from mellow_tpu.ops.pallas_decode_attention import lane_pad

    L = cfg.num_layers
    KL = cfg.num_kv_heads * cfg.head_dim
    hd = cfg.head_dim
    KV = cfg.num_kv_heads
    P = KVCache.packed_dim(cfg)
    SP = lane_pad(S8)
    ks = jax.random.split(key, 4)
    k8 = jax.random.randint(ks[0], (L, B, S, P), -127, 128, jnp.int8)
    v8 = jax.random.randint(ks[1], (L, B, S, P), -127, 128, jnp.int8)
    ksc = jax.random.uniform(ks[2], (L, B, S)) * 0.01
    vsc = jax.random.uniform(ks[3], (L, B, S)) * 0.01
    cache = KVCache(
        k=k8, v=v8, length=jnp.asarray(FLUSHED, jnp.int32),
        k_scale=ksc, v_scale=vsc,
    )
    # Packed layout: per-group [K_g | V_g] pairs.
    kp = k8[..., :KL].reshape(L, B, S, KV, hd)
    vp = v8[..., :KL].reshape(L, B, S, KV, hd)
    kv = jnp.stack([kp, vp], axis=-2).reshape(L, B, S, 2 * KL)
    kv = jnp.pad(kv, ((0, 0), (0, 0), (0, S8 - S), (0, 0)))
    scale_kv = jnp.zeros((L, B, 2 * SP), jnp.float32)
    scale_kv = jax.lax.dynamic_update_slice(scale_kv, ksc, (0, 0, 0))
    scale_kv = jax.lax.dynamic_update_slice(scale_kv, vsc, (0, 0, SP))
    return cache, kv, scale_kv


def main():
    from mellow_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()

    from mellow_tpu.models import llama

    cfg = _cfg()
    dt = jnp.bfloat16
    params = llama.quantize_decoder(
        llama.init_params(jax.random.PRNGKey(0), cfg, dt), cfg
    )
    t0 = time.time()
    cache, kv, scale_kv = _make_cache(jax.random.PRNGKey(1), cfg)
    jax.block_until_ready(kv)
    log(f"cache built on device in {time.time()-t0:.1f}s")
    cos_np, sin_np = llama.rope_tables(cfg, S8, dt)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
    tok0 = jnp.asarray(
        np.random.RandomState(0).randn(B, cfg.hidden_size) * 0.02, dt
    )

    KL = cfg.num_kv_heads * cfg.head_dim
    L = cfg.num_layers
    for name, fn, args, byts in [
        (
            "current einsum (2x256 lanes)",
            run_current, (params, cfg, cache, cos, sin, tok0),
            L * B * S * (2 * 256 + 8),
        ),
        (
            "packed kernel (1x384 lanes)",
            run_packed, (params, cfg, kv, scale_kv, cos, sin, tok0),
            L * B * S8 * (2 * KL + 8),
        ),
    ]:
        t0 = time.time()
        float(fn(*args, reps=2))
        log(f"{name}: compile+warm {time.time()-t0:.1f}s")
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            float(fn(*args, reps=REPS))
            best = min(best, (time.time() - t0) / REPS)
        log(
            f"{name}: {best*1e3:.2f} ms/step | cache {byts/1e6:.0f} MB -> "
            f"{byts/best/1e9:.0f} GB/s | {B/best:,.0f} tok/s attention-only-step"
        )


if __name__ == "__main__":
    main()
