"""A/B: decode-attention MAC count (VERDICT r4 item 1).

The shipped einsum decode step contracts every query head against the
FULL 256-lane packed cache row via a block-diagonal dense q
(llama.decode_step, the eye-einsum q_dense/o_dense pair): per position
each of the 9 heads spends 256 MACs where only its own 64-lane block is
meaningful — ~4x the minimal attention MACs. The r3 packed Pallas kernel
that removed the waste only TIED because its M=16 dots ran at ~40% MXU,
so the r4 verdict's instruction is to attack the MAC COUNT in XLA first:

  current  — baseline: block-diagonal q_dense at K=256 (what ships).
  k192     — same, but contraction sliced to the 192 real lanes
             (drops the 25% explicit-pad MACs; layout risk: 192 is not a
             lane-tile multiple).
  group    — per-KV-group contraction: q as (B, KV, rep, hd) against the
             cache reshaped (B, S, KV, hd); one grouped dot_general with
             (b, g) batch dims — 4x fewer logical MACs, but (a) M=rep=3
             pads to the sublane tile and (b) XLA may transpose the
             cache to make g a batch dim (a per-step copy of the whole
             cache would swamp the dot savings).
  slice3   — three per-group dots on 64-lane cache slices
             (k_cache[..., 64g:64g+64]) — no reshape of the cache, but
             64-lane slices read half tiles.

All variants run the FULL layer stack (weights + MLP, logits excluded
equally), chained ``reps`` steps inside one jit so tunnel RTT cancels —
same frame as exp_decode_attn.py. Tokens are compared for equality to the
baseline (greedy argmax over a projection) as a sanity check.

Run on the TPU:  python benchmarks/exp_decode_attn2.py [B]
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
S = 533
FLUSHED = 500
REPS = 32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _cfg():
    from mellow_tpu.config import get_config

    return get_config("v0").decoder


def _attention(variant, cfg, q, k_cache, v_cache, k_sc, v_sc, mask,
               k_cur, v_cur):
    """One decode step's attention over [cache | current token].

    q: (B, 1, H, hd) roped. k_cur/v_cur: (B, 1, KV, hd) (k roped).
    k_cache/v_cache: (B, S_max, packed) int8; k_sc/v_sc: (B, S_max) fp32.
    mask: (1, S_max) additive. Returns o: (B, 1, H*hd).
    """
    Bq = q.shape[0]
    KV, H, hd = cfg.num_kv_heads, cfg.num_heads, cfg.head_dim
    rep = H // KV
    KL = KV * hd
    scale = 1.0 / np.sqrt(hd)
    dt = q.dtype

    if variant in ("current", "k192"):
        eye = jnp.eye(KV, dtype=dt)
        packed = k_cache.shape[-1]
        width = KL if variant == "k192" else packed
        qg = q.reshape(Bq, KV, rep, hd)
        q_dense = jnp.einsum("bgrd,gk->bgrkd", qg, eye).reshape(Bq, H, KL)
        if width > KL:
            q_dense = jnp.pad(q_dense, ((0, 0), (0, 0), (0, width - KL)))
        kc = k_cache if width == packed else k_cache[..., :KL]
        vc = v_cache if width == packed else v_cache[..., :KL]
        k_cur_p = jnp.pad(
            k_cur.reshape(Bq, 1, KL), ((0, 0), (0, 0), (0, width - KL))
        )
        v_cur_p = jnp.pad(
            v_cur.reshape(Bq, 1, KL), ((0, 0), (0, 0), (0, width - KL))
        )
        s_cache = jnp.einsum("bqd,bsd->bqs", q_dense, kc.astype(dt)) * scale
        s_cache = s_cache * k_sc[:, None, :].astype(s_cache.dtype)
        s_cache = (s_cache + mask[:, None]).astype(jnp.float32)
        s_cur = (
            jnp.einsum("bqd,bsd->bqs", q_dense, k_cur_p) * scale
        ).astype(jnp.float32)
        m = jnp.maximum(jnp.max(s_cache, axis=-1, keepdims=True), s_cur)
        e_cache = jnp.exp(s_cache - m).astype(dt)
        e_cur = jnp.exp(s_cur - m).astype(dt)
        denom = jnp.sum(e_cache, axis=-1, keepdims=True) + e_cur
        e_v = e_cache * v_sc[:, None, :].astype(e_cache.dtype)
        o_dense = jnp.einsum("bqs,bsd->bqd", e_v, vc.astype(dt))
        o_dense = o_dense + e_cur * v_cur_p
        o = jnp.einsum(
            "bgrkd,gk->bgrd",
            o_dense[..., :KL].reshape(Bq, KV, rep, KV, hd),
            eye,
        )
        return (o / denom.reshape(Bq, KV, rep, 1)).reshape(Bq, 1, H * hd)

    qg = q.reshape(Bq, KV, rep, hd)
    if variant == "group":
        kg = k_cache[..., :KL].reshape(Bq, -1, KV, hd)
        vg = v_cache[..., :KL].reshape(Bq, -1, KV, hd)
        s = jnp.einsum("bgrd,bsgd->bgrs", qg, kg.astype(dt)) * scale
        s = s * k_sc[:, None, None, :].astype(s.dtype)
        s = (s + mask[:, None, None]).astype(jnp.float32)  # (B, g, r, S)
        s_cur = (
            jnp.einsum("bgrd,bgd->bgr", qg, k_cur.reshape(Bq, KV, hd))[
                ..., None
            ]
            * scale
        ).astype(jnp.float32)  # (B, g, r, 1)
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_cur)
        e = jnp.exp(s - m).astype(dt)
        e_cur = jnp.exp(s_cur - m).astype(dt)
        denom = jnp.sum(e, axis=-1, keepdims=True) + e_cur
        ev = e * v_sc[:, None, None, :].astype(e.dtype)
        o = jnp.einsum("bgrs,bsgd->bgrd", ev, vg.astype(dt))
        o = o + e_cur * v_cur.reshape(Bq, KV, 1, hd)
        return (o / denom).reshape(Bq, 1, H * hd)

    if variant == "slice3":
        os_, denoms = [], []
        for g in range(KV):
            kgs = k_cache[..., g * hd:(g + 1) * hd]  # (B, S, hd)
            vgs = v_cache[..., g * hd:(g + 1) * hd]
            s = jnp.einsum("brd,bsd->brs", qg[:, g], kgs.astype(dt)) * scale
            s = s * k_sc[:, None, :].astype(s.dtype)
            s = (s + mask[:, None]).astype(jnp.float32)  # (B, r, S)
            s_cur = (
                jnp.einsum("brd,bd->br", qg[:, g], k_cur[:, 0, g])[..., None]
                * scale
            ).astype(jnp.float32)
            m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_cur)
            e = jnp.exp(s - m).astype(dt)
            e_cur = jnp.exp(s_cur - m).astype(dt)
            denom = jnp.sum(e, axis=-1, keepdims=True) + e_cur
            ev = e * v_sc[:, None, :].astype(e.dtype)
            o = jnp.einsum("brs,bsd->brd", ev, vgs.astype(dt))
            o = o + e_cur * v_cur[:, :, g]
            os_.append(o)
            denoms.append(denom)
        o = jnp.stack(os_, axis=1)  # (B, g, r, hd)
        denom = jnp.stack(denoms, axis=1)
        return (o / denom).reshape(Bq, 1, H * hd)

    raise ValueError(variant)


def make_step(variant):
    """Full decode step (all layers, MLP included) with the attention
    variant swapped in — mirrors llama.decode_step with empty pending."""

    def step(params, cfg, token_embed, cache, cos_full, sin_full):
        from mellow_tpu.models.llama import _mm, apply_rope, rms_norm

        Bq, D = token_embed.shape
        KV, H, hd = cfg.num_kv_heads, cfg.num_heads, cfg.head_dim
        S_max = cache.k.shape[2]
        flushed = cache.length
        x = token_embed[:, None, :]
        cos = jax.lax.dynamic_slice_in_dim(cos_full, flushed, 1, axis=0)
        sin = jax.lax.dynamic_slice_in_dim(sin_full, flushed, 1, axis=0)
        kpos = jnp.arange(S_max)
        mask = jnp.where(kpos[None, :] < flushed, 0.0, -jnp.inf).astype(
            jnp.float32
        )

        def body(carry, scanned):
            (x,) = carry
            lp, k_cache, v_cache, k_sc, v_sc = scanned
            h = rms_norm(x, lp["ln_attn"], cfg.rms_norm_eps)
            q = _mm(h, lp["wq"]).reshape(Bq, 1, H, hd)
            k = _mm(h, lp["wk"]).reshape(Bq, 1, KV, hd)
            v = _mm(h, lp["wv"]).reshape(Bq, 1, KV, hd)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            o = _attention(
                variant, cfg, q, k_cache, v_cache, k_sc, v_sc, mask, k, v
            )
            x = x + _mm(o, lp["wo"])
            h = rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps)
            gate = jax.nn.silu(_mm(h, lp["w_gate"]))
            up = _mm(h, lp["w_up"])
            x = x + _mm(gate * up, lp["w_down"])
            return (x,), None

        xs = (params["layers"], cache.k, cache.v, cache.k_scale, cache.v_scale)
        (x,), _ = jax.lax.scan(body, (x,), xs)
        x = rms_norm(x, params["norm_f"], cfg.rms_norm_eps)
        return x[:, 0, :]

    @functools.partial(jax.jit, static_argnames=("reps", "cfg"))
    def run(params, cfg, cache, cos, sin, tok0, reps: int):
        def rep(i, carry):
            acc, emb = carry
            hidden = step(params, cfg, emb, cache, cos, sin)
            emb = (tok0 + hidden.astype(tok0.dtype) * 1e-3).astype(tok0.dtype)
            return acc + jnp.sum(hidden.astype(jnp.float32)) * 1e-9, emb

        acc, emb = jax.lax.fori_loop(0, reps, rep, (jnp.float32(0), tok0))
        return acc, emb

    return run


@functools.partial(jax.jit, static_argnames=("cfg",))
def _make_cache(key, cfg):
    from mellow_tpu.models.llama import KVCache

    L = cfg.num_layers
    P = KVCache.packed_dim(cfg)
    KL = cfg.num_kv_heads * cfg.head_dim
    ks = jax.random.split(key, 4)
    k8 = jax.random.randint(ks[0], (L, B, S, P), -127, 128, jnp.int8)
    v8 = jax.random.randint(ks[1], (L, B, S, P), -127, 128, jnp.int8)
    # Zero the pad lanes (the real cache keeps them zero; 'current'
    # depends on it).
    lane = jnp.arange(P) < KL
    k8 = jnp.where(lane[None, None, None, :], k8, 0)
    v8 = jnp.where(lane[None, None, None, :], v8, 0)
    ksc = jax.random.uniform(ks[2], (L, B, S)) * 0.01
    vsc = jax.random.uniform(ks[3], (L, B, S)) * 0.01
    return KVCache(
        k=k8, v=v8, length=jnp.asarray(FLUSHED, jnp.int32),
        k_scale=ksc, v_scale=vsc,
    )


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
    cache = _make_cache(jax.random.PRNGKey(1), cfg)
    jax.block_until_ready(cache.k)
    log(f"cache built on device in {time.time()-t0:.1f}s (B={B})")
    cos_np, sin_np = llama.rope_tables(cfg, S, dt)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
    tok0 = jnp.asarray(
        np.random.RandomState(0).randn(B, cfg.hidden_size) * 0.02, dt
    )

    L = cfg.num_layers
    base_emb = None
    for variant in ("current", "group", "slice3", "k192"):
        run = make_step(variant)
        args = (params, cfg, cache, cos, sin, tok0)
        t0 = time.time()
        acc, emb = run(*args, reps=2)
        float(acc)
        log(f"{variant}: compile+warm {time.time()-t0:.1f}s")
        if base_emb is None:
            base_emb = np.asarray(emb, np.float32)
        else:
            diff = float(
                np.max(np.abs(np.asarray(emb, np.float32) - base_emb))
            )
            log(f"  {variant} vs current carry diff: {diff:.2e}")
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            acc, _ = run(*args, reps=REPS)
            float(acc)
            best = min(best, (time.time() - t0) / REPS)
        byts = L * B * S * (2 * 256 + 8)
        log(
            f"{variant}: {best*1e3:.2f} ms/step | {best/L*1e6:.0f} us/layer | "
            f"{byts/best/1e9:.0f} GB/s cache-stream rate | "
            f"{B/best:,.0f} tok/s attention-only-step"
        )


if __name__ == "__main__":
    main()
