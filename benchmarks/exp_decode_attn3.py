"""A/B: group-TILED int8 packed decode kernel (VERDICT r4 item 1) vs the
shipped einsum path and the r3 full-width packed kernel.

The tiled kernel (ops/pallas_decode_attention.flash_gqa_decode_tiled)
exploits the flat [K|V] row's 128-lane tile structure ([K0|K1], [K2|V0],
[V1|V2]) to cut the attention dots from 2x16x384 to 5x8x128 hardware
MACs per cache position (2.4x fewer) — the r3 kernel's compute was the
reason it only TIED the einsum (90 us/layer int8 dots vs the 74 us DMA
floor); with the MAC cut the kernel should become DMA-bound.

All variants run the FULL layer stack (weights + MLP; logits excluded
equally), chained ``reps`` steps inside one jit. XLA-reformulation
negative results (group/slice3/k192 einsums, all slower from layout
copies) are in exp_decode_attn2.py.

Run on the TPU:  python benchmarks/exp_decode_attn3.py [B]
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
S8 = -(-S // 8) * 8
FLUSHED = 500
REPS = 32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _cfg():
    from mellow_tpu.config import get_config

    return get_config("v0").decoder


def run_einsum_factory():
    @functools.partial(jax.jit, static_argnames=("reps", "cfg"))
    def run(params, cfg, cache, cos, sin, tok0, reps: int):
        from mellow_tpu.models import llama

        def rep(i, carry):
            acc, emb = carry
            hidden, _, _ = llama.decode_step(params, cfg, emb, cache, cos, sin)
            emb = (tok0 + hidden.astype(tok0.dtype) * 1e-3).astype(tok0.dtype)
            return acc + jnp.sum(hidden.astype(jnp.float32)) * 1e-9, emb

        acc, _ = jax.lax.fori_loop(0, reps, rep, (jnp.float32(0), tok0))
        return acc

    return run


def run_packed_factory(tiled: bool):
    @functools.partial(jax.jit, static_argnames=("reps", "cfg"))
    def run(params, cfg, pcache, cos, sin, tok0, reps: int):
        from mellow_tpu.models import llama
        from mellow_tpu.models.llama import _mm, apply_rope, rms_norm
        from mellow_tpu.ops import pallas_decode_attention as pda

        P2 = llama.PackedKVCache.packed_dim(cfg)
        KV, H, hd = cfg.num_kv_heads, cfg.num_heads, cfg.head_dim
        rep_ = H // KV
        L = cfg.num_layers
        extras0 = jnp.zeros((L, B, 8, P2), tok0.dtype)
        flushed = pcache.length
        eye = jnp.eye(KV, dtype=tok0.dtype)

        def step(emb):
            x = emb[:, None, :]
            cs = jax.lax.dynamic_slice_in_dim(cos, flushed, 1, axis=0)
            sn = jax.lax.dynamic_slice_in_dim(sin, flushed, 1, axis=0)

            def body(carry, scanned):
                (x,) = carry
                lp, ex_layer, l_idx = scanned
                h = rms_norm(x, lp["ln_attn"], cfg.rms_norm_eps)
                q = _mm(h, lp["wq"]).reshape(B, 1, H, hd)
                k = _mm(h, lp["wk"]).reshape(B, 1, KV, hd)
                v = _mm(h, lp["wv"]).reshape(B, 1, KV, hd)
                q = apply_rope(q, cs, sn)
                k = apply_rope(k, cs, sn)
                kv_row = jnp.concatenate(
                    [k.reshape(B, 1, KV * hd), v.reshape(B, 1, KV * hd)],
                    axis=-1,
                )
                ex = jax.lax.dynamic_update_slice(ex_layer, kv_row, (0, 0, 0))
                if tiled:
                    qt = pda.build_q_tiled(q.reshape(B, KV, rep_, hd))
                    out = pda.flash_gqa_decode_tiled(
                        qt, pcache.kv, pcache.scale, ex, l_idx, flushed,
                        jnp.asarray(1, jnp.int32), head_dim=hd,
                    )
                    o = pda.extract_o_tiled(out, x.dtype)
                else:
                    qg = q.reshape(B, KV, rep_, hd)
                    q_dense = jnp.einsum("bgrd,gk->bgrkd", qg, eye).reshape(
                        B, H, KV * hd
                    )
                    q_dense = jnp.pad(
                        q_dense, ((0, 0), (0, pda.HEAD_PAD - H), (0, KV * hd))
                    )
                    o_pk = pda.flash_gqa_decode(
                        q_dense, pcache.kv, pcache.scale, ex, l_idx, flushed,
                        jnp.asarray(1, jnp.int32), head_dim=hd,
                    )[:, :H, KV * hd:]
                    o = jnp.einsum(
                        "bgrkd,gk->bgrd",
                        o_pk.reshape(B, KV, rep_, KV, hd), eye,
                    ).reshape(B, 1, H * hd)
                x = x + _mm(o, lp["wo"])
                h = rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps)
                gate = jax.nn.silu(_mm(h, lp["w_gate"]))
                up = _mm(h, lp["w_up"])
                x = x + _mm(gate * up, lp["w_down"])
                return (x,), None

            (x,), _ = jax.lax.scan(
                body, (x,),
                (params["layers"], extras0, jnp.arange(L, dtype=jnp.int32)),
            )
            return rms_norm(x, params["norm_f"], cfg.rms_norm_eps)[:, 0, :]

        def rep(i, carry):
            acc, emb = carry
            hidden = step(emb)
            emb = (tok0 + hidden.astype(tok0.dtype) * 1e-3).astype(tok0.dtype)
            return acc + jnp.sum(hidden.astype(jnp.float32)) * 1e-9, emb

        acc, _ = jax.lax.fori_loop(0, reps, rep, (jnp.float32(0), tok0))
        return acc

    return run


@functools.partial(jax.jit, static_argnames=("cfg",))
def _make_cache(key, cfg):
    from mellow_tpu.models.llama import KVCache, PackedKVCache
    from mellow_tpu.ops.pallas_decode_attention import lane_pad

    L = cfg.num_layers
    KL = cfg.num_kv_heads * cfg.head_dim
    P = KVCache.packed_dim(cfg)
    SP = lane_pad(S8)
    ks = jax.random.split(key, 4)
    k8 = jax.random.randint(ks[0], (L, B, S, P), -127, 128, jnp.int8)
    v8 = jax.random.randint(ks[1], (L, B, S, P), -127, 128, jnp.int8)
    lane = jnp.arange(P) < KL
    k8 = jnp.where(lane[None, None, None, :], k8, 0)
    v8 = jnp.where(lane[None, None, None, :], v8, 0)
    ksc = jax.random.uniform(ks[2], (L, B, S)) * 0.01
    vsc = jax.random.uniform(ks[3], (L, B, S)) * 0.01
    cache = KVCache(
        k=k8, v=v8, length=jnp.asarray(FLUSHED, jnp.int32),
        k_scale=ksc, v_scale=vsc,
    )
    kv = jnp.concatenate([k8[..., :KL], v8[..., :KL]], axis=-1)
    kv = jnp.pad(kv, ((0, 0), (0, 0), (0, S8 - S), (0, 0)))
    scale_kv = jnp.zeros((L, B, 2 * SP), jnp.float32)
    scale_kv = jax.lax.dynamic_update_slice(scale_kv, ksc, (0, 0, 0))
    scale_kv = jax.lax.dynamic_update_slice(scale_kv, vsc, (0, 0, SP))
    pcache = PackedKVCache(
        kv=kv, length=jnp.asarray(FLUSHED, jnp.int32), scale=scale_kv
    )
    return cache, pcache


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
    cache, pcache = _make_cache(jax.random.PRNGKey(1), cfg)
    jax.block_until_ready(pcache.kv)
    log(f"caches built on device in {time.time()-t0:.1f}s (B={B})")
    cos_np, sin_np = llama.rope_tables(cfg, S8, dt)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
    tok0 = jnp.asarray(
        np.random.RandomState(0).randn(B, cfg.hidden_size) * 0.02, dt
    )

    L = cfg.num_layers
    for name, fn, args in [
        ("einsum (shipped int8)", run_einsum_factory(),
         (params, cfg, cache, cos, sin, tok0)),
        ("packed kernel r3 (full-width)", run_packed_factory(False),
         (params, cfg, pcache, cos, sin, tok0)),
        ("packed kernel TILED", run_packed_factory(True),
         (params, cfg, pcache, cos, sin, tok0)),
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
            f"{name}: {best*1e3:.2f} ms/step | {best/L*1e6:.0f} us/layer | "
            f"{B/best:,.0f} tok/s attention-only-step"
        )


if __name__ == "__main__":
    main()
