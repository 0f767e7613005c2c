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


def run_current_factory():
    import functools

    @functools.partial(jax.jit, static_argnames=("reps", "cfg"))
    def run_current(params, cfg, cache, cos, sin, tok0, reps: int):
        from mellow_tpu.models import llama

        def rep(i, carry):
            acc, emb = carry
            hidden, _, _ = llama.decode_step(params, cfg, emb, cache, cos, sin)
            emb = (tok0 + hidden.astype(tok0.dtype) * 1e-3).astype(tok0.dtype)
            return acc + jnp.sum(hidden.astype(jnp.float32)) * 1e-9, emb

        acc, _ = jax.lax.fori_loop(0, reps, rep, (jnp.float32(0), tok0))
        return acc

    return run_current


def run_packed_factory():
    import functools

    @functools.partial(jax.jit, static_argnames=("reps", "cfg"))
    def run_packed(params, cfg, pcache, cos, sin, tok0, reps: int):
        from mellow_tpu.models import llama

        P2 = llama.PackedKVCache.packed_dim(cfg)
        extras0 = jnp.zeros((cfg.num_layers, B, 8, P2), tok0.dtype)

        def rep(i, carry):
            acc, emb = carry
            hidden, _ = llama.decode_step_packed(
                params, cfg, emb, pcache, cos, sin, extras0, 0
            )
            emb = (tok0 + hidden.astype(tok0.dtype) * 1e-3).astype(tok0.dtype)
            return acc + jnp.sum(hidden.astype(jnp.float32)) * 1e-9, emb

        acc, _ = jax.lax.fori_loop(0, reps, rep, (jnp.float32(0), tok0))
        return acc

    return run_packed


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
    ksc = jax.random.uniform(ks[2], (L, B, S)) * 0.01
    vsc = jax.random.uniform(ks[3], (L, B, S)) * 0.01
    cache = KVCache(
        k=k8, v=v8, length=jnp.asarray(FLUSHED, jnp.int32),
        k_scale=ksc, v_scale=vsc,
    )
    # Flat [K | V] packed layout (PackedKVCache docstring).
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
    log(f"cache built on device in {time.time()-t0:.1f}s")
    cos_np, sin_np = llama.rope_tables(cfg, S8, dt)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
    tok0 = jnp.asarray(
        np.random.RandomState(0).randn(B, cfg.hidden_size) * 0.02, dt
    )

    KL = cfg.num_kv_heads * cfg.head_dim
    L = cfg.num_layers
    run_current = run_current_factory()
    run_packed = run_packed_factory()
    for name, fn, args, byts in [
        (
            "current einsum (2x256 lanes)",
            run_current, (params, cfg, cache, cos, sin, tok0),
            L * B * S * (2 * 256 + 8),
        ),
        (
            "packed kernel (1x384 lanes)",
            run_packed, (params, cfg, pcache, cos, sin, tok0),
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
