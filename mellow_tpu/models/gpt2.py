"""GPT-2 architecture causal LM (the reference's second decoder family,
mellow/model/decoder.py:26-27,41-45: gpt2-style models drive the same
prefix pipeline with wte embeddings and sep token 50256).

Same functional interface as mellow_tpu.models.llama (forward / prefill /
decode_step / logits_from_hidden / init_params) so generation code is
family-agnostic via mellow_tpu.models.decoders. Architecture: learned
positional embeddings, pre-LN blocks, full MHA (KV heads == heads), GELU
(tanh approximation — GPT-2's 'gelu_new'), tied LM head, LayerNorm with
bias.

Param tree (kernels (in, out); biases present — GPT-2 uses them everywhere):
  params = {
    "wte": (V, D), "wpe": (P, D),
    "layers": { stacked on axis 0:
        "ln1_g","ln1_b","ln2_g","ln2_b": (L, D),
        "w_qkv": (L, D, 3D), "b_qkv": (L, 3D),
        "w_o": (L, D, D), "b_o": (L, D),
        "w_fc": (L, D, 4D), "b_fc": (L, 4D),
        "w_proj": (L, 4D, D), "b_proj": (L, D),
    },
    "lnf_g","lnf_b": (D,),
  }
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mellow_tpu.models.llama import _mm


@dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 1024
    layer_norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


class GPT2Cache(NamedTuple):
    k: jax.Array  # (L, B, S_max, D) packed heads (lane-friendly)
    v: jax.Array
    length: jax.Array

    @staticmethod
    def create(cfg: GPT2Config, batch: int, max_len: int, dtype=jnp.float32):
        dtype = jnp.dtype(dtype)
        if not jnp.issubdtype(dtype, jnp.floating):
            # The gpt2 family has no quantized-cache path (no scale fields);
            # a raw astype would silently truncate (-1, 1) values to 0.
            raise ValueError(
                f"gpt2 KV cache requires a floating dtype, got {dtype}; "
                "kv_cache_dtype='int8' is a llama-family-only perf mode"
            )
        shape = (cfg.num_layers, batch, max_len, cfg.hidden_size)
        return GPT2Cache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                         jnp.zeros((), jnp.int32))


def quantize_gpt2(params: dict, cfg: GPT2Config) -> dict:
    """int8-weight inference mode for the gpt2 family (mirrors
    llama.quantize_decoder): every per-layer matmul kernel gets symmetric
    per-out-channel int8 values + fp32 scales (biases stay float; the wte
    GATHER keeps the float table), and the logits matmul — which streams
    all V*D weights every decode step — gets a quantized copy under
    ``wte_head_q`` that ``logits_from_hidden`` prefers when present."""
    from mellow_tpu.models.llama import quantize_weight

    out = dict(params)
    layers = dict(params["layers"])
    for k in ("w_qkv", "w_o", "w_fc", "w_proj"):
        layers[k] = quantize_weight(layers[k])
    out["layers"] = layers
    out["wte_head_q"] = quantize_weight(params["wte"].T)
    return out


def _ln(x, g, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _gelu_new(x):
    # GPT-2's tanh-approximated gelu.
    return jax.nn.gelu(x, approximate=True)


def _attn_full(cfg: GPT2Config, q, k, v, mask):
    """q, k, v: (B, S, H, hd); mask additive (1, 1, S, S_kv)."""
    scale = 1.0 / np.sqrt(cfg.head_dim)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    attn = attn + mask
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


def _layer_full(cfg, x, lp, mask, use_fused=False):
    B, S, D = x.shape
    H, hd = cfg.num_heads, cfg.head_dim
    h = _ln(x, lp["ln1_g"], lp["ln1_b"], cfg.layer_norm_eps)
    qkv = _mm(h, lp["w_qkv"]) + lp["b_qkv"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if use_fused:
        # Whole-sequence-in-VMEM Pallas attention (pure causal, bf16 perf
        # mode; see llama.prefill + ops/pallas_attention.py). MHA is the
        # KV == H special case of the GQA kernel.
        from mellow_tpu.ops.pallas_attention import flash_gqa_prefill

        o = flash_gqa_prefill(
            q, k, v, num_heads=H, num_kv_heads=H, head_dim=hd
        )
    else:
        o = _attn_full(
            cfg, q.reshape(B, S, H, hd), k.reshape(B, S, H, hd),
            v.reshape(B, S, H, hd), mask,
        ).reshape(B, S, D)
    x = x + _mm(o, lp["w_o"]) + lp["b_o"]
    h = _ln(x, lp["ln2_g"], lp["ln2_b"], cfg.layer_norm_eps)
    x = x + _mm(_gelu_new(_mm(h, lp["w_fc"]) + lp["b_fc"]), lp["w_proj"]) + lp["b_proj"]
    return x, (k, v)


def forward(params, cfg: GPT2Config, inputs_embeds: jax.Array,
            *, position_offset: int = 0, remat: bool = False) -> jax.Array:
    """Full-sequence forward -> logits (B, S, V). inputs_embeds are the
    already-embedded tokens (the Mellow pipeline feeds audio prefixes this
    way, wrapper.py:217)."""
    B, S, D = inputs_embeds.shape
    pos = jnp.arange(position_offset, position_offset + S)
    x = inputs_embeds + params["wpe"][pos].astype(inputs_embeds.dtype)
    causal = jnp.tril(jnp.ones((S, S), bool))
    mask = jnp.where(causal, 0.0, -jnp.inf).astype(jnp.float32)[None, None]

    def body(x, lp):
        x, _ = _layer_full(cfg, x, lp, mask)
        return x, None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params["layers"])
    x = _ln(x, params["lnf_g"], params["lnf_b"], cfg.layer_norm_eps)
    return x @ params["wte"].T.astype(x.dtype)


def prefill(params, cfg: GPT2Config, inputs_embeds, cache: GPT2Cache):
    B, S, D = inputs_embeds.shape
    pos = jnp.arange(S)
    x = inputs_embeds + params["wpe"][pos].astype(inputs_embeds.dtype)
    causal = jnp.tril(jnp.ones((S, S), bool))
    mask = jnp.where(causal, 0.0, -jnp.inf).astype(jnp.float32)[None, None]
    # Same trace-time kill switch as llama.prefill (CLAUDE.md's documented
    # knob; note the env var is read at TRACE time, so flipping it requires
    # a fresh jit cache entry).
    import os

    use_fused = (
        inputs_embeds.dtype == jnp.bfloat16
        and jax.default_backend() in ("tpu", "axon")
        and S <= 1024
        and not os.environ.get("MELLOW_TPU_DISABLE_FUSED_ATTN")
    )

    def body(x, lp):
        x, (k, v) = _layer_full(cfg, x, lp, mask, use_fused=use_fused)
        return x, (k, v)

    x, (ks, vs) = jax.lax.scan(body, x, params["layers"])
    new_k = jax.lax.dynamic_update_slice(cache.k, ks.astype(cache.k.dtype), (0, 0, 0, 0))
    new_v = jax.lax.dynamic_update_slice(cache.v, vs.astype(cache.v.dtype), (0, 0, 0, 0))
    x = _ln(x, params["lnf_g"], params["lnf_b"], cfg.layer_norm_eps)
    return x[:, -1, :], GPT2Cache(new_k, new_v, jnp.asarray(S, jnp.int32))


def flush_pending(cfg: GPT2Config, cache: GPT2Cache, pending) -> GPT2Cache:
    """Scatter pending — a tuple of n single-position (k, v) entries, each
    (L, B, 1, D), positions cache.length .. cache.length+n-1 — in one
    dynamic_update_slice per buffer (same flush-batching design as
    llama.flush_pending; the stack is concatenated only here)."""
    if len(pending) == 1:
        pk, pv = pending[0]
    else:
        pk = jnp.concatenate([e[0] for e in pending], axis=2)
        pv = jnp.concatenate([e[1] for e in pending], axis=2)
    start = cache.length
    return GPT2Cache(
        jax.lax.dynamic_update_slice(cache.k, pk.astype(cache.k.dtype), (0, 0, start, 0)),
        jax.lax.dynamic_update_slice(cache.v, pv.astype(cache.v.dtype), (0, 0, start, 0)),
        start + pk.shape[2],
    )


def decode_step(params, cfg: GPT2Config, token_embed, cache: GPT2Cache,
                pending: tuple = ()):
    """One incremental step; NEVER writes the cache — pending is a tuple of
    single-position (k, v) entries (trailing un-flushed positions), attended
    explicitly; the caller flushes a window at a time (same design as
    llama.decode_step)."""
    pending = tuple(pending) if pending else ()
    B, D = token_embed.shape
    H, hd = cfg.num_heads, cfg.head_dim
    S_max = cache.k.shape[2]
    flushed = cache.length
    n_pend = len(pending)
    pos = flushed + n_pend

    x = token_embed[:, None, :] + params["wpe"][pos][None, None].astype(token_embed.dtype)
    mask = jnp.where(jnp.arange(S_max)[None, :] < flushed, 0.0, -jnp.inf).astype(jnp.float32)

    def body(carry, scanned):
        x, = carry
        lp, k_cache, v_cache = scanned[:3]
        pend = scanned[3:]  # flattened (k0, v0, ...) per-layer (B, 1, D)
        pend_entries = [(pend[2 * i], pend[2 * i + 1]) for i in range(n_pend)]
        h = _ln(x, lp["ln1_g"], lp["ln1_b"], cfg.layer_norm_eps)
        qkv = _mm(h, lp["w_qkv"]) + lp["b_qkv"]
        q, k_cur, v_cur = jnp.split(qkv, 3, axis=-1)  # (B, 1, D) each
        qh = q.reshape(B, H, hd)

        scale = 1.0 / np.sqrt(hd)
        kc = k_cache.reshape(B, S_max, H, hd)
        s_cache = (jnp.einsum("bhd,bshd->bhs", qh, kc.astype(q.dtype)) * scale
                   + mask).astype(jnp.float32)
        s_cur = (jnp.einsum("bhd,bhd->bh", qh, k_cur.reshape(B, H, hd))
                 * scale).astype(jnp.float32)[..., None]
        s_pends = [
            (jnp.einsum("bhd,bhd->bh", qh, pk.reshape(B, H, hd).astype(q.dtype))
             * scale).astype(jnp.float32)[..., None]
            for pk, _ in pend_entries
        ]
        m = jnp.maximum(jnp.max(s_cache, axis=-1, keepdims=True), s_cur)
        for s_p in s_pends:
            m = jnp.maximum(m, s_p)
        e_cache = jnp.exp(s_cache - m).astype(x.dtype)
        e_cur = jnp.exp(s_cur - m).astype(x.dtype)
        denom = jnp.sum(e_cache, axis=-1, keepdims=True) + e_cur
        vc = v_cache.reshape(B, S_max, H, hd)
        o = jnp.einsum("bhs,bshd->bhd", e_cache, vc.astype(x.dtype))
        o = o + e_cur * v_cur.reshape(B, H, hd)
        for s_p, (_, pv) in zip(s_pends, pend_entries):
            e_p = jnp.exp(s_p - m).astype(x.dtype)  # (B, H, 1)
            denom = denom + e_p
            o = o + e_p * pv.reshape(B, H, hd)
        o = o / denom
        x = x + _mm(o.reshape(B, 1, D), lp["w_o"]) + lp["b_o"]

        h = _ln(x, lp["ln2_g"], lp["ln2_b"], cfg.layer_norm_eps)
        x = x + _mm(_gelu_new(_mm(h, lp["w_fc"]) + lp["b_fc"]), lp["w_proj"]) + lp["b_proj"]
        return (x,), (k_cur.astype(token_embed.dtype), v_cur.astype(token_embed.dtype))

    xs = [params["layers"], cache.k, cache.v]
    for pk, pv in pending:
        xs += [pk, pv]
    (x,), (ks, vs) = jax.lax.scan(body, (x,), tuple(xs))
    x = _ln(x, params["lnf_g"], params["lnf_b"], cfg.layer_norm_eps)
    return x[:, 0, :], cache, pending + ((ks, vs),)


def logits_from_hidden(params, cfg: GPT2Config, x):
    if "wte_head_q" in params:  # int8-weight perf mode (quantize_gpt2)
        return _mm(x, params["wte_head_q"])
    return x @ params["wte"].T.astype(x.dtype)


def init_params(rng, cfg: GPT2Config, dtype=jnp.float32):
    seed = int(np.asarray(jax.random.key_data(rng)).ravel()[-1])
    g = np.random.default_rng(seed)
    L, D = cfg.num_layers, cfg.hidden_size

    def nrm(shape, std=0.02):
        return jnp.asarray(g.normal(0.0, std, shape), dtype)

    return {
        "wte": nrm((cfg.vocab_size, D)),
        "wpe": nrm((cfg.max_position_embeddings, D), 0.01),
        "layers": {
            "ln1_g": jnp.ones((L, D), dtype), "ln1_b": jnp.zeros((L, D), dtype),
            "ln2_g": jnp.ones((L, D), dtype), "ln2_b": jnp.zeros((L, D), dtype),
            "w_qkv": nrm((L, D, 3 * D)), "b_qkv": jnp.zeros((L, 3 * D), dtype),
            "w_o": nrm((L, D, D)), "b_o": jnp.zeros((L, D), dtype),
            "w_fc": nrm((L, D, 4 * D)), "b_fc": jnp.zeros((L, 4 * D), dtype),
            "w_proj": nrm((L, 4 * D, D)), "b_proj": jnp.zeros((L, D), dtype),
        },
        "lnf_g": jnp.ones((D,), dtype), "lnf_b": jnp.zeros((D,), dtype),
    }


def convert_hf_gpt2(sd, num_layers: int, prefix: str = "") -> dict:
    """HF GPT2LMHeadModel state_dict -> param tree. HF stores attention and
    MLP weights as Conv1D (already (in, out)) — no transpose."""
    import numpy as onp

    def g(key):
        t = sd[prefix + key]
        return onp.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t, onp.float32)

    def stack(fmt):
        return onp.stack([g(fmt.format(i)) for i in range(num_layers)], axis=0)

    return {
        "wte": g("transformer.wte.weight"),
        "wpe": g("transformer.wpe.weight"),
        "layers": {
            "ln1_g": stack("transformer.h.{}.ln_1.weight"),
            "ln1_b": stack("transformer.h.{}.ln_1.bias"),
            "ln2_g": stack("transformer.h.{}.ln_2.weight"),
            "ln2_b": stack("transformer.h.{}.ln_2.bias"),
            "w_qkv": stack("transformer.h.{}.attn.c_attn.weight"),
            "b_qkv": stack("transformer.h.{}.attn.c_attn.bias"),
            "w_o": stack("transformer.h.{}.attn.c_proj.weight"),
            "b_o": stack("transformer.h.{}.attn.c_proj.bias"),
            "w_fc": stack("transformer.h.{}.mlp.c_fc.weight"),
            "b_fc": stack("transformer.h.{}.mlp.c_fc.bias"),
            "w_proj": stack("transformer.h.{}.mlp.c_proj.weight"),
            "b_proj": stack("transformer.h.{}.mlp.c_proj.bias"),
        },
        "lnf_g": g("transformer.ln_f.weight"),
        "lnf_b": g("transformer.ln_f.bias"),
    }
