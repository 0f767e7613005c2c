"""TPU-native Llama-architecture causal LM (SmolLM2-135M shape).

The reference drives HuggingFace's ``AutoModelForCausalLM`` through
``inputs_embeds`` (mellow/model/decoder.py:25, mellow/wrapper.py:217) and
re-runs the full model every decode step with no KV cache
(SURVEY.md section 3.4 Q3). This implementation is a from-scratch functional JAX
Llama with:

  * stacked per-layer parameters scanned with ``lax.scan`` (one compiled
    layer body instead of 30 unrolled layers),
  * a static-shape KV cache so the whole decode loop jits once,
  * GQA (9 query heads / 3 KV heads), RoPE (HF "rotate_half" convention),
    RMSNorm, SiLU-gated MLP, tied embeddings.

Parameter tree (all kernels stored (in, out) so application is ``x @ W``):

  params = {
    "embed": (V, D),
    "layers": {               # every leaf stacked on axis 0 with L entries
        "ln_attn": (L, D), "ln_mlp": (L, D),
        "wq": (L, D, H*hd), "wk": (L, D, KV*hd), "wv": (L, D, KV*hd),
        "wo": (L, H*hd, D),
        "w_gate": (L, D, I), "w_up": (L, D, I), "w_down": (L, I, D),
    },
    "norm_f": (D,),
  }
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mellow_tpu.config import LlamaConfig


class KVCache(NamedTuple):
    """Static-shape per-layer KV cache.

    k, v: (L, B, S_max, KV_heads * head_dim) — KV heads PACKED into the lane
    dimension. Two hardware reasons (measured on v5e-1):
      * a trailing head_dim of 64 pads to the 128-lane tile, doubling the
        cache's physical footprint and HBM traffic;
      * the per-step position write becomes one contiguous (L, B, 1, 192)
        row scatter (~0.5 ms) instead of a strided 64-wide scatter (~1.8 ms).
    Attention contracts directly over the packed 192 dim using
    block-diagonal dense queries (see ``_dense_queries``) — no per-step
    cache transpose or reshape ever touches HBM.
    ``length`` is the number of valid positions (traced scalar).

    int8 mode (``cache_dtype="int8"``, perf option): k/v are symmetric
    per-position int8 with fp32 scales (L, B, S) in k_scale/v_scale —
    attention reads half the HBM bytes; the scale multiplies scores /
    exp-weights AFTER the matmul so no dequantized cache is materialized.
    In float modes the scale arrays are empty placeholders (stable pytree).
    """

    k: jax.Array
    v: jax.Array
    length: jax.Array  # int32 scalar
    k_scale: Optional[jax.Array] = None  # None = float cache (no scales)
    v_scale: Optional[jax.Array] = None

    @staticmethod
    def packed_dim(cfg: LlamaConfig) -> int:
        # Explicitly pad KV*hd (192) up to the 128-lane tile (256): the
        # physical footprint is identical (XLA pads anyway) but per-position
        # writes stop being read-modify-writes on partially-used tiles
        # (measured 1.49 -> 0.49 ms/write at B=64 on v5e-1). The dead lanes
        # hold zeros, which the block-diagonal queries ignore.
        raw = cfg.num_kv_heads * cfg.head_dim
        return -(-raw // 128) * 128

    @staticmethod
    def create(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.float32) -> "KVCache":
        dtype = jnp.dtype(dtype)
        shape = (cfg.num_layers, batch, max_len, KVCache.packed_dim(cfg))
        if dtype == jnp.int8:
            # Distinct arrays (not one shared zeros): concrete caches are
            # DONATED to generate(), and aliased leaves trip XLA's
            # donate-the-same-buffer-twice check.
            return KVCache(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                length=jnp.zeros((), jnp.int32),
                k_scale=jnp.zeros(shape[:3], jnp.float32),
                v_scale=jnp.zeros(shape[:3], jnp.float32),
            )
        return KVCache(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            length=jnp.zeros((), jnp.int32),
        )

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-position int8 quantization over the packed lane dim.
    x: (..., packed) -> (int8 values, fp32 scale (...,))."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def _mm(x: jax.Array, w) -> jax.Array:
    """Matmul against a possibly weight-quantized kernel.

    Float kernel: plain ``x @ w``. int8 kernel ``{"q": int8 (.., in, out),
    "scale": fp32 (.., out)}``: the int8 values are what stream from HBM
    (the convert fuses into the dot's operand load) and the per-output-column
    scale folds in AFTER the matmul — decode is weight-streaming bound, so
    halving the bytes is ~2x step-rate headroom (BENCH r1: 103 GB/s of the
    chip's 530 GB/s)."""
    if isinstance(w, dict):
        return (x @ w["q"].astype(x.dtype)) * w["scale"].astype(x.dtype)
    return x @ w


def quantize_weight(w: jax.Array) -> dict:
    """Symmetric per-output-channel int8 (kernels are stored (.., in, out);
    the scale is per out column, amax over the contraction axis)."""
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.squeeze(-2)}


_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_decoder(params: dict, cfg: LlamaConfig) -> dict:
    """int8-weight inference mode (perf, non-parity): quantize every
    per-layer matmul kernel and the logits head. The embedding GATHER keeps
    the float table (it reads only B rows/step); the logits matmul — which
    streams all V*D weights every step — gets a quantized copy under
    ``lm_head_q`` that ``logits_from_hidden`` prefers when present."""
    out = dict(params)
    layers = dict(params["layers"])
    for k in _QUANT_KEYS:
        layers[k] = quantize_weight(layers[k])
    out["layers"] = layers
    head = (
        params["embed"].T if cfg.tie_word_embeddings else params["lm_head"]
    )
    out["lm_head_q"] = quantize_weight(head)
    return out


def rope_tables(cfg: LlamaConfig, max_len: int, dtype=jnp.float32) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin tables, HF convention: emb = concat(freqs, freqs)."""
    inv_freq = 1.0 / (
        cfg.rope_theta ** (np.arange(0, cfg.head_dim, 2, dtype=np.float64) / cfg.head_dim)
    )
    t = np.arange(max_len, dtype=np.float64)
    freqs = np.outer(t, inv_freq)  # (S, hd/2)
    emb = np.concatenate([freqs, freqs], axis=-1)  # (S, hd)
    return np.cos(emb).astype(dtype), np.sin(emb).astype(dtype)


def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, S, H, hd); cos/sin: (S, hd) shared, or (B, S, hd) per-row
    (ragged continuous-batching decode, models/continuous.py)."""
    if cos.ndim == 3:
        cos = cos[:, :, None, :]
        sin = sin[:, :, None, :]
    else:
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
    return x * cos + _rotate_half(x) * sin


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32)).astype(dtype)


def _flash_causal_attention(q, k, v):
    """Causal attention via the stock Pallas TPU flash kernel (no (S, S)
    score materialization — the einsum path writes ~350 MB of fp32 scores
    per layer at B=64, S=389). q/k/v: (B, S, H, hd) with KV already
    repeated; returns (B, S, H, hd). Pads S up to a 512 multiple (padded
    queries are causal-masked to self-attention only and sliced away)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    B, S, H, hd = q.shape
    pad = (-S) % 512
    if pad:
        zq = jnp.zeros((B, pad, H, hd), q.dtype)
        q = jnp.concatenate([q, zq], axis=1)
        k = jnp.concatenate([k, zq], axis=1)
        v = jnp.concatenate([v, zq], axis=1)
    qt = jnp.transpose(q, (0, 2, 1, 3))  # (B, H, S, hd)
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    out = flash_attention(qt, kt, vt, causal=True, sm_scale=1.0 / np.sqrt(hd))
    out = jnp.transpose(out, (0, 2, 1, 3))
    return out[:, :S] if pad else out


def _deq_weight(w, dtype):
    """int8 {"q", "scale"} -> dense dtype kernel (for kernels that consume
    the weight inside a Pallas program; the tiny dequant runs once per
    layer outside and is fused by XLA)."""
    if isinstance(w, dict):
        return (
            w["q"].astype(jnp.float32) * w["scale"][None, :].astype(jnp.float32)
        ).astype(dtype)
    return w


def _mlp_half(cfg: LlamaConfig, x, lp, mlp_mode: int = 0):
    """MLP half of a layer: x + down(silu(gate(norm(x))) * up(norm(x))).

    mlp_mode 0: XLA path. 1: fused Pallas MLP block (norm+residual inside
    the program — benchmarks/exp_mlp_block.py: 0.543 vs 0.567 ms/layer).
    2: W8A8 — int8 weights resident + in-kernel per-row activation quant
    driving native int8 MXU dots (0.439 ms/layer, the raw int8 dot being
    1.51x bf16 at prefill shapes, exp_w8a8_prefill.py). Mode 2 requires
    quantized weight dicts and is a further lossy step beyond weight-only
    int8 (rel. Frobenius error ~3% per block on random weights)."""
    if mlp_mode == 2 and isinstance(lp["w_gate"], dict):
        from mellow_tpu.ops.pallas_mlp_block import fused_mlp_block_w8a8

        return fused_mlp_block_w8a8(
            x, lp["ln_mlp"],
            lp["w_gate"]["q"], lp["w_gate"]["scale"],
            lp["w_up"]["q"], lp["w_up"]["scale"],
            lp["w_down"]["q"], lp["w_down"]["scale"],
            eps=cfg.rms_norm_eps,
        )
    if mlp_mode:
        from mellow_tpu.ops.pallas_mlp_block import fused_mlp_block

        return fused_mlp_block(
            x, lp["ln_mlp"],
            _deq_weight(lp["w_gate"], x.dtype),
            _deq_weight(lp["w_up"], x.dtype),
            _deq_weight(lp["w_down"], x.dtype),
            eps=cfg.rms_norm_eps,
        )
    h = rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps)
    gate = jax.nn.silu(_mm(h, lp["w_gate"]))
    up = _mm(h, lp["w_up"])
    return x + _mm(gate * up, lp["w_down"])


def _layer(
    cfg: LlamaConfig, x, lp, cos, sin, mask, kv_slot=None, use_flash=False,
    use_fused=False, use_fused_block=False, mlp_mode=0, kv_quant=False,
):
    """One transformer layer.

    x: (B, S, D). mask: additive (1, 1, S, S_kv) or None (pure causal handled
    by caller-provided mask). Returns (out, (k, v)) where k/v are this
    layer's new keys/values (B, S, KV, hd) BEFORE any cache merge.
    kv_slot: optional (k_cache, v_cache) of shape (B, S_max, KV, hd) holding
    previously cached positions; when given, attention runs over the cache
    with the new kv scattered in by the caller (decode path).
    """
    B, S, D = x.shape
    H, KV, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    if use_fused_block and kv_slot is None:
        # Whole attention half (pre-norm + qkv + rope + causal GQA + o-proj
        # + residual) in ONE Pallas program per batch row — removes the
        # h/q/k/v HBM round-trips and the VPU norm/rope fusion chain that
        # the per-op profile attributed the remaining prefill MFU gap to
        # (benchmarks/README.md). In w8a8 mode (mlp_mode 2) the block runs
        # every dot on the int8 MXU path (2x bf16 — the r4 ablation showed
        # both the projection half and the hd=64 attention core are
        # MXU-bound, benchmarks/exp_attn_block_parts.py); otherwise int8
        # weights are dequantized per layer outside the kernel (negligible;
        # a bf16-weight A/B measured no difference).
        import os

        if (
            mlp_mode == 2
            and isinstance(lp["wq"], dict)
            and not os.environ.get("MELLOW_TPU_DISABLE_W8A8_ATTN")
        ):
            from mellow_tpu.ops.pallas_attn_block import fused_attn_block_w8a8

            outs = fused_attn_block_w8a8(
                x, lp["ln_attn"],
                lp["wq"]["q"], lp["wq"]["scale"],
                lp["wk"]["q"], lp["wk"]["scale"],
                lp["wv"]["q"], lp["wv"]["scale"],
                lp["wo"]["q"], lp["wo"]["scale"],
                cos, sin, num_heads=H, num_kv_heads=KV, head_dim=hd,
                eps=cfg.rms_norm_eps, kv_quant=kv_quant,
            )
        else:
            from mellow_tpu.ops.pallas_attn_block import fused_attn_block

            outs = fused_attn_block(
                x, lp["ln_attn"],
                _deq_weight(lp["wq"], x.dtype), _deq_weight(lp["wk"], x.dtype),
                _deq_weight(lp["wv"], x.dtype), _deq_weight(lp["wo"], x.dtype),
                cos, sin, num_heads=H, num_kv_heads=KV, head_dim=hd,
                eps=cfg.rms_norm_eps, kv_quant=kv_quant,
            )
        if kv_quant:
            # int8-cache prefill: k/v come back already quantized packed
            # (B, S, KV*hd) int8 + per-position scales in lane layout
            # (B, 1, SP) — slice the real positions; the commit is then a
            # pure dynamic_update_slice (no XLA-side quantize pass).
            x, k8, v8, ksc, vsc = outs
            kv = (k8, v8, ksc[:, 0, :S], vsc[:, 0, :S])
        else:
            x, kpk, vpk = outs
            kv = (kpk.reshape(B, S, KV, hd), vpk.reshape(B, S, KV, hd))
        return _mlp_half(cfg, x, lp, mlp_mode), kv

    with jax.named_scope("decoder/attn_proj"):
        h = rms_norm(x, lp["ln_attn"], cfg.rms_norm_eps)
        q = _mm(h, lp["wq"]).reshape(B, S, H, hd)
        k = _mm(h, lp["wk"]).reshape(B, S, KV, hd)
        v = _mm(h, lp["wv"]).reshape(B, S, KV, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    if kv_slot is None:
        k_att, v_att = k, v
    else:
        k_att, v_att = kv_slot

    rep = H // KV
    if use_fused:
        # Custom Pallas GQA kernel (pure causal, bf16 perf mode): whole
        # sequence VMEM-resident per batch row, no HBM score tensor, no KV
        # repeat — measured 1.70 vs 3.01 ms/layer for the einsum at B=64,
        # S=389 (benchmarks/exp_prefill_attn.py). fp32 parity mode keeps
        # the einsum below.
        from mellow_tpu.ops.pallas_attention import flash_gqa_prefill

        o = flash_gqa_prefill(
            q.reshape(B, S, H * hd),
            k_att.reshape(B, S, KV * hd),
            v_att.reshape(B, S, KV * hd),
            num_heads=H, num_kv_heads=KV, head_dim=hd,
        )
    elif use_flash:
        # Flash path (inference prefill, pure causal): repeat KV to H heads
        # (29 MB at B=64 — cheap next to the O(S^2) scores it avoids).
        k_full = jnp.repeat(k_att, rep, axis=2)
        v_full = jnp.repeat(v_att, rep, axis=2)
        o = _flash_causal_attention(q, k_full, v_full).reshape(B, S, H * hd)
    else:
        # GQA without materializing repeated KV heads: group the query heads
        # as (KV, rep) and contract against the KV heads directly.
        qg = q.reshape(B, S, KV, rep, hd)
        scale = 1.0 / np.sqrt(hd)
        attn = jnp.einsum("bqhrd,bkhd->bhrqk", qg, k_att) * scale
        if mask is not None:
            attn = attn + mask[:, :, None]  # (B?, 1|H, q, k) -> broadcast rep
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhrqk,bkhd->bqhrd", attn, v_att).reshape(B, S, H * hd)
    x = x + _mm(o, lp["wo"])
    return _mlp_half(cfg, x, lp, mlp_mode), (k, v)


def forward(
    params,
    cfg: LlamaConfig,
    inputs_embeds: jax.Array,
    *,
    attention_mask: Optional[jax.Array] = None,
    remat: bool = False,
) -> jax.Array:
    """Full-sequence forward (teacher forcing / the reference's per-step
    full recompute, wrapper.py:217). Returns logits (B, S, V).
    ``remat`` checkpoints each layer (recompute activations in backward —
    the TPU memory/FLOP trade the task mandates for training at scale)."""
    B, S, D = inputs_embeds.shape
    cos_t, sin_t = rope_tables(cfg, S, inputs_embeds.dtype)
    cos, sin = jnp.asarray(cos_t), jnp.asarray(sin_t)

    causal = jnp.tril(jnp.ones((S, S), bool))
    mask = jnp.where(causal, 0.0, -jnp.inf).astype(jnp.float32)[None, None]
    if attention_mask is not None:
        pad = jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, -jnp.inf)
        mask = mask + pad

    def body(x, lp):
        x, _ = _layer(cfg, x, lp, cos, sin, mask)
        return x, None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, inputs_embeds, params["layers"])
    x = rms_norm(x, params["norm_f"], cfg.rms_norm_eps)
    return logits_from_hidden(params, cfg, x)


def logits_from_hidden(params, cfg: LlamaConfig, x: jax.Array) -> jax.Array:
    if "lm_head_q" in params:  # int8-weight perf mode (quantize_decoder)
        return _mm(x, params["lm_head_q"])
    head = params["embed"].T if cfg.tie_word_embeddings else params["lm_head"]
    return x @ head.astype(x.dtype)


def _prefill_scan(params, cfg: LlamaConfig, inputs_embeds, use_fused,
                  use_fused_block=False, mlp_mode=0, kv_quant=False):
    """Layer scan over one batch chunk: returns (post-norm last hidden
    (B, D), kv) where kv = (ks, vs) packed bf16 (L, B, S, KV*hd), or —
    with ``kv_quant`` — (ks8, vs8, ksc, vsc): int8 rows + (L, B, S) fp32
    scales, quantized inside the fused attention kernel."""
    B, S, D = inputs_embeds.shape
    cos_t, sin_t = rope_tables(cfg, S, inputs_embeds.dtype)
    cos, sin = jnp.asarray(cos_t), jnp.asarray(sin_t)
    causal = jnp.tril(jnp.ones((S, S), bool))
    mask = jnp.where(causal, 0.0, -jnp.inf).astype(jnp.float32)[None, None]

    def body(x, lp):
        x, kv = _layer(cfg, x, lp, cos, sin, mask, use_fused=use_fused,
                       use_fused_block=use_fused_block, mlp_mode=mlp_mode,
                       kv_quant=kv_quant)
        return x, kv

    x, kv = jax.lax.scan(body, inputs_embeds, params["layers"])
    if not kv_quant:
        # ks: (L, B, S, KV, hd) -> packed (L, B, S, KV*hd); (KV, hd) are
        # adjacent so this is a pure view, no transpose.
        ks, vs = kv
        L_, B_, S_ = ks.shape[:3]
        kv = (ks.reshape(L_, B_, S_, -1), vs.reshape(L_, B_, S_, -1))
    # Final norm is per-position: norm of the last row == last row of the
    # full norm, so only the row the decode loop consumes is computed.
    x_last = rms_norm(x[:, -1, :], params["norm_f"], cfg.rms_norm_eps)
    return x_last, kv


def prefill(
    params,
    cfg: LlamaConfig,
    inputs_embeds: jax.Array,
    cache: KVCache,
    chunk: Optional[int] = None,
    w8a8: bool = False,
) -> Tuple[jax.Array, KVCache]:
    """Run the prefix through the model, filling the cache.

    Returns (hidden of last position (B, D) post-final-norm, updated cache).

    ``chunk``: batch-chunked prefill. XLA flips the scan carry's activation
    layout to batch-minor above B=128 and inserts repair copies, dropping
    large-batch prefill to ~40% MFU (profiled — benchmarks/README.md);
    running the layer scan as B/chunk sequential chunks keeps every chunk
    on the standard layout. Measured at B=256 int8/int8, prefill+16 steps:
    off 433 ms, 128 -> 397, 64 -> 370, 32 -> 357 (1.21x; per-op profile
    shows all-standard layouts and zero repair copies at 32). Re-swept
    after the fused attn/MLP blocks + W8A8 landed (they shifted the
    per-chunk balance): 16 -> 317, 32 -> 316, 64 -> 308, 128 -> 313 ms —
    64 is the new optimum. None = auto
    (64 when B > 128 on TPU — B <= 128 never flips and stays monolithic);
    0 disables (sharded runs: a slice along the DP-sharded batch axis
    would force cross-device gathers — the wrapper passes 0 when a mesh is
    active, where per-device batches are small anyway).

    ``w8a8``: with int8-quantized weights, run the prefill MLP halves as
    W8A8 — in-kernel per-row int8 activation quantization driving native
    int8 MXU dots (ops/pallas_mlp_block.py). Measured B=256 chunk=32
    int8/int8 prefill: 229 -> 199 ms (benchmarks/exp_fused_block.py). A
    further lossy step beyond weight-only int8, hence opt-in; bench.py
    reports its token-agreement alongside the int8 modes.
    """
    B, S, D = inputs_embeds.shape
    S_max = (
        cache.kv if isinstance(cache, PackedKVCache) else cache.k
    ).shape[2]
    # NOTE: the stock Pallas flash-attention kernel was measured SLOWER here
    # (B=64, S=389->512 pad, hd=64, 9 heads: 209 ms vs 106 ms for the einsum
    # formulation on v5e-1 — its block sizes don't suit this tiny head_dim
    # and the GQA repeat adds traffic). The CUSTOM whole-sequence-in-VMEM
    # GQA kernel (ops/pallas_attention.py) IS faster (1.70 vs 3.01 ms/layer)
    # and serves the bf16 perf mode on TPU; fp32 parity mode and CPU keep
    # the einsum.
    import os

    on_tpu = jax.default_backend() in ("tpu", "axon")
    use_fused = (
        inputs_embeds.dtype == jnp.bfloat16
        and on_tpu
        and S <= 1024  # whole-sequence-in-VMEM design bound
        and not os.environ.get("MELLOW_TPU_DISABLE_FUSED_ATTN")
    )
    # Whole-attention-half Pallas block (pallas_attn_block.fused_attn_block):
    # measured 232.5 -> 228.8 ms at the B=256 chunk=32 int8/int8 headline
    # shape (stable A/B; benchmarks/exp_fused_block.py). Default-on where
    # the weight working set fits comfortably in VMEM; same trace-time env
    # caveat as the other kernel knobs.
    H, KV, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    attn_weight_bytes = 2 * D * (2 * H + 2 * KV) * hd + 2 * (
        (H * hd) ** 2 + (KV * hd) ** 2
    )  # wq/wk/wv/wo + rope permutation matrices, bf16
    use_fused_block = (
        use_fused
        and attn_weight_bytes < 8 * 1024 * 1024
        and not os.environ.get("MELLOW_TPU_DISABLE_FUSED_BLOCK")
    )
    # Fused MLP block (ops/pallas_mlp_block.py): norm + gate/up/down +
    # residual in one VMEM-resident program. Mode 1 (bf16) is default-on
    # under the same gates as the attention block (0.543 vs 0.567 ms/layer,
    # benchmarks/exp_mlp_block.py). Mode 2 (W8A8: in-kernel per-row int8
    # activation quant driving native int8 MXU dots, 0.439 ms/layer) is a
    # further lossy step beyond weight-only int8, so it is OPT-IN via
    # MELLOW_TPU_W8A8=1 and requires int8-quantized weights. Trace-time
    # env reads, same caveat as the other kernel knobs.
    mlp_weight_bytes = 2 * 3 * D * cfg.intermediate_size
    use_fused_mlp = (
        use_fused
        and mlp_weight_bytes < 12 * 1024 * 1024
        and not os.environ.get("MELLOW_TPU_DISABLE_FUSED_MLP")
    )
    quantized_w = isinstance(params["layers"]["w_gate"], dict)
    w8a8 = w8a8 or bool(os.environ.get("MELLOW_TPU_W8A8"))
    mlp_mode = 0
    if use_fused_mlp:
        mlp_mode = 2 if (quantized_w and w8a8) else 1
    # int8-cache prefill: quantize k/v INSIDE the fused attention kernel
    # (rows are VMEM-resident there) instead of a whole-stack XLA quantize
    # at commit — the commit becomes a pure dynamic_update_slice. The
    # XLA-side chain (quantize fusion + layout copy + pad) measured
    # ~13 ms of the 176 ms B=256 prefill (r4 profile).
    kv_quant = (
        use_fused_block
        and isinstance(cache, (KVCache, PackedKVCache))
        and cache.quantized
        and not os.environ.get("MELLOW_TPU_DISABLE_KV_QUANT_KERNEL")
    )
    if chunk is None:
        # The B>128 batch-minor layout flip the chunking worked around was
        # on the scan's stacked bf16 k/v ys; with kernel-quantized int8
        # ys it is GONE and the monolithic scan is fastest (r4 re-sweep:
        # chunk 0: 258 ms, 64: 265, 128: 269, 32: 272 — prefill+16 steps,
        # B=256 w8a8). bf16-stack paths keep chunk=64 (r3 sweep).
        chunk = 0 if kv_quant else (64 if (on_tpu and B > 128) else 0)

    def commit(cache: KVCache, ks, vs, b0: int) -> KVCache:
        # Pad to the cache's lane-aligned packed dim (KVCache.packed_dim)
        # and write the batch slab [b0:b0+bs] into the cache buffers.
        # NOTE: committing per chunk (8x b0=i*32 slab writes instead of
        # one concat + commit) was measured SLOWER at B=256 (252-258 vs
        # 228-232 ms prefill): the cache's batch-minor layout makes the
        # 32-row slab updates strided scatter writes that cost more than
        # the concat path's full-size quantize + layout copy + pad
        # (~15 ms, profiled in benchmarks/README.md). Single commit.
        pad = cache.k.shape[-1] - ks.shape[-1]
        if pad:
            ks = jnp.pad(ks, ((0, 0),) * 3 + ((0, pad),))
            vs = jnp.pad(vs, ((0, 0),) * 3 + ((0, pad),))
        at4, at3 = (0, b0, 0, 0), (0, b0, 0)
        if cache.quantized:
            ks8, ksc = quantize_kv(ks)
            vs8, vsc = quantize_kv(vs)
            return KVCache(
                jax.lax.dynamic_update_slice(cache.k, ks8, at4),
                jax.lax.dynamic_update_slice(cache.v, vs8, at4),
                jnp.asarray(S, jnp.int32),
                jax.lax.dynamic_update_slice(cache.k_scale, ksc, at3),
                jax.lax.dynamic_update_slice(cache.v_scale, vsc, at3),
            )
        return KVCache(
            jax.lax.dynamic_update_slice(cache.k, ks.astype(cache.k.dtype), at4),
            jax.lax.dynamic_update_slice(cache.v, vs.astype(cache.v.dtype), at4),
            jnp.asarray(S, jnp.int32),
        )

    if chunk and B > chunk and B % chunk == 0:
        parts = [
            _prefill_scan(
                params, cfg,
                jax.lax.slice_in_dim(inputs_embeds, i * chunk, (i + 1) * chunk, axis=0),
                use_fused, use_fused_block, mlp_mode, kv_quant,
            )
            for i in range(B // chunk)
        ]
        x = jnp.concatenate([p[0] for p in parts], axis=0)
        kv = tuple(
            jnp.concatenate([p[1][i] for p in parts], axis=1)
            for i in range(len(parts[0][1]))
        )
    else:
        x, kv = _prefill_scan(params, cfg, inputs_embeds, use_fused,
                              use_fused_block, mlp_mode, kv_quant)
    if kv_quant:
        # Kernel-quantized k/v: commit is pure dynamic_update_slices. The
        # k/v rows are 192-lane int8 written into the 256-lane cache rows
        # (lanes beyond KV*hd stay zero, as KVCache.create left them).
        ks8, vs8, ksc, vsc = kv
        if isinstance(cache, PackedKVCache):
            # Flat [K|V] rows for the fused/tiled decode kernel: one
            # minor-dim concat + per-half scale writes — keeps the
            # in-kernel-quantize commit as cheap as the KVCache path.
            rows = _pack_kv_rows(ks8, vs8, cfg.num_kv_heads, cfg.head_dim)
            SP = cache.scale.shape[-1] // 2
            scale = jax.lax.dynamic_update_slice(cache.scale, ksc, (0, 0, 0))
            scale = jax.lax.dynamic_update_slice(scale, vsc, (0, 0, SP))
            return x, PackedKVCache(
                kv=jax.lax.dynamic_update_slice(cache.kv, rows, (0, 0, 0, 0)),
                length=jnp.asarray(S, jnp.int32),
                scale=scale,
            )
        return x, KVCache(
            jax.lax.dynamic_update_slice(cache.k, ks8, (0, 0, 0, 0)),
            jax.lax.dynamic_update_slice(cache.v, vs8, (0, 0, 0, 0)),
            jnp.asarray(S, jnp.int32),
            jax.lax.dynamic_update_slice(cache.k_scale, ksc, (0, 0, 0)),
            jax.lax.dynamic_update_slice(cache.v_scale, vsc, (0, 0, 0)),
        )
    ks, vs = kv
    if isinstance(cache, PackedKVCache):
        # Packed layout for the fused decode kernel: interleave per-group
        # [K_g | V_g] rows (quantizing k/v separately) instead of padding
        # each to the 256-lane tile.
        return x, _write_packed(cfg, cache, ks, vs, jnp.asarray(0, jnp.int32))
    return x, commit(cache, ks, vs, 0)


def flush_pending(cfg: LlamaConfig, cache: KVCache, pending) -> KVCache:
    """Scatter ``pending`` — a tuple of n (k, v) single-position entries,
    each (L, B, 1, packed), covering positions cache.length ..
    cache.length+n-1 — into the cache in ONE dynamic_update_slice per
    buffer. The per-(l, b) row scatter is RMW-tile bound, so writing n rows
    costs ~the same as writing one (profiled 62 us either way at B=64):
    batching n steps' writes into one flush divides the flush cost by n.
    The stack is concatenated HERE, once per window — concatenating inside
    the decode loop was measured to eat the savings (re-materializes the
    growing stack every sub-step). Quantizes on the way in for int8."""
    if len(pending) == 1:
        pk, pv = pending[0]
    else:
        pk = jnp.concatenate([e[0] for e in pending], axis=2)
        pv = jnp.concatenate([e[1] for e in pending], axis=2)
    start = cache.length
    if cache.quantized:
        pk8, pksc = quantize_kv(pk)
        pv8, pvsc = quantize_kv(pv)
        return KVCache(
            jax.lax.dynamic_update_slice(cache.k, pk8, (0, 0, start, 0)),
            jax.lax.dynamic_update_slice(cache.v, pv8, (0, 0, start, 0)),
            start + pk.shape[2],
            jax.lax.dynamic_update_slice(cache.k_scale, pksc, (0, 0, start)),
            jax.lax.dynamic_update_slice(cache.v_scale, pvsc, (0, 0, start)),
        )
    return KVCache(
        jax.lax.dynamic_update_slice(cache.k, pk.astype(cache.k.dtype), (0, 0, start, 0)),
        jax.lax.dynamic_update_slice(cache.v, pv.astype(cache.v.dtype), (0, 0, start, 0)),
        start + pk.shape[2],
    )


class PackedKVCache(NamedTuple):
    """Packed-layout KV cache consumed by the fused Pallas decode kernel
    (ops/pallas_decode_attention.py — see its module docstring for the
    measured rationale; the short version: decode streams the whole cache
    every step, the split K/V layout's 256-lane rows carry 25% explicit
    tile pad, and the packed flat-[K|V] 384-lane rows carry
    none, read once by the kernel at the HBM roofline).

    kv:     (L, B, S8, P2) int8 or float; P2 = 2 * KV_heads * head_dim;
            lanes [0, KV*hd) hold the packed K row, [KV*hd, P2) the
            packed V row. (A per-group-interleaved [K_g|V_g] layout was
            tried first for TP lane-shardability, but its pack/unpack
            needs 6D reshapes whose batch-minor layouts cost ~50 ms of
            copies at the B=256 prefill commit; the flat [K|V] layout
            packs with plain minor-dim concats, and the fused-decode
            path is disabled under a mesh anyway — the custom call does
            not partition.)
    scale:  (L, B, 2*SP) f32 merged per-position scales (int8 mode only):
            k at lanes [0, S8), v at [SP, SP+S8), SP = S8 lane-padded to
            128 — merged so the kernel's manual DMA moves one buffer.
    S8 is max_len rounded up to 8 (manual HBM slices need sublane-aligned
    memrefs). ``length`` counts flushed positions, as in KVCache.
    """

    kv: jax.Array
    length: jax.Array  # int32 scalar
    scale: Optional[jax.Array] = None  # None = float cache

    @staticmethod
    def packed_dim(cfg: LlamaConfig) -> int:
        return cfg.num_kv_heads * 2 * cfg.head_dim

    @staticmethod
    def create(
        cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16
    ) -> "PackedKVCache":
        from mellow_tpu.ops.pallas_decode_attention import lane_pad

        dtype = jnp.dtype(dtype)
        S8 = -(-max_len // 8) * 8
        P2 = PackedKVCache.packed_dim(cfg)
        shape = (cfg.num_layers, batch, S8, P2)
        if dtype == jnp.int8:
            SP = lane_pad(S8)
            return PackedKVCache(
                kv=jnp.zeros(shape, jnp.int8),
                length=jnp.zeros((), jnp.int32),
                scale=jnp.zeros((cfg.num_layers, batch, 2 * SP), jnp.float32),
            )
        return PackedKVCache(
            kv=jnp.zeros(shape, dtype), length=jnp.zeros((), jnp.int32)
        )

    @property
    def quantized(self) -> bool:
        return self.scale is not None


def _pack_kv_rows(k, v, kv_heads: int, head_dim: int):
    """(…, KV*hd) k and v -> (…, 2*KV*hd) flat [K | V] rows (one plain
    minor-dim concat — see PackedKVCache for why not interleaved). Any
    leading shape and dtype (int8 stays int8)."""
    return jnp.concatenate([k, v], axis=-1)


def _write_packed(
    cfg: LlamaConfig, cache: PackedKVCache, ks, vs, start
) -> PackedKVCache:
    """Quantize (if int8) + pack + write (L, B, n, KV*hd) k/v rows into the
    packed cache at position ``start``; returns the cache with length =
    start + n."""
    KV, hd = cfg.num_kv_heads, cfg.head_dim
    n = ks.shape[2]
    if cache.quantized:
        ks8, ksc = quantize_kv(ks)
        vs8, vsc = quantize_kv(vs)
        rows = _pack_kv_rows(ks8, vs8, KV, hd)
        SP = cache.scale.shape[-1] // 2
        scale = jax.lax.dynamic_update_slice(cache.scale, ksc, (0, 0, start))
        scale = jax.lax.dynamic_update_slice(scale, vsc, (0, 0, SP + start))
        return PackedKVCache(
            kv=jax.lax.dynamic_update_slice(cache.kv, rows, (0, 0, start, 0)),
            length=start + n,
            scale=scale,
        )
    rows = _pack_kv_rows(ks, vs, KV, hd).astype(cache.kv.dtype)
    return PackedKVCache(
        kv=jax.lax.dynamic_update_slice(cache.kv, rows, (0, 0, start, 0)),
        length=start + n,
        scale=None,
    )


def flush_packed(
    cfg: LlamaConfig, cache: PackedKVCache, extras: jax.Array, n: int
) -> PackedKVCache:
    """Flush the window's extras buffer — (L, B, EP, P2) bf16 packed rows,
    rows [0, n) valid, covering positions cache.length .. +n-1 — into the
    packed cache (KVCache path: ``flush_pending``). Quantizes on the way
    in for int8; the un-flushed window rides unquantized, same fidelity
    note as ``generate``'s docstring."""
    L, B, EP, P2 = extras.shape
    KL = cfg.num_kv_heads * cfg.head_dim
    ks = extras[:, :, :n, :KL]
    vs = extras[:, :, :n, KL:]
    return _write_packed(cfg, cache, ks, vs, cache.length)


def decode_step_packed(
    params,
    cfg: LlamaConfig,
    token_embed: jax.Array,  # (B, D) embedding of the token just sampled
    cache: PackedKVCache,
    cos_full: jax.Array,  # (S8, hd) precomputed rope tables
    sin_full: jax.Array,
    extras: jax.Array,  # (L, B, EP, P2) bf16: the window's packed k/v rows
    n_extra: int,  # static: valid extras rows; this step writes row n_extra
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One incremental decode step over the packed cache via the fused
    Pallas kernel (ops/pallas_decode_attention.flash_gqa_decode).

    Differences vs ``decode_step``: the flush window's un-flushed
    positions ride in ONE fixed (L, B, EP, P2) ``extras`` buffer instead
    of a growing tuple of per-entry arrays — the einsum path's per-entry
    slices/einsums made late window sub-steps ~20% slower than early ones
    (profiled: 4.16 -> 5.08 ms across a W=8 window at B=256); here every
    sub-step runs the same single kernel, extras included (the
    flash-composition alternative — stats out, XLA-side merge — was
    measured slower, kernel module docstring). NEVER writes the cache;
    returns (last hidden (B, D), extras with row ``n_extra`` filled).
    The caller flushes whole windows via ``flush_packed``.
    """
    B, D = token_embed.shape
    L = cfg.num_layers
    KV, H, hd = cfg.num_kv_heads, cfg.num_heads, cfg.head_dim
    rep = H // KV
    P2 = PackedKVCache.packed_dim(cfg)
    from mellow_tpu.ops.pallas_decode_attention import (
        HEAD_PAD, flash_gqa_decode,
    )

    flushed = cache.length
    pos = flushed + n_extra
    x = token_embed[:, None, :]
    cos = jax.lax.dynamic_slice_in_dim(cos_full, pos, 1, axis=0)
    sin = jax.lax.dynamic_slice_in_dim(sin_full, pos, 1, axis=0)
    eye = jnp.eye(KV, dtype=token_embed.dtype)
    from mellow_tpu.ops.pallas_decode_attention import (
        build_q_tiled, extract_o_tiled, flash_gqa_decode_tiled,
        tiled_supported,
    )

    # Group-tiled kernel (int8 caches at the v0 GQA geometry): cuts the
    # attention dots from 2x16x384 to 5x8x128 hw MACs per cache position
    # by splitting them along the flat [K|V] row's 128-lane tiles —
    # measured 5.66 -> 5.01 ms/step at B=256, 9.98 -> 8.77 at B=512
    # (benchmarks/exp_decode_attn3.py; the r4 verdict's MAC-count item).
    use_tiled = cache.quantized and tiled_supported(H, KV, hd)

    def body(carry, scanned):
        (x,) = carry
        lp, ex_layer, l_idx = scanned
        h = rms_norm(x, lp["ln_attn"], cfg.rms_norm_eps)
        q = _mm(h, lp["wq"]).reshape(B, 1, H, hd)
        k = _mm(h, lp["wk"]).reshape(B, 1, KV, hd)
        v = _mm(h, lp["wv"]).reshape(B, 1, KV, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        qg = q.reshape(B, KV, rep, hd)
        kv_row = _pack_kv_rows(
            k.reshape(B, 1, KV * hd), v.reshape(B, 1, KV * hd), KV, hd
        )  # (B, 1, P2)
        ex = jax.lax.dynamic_update_slice(ex_layer, kv_row, (0, n_extra, 0))

        if use_tiled:
            out = flash_gqa_decode_tiled(
                build_q_tiled(qg), cache.kv, cache.scale, ex, l_idx,
                flushed, jnp.asarray(n_extra + 1, jnp.int32), head_dim=hd,
                interpret=interpret,
            )
            o = extract_o_tiled(out, x.dtype)
        else:
            # Block-diagonal dense-q construction as in the einsum path
            # (decode_step), zero-padded over the V half and the pad rows
            # so the kernel's full-width contraction yields K-only scores.
            q_dense = jnp.einsum(
                "bgrd,gk->bgrkd", qg, eye
            ).reshape(B, H, KV * hd)
            q_dense = jnp.pad(
                q_dense, ((0, 0), (0, HEAD_PAD - H), (0, KV * hd))
            )  # (B, HP, P2)
            o_pk = flash_gqa_decode(
                q_dense, cache.kv, cache.scale, ex, l_idx, flushed,
                jnp.asarray(n_extra + 1, jnp.int32), head_dim=hd,
                interpret=interpret,
            )[:, :H, KV * hd:]  # (B, H, KV*hd): the V half is the output
            o = jnp.einsum(
                "bgrkd,gk->bgrd", o_pk.reshape(B, KV, rep, KV, hd), eye,
            ).reshape(B, 1, H * hd)
        x = x + _mm(o, lp["wo"])

        h = rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps)
        gate = jax.nn.silu(_mm(h, lp["w_gate"]))
        up = _mm(h, lp["w_up"])
        x = x + _mm(gate * up, lp["w_down"])
        return (x,), kv_row.astype(extras.dtype)

    (x,), new_rows = jax.lax.scan(
        body,
        (x,),
        (params["layers"], extras, jnp.arange(L, dtype=jnp.int32)),
    )
    # new_rows: (L, B, 1, P2) — this token's packed k/v, written into the
    # window buffer at its sub-step slot.
    extras = jax.lax.dynamic_update_slice(
        extras, new_rows, (0, 0, n_extra, 0)
    )
    x = rms_norm(x, params["norm_f"], cfg.rms_norm_eps)
    return x[:, 0, :], extras


def decode_step(
    params,
    cfg: LlamaConfig,
    token_embed: jax.Array,  # (B, D) embedding of the token just sampled
    cache: KVCache,
    cos_full: jax.Array,  # (S_max, hd) precomputed rope tables
    sin_full: jax.Array,
    pending: tuple = (),
    start: Optional[jax.Array] = None,  # (B,) int32: per-row first cache
    # column (continuous batching — models/continuous.py). None = 0.
) -> Tuple[jax.Array, KVCache, tuple]:
    """One incremental decode step. NEVER writes the cache.

    ``start`` (ragged rows, continuous batching): row r's sequence begins
    at cache column start[r] and its kv there were stored with LOCAL RoPE
    positions (0, 1, ...) — a joiner admitted mid-flight was prefilled
    with standard positions [0, P) and its rows inserted at columns
    [t-P, t). This step then (a) ropes the new q/k at the row's LOCAL
    position ``pos - start[r]`` and (b) masks cache columns < start[r].
    Rows are independent under causal attention, so each row's math is
    bitwise identical to a solo run at its own positions; the cache WRITE
    position stays the shared global column (one dynamic_update_slice, no
    scatter) — only the rope gather and the mask are per-row.

    Cache-aliasing / flush-batching design: XLA copies a loop-carried buffer
    that is read and THEN scatter-written in the same iteration, and even an
    aliased in-place scatter costs ~62 us/buffer at B=64 (RMW on partial
    tiles). So writes are batched: ``cache.length`` counts only FLUSHED
    positions; ``pending`` is a tuple of n single-position (k, v) entries —
    each (L, B, 1, packed) bf16, the trailing un-flushed positions — which
    attention handles as explicit extra positions alongside the current
    token (multi-part flash-style softmax; one tiny einsum per entry, no
    stack re-materialization). The caller accumulates pending over a small
    window of steps and calls ``flush_pending`` once per window —
    write-before-read at the window top, which XLA aliases in place.

    Returns (last hidden (B, D), cache UNCHANGED, pending + 1 new entry).
    The final window's pending never needs flushing (nothing reads past the
    loop).
    """
    pending = tuple(pending) if pending else ()
    B, D = token_embed.shape
    L = cfg.num_layers
    KV, H, hd = cfg.num_kv_heads, cfg.num_heads, cfg.head_dim
    rep = H // KV
    S_max = cache.k.shape[2]
    flushed = cache.length  # scalar int32: flushed positions only
    n_pend = len(pending)
    pos = flushed + n_pend  # this token's position
    x = token_embed[:, None, :]  # (B, 1, D)

    kpos = jnp.arange(S_max)
    if start is None:
        cos = jax.lax.dynamic_slice_in_dim(cos_full, pos, 1, axis=0)  # (1, hd)
        sin = jax.lax.dynamic_slice_in_dim(sin_full, pos, 1, axis=0)
        mask = jnp.where(
            kpos[None, :] < flushed, 0.0, -jnp.inf
        ).astype(jnp.float32)  # (1, S_max)
    else:
        # Ragged rows: per-row LOCAL rope position + per-row start mask.
        local = pos - start  # (B,)
        cos = cos_full[local][:, None, :]  # (B, 1, hd)
        sin = sin_full[local][:, None, :]
        mask = jnp.where(
            (kpos[None, :] >= start[:, None]) & (kpos[None, :] < flushed),
            0.0, -jnp.inf,
        ).astype(jnp.float32)[:, None, :]  # (B, 1, S_max)
    # Block-diagonal expansion: query head h = (g, r) only contracts with KV
    # head g's 64-dim block of the packed 192-dim cache rows. eye-einsum
    # fuses to a masked broadcast — no scatter.
    eye = jnp.eye(KV, dtype=token_embed.dtype)

    def body(carry, scanned):
        x, = carry
        if cache.quantized:
            lp, k_cache, v_cache, k_sc, v_sc = scanned[:5]
            pend = scanned[5:]
        else:
            lp, k_cache, v_cache = scanned[:3]
            pend = scanned[3:]
            k_sc = v_sc = None
        # pend: flattened (k0, v0, k1, v1, ...) per-layer slices (B, 1, packed)
        pend_entries = [(pend[2 * i], pend[2 * i + 1]) for i in range(n_pend)]

        h = rms_norm(x, lp["ln_attn"], cfg.rms_norm_eps)
        q = _mm(h, lp["wq"]).reshape(B, 1, H, hd)
        k = _mm(h, lp["wk"]).reshape(B, 1, KV, hd)
        v = _mm(h, lp["wv"]).reshape(B, 1, KV, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        packed = cache.k.shape[-1]  # lane-aligned (>= KV*hd, zeros beyond)
        pad = packed - KV * hd
        k_cur = jnp.pad(k.reshape(B, 1, KV * hd), ((0, 0), (0, 0), (0, pad)))
        v_cur = jnp.pad(v.reshape(B, 1, KV * hd), ((0, 0), (0, 0), (0, pad)))

        qg = q.reshape(B, KV, rep, hd)
        q_dense = jnp.einsum("bgrd,gk->bgrkd", qg, eye).reshape(B, H, KV * hd)
        q_dense = jnp.pad(q_dense, ((0, 0), (0, 0), (0, pad)))

        scale = 1.0 / np.sqrt(hd)
        s_cache = (
            jnp.einsum("bqd,bsd->bqs", q_dense, k_cache.astype(q.dtype)) * scale
        )
        if k_sc is not None:
            # int8 cache: fold the per-position scale in AFTER the matmul,
            # so the int8 values are what streams from HBM.
            s_cache = s_cache * k_sc[:, None, :].astype(s_cache.dtype)
        s_cache = (s_cache + mask).astype(jnp.float32)  # (B, H, S_max)
        s_cur = (
            jnp.einsum("bqd,bsd->bqs", q_dense, k_cur) * scale
        ).astype(jnp.float32)  # (B, H, 1)
        # Joint softmax over [cache | pending entries | current] without
        # materializing any concatenation (multi-part flash-style
        # normalization). Each pending entry adds one (B, H, 1) score.
        s_pends = [
            (
                jnp.einsum("bqd,bsd->bqs", q_dense, pk.astype(q.dtype)) * scale
            ).astype(jnp.float32)
            for pk, _ in pend_entries
        ]
        m = jnp.maximum(jnp.max(s_cache, axis=-1, keepdims=True), s_cur)
        for s_p in s_pends:
            m = jnp.maximum(m, s_p)
        e_cache = jnp.exp(s_cache - m).astype(x.dtype)
        e_cur = jnp.exp(s_cur - m).astype(x.dtype)
        denom = jnp.sum(e_cache, axis=-1, keepdims=True) + e_cur
        e_v = e_cache if v_sc is None else e_cache * v_sc[:, None, :].astype(e_cache.dtype)
        o_dense = jnp.einsum("bqs,bsd->bqd", e_v, v_cache.astype(x.dtype))
        o_dense = o_dense + e_cur * v_cur  # (B, H, packed)
        for s_p, (_, pv) in zip(s_pends, pend_entries):
            e_p = jnp.exp(s_p - m).astype(x.dtype)  # (B, H, 1)
            denom = denom + e_p
            o_dense = o_dense + e_p * pv.astype(x.dtype)  # bcast (B, 1, packed)
        # Extract each query head's own KV block (the rest are cross-head
        # sums that the block-diagonal q kept meaningful only on-block for
        # scores; for values we must select block g explicitly). Dead pad
        # lanes are dropped here.
        o = jnp.einsum(
            "bgrkd,gk->bgrd",
            o_dense[..., : KV * hd].reshape(B, KV, rep, KV, hd),
            eye,
        )
        o = (o / denom.reshape(B, KV, rep, 1)).reshape(B, 1, H * hd)
        x = x + _mm(o, lp["wo"])

        h = rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps)
        gate = jax.nn.silu(_mm(h, lp["w_gate"]))
        up = _mm(h, lp["w_up"])
        x = x + _mm(gate * up, lp["w_down"])
        # pending stays in the compute dtype; quantization (if any) happens
        # at the next step's flush.
        return (x,), (
            k_cur.astype(token_embed.dtype),
            v_cur.astype(token_embed.dtype),
        )

    xs = [params["layers"], cache.k, cache.v]
    if cache.quantized:
        xs += [cache.k_scale, cache.v_scale]
    for pk, pv in pending:
        xs += [pk, pv]
    (x,), (ks, vs) = jax.lax.scan(body, (x,), tuple(xs))
    # ks, vs: (L, B, 1, packed) — appended to pending as one more entry; the
    # caller flushes a whole window at once (flush_pending) so the cache
    # write always precedes every read of its window (see docstring).
    x = rms_norm(x, params["norm_f"], cfg.rms_norm_eps)
    return x[:, 0, :], cache, pending + ((ks, vs),)


def init_params(rng: jax.Array, cfg: LlamaConfig, dtype=jnp.float32):
    """Random init (testing / training-from-scratch). Normal(0, 0.02)
    truncation-free — real weights come from the checkpoint converter."""
    keys = jax.random.split(rng, 9)
    L, D, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    H, KV, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def nrm(key, shape):
        return (jax.random.normal(key, shape) * 0.02).astype(dtype)

    params = {
        "embed": nrm(keys[0], (cfg.vocab_size, D)),
        "layers": {
            "ln_attn": jnp.ones((L, D), dtype),
            "ln_mlp": jnp.ones((L, D), dtype),
            "wq": nrm(keys[1], (L, D, H * hd)),
            "wk": nrm(keys[2], (L, D, KV * hd)),
            "wv": nrm(keys[3], (L, D, KV * hd)),
            "wo": nrm(keys[4], (L, H * hd, D)),
            "w_gate": nrm(keys[5], (L, D, I)),
            "w_up": nrm(keys[6], (L, D, I)),
            "w_down": nrm(keys[7], (L, I, D)),
        },
        "norm_f": jnp.ones((D,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = nrm(keys[8], (D, cfg.vocab_size))
    return params
