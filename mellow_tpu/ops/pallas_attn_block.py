"""Fused Pallas attention BLOCK for the prefill path: pre-RMSNorm + qkv
projections + RoPE + causal GQA attention + output projection + residual,
one program per batch row, everything VMEM-resident.

Why: after the r3 chunked-prefill fix removed XLA's batch-minor layout
flip, the per-layer profile (benchmarks/README.md) showed the remaining
MFU gap is the norm/rope/residual elementwise chain around the plain
attention kernel (0.269 ms/layer fusion at ~4x the bandwidth bound — VPU
cross-lane reductions) plus the HBM round-trips of h/q/k/v between the
kernel boundary and XLA fusions. Folding the whole attention half of the
layer into one kernel removes those round-trips: only x in, (out, k, v)
out.

RoPE without lane shuffles: Mosaic cannot concatenate vectors with
differing lane offsets (CLAUDE.md), so ``rotate_half`` is expressed as a
matmul against a constant block-diagonal permutation-with-sign matrix P
(one 64x64 block per head):

    rotate_half(x) == x @ P,   rope(x) = x * cos + (x @ P) * sin

with cos/sin pre-tiled to the packed width. P's matmul is exact (values
are only moved/negated) and its FLOPs are negligible next to the score
matmuls; on the MXU it replaces the slice/negate/concat VPU chain that
the unfused path pays.

Semantics mirrored 1:1 from llama._layer's attention half
(models/llama.py): rms_norm in fp32 with the same eps placement, bf16
matmuls with fp32 accumulation, HF rope convention (emb = concat(freqs,
freqs), llama.rope_tables), causal mask, fp32 softmax on-chip. Reference
behavior: HF Llama SDPA driven by /root/reference/mellow/wrapper.py:217.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def rotate_half_matrix(num_heads: int, head_dim: int) -> np.ndarray:
    """(H*hd, H*hd) block-diagonal P with x @ P == rotate_half per head
    (HF half-split convention: out = concat(-x2, x1) within each head)."""
    hd = head_dim
    half = hd // 2
    blk = np.zeros((hd, hd), np.float32)
    for i in range(half):
        blk[i + half, i] = -1.0  # out[:half] = -x2
        blk[i, i + half] = 1.0  # out[half:] = x1
    P = np.zeros((num_heads * hd, num_heads * hd), np.float32)
    for h in range(num_heads):
        P[h * hd : (h + 1) * hd, h * hd : (h + 1) * hd] = blk
    return P


def _kernel(
    x_ref, ln_ref, wq_ref, wk_ref, wv_ref, wo_ref,
    cosq_ref, sinq_ref, cosk_ref, sink_ref, pq_ref, pk_ref,
    out_ref, k_ref, v_ref,
    q_s, k_s, v_s, o_s,
    *, H, KV, hd, eps, scale, SP, S_real,
):
    f32 = jnp.float32
    x = x_ref[0]  # (SP, D)

    # --- rms_norm (fp32, llama.rms_norm formula) ---
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

    # --- projections + rope (rotate_half as a permutation matmul) ---
    q = mm(h, wq_ref)  # (SP, H*hd)
    k = mm(h, wk_ref)  # (SP, KV*hd)
    v = mm(h, wv_ref)
    q_s[...] = q * cosq_ref[...] + mm(q, pq_ref) * sinq_ref[...]
    k_s[...] = k * cosk_ref[...] + mm(k, pk_ref) * sink_ref[...]
    if SP > S_real:
        # zero V's OOB rows: their softmax weights are exact zeros, but
        # 0 * garbage-NaN would still poison the value dot.
        vrows = jax.lax.broadcasted_iota(jnp.int32, (SP, KV * hd), 0)
        v = jnp.where(vrows < S_real, v, jnp.zeros_like(v))
    v_s[...] = v

    # --- causal GQA attention (same structure as pallas_attention._kernel,
    # reading the scratch refs so head slices are ref slices) ---
    rep = H // KV
    rows = jax.lax.broadcasted_iota(jnp.int32, (SP, SP), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (SP, SP), 1)
    causal = rows >= cols
    for g in range(KV):
        k_g = k_s[:, g * hd : (g + 1) * hd]  # (SP, hd)
        v_g = v_s[:, g * hd : (g + 1) * hd]
        for r in range(rep):
            hh = g * rep + r
            q_h = q_s[:, hh * hd : (hh + 1) * hd]
            s = jax.lax.dot_general(
                q_h, k_g, (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            ) * scale
            s = jnp.where(causal, s, _NEG)
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=1, keepdims=True)
            o = jax.lax.dot_general(
                e.astype(x.dtype), v_g, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            o_s[:, hh * hd : (hh + 1) * hd] = (o / denom).astype(x.dtype)

    # --- output projection + residual ---
    out_ref[0] = x + mm(o_s[...], wo_ref)
    k_ref[0] = k_s[...]
    v_ref[0] = v_s[...]


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "num_kv_heads", "head_dim", "eps", "interpret",
    ),
)
def fused_attn_block(
    x: jax.Array,  # (B, S, D) — raw layer input (pre-norm)
    ln_w: jax.Array,  # (D,)
    wq: jax.Array,  # (D, H*hd)
    wk: jax.Array,  # (D, KV*hd)
    wv: jax.Array,  # (D, KV*hd)
    wo: jax.Array,  # (H*hd, D)
    cos: jax.Array,  # (S, hd) rope tables (llama.rope_tables)
    sin: jax.Array,  # (S, hd)
    *,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    eps: float,
    interpret: bool = False,
):
    """Returns (out, k, v): out = x + attn(rms_norm(x)) @ wo  (B, S, D);
    k (post-rope) and v (B, S, KV*hd) for the cache."""
    B, S, D = x.shape
    H, KV, hd = num_heads, num_kv_heads, head_dim
    SP = -(-S // 8) * 8  # sublane alignment is enough (see sp_align)
    scale = 1.0 / np.sqrt(hd)
    dt = x.dtype

    # Tables padded to SP rows on the host side of the trace (cheap, once
    # per compile); tiled to the packed widths.
    pad = SP - S
    cosp = jnp.pad(cos.astype(dt), ((0, pad), (0, 0)), constant_values=1.0)
    sinp = jnp.pad(sin.astype(dt), ((0, pad), (0, 0)))
    cosq, sinq = jnp.tile(cosp, (1, H)), jnp.tile(sinp, (1, H))
    cosk, sink = jnp.tile(cosp, (1, KV)), jnp.tile(sinp, (1, KV))
    pq = jnp.asarray(rotate_half_matrix(H, hd), dt)
    pk = jnp.asarray(rotate_half_matrix(KV, hd), dt)

    row = lambda b: (b, 0, 0)  # noqa: E731
    whole = lambda b: (0, 0)  # noqa: E731
    vec = lambda b: (0,)  # noqa: E731
    V = pltpu.VMEM
    out, kk, vv = pl.pallas_call(
        functools.partial(
            _kernel, H=H, KV=KV, hd=hd, eps=np.float32(eps),
            scale=np.float32(scale), SP=SP, S_real=S,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, SP, D), row, memory_space=V),
            pl.BlockSpec((D,), vec, memory_space=V),
            pl.BlockSpec((D, H * hd), whole, memory_space=V),
            pl.BlockSpec((D, KV * hd), whole, memory_space=V),
            pl.BlockSpec((D, KV * hd), whole, memory_space=V),
            pl.BlockSpec((H * hd, D), whole, memory_space=V),
            pl.BlockSpec((SP, H * hd), whole, memory_space=V),
            pl.BlockSpec((SP, H * hd), whole, memory_space=V),
            pl.BlockSpec((SP, KV * hd), whole, memory_space=V),
            pl.BlockSpec((SP, KV * hd), whole, memory_space=V),
            pl.BlockSpec((H * hd, H * hd), whole, memory_space=V),
            pl.BlockSpec((KV * hd, KV * hd), whole, memory_space=V),
        ],
        out_specs=[
            pl.BlockSpec((1, SP, D), row, memory_space=V),
            pl.BlockSpec((1, SP, KV * hd), row, memory_space=V),
            pl.BlockSpec((1, SP, KV * hd), row, memory_space=V),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, D), dt),
            jax.ShapeDtypeStruct((B, S, KV * hd), dt),
            jax.ShapeDtypeStruct((B, S, KV * hd), dt),
        ],
        scratch_shapes=[
            V((SP, H * hd), dt),
            V((SP, KV * hd), dt),
            V((SP, KV * hd), dt),
            V((SP, H * hd), dt),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * D * (H + 2 * KV) * hd  # qkv
            + 2 * 2 * B * H * SP * SP * hd  # scores + pv
            + 2 * B * S * H * hd * D,  # o proj
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=B * H * SP * SP,
        ),
    )(x, ln_w, wq, wk, wv, wo, cosq, sinq, cosk, sink, pq, pk)
    return out, kk, vv


def reference_attn_block(
    x, ln_w, wq, wk, wv, wo, cos, sin, *, num_heads, num_kv_heads, head_dim,
    eps,
):
    """jnp oracle with identical contract (norm/rope/attention formulas
    restated from models/llama.py for the kernel tests)."""
    from mellow_tpu.models.llama import apply_rope, rms_norm
    from mellow_tpu.ops.pallas_attention import reference_gqa_prefill

    B, S, D = x.shape
    H, KV, hd = num_heads, num_kv_heads, head_dim
    h = rms_norm(x, ln_w, eps)
    q = apply_rope((h @ wq).reshape(B, S, H, hd), cos, sin)
    k = apply_rope((h @ wk).reshape(B, S, KV, hd), cos, sin)
    v = h @ wv
    o = reference_gqa_prefill(
        q.reshape(B, S, H * hd), k.reshape(B, S, KV * hd), v,
        num_heads=H, num_kv_heads=KV, head_dim=hd,
    )
    return x + o @ wo, k.reshape(B, S, KV * hd), v
