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
matmul against a constant 64x64 permutation-with-sign block P, applied
PER HEAD on 64-lane ref slices:

    rotate_half(x_h) == x_h @ P,   rope(x_h) = x_h * cos + (x_h @ P) * sin

P's dot is exact (values are only moved/negated). r3 shipped this as one
packed-width block-diagonal (H*hd, H*hd) matmul; the r4 per-op profile
showed that single dot costs as much as the whole wq projection (260
MFLOP/row — 22% of the block's FLOPs), while H per-head (SP, 64) @
(64, 64) dots do the same work in 29 MFLOP/row and need no pre-tiled
cos/sin operands. Head slices of the q/k scratch refs are the same
64-lane partial-tile accesses the attention loop already uses.

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
    """(hd, hd) P with x_h @ P == rotate_half for one head (HF half-split
    convention: out = concat(-x2, x1)). ``num_heads`` > 1 returns the
    block-diagonal packed-width version (kept for the parity tests /
    external callers; the kernel applies the single block per head)."""
    hd = head_dim
    half = hd // 2
    blk = np.zeros((hd, hd), np.float32)
    for i in range(half):
        blk[i + half, i] = -1.0  # out[:half] = -x2
        blk[i, i + half] = 1.0  # out[half:] = x1
    if num_heads == 1:
        return blk
    P = np.zeros((num_heads * hd, num_heads * hd), np.float32)
    for h in range(num_heads):
        P[h * hd : (h + 1) * hd, h * hd : (h + 1) * hd] = blk
    return P


def _rope_heads(ref, n_heads, hd, cos, sin, blk_ref, mm):
    """Apply rope in place to ``ref`` (SP, n_heads*hd): per-head 64-lane
    slices, rotate_half as one (SP, hd) @ (hd, hd) dot each."""
    for h in range(n_heads):
        sl = slice(h * hd, (h + 1) * hd)
        xh = ref[:, sl]
        ref[:, sl] = xh * cos + mm(xh, blk_ref) * sin


def _attn_row_block(
    q_s, k_s, v_s, o_s, *, H, KV, hd, scale, dt, r0, r1, n_cols
):
    """Causal GQA attention for query rows [r0, r1) against key/value rows
    [0, n_cols), writing o_s rows [r0, r1). Exact per row: a causal row r
    only attends cols <= r, so any n_cols > r1 - 1 is complete; masked
    score lanes are exp(-1e30 - m) == 0.0 exactly, so the shorter top
    block is BITWISE identical to the full-width dot.

    Why blocks: one whole-SP score dot does SP^2 work where the causal
    triangle needs half. Fine-grained triangle skipping was measured
    SLOWER in r3 (36 skinny dots, ops/pallas_attention.py note); TWO
    row blocks keep M >= 200 beefy and still cut score+pv FLOPs 25%
    (top half: SP/2 x SP/2 instead of SP/2 x SP). Measured on the w8a8
    block at B=256/S=389 (profile_prefill.py, r4): 3.03 -> 2.91 ms/layer
    (whole-prefill while loop 157.4 -> 153.8 ms)."""
    f32 = jnp.float32
    rep = H // KV
    M = r1 - r0
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, n_cols), 0) + r0
    cols = jax.lax.broadcasted_iota(jnp.int32, (M, n_cols), 1)
    causal = rows >= cols
    for g in range(KV):
        k_g = k_s[:n_cols, g * hd : (g + 1) * hd]  # (n_cols, hd)
        v_g = v_s[:n_cols, g * hd : (g + 1) * hd]
        for r in range(rep):
            hh = g * rep + r
            q_h = q_s[r0:r1, hh * hd : (hh + 1) * hd]
            s = jax.lax.dot_general(
                q_h, k_g, (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            ) * scale
            s = jnp.where(causal, s, _NEG)
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=1, keepdims=True)
            o = jax.lax.dot_general(
                e.astype(dt), v_g, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            o_s[r0:r1, hh * hd : (hh + 1) * hd] = (o / denom).astype(dt)


def _attention(q_s, k_s, v_s, o_s, *, H, KV, hd, scale, SP, dt):
    """Row-blocked causal attention over the scratch refs (see
    _attn_row_block). Block boundaries must be sublane-aligned (8).
    TWO blocks is the measured optimum at the B=256/S=389 w8a8 prefill
    shape (profile_prefill.py, r4): mono 3.03 / 2 blocks 2.91 / 4 blocks
    3.44 ms/layer — the FLOP model says 0.75x / 0.625x, but at 4 blocks
    the M=104 dots' fixed overhead swamps the saved work (the same
    skinny-dot wall as r3's fine-grained triangle skip). Keep 2."""
    n_blk = 2 if SP >= 128 else 1
    bounds = [((SP * i // n_blk + 7) // 8) * 8 for i in range(n_blk)] + [SP]
    for r0, r1 in zip(bounds[:-1], bounds[1:]):
        if r1 <= r0:
            continue
        _attn_row_block(
            q_s, k_s, v_s, o_s, H=H, KV=KV, hd=hd, scale=scale, dt=dt,
            r0=r0, r1=r1, n_cols=r1,
        )


def _emit_quantized_kv(k_s, v_s, k_ref, v_ref, ksc_ref, vsc_ref, SP, S_real):
    """int8-cache epilogue: quantize the roped k and v rows in VMEM
    (llama.quantize_kv formula — symmetric per-position int8 over the
    packed KV*hd lanes) and emit the per-row scales in LANE layout.

    Why in-kernel: the XLA-side commit quantize read the full bf16 k/v
    stacks back from HBM and spent ~13 ms at B=256 in quantize + layout
    + pad fusions (r4 profile); here the rows are already VMEM-resident
    and the kernel writes int8 (half the bytes) directly.

    The scale comes out of the row reduction as an (SP, 1) sublane vector
    but the cache contract stores scales per-position in the LANE dim
    (llama.KVCache k_scale (L, B, S)); Mosaic has no vector transpose, so
    the (SP, 1) -> (1, SP) move is an eye-mask + cross-sublane sum:
    where(eye, scale_col, 0) summed over rows. Garbage pad rows (SP >
    S_real) are masked out of the eye so a NaN there cannot poison real
    lanes; their int8 rows are dropped by the partial-block write."""
    f32 = jnp.float32

    def q(x):
        am = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        sc = jnp.maximum(am, 1e-8) * (1.0 / 127.0)
        return jnp.clip(jnp.round(x / sc), -127, 127).astype(jnp.int8), sc

    k8, ksc = q(k_s[...].astype(f32))
    v8, vsc = q(v_s[...].astype(f32))
    k_ref[0] = k8
    v_ref[0] = v8
    rows = jax.lax.broadcasted_iota(jnp.int32, (SP, SP), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (SP, SP), 1)
    eye = rows == cols
    if SP > S_real:
        eye = jnp.logical_and(eye, rows < S_real)
    ksc_ref[0] = jnp.sum(jnp.where(eye, ksc, 0.0), axis=0, keepdims=True)
    vsc_ref[0] = jnp.sum(jnp.where(eye, vsc, 0.0), axis=0, keepdims=True)


def _kernel(
    x_ref, ln_ref, wq_ref, wk_ref, wv_ref, wo_ref,
    cos_ref, sin_ref, p_ref,
    *rest,
    H, KV, hd, eps, scale, SP, S_real, kv_quant,
):
    if kv_quant:
        (out_ref, k_ref, v_ref, ksc_ref, vsc_ref,
         q_s, k_s, v_s, o_s) = rest
    else:
        out_ref, k_ref, v_ref, q_s, k_s, v_s, o_s = rest
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

    # --- projections + rope (rotate_half as per-head (hd, hd) dots) ---
    q_s[...] = mm(h, wq_ref)  # (SP, H*hd)
    k_s[...] = mm(h, wk_ref)  # (SP, KV*hd)
    v = mm(h, wv_ref)
    cos, sin = cos_ref[...], sin_ref[...]  # (SP, hd)
    _rope_heads(q_s, H, hd, cos, sin, p_ref, mm)
    _rope_heads(k_s, KV, hd, cos, sin, p_ref, mm)
    if SP > S_real:
        # zero V's OOB rows: their softmax weights are exact zeros, but
        # 0 * garbage-NaN would still poison the value dot.
        vrows = jax.lax.broadcasted_iota(jnp.int32, (SP, KV * hd), 0)
        v = jnp.where(vrows < S_real, v, jnp.zeros_like(v))
    v_s[...] = v

    # --- causal GQA attention (same structure as pallas_attention._kernel,
    # reading the scratch refs so head slices are ref slices; two causal
    # row blocks, see _attn_row_block) ---
    _attention(q_s, k_s, v_s, o_s, H=H, KV=KV, hd=hd, scale=scale, SP=SP,
               dt=x.dtype)

    # --- output projection + residual ---
    out_ref[0] = x + mm(o_s[...], wo_ref)
    if kv_quant:
        _emit_quantized_kv(k_s, v_s, k_ref, v_ref, ksc_ref, vsc_ref, SP, S_real)
    else:
        k_ref[0] = k_s[...]
        v_ref[0] = v_s[...]


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "num_kv_heads", "head_dim", "eps", "interpret",
        "kv_quant",
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
    kv_quant: bool = False,
):
    """Returns (out, k, v): out = x + attn(rms_norm(x)) @ wo  (B, S, D);
    k (post-rope) and v (B, S, KV*hd) for the cache.

    ``kv_quant`` (int8-cache prefill): returns (out, k8, v8, kscale,
    vscale) — k/v quantized in-kernel (llama.quantize_kv formula), scales
    (B, 1, SP) fp32 with the position in the LANE dim (see
    _emit_quantized_kv)."""
    B, S, D = x.shape
    H, KV, hd = num_heads, num_kv_heads, head_dim
    SP = -(-S // 8) * 8  # sublane alignment is enough (see sp_align)
    scale = 1.0 / np.sqrt(hd)
    dt = x.dtype

    # Tables padded to SP rows on the host side of the trace (cheap, once
    # per compile); cos pad rows are 1 / sin 0 so pad rows pass through.
    pad = SP - S
    cosp = jnp.pad(cos.astype(dt), ((0, pad), (0, 0)), constant_values=1.0)
    sinp = jnp.pad(sin.astype(dt), ((0, pad), (0, 0)))
    blk = jnp.asarray(rotate_half_matrix(1, hd), dt)

    row = lambda b: (b, 0, 0)  # noqa: E731
    whole = lambda b: (0, 0)  # noqa: E731
    vec = lambda b: (0,)  # noqa: E731
    V = pltpu.VMEM
    out_specs = [
        pl.BlockSpec((1, SP, D), row, memory_space=V),
        pl.BlockSpec((1, SP, KV * hd), row, memory_space=V),
        pl.BlockSpec((1, SP, KV * hd), row, memory_space=V),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, S, D), dt),
        jax.ShapeDtypeStruct(
            (B, S, KV * hd), jnp.int8 if kv_quant else dt
        ),
        jax.ShapeDtypeStruct(
            (B, S, KV * hd), jnp.int8 if kv_quant else dt
        ),
    ]
    if kv_quant:
        sc_spec = pl.BlockSpec((1, 1, SP), lambda b: (b, 0, 0), memory_space=V)
        sc_shape = jax.ShapeDtypeStruct((B, 1, SP), jnp.float32)
        out_specs += [sc_spec, sc_spec]
        out_shape += [sc_shape, sc_shape]
    outs = pl.pallas_call(
        functools.partial(
            _kernel, H=H, KV=KV, hd=hd, eps=np.float32(eps),
            scale=np.float32(scale), SP=SP, S_real=S, kv_quant=kv_quant,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, SP, D), row, memory_space=V),
            pl.BlockSpec((D,), vec, memory_space=V),
            pl.BlockSpec((D, H * hd), whole, memory_space=V),
            pl.BlockSpec((D, KV * hd), whole, memory_space=V),
            pl.BlockSpec((D, KV * hd), whole, memory_space=V),
            pl.BlockSpec((H * hd, D), whole, memory_space=V),
            pl.BlockSpec((SP, hd), whole, memory_space=V),
            pl.BlockSpec((SP, hd), whole, memory_space=V),
            pl.BlockSpec((hd, hd), whole, memory_space=V),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
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
    )(x, ln_w, wq, wk, wv, wo, cosp, sinp, blk)
    return tuple(outs)


def _rowquant(h):
    """Per-row symmetric int8 quantization (pallas_mlp_block._rowquant) on
    VMEM-resident fp32 data. Returns (int8 values, fp32 scale (SP, 1))."""
    amax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(h / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _kernel_w8a8(
    x_ref, ln_ref, wq_ref, wk_ref, wv_ref, wo_ref,
    sq_ref, sk_ref, sv_ref, so_ref,
    cos_ref, sin_ref, p_ref,
    *rest,
    H, KV, hd, eps, scale, SP, S_real, kv_quant,
):
    """W8A8 variant: every dot runs on the int8 MXU path (2x the bf16
    rate — the r4 ablation showed both the projection half (62% MFU) and
    the attention core (43%, structurally capped at 50% by the hd=64
    dots' K/N=64) are MXU-bound, so int8 is the only lever left).

      * qkv/o: per-row int8 activations x per-out-column int8 weights,
        int32 accumulate (exactly pallas_mlp_block._kernel_w8a8's scheme).
      * scores: per-(row, head) int8 q x per-group SCALAR-scale int8 k —
        a scalar k scale avoids the (SP, 1) -> (1, SP) on-chip transpose
        a per-position k scale would need (the decode kernel gets
        per-position scales precomputed in lane layout from the cache;
        here k is fresh).
      * value dot: softmax weights quantized at the fixed scale 127
        (they live in [0, 1]) x scalar-scale int8 v — the decode kernel's
        scheme (pallas_decode_attention.py int8 numerics note).

    All further lossy steps beyond weight-only int8, so this kernel backs
    the OPT-IN w8a8 mode only; bench.py reports the resulting token
    agreement alongside the int8 modes."""
    if kv_quant:
        (out_ref, k_ref, v_ref, ksc_ref, vsc_ref,
         q_s, k_s, v_s, o_s) = rest
    else:
        out_ref, k_ref, v_ref, q_s, k_s, v_s, o_s = rest
    f32 = jnp.float32
    x = x_ref[0]  # (SP, D)

    xf = x.astype(f32)
    var = jnp.mean(xf * xf, axis=1, keepdims=True)
    h = xf * jax.lax.rsqrt(var + eps) * ln_ref[...].astype(f32)
    h8, hs = _rowquant(h)

    def mm8(a8, b_ref):
        return jax.lax.dot_general(
            a8, b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(f32)

    def mm(a, b_ref):
        return jax.lax.dot_general(
            a, b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).astype(a.dtype)

    dt = x.dtype
    q_s[...] = (mm8(h8, wq_ref) * hs * sq_ref[...].astype(f32)).astype(dt)
    k_s[...] = (mm8(h8, wk_ref) * hs * sk_ref[...].astype(f32)).astype(dt)
    v = (mm8(h8, wv_ref) * hs * sv_ref[...].astype(f32)).astype(dt)
    cos, sin = cos_ref[...], sin_ref[...]  # (SP, hd)
    _rope_heads(q_s, H, hd, cos, sin, p_ref, mm)
    _rope_heads(k_s, KV, hd, cos, sin, p_ref, mm)
    if SP > S_real:
        vrows = jax.lax.broadcasted_iota(jnp.int32, (SP, KV * hd), 0)
        v = jnp.where(vrows < S_real, v, jnp.zeros_like(v))
    v_s[...] = v

    # Attention core: bf16 dots, same as _kernel. (A fully-int8 core —
    # per-row q / scalar-scale k/v / fixed-127 softmax weights — was
    # measured SLOWER: 15.1 vs 13.7 us/row at B=64/S=389. The hd=64 dots'
    # K/N=64 cap doesn't lift under int8, and the per-head quantize VPU
    # chains add on top; benchmarks/exp_attn_block_parts.py.) Two causal
    # row blocks (see _attn_row_block).
    _attention(q_s, k_s, v_s, o_s, H=H, KV=KV, hd=hd, scale=scale, SP=SP,
               dt=dt)

    o8, os = _rowquant(o_s[...].astype(f32))
    out_ref[0] = x + (mm8(o8, wo_ref) * os * so_ref[...].astype(f32)).astype(
        dt
    )
    if kv_quant:
        _emit_quantized_kv(k_s, v_s, k_ref, v_ref, ksc_ref, vsc_ref, SP, S_real)
    else:
        k_ref[0] = k_s[...]
        v_ref[0] = v_s[...]


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "num_kv_heads", "head_dim", "eps", "interpret",
        "kv_quant",
    ),
)
def fused_attn_block_w8a8(
    x: jax.Array,  # (B, S, D) — raw layer input (pre-norm)
    ln_w: jax.Array,  # (D,)
    wq_q: jax.Array,  # (D, H*hd) int8 (llama.quantize_weight layout)
    wq_s: jax.Array,  # (H*hd,) fp32 per-out-column scale
    wk_q: jax.Array,
    wk_s: jax.Array,
    wv_q: jax.Array,
    wv_s: jax.Array,
    wo_q: jax.Array,  # (H*hd, D) int8
    wo_s: jax.Array,  # (D,)
    cos: jax.Array,  # (S, hd)
    sin: jax.Array,
    *,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    eps: float,
    interpret: bool = False,
    kv_quant: bool = False,
):
    """W8A8 attention block (see _kernel_w8a8). Same contract as
    ``fused_attn_block``: returns (out, k, v) with k/v in bf16 — cache
    quantization stays the caller's (llama.prefill commit) business —
    or, with ``kv_quant``, (out, k8, v8, kscale, vscale) quantized
    in-kernel (see _emit_quantized_kv)."""
    B, S, D = x.shape
    H, KV, hd = num_heads, num_kv_heads, head_dim
    SP = -(-S // 32) * 32  # int8 min sublane tile is 32
    scale = 1.0 / np.sqrt(hd)
    dt = x.dtype

    pad = SP - S
    cosp = jnp.pad(cos.astype(dt), ((0, pad), (0, 0)), constant_values=1.0)
    sinp = jnp.pad(sin.astype(dt), ((0, pad), (0, 0)))
    blk = jnp.asarray(rotate_half_matrix(1, hd), dt)

    row = lambda b: (b, 0, 0)  # noqa: E731
    whole = lambda b: (0, 0)  # noqa: E731
    vec = lambda b: (0,)  # noqa: E731
    V = pltpu.VMEM
    out_specs = [
        pl.BlockSpec((1, SP, D), row, memory_space=V),
        pl.BlockSpec((1, SP, KV * hd), row, memory_space=V),
        pl.BlockSpec((1, SP, KV * hd), row, memory_space=V),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, S, D), dt),
        jax.ShapeDtypeStruct((B, S, KV * hd), jnp.int8 if kv_quant else dt),
        jax.ShapeDtypeStruct((B, S, KV * hd), jnp.int8 if kv_quant else dt),
    ]
    if kv_quant:
        sc_spec = pl.BlockSpec((1, 1, SP), lambda b: (b, 0, 0), memory_space=V)
        sc_shape = jax.ShapeDtypeStruct((B, 1, SP), jnp.float32)
        out_specs += [sc_spec, sc_spec]
        out_shape += [sc_shape, sc_shape]
    outs = pl.pallas_call(
        functools.partial(
            _kernel_w8a8, H=H, KV=KV, hd=hd, eps=np.float32(eps),
            scale=np.float32(scale), SP=SP, S_real=S, kv_quant=kv_quant,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, SP, D), row, memory_space=V),
            pl.BlockSpec((D,), vec, memory_space=V),
            pl.BlockSpec((D, H * hd), whole, memory_space=V),
            pl.BlockSpec((D, KV * hd), whole, memory_space=V),
            pl.BlockSpec((D, KV * hd), whole, memory_space=V),
            pl.BlockSpec((H * hd, D), whole, memory_space=V),
            pl.BlockSpec((1, H * hd), whole, memory_space=V),
            pl.BlockSpec((1, KV * hd), whole, memory_space=V),
            pl.BlockSpec((1, KV * hd), whole, memory_space=V),
            pl.BlockSpec((1, D), whole, memory_space=V),
            pl.BlockSpec((SP, hd), whole, memory_space=V),
            pl.BlockSpec((SP, hd), whole, memory_space=V),
            pl.BlockSpec((hd, hd), whole, memory_space=V),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            V((SP, H * hd), dt),
            V((SP, KV * hd), dt),
            V((SP, KV * hd), dt),
            V((SP, H * hd), dt),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * D * (H + 2 * KV) * hd
            + 2 * 2 * B * H * SP * SP * hd
            + 2 * B * S * H * hd * D,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=B * H * SP * SP,
        ),
    )(
        x, ln_w, wq_q, wk_q, wv_q, wo_q,
        wq_s.reshape(1, -1), wk_s.reshape(1, -1), wv_s.reshape(1, -1),
        wo_s.reshape(1, -1), cosp, sinp, blk,
    )
    return tuple(outs)


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
