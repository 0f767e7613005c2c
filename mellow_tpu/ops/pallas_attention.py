"""Fused Pallas causal GQA attention for the prefill path.

The XLA einsum formulation of prefill attention (llama.py `_layer`)
materializes the (B, H, S, S) score tensor in HBM — measured 349 MB/layer
fp32 at B=64, S=389 — plus a rep-broadcast transpose of K (90 MB/layer).
A profile attributed ~2 ms of the 2.9 ms/layer prefill cost to those
round-trips. The stock `flash_attention` and `splash_attention` kernels
were both measured ~2x SLOWER than the einsum at these shapes (hd=64,
S<=512, 9 heads — block sizes don't fit; benchmarks/exp_prefill_attn.py),
so this kernel is specialized to the Mellow regime instead:

  * S is small (<=1024 padded): the WHOLE sequence — q (S, H*hd), packed
    k/v (S, KV*hd), scores (S, S) — fits in VMEM per batch row, so there is
    no streaming flash recurrence at all; grid = (B,), one program per clip.
  * GQA is handled by lane-slicing each head's 64-wide block out of the
    packed projections — no repeat of K/V to H heads anywhere.
  * scores/softmax run in fp32 on the VPU, entirely on-chip; only the
    (S, H*hd) output returns to HBM.

Layout contract (exactly what `llama.prefill` has in registers anyway):
  q: (B, S, H*hd)  RoPE already applied, head h at lanes [h*hd, (h+1)*hd)
  k: (B, S, KV*hd) RoPE already applied, group g at lanes [g*hd, (g+1)*hd)
  v: (B, S, KV*hd)
  Query head h belongs to KV group h // (H // KV) (the (KV, rep) grouping
  used everywhere in llama.py).

Reference behavior mirrored: mellow/wrapper.py:217 runs HF Llama SDPA
(causal, no pad mask needed — prefix rows are all real); this kernel is the
perf-mode (bf16) implementation, the einsum stays for fp32 parity mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # large-negative instead of -inf: keeps pad rows finite


def _kernel(q_ref, k_ref, v_ref, o_ref, *, H, KV, hd, scale, SP, S_real):
    rep = H // KV
    rows = jax.lax.broadcasted_iota(jnp.int32, (SP, SP), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (SP, SP), 1)
    causal = rows >= cols
    if SP > S_real:  # zero V's OOB rows (see flash_gqa_prefill docstring)
        vrows = jax.lax.broadcasted_iota(jnp.int32, (SP, hd), 0)
        v_valid = vrows < S_real
    for g in range(KV):
        k_g = k_ref[0, :, g * hd : (g + 1) * hd]  # (SP, hd)
        v_g = v_ref[0, :, g * hd : (g + 1) * hd]
        if SP > S_real:
            v_g = jnp.where(v_valid, v_g, jnp.zeros_like(v_g))
        for r in range(rep):
            h = g * rep + r
            q_h = q_ref[0, :, h * hd : (h + 1) * hd]  # (SP, hd)
            s = jax.lax.dot_general(
                q_h, k_g, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (SP, SP)
            s = jnp.where(causal, s, _NEG)
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=1, keepdims=True)
            o = jax.lax.dot_general(
                e.astype(q_ref.dtype), v_g, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (SP, hd)
            o_ref[0, :, h * hd : (h + 1) * hd] = (o / denom).astype(o_ref.dtype)


def _kernel_tri(q_ref, k_ref, v_ref, o_ref, *, H, KV, hd, scale, SP, S_real):
    """Triangle-skipping variant: queries processed in 128-row blocks; block
    qi only computes scores against the (qi+1)*128 causally-visible columns.
    Measured SLOWER than the whole-square kernel at SP=512 (1.84 vs 1.70
    ms/layer, B=64): the 36 skinny dots + concats cost more than the skipped
    upper-triangle work saves. Kept as the measured record; may win at
    larger SP where the triangle fraction matters more. (A third variant —
    per-block triangle softmax writing normalized weights into a zeroed
    (SP, SP) scratch, one full value dot per head — was also measured and
    was 5x SLOWER (0.34 vs 0.07 ms/call at B=32, S=389): the scratch
    zero-fill + blockwise stores dwarf the skipped exp work. The square
    kernel is already at its compute ideal in isolation — 0.070 ms/call
    at B=32 equals the analytic bound benchmarks/README.md quotes; the
    0.227 ms/layer prefill attribution is the whole fused attention
    BLOCK (qkv+rope+attn+o+residual), not this kernel.)"""
    rep = H // KV
    QB = 128
    nq = SP // QB
    rows = jax.lax.broadcasted_iota(jnp.int32, (QB, QB), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (QB, QB), 1)
    tri = rows >= cols  # causal mask for the diagonal block
    if SP > S_real:  # zero V's OOB rows (see flash_gqa_prefill docstring)
        vrows = jax.lax.broadcasted_iota(jnp.int32, (SP, hd), 0)
        v_valid = vrows < S_real
    for g in range(KV):
        k_g = k_ref[0, :, g * hd : (g + 1) * hd]  # (SP, hd)
        v_g = v_ref[0, :, g * hd : (g + 1) * hd]
        if SP > S_real:
            v_g = jnp.where(v_valid, v_g, jnp.zeros_like(v_g))
        for r in range(rep):
            h = g * rep + r
            for qi in range(nq):
                Lk = (qi + 1) * QB  # static per qi
                q_blk = q_ref[0, qi * QB : (qi + 1) * QB, h * hd : (h + 1) * hd]
                s = jax.lax.dot_general(
                    q_blk, k_g[:Lk], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale  # (QB, Lk)
                if qi == 0:
                    s = jnp.where(tri, s, _NEG)
                else:
                    diag = jnp.where(tri, s[:, qi * QB :], _NEG)
                    s = jnp.concatenate([s[:, : qi * QB], diag], axis=1)
                m = jnp.max(s, axis=1, keepdims=True)
                e = jnp.exp(s - m)
                denom = jnp.sum(e, axis=1, keepdims=True)
                o = jax.lax.dot_general(
                    e.astype(q_ref.dtype), v_g[:Lk], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (QB, hd)
                o_ref[0, qi * QB : (qi + 1) * QB, h * hd : (h + 1) * hd] = (
                    o / denom
                ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "num_kv_heads", "head_dim", "interpret", "variant",
        "sp_align",
    ),
)
def flash_gqa_prefill(
    q: jax.Array,  # (B, S, H*hd)
    k: jax.Array,  # (B, S, KV*hd)
    v: jax.Array,  # (B, S, KV*hd)
    *,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    interpret: bool = False,
    variant: str = "square",  # measured fastest at SP=512 (vs "tri")
    sp_align: int = 8,  # VMEM block rows need only sublane (8) alignment:
    # SP=392 instead of 512 at S=389 skips the dead score rows (measured a
    # modest 1.073 -> 1.047 ms/layer isolated at B=32 — the lane dim still
    # pads to 512 so only row work shrinks; "tri" still assumes 128)
) -> jax.Array:
    """Causal GQA attention, returns (B, S, H*hd). Pure function of the
    packed projections. No host-side padding: Pallas partial blocks cover
    S not divisible by 128 (the explicit q pad + output slice cost
    ~0.9 ms/layer at B=256). Out-of-bounds garbage is provably inert:
    garbage SCORE entries (from OOB q rows or k rows) sit at masked or
    discarded positions — `jnp.where(causal, s, _NEG)` replaces every
    column > row, and real rows only have real columns in their causal
    range — while V's OOB rows are zeroed IN-KERNEL (their softmax weights
    are exact zeros, but 0 * garbage-NaN would still poison the value
    dot). OOB output rows are dropped by the masked partial-block write."""
    B, S, _ = q.shape
    H, KV, hd = num_heads, num_kv_heads, head_dim
    if variant == "tri":
        sp_align = 128  # _kernel_tri's 128-row query blocks need it
    SP = -(-S // sp_align) * sp_align
    scale = 1.0 / np.sqrt(hd)

    kern = {"tri": _kernel_tri, "square": _kernel}[variant]
    scratch = []
    out = pl.pallas_call(
        functools.partial(
            kern, H=H, KV=KV, hd=hd, scale=np.float32(scale), SP=SP, S_real=S
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, SP, H * hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SP, KV * hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SP, KV * hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, SP, H * hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, H * hd), q.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * SP * SP * hd,
            bytes_accessed=q.size * q.dtype.itemsize * 2
            + 2 * k.size * k.dtype.itemsize,
            transcendentals=B * H * SP * SP,
        ),
    )(q, k, v)
    return out


def reference_gqa_prefill(q, k, v, *, num_heads, num_kv_heads, head_dim):
    """jnp oracle with identical layout contract (for tests/benchmarks)."""
    B, S, _ = q.shape
    H, KV, hd = num_heads, num_kv_heads, head_dim
    rep = H // KV
    qg = q.reshape(B, S, KV, rep, hd)
    kg = k.reshape(B, S, KV, hd)
    vg = v.reshape(B, S, KV, hd)
    causal = jnp.tril(jnp.ones((S, S), bool))
    mask = jnp.where(causal, 0.0, -jnp.inf).astype(jnp.float32)
    s = jnp.einsum("bqgrd,bkgd->bgrqk", qg, kg) / np.sqrt(hd)
    s = s.astype(jnp.float32) + mask
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bgrqk,bkgd->bqgrd", p, vg)
    return o.reshape(B, S, H * hd)
