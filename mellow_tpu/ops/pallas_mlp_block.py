"""Fused Pallas MLP BLOCK for the prefill path: pre-RMSNorm + gate/up
projections + SiLU·mul + down projection + residual, one program per
batch row, everything VMEM-resident — plus a W8A8 variant that quantizes
activations in-kernel and runs the dots on the int8 MXU path.

Why: after the fused attention block (ops/pallas_attn_block.py) absorbed
the attention half's elementwise chain, the remaining per-layer prefill
time is the MLP half: three matmuls the profile shows AT the bf16
roofline plus the ln_mlp/residual share of the 0.269 ms/layer VPU fusion
(benchmarks/README.md). Two levers, both in this file:

  * fuse norm + residual into the matmul program (removes the h HBM
    round-trip and the separate VPU pass);
  * W8A8: benchmarks/exp_w8a8_prefill.py measured the raw int8 MXU dot
    1.51x faster than bf16 at exactly these shapes — but XLA's dynamic
    per-token quantization costs more than the dot saves (C vs A: +3%).
    In-kernel, the quantize happens on VMEM-resident data inside the
    same program, so the 1.5x is capturable.

Semantics mirrored 1:1 from llama._layer's MLP half (models/llama.py:
257-260): rms_norm in fp32 with the same eps placement, bf16 matmuls
with fp32 accumulation, SiLU gate. Reference behavior: HF LlamaMLP
driven by /root/reference/mellow/wrapper.py:217.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _norm(x_ref, ln_ref, eps):
    xf = x_ref[0].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * ln_ref[...].astype(jnp.float32))


def _kernel_bf16(x_ref, ln_ref, wg_ref, wu_ref, wd_ref, out_ref, *, eps):
    f32 = jnp.float32
    x = x_ref[0]  # (SP, D)
    h = _norm(x_ref, ln_ref, eps).astype(x.dtype)

    def mm(a, b_ref):
        return jax.lax.dot_general(
            a, b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    gate = jax.nn.silu(mm(h, wg_ref)).astype(x.dtype)
    up = mm(h, wu_ref).astype(x.dtype)
    out_ref[0] = x + mm(gate * up, wd_ref).astype(x.dtype)


def _rowquant(h):
    """Per-row symmetric int8 quantization (llama.quantize_kv formula) on
    VMEM-resident fp32 data. Returns (int8 values, fp32 scale (SP, 1))."""
    amax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(h / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _kernel_w8a8(
    x_ref, ln_ref, wg_ref, wu_ref, wd_ref, sg_ref, su_ref, sd_ref, out_ref,
    *, eps,
):
    f32 = jnp.float32
    x = x_ref[0]  # (SP, D)
    h8, hs = _rowquant(_norm(x_ref, ln_ref, eps))

    def mm8(a8, b_ref):
        return jax.lax.dot_general(
            a8, b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(f32)

    # per-row activation scale * per-column weight scale fold in AFTER the
    # int32 accumulate (llama.quantize_weight stores per-out-column scales)
    gate = jax.nn.silu(mm8(h8, wg_ref) * hs * sg_ref[...].astype(f32))
    up = mm8(h8, wu_ref) * hs * su_ref[...].astype(f32)
    g8, gs = _rowquant(gate * up)
    y = mm8(g8, wd_ref) * gs * sd_ref[...].astype(f32)
    out_ref[0] = x + y.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_mlp_block(
    x: jax.Array,  # (B, S, D) — raw layer input (pre-norm)
    ln_w: jax.Array,  # (D,)
    w_gate: jax.Array,  # (D, I)
    w_up: jax.Array,  # (D, I)
    w_down: jax.Array,  # (I, D)
    *,
    eps: float,
    interpret: bool = False,
) -> jax.Array:
    """out = x + silu(norm(x) @ w_gate) * (norm(x) @ w_up) @ w_down."""
    B, S, D = x.shape
    I = w_gate.shape[1]
    SP = -(-S // 8) * 8
    dt = x.dtype

    row = lambda b: (b, 0, 0)  # noqa: E731
    whole = lambda b: (0, 0)  # noqa: E731
    vec = lambda b: (0,)  # noqa: E731
    V = pltpu.VMEM
    # No host-side row pad: Pallas partial blocks read/write only the S
    # real rows (every op in the kernel is row-confined, so the SP-S
    # garbage rows are inert and their outputs are dropped by the masked
    # partial-block write). The explicit pad + output slice cost ~1 ms at
    # the B=256 chunked-prefill shape (r4 profile).
    out = pl.pallas_call(
        functools.partial(_kernel_bf16, eps=np.float32(eps)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, SP, D), row, memory_space=V),
            pl.BlockSpec((D,), vec, memory_space=V),
            pl.BlockSpec((D, I), whole, memory_space=V),
            pl.BlockSpec((D, I), whole, memory_space=V),
            pl.BlockSpec((I, D), whole, memory_space=V),
        ],
        out_specs=pl.BlockSpec((1, SP, D), row, memory_space=V),
        out_shape=jax.ShapeDtypeStruct((B, S, D), dt),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * SP * D * I * 3,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + 3 * D * I * w_gate.dtype.itemsize,
            transcendentals=B * SP * I,
        ),
    )(x, ln_w, w_gate, w_up, w_down)
    return out


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_mlp_block_w8a8(
    x: jax.Array,  # (B, S, D)
    ln_w: jax.Array,  # (D,)
    wg_q: jax.Array,  # (D, I) int8
    wg_s: jax.Array,  # (I,) fp32 per-out-column scale
    wu_q: jax.Array,
    wu_s: jax.Array,
    wd_q: jax.Array,  # (I, D) int8
    wd_s: jax.Array,  # (D,)
    *,
    eps: float,
    interpret: bool = False,
) -> jax.Array:
    """W8A8 MLP block: int8 weights (llama.quantize_weight layout) and
    per-row in-kernel int8 activations; int32 MXU accumulation. A further
    accuracy step beyond weight-only int8 — opt-in perf mode, divergence
    measured in bench output alongside the int8 modes."""
    B, S, D = x.shape
    I = wg_q.shape[1]
    # int8 min tile is (32, 128): align the BLOCK row dim to 32 so the
    # quantized activations hit the native layout. No host-side pad/slice
    # (it cost ~4 ms at the B=256 chunked-prefill shape, r4 profile):
    # partial blocks cover S % 32, the garbage rows are row-confined and
    # dropped by the masked output write.
    SP = -(-S // 32) * 32
    dt = x.dtype

    row = lambda b: (b, 0, 0)  # noqa: E731
    whole = lambda b: (0, 0)  # noqa: E731
    vec = lambda b: (0,)  # noqa: E731
    V = pltpu.VMEM
    out = pl.pallas_call(
        functools.partial(_kernel_w8a8, eps=np.float32(eps)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, SP, D), row, memory_space=V),
            pl.BlockSpec((D,), vec, memory_space=V),
            pl.BlockSpec((D, I), whole, memory_space=V),
            pl.BlockSpec((D, I), whole, memory_space=V),
            pl.BlockSpec((I, D), whole, memory_space=V),
            pl.BlockSpec((1, I), whole, memory_space=V),
            pl.BlockSpec((1, I), whole, memory_space=V),
            pl.BlockSpec((1, D), whole, memory_space=V),
        ],
        out_specs=pl.BlockSpec((1, SP, D), row, memory_space=V),
        out_shape=jax.ShapeDtypeStruct((B, S, D), dt),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * SP * D * I * 3,
            bytes_accessed=2 * x.size * x.dtype.itemsize + 3 * D * I,
            transcendentals=B * SP * I,
        ),
    )(
        x, ln_w, wg_q, wu_q, wd_q,
        wg_s.reshape(1, I), wu_s.reshape(1, I), wd_s.reshape(1, D),
    )
    return out


def reference_mlp_block(x, ln_w, w_gate, w_up, w_down, *, eps):
    """jnp oracle with identical contract (restated from
    models/llama.py:257-260 for the kernel tests)."""
    from mellow_tpu.models.llama import rms_norm

    h = rms_norm(x, ln_w, eps)
    gate = jax.nn.silu(h @ w_gate)
    return x + (gate * (h @ w_up)) @ w_down
