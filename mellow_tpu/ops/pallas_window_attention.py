"""Fused Pallas Swin window attention (qkv -> attention -> out, on-chip).

The XLA formulation of `htsat.window_attention` splits (C) into
(heads, hd=24) — on TPU every (.., 24)-lane tensor pads to 128 lanes, and
the per-head einsums materialize 5-D transposes: a B=32 encoder profile
showed ~2 ms/block of copies + score fusions in stage 1 alone
((2048, 64, 3, 4, 24) layout copies at 0.5 ms each). This kernel keeps
everything in the packed (N, C) layout instead:

  * block-diagonal queries (the same trick as llama's decode attention):
    q is repeated H times along rows and lane-masked per head, so the
    scores for ALL heads are ONE (H*N, C) @ (C, N) matmul — no head dim,
    no sub-128-lane tensors anywhere;
  * relative-position bias (+ the shifted-window mask, selected per window
    at runtime) is added in-kernel; softmax runs in fp32 on the VPU;
  * the value product is one (H*N, N) @ (N, C) matmul whose per-head
    blocks are lane-masked and summed — only (N, C) returns to HBM.

The qkv and output projections stay in XLA (they are well-shaped MXU
matmuls). Reference semantics mirrored: mellow/model/htsat.py:301-332
(W-MSA/SW-MSA with learned relative position bias and additive -100
shifted mask). bf16 perf mode only; fp32 parity mode keeps the einsum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(qkv_ref, bias_ref, mask_ref, out_ref, *, H, C, N, n_mask, chunk, scale):
    hd = C // H
    # Loop-invariant block-diagonal lane mask: row (h*N + n) keeps only head
    # h's lanes (hoisted out of the window loop).
    rows = jax.lax.broadcasted_iota(jnp.int32, (H * N, C), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (H * N, C), 1)
    blockmask = (rows // N) == (lanes // hd)
    zero = jnp.zeros((H * N, C), jnp.float32)
    for wi in range(chunk):
        qkv = qkv_ref[wi]  # (N, 3C)
        q = qkv[:, :C] * scale
        k = qkv[:, C : 2 * C]
        v = qkv[:, 2 * C :]
        q_rep = jnp.concatenate([q] * H, axis=0)  # (H*N, C)
        q_bd = jnp.where(blockmask, q_rep, zero.astype(q_rep.dtype))
        s = jax.lax.dot_general(
            q_bd, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H*N, N): per-(head, query) scores
        s = s + bias_ref[:, :]  # (H*N, N) fp32 rel-pos bias
        if n_mask:
            w = pl.program_id(0) * chunk + wi
            m = mask_ref[jax.lax.rem(w, n_mask)]  # (N, N)
            s = s + jnp.concatenate([m] * H, axis=0)
        m_row = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m_row)
        p = (e / jnp.sum(e, axis=1, keepdims=True)).astype(qkv.dtype)
        o_bd = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H*N, C); row (h*N+n) is valid only on head h's lanes
        o_masked = jnp.where(blockmask, o_bd, zero)
        o = jnp.sum(o_masked.reshape(H, N, C), axis=0)  # (N, C)
        out_ref[wi] = o.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "window_size", "interpret", "chunk"),
)
def window_attention_fused(
    qkv: jax.Array,  # (Bn, N, 3C) — x @ W_qkv + b, N = window_size**2
    bias: jax.Array,  # (H*N, N) fp32 relative-position bias, rows head-major
    mask,  # (nW, N, N) fp32 shifted-window mask, or None
    *,
    num_heads: int,
    window_size: int,
    interpret: bool = False,
    chunk: int = 0,  # windows per program; 0 = auto by VMEM budget
) -> jax.Array:
    """Returns (Bn, N, C) attention output (pre-projection)."""
    Bn, N, C3 = qkv.shape
    C = C3 // 3
    H = num_heads
    assert N == window_size * window_size
    scale = np.float32((C // H) ** -0.5)
    if chunk == 0:
        # VMEM per window ~ (H*N)*(C*6 + N*6) bytes; target ~4 MB of scratch.
        per_w = H * N * (C * 6 + N * 6)
        chunk = max(1, min(8, (4 << 20) // per_w))
    while Bn % chunk:
        chunk -= 1
    n_mask = 0 if mask is None else mask.shape[0]
    if mask is None:
        mask_in = jnp.zeros((1, N, N), jnp.float32)  # unused placeholder
    else:
        mask_in = jnp.asarray(mask, jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _kernel, H=H, C=C, N=N, n_mask=n_mask, chunk=chunk, scale=scale
        ),
        grid=(Bn // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, N, 3 * C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (chunk, N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bn, N, C), qkv.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Bn * H * N * N * C,
            bytes_accessed=qkv.size * qkv.dtype.itemsize
            + Bn * N * C * qkv.dtype.itemsize,
            transcendentals=Bn * H * N * N,
        ),
    )(qkv, jnp.asarray(bias, jnp.float32), mask_in)
    return out
