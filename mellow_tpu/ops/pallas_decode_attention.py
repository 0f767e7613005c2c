"""Fused Pallas GQA attention for the incremental decode step, over a
zero-pad PACKED KV cache.

Decode streams the whole KV cache every step, so its floor is HBM
bandwidth. The einsum formulation (llama.decode_step) reads K and V from
separate (L, B, S, 256) buffers whose packed lane dim is 192 useful + 64
explicit tile pad (llama.KVCache.packed_dim) — 25% of every cache byte is
pad. This kernel consumes a single (L, B, S8, P2) buffer laid out as
flat [K | V] halves — zero pad (P2 = 384 = 3 exact
128-lane tiles at the production shape) — in ONE pass per (layer,
batch-chunk): scores, fp32 softmax over the flushed cache, and the value
contraction all happen on-chip; only (B, 16, P2) bf16 returns to HBM.

The flush window's pending/current "extra" positions ride INSIDE the
kernel as a small (B, EP, P2) operand sharing the softmax statistics.
(The flash-composition alternative — kernel returns m/d stats, extras
merge outside via two batched XLA einsums — was measured SLOWER e2e:
5.79 vs 5.27 ms/step at B=256 int8; the per-layer (B, 16, P2) f32
XLA intermediates cost more than the ~25 us/layer the in-kernel extras
dots cost, and for bf16 caches the kernel is DMA-bound so the in-kernel
extras compute hides entirely.)

Measured design history (v5e-1, B=256, S8=536, int8, L=30 — the bench
headline decode shape; benchmarks/exp_decode_attn.py):
  * Auto-pipelined grid over single batch rows: DMA reaches only 557 GB/s
    (204 KB blocks) and the whole kernel ran SLOWER than the einsum path.
  * 8-row chunks lift the pure DMA to 706 GB/s — the chip's practical
    HBM roofline (the same rate XLA's fused cache reads hit).
  * The kernel is then COMPUTE-bound, not DMA-bound: a compute-only mode
    (no DMA waits) measures 103 us/layer vs the 74 us DMA floor. The
    skinny M=16 dots run at ~40% MXU efficiency and dominate. Manual
    double-buffering, 16-row chunks, and dimension_semantics made no
    difference — overlap was already working; compute is the wall.
  * Native int8 MXU dots (2x the bf16 rate) cut compute to ~90 us/layer;
    slicing the score dot to the K half saved only 4 us more (not taken:
    it complicates the layout contract for ~4%).
So: int8 caches run int8 x int8 dots in-kernel (the cache values stream
untouched; per-position scales and the in-kernel quantization scales fold
in after the matmuls), bf16 caches run bf16 dots and sit at the DMA
floor. Either way the manual double-buffered DMA (2-slot VMEM scratch,
8-row chunks, next chunk's copy issued before the current chunk's wait)
keeps the stream at the roofline.

Layout contract (P2 = 2 * KV_heads * head_dim lanes, split into FLAT
halves: lanes [0, KL) hold the packed K row, [KL, P2) the packed V row,
KL = KV_heads * head_dim — the layout llama._pack_kv_rows/PackedKVCache
produce with one minor-dim concat. A per-group interleaved [K_g|V_g]
layout was tried first for TP lane-shardability and dropped: its
pack/unpack needs 6D reshapes whose batch-minor copies cost ~50 ms at
the B=256 prefill commit; see PackedKVCache's docstring):
  q_dense: (B, HP, P2) bf16, HP = num_heads padded up to a multiple of 8
           (M=9 dots trip a Mosaic skinny-M 'vector.broadcast' bug).
           Head h = (g, r) holds its RoPE'd query at K-half lanes
           [g*hd, (g+1)*hd); all other lanes (including the whole V
           half) are zero, so contracting all P2 lanes of a packed row
           yields head h's score against KV head g only. Pad rows are
           zeros; their outputs are garbage (discarded by the caller).
  kv:      (L, B, S8, P2) int8 or float; S8 % 8 == 0 (manual HBM slices
           need sublane-aligned memrefs).
  scale:   (L, B, 2*SP) f32 or None (float cache). SP = S8 rounded up to
           a 128-lane multiple; k scales at lanes [0, S8), v scales at
           [SP, SP+S8). Merged so each chunk needs ONE scale DMA.
  extra:   (B, EP, P2) bf16 — the flush window's pending positions plus
           the current token in the same packed layout; rows >= n_extra
           are masked. EP is static (= flush window) so one compiled
           kernel serves every window sub-step. Extras always use bf16
           dots (EP is tiny).
Returns o: (B, HP, P2) bf16, softmax-normalized jointly over cache and
extras. V-half lanes [KL + g*hd, KL + (g+1)*hd) of row h = (g, r) hold
head h's output — the caller slices [:, :H, KL:] and keeps each head's
own group block (same eye-einsum as the einsum path); K-half columns are
garbage weight sums, dropped.

int8 numerics (int8 caches only — bf16 caches match the einsum math):
scores use per-head-row symmetric int8 q (qmax/127 folds into the score
scale); the value contraction quantizes w = softmax_weight * v_scale
per head row to int8 (wmax/127 folds out after the dot). Both are
additional ~0.4% relative rounding on top of the cache's own int8
quantization; bench.py reports the resulting token agreement.

Reference behavior mirrored: the attention inside the reference's decode
loop (mellow/wrapper.py:217, full recompute) as restated incrementally by
llama.decode_step; bf16 perf mode only — fp32 parity mode and CPU keep
the einsum path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # large-negative instead of -inf (keeps pad rows finite)

HEAD_PAD = 16  # q_dense row count; multiple of the 8-sublane tile >= H=9
CHUNK_ROWS = 8  # batch rows per manual DMA (706 GB/s; 1 row = 557 GB/s)


def lane_pad(n: int, tile: int = 128) -> int:
    return -(-n // tile) * tile


def vmem_bytes(B: int, S8: int, P2: int, EP: int, kv_itemsize: int) -> int:
    """Kernel VMEM footprint estimate: q + out + extras (whole-batch VMEM
    operands) + the 2-slot chunk scratch. Callers gate on this."""
    cr = min(CHUNK_ROWS, B)
    return (
        2 * B * HEAD_PAD * P2 * 2  # q_dense + out, bf16
        + B * max(EP, 8) * P2 * 2  # extras, bf16
        + 2 * cr * S8 * P2 * kv_itemsize  # kv scratch, 2 slots
        + 2 * cr * 2 * lane_pad(S8) * 4  # scale scratch, 2 slots
    )


def _kernel(s_ref, q_ref, kv_ref, ex_ref, sc_ref, o_ref, kv_s, sc_s, sem,
            *, B, S8, SP, P2, EP, CR, scale, quantized):
    # s_ref: (3,) int32 scalar prefetch = [layer, flushed, n_extra].
    layer = s_ref[0]
    flushed = s_ref[1]
    n_extra = s_ref[2]
    NC = B // CR

    def dma(slot, c):
        copies = [
            pltpu.make_async_copy(
                kv_ref.at[layer, pl.ds(c * CR, CR)], kv_s.at[slot],
                sem.at[slot, 0]),
        ]
        if quantized:
            copies.append(pltpu.make_async_copy(
                sc_ref.at[layer, pl.ds(c * CR, CR)], sc_s.at[slot],
                sem.at[slot, 1]))
        return copies

    for d in dma(0, 0):
        d.start()

    cols = jax.lax.broadcasted_iota(jnp.int32, (HEAD_PAD, S8), 1)
    cmask = jnp.where(cols < flushed, 0.0, _NEG).astype(jnp.float32)
    ecols = jax.lax.broadcasted_iota(jnp.int32, (HEAD_PAD, EP), 1)
    emask = jnp.where(ecols < n_extra, 0.0, _NEG).astype(jnp.float32)

    def chunk(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < NC)
        def _():
            for d in dma(jax.lax.rem(c + 1, 2), c + 1):
                d.start()

        for d in dma(slot, c):
            d.wait()

        for r in range(CR):
            row = c * CR + r
            q = q_ref[row]  # (HP, P2) bf16, only K sub-lanes nonzero
            ex = ex_ref[row]  # (EP, P2) bf16
            kvb8 = kv_s[slot, r]  # (S8, P2) int8 or float

            if quantized:
                # Per-head-row symmetric int8 q: native int8 MXU dots run
                # 2x bf16 and skip the (S8, P2) VPU dequant entirely
                # (compute is the kernel's bottleneck — module docstring).
                qmax = jnp.maximum(
                    jnp.max(jnp.abs(q), axis=1, keepdims=True)
                    .astype(jnp.float32),
                    1e-8,
                )  # (HP, 1) f32
                # round() only legalizes on f32 in Mosaic (bf16 roundeven
                # does not lower); q is tiny so the f32 detour is cheap.
                q8 = jnp.round(
                    q.astype(jnp.float32) * (127.0 / qmax)
                ).astype(jnp.int8)
                s32 = jax.lax.dot_general(
                    q8, kvb8, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)  # (HP, S8)
                ks_row = sc_s[slot, pl.ds(r, 1), pl.ds(0, S8)]  # (1, S8)
                s = (
                    s32.astype(jnp.float32)
                    * (qmax * (scale / 127.0))
                    * ks_row.astype(jnp.float32)
                )
            else:
                kvb = kvb8.astype(q.dtype)
                s = jax.lax.dot_general(
                    q, kvb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
            s = s + cmask  # (HP, S8) f32

            s_e = jax.lax.dot_general(
                q, ex, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + emask  # (HP, EP) f32

            m = jnp.maximum(
                jnp.max(s, axis=1, keepdims=True),
                jnp.max(s_e, axis=1, keepdims=True),
            )  # (HP, 1)
            e = jnp.exp(s - m)  # exact zeros at masked positions
            e_e = jnp.exp(s_e - m)
            denom = (
                jnp.sum(e, axis=1, keepdims=True)
                + jnp.sum(e_e, axis=1, keepdims=True)
            )
            if quantized:
                # w = softmax weight x per-position v scale, re-quantized
                # per head row so the value dot stays int8 x int8.
                vs_row = sc_s[slot, pl.ds(r, 1), pl.ds(SP, S8)]
                w = e * vs_row.astype(jnp.float32)  # (HP, S8)
                wmax = jnp.maximum(
                    jnp.max(w, axis=1, keepdims=True), 1e-30
                )
                # w >= 0, so truncation loses at most 1/254 relative —
                # below the cache's own int8 noise.
                w8 = (w * (127.0 / wmax)).astype(jnp.int8)
                o32 = jax.lax.dot_general(
                    w8, kvb8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)  # (HP, P2)
                o = o32.astype(jnp.float32) * (wmax / 127.0)
            else:
                o = jax.lax.dot_general(
                    e.astype(q.dtype), kvb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o = o + jax.lax.dot_general(
                e_e.astype(q.dtype), ex, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[row] = (o / denom).astype(o_ref.dtype)
        return _

    jax.lax.fori_loop(0, NC, chunk, None)


@functools.partial(jax.jit, static_argnames=("head_dim", "interpret"))
def flash_gqa_decode(
    q_dense: jax.Array,  # (B, HP, P2) bf16 — module-docstring layout
    kv: jax.Array,       # (L, B, S8, P2) int8 or float packed cache
    scale_kv,            # (L, B, 2*SP) f32 merged [k|v] scales, or None
    extra: jax.Array,    # (B, EP, P2) bf16 pending + current positions
    layer: jax.Array,    # () int32 — which cache layer to attend over
    flushed: jax.Array,  # () int32 — valid cache positions (>= 1)
    n_extra: jax.Array,  # () int32 — live rows of `extra`
    *,
    head_dim: int,
    interpret: bool = False,
) -> jax.Array:
    """One layer's complete decode attention (flushed cache + extras);
    returns (B, HP, P2) bf16, softmax-normalized (module docstring)."""
    B, HP, P2 = q_dense.shape
    L, _, S8, _P2 = kv.shape
    EP = extra.shape[1]
    if EP < 8:
        # Degenerate extras dots (N < 8) hit the same Mosaic skinny-dot
        # bug as M = 9 queries; dead rows are masked by n_extra anyway.
        extra = jnp.pad(extra, ((0, 0), (0, 8 - EP), (0, 0)))
        EP = 8
    assert P2 == _P2, (P2, _P2)
    assert HP == HEAD_PAD and HP % 8 == 0, HP
    assert S8 % 8 == 0, S8
    quantized = scale_kv is not None
    SP = lane_pad(S8)
    if quantized:
        assert scale_kv.shape == (L, B, 2 * SP), (scale_kv.shape, SP)
    CR = min(CHUNK_ROWS, B)
    assert B % CR == 0, (B, CR)
    sm_scale = np.float32(1.0 / np.sqrt(head_dim))

    scalars = jnp.stack([
        jnp.asarray(layer, jnp.int32),
        jnp.asarray(flushed, jnp.int32),
        jnp.asarray(n_extra, jnp.int32),
    ])

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # q_dense
        pl.BlockSpec(memory_space=pl.ANY),      # kv (manual DMA)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # extras
    ]
    operands = [q_dense, kv, extra]
    scratch = [
        pltpu.VMEM((2, CR, S8, P2), kv.dtype),
        pltpu.VMEM((2, CR, 2 * SP), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    if quantized:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(scale_kv)

    def kern(s_ref, *refs):
        if quantized:
            q_ref, kv_ref, ex_ref, sc_ref = refs[:4]
            rest = refs[4:]
        else:
            q_ref, kv_ref, ex_ref = refs[:3]
            sc_ref = None
            rest = refs[3:]
        o_ref, kv_s, sc_s, sem = rest
        _kernel(
            s_ref, q_ref, kv_ref, ex_ref, sc_ref, o_ref, kv_s, sc_s, sem,
            B=B, S8=S8, SP=SP, P2=P2, EP=EP, CR=CR, scale=sm_scale,
            quantized=quantized,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, HP, P2), q_dense.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * HP * (S8 + EP) * P2,
            bytes_accessed=B * S8 * P2 * kv.dtype.itemsize
            + extra.size * 2 + (q_dense.size + B * HP * P2) * 2,
            transcendentals=B * HP * (S8 + EP),
        ),
    )(scalars, *operands)


_KV3_GEOM = dict(KV=3, rep=3, hd=64)  # the v0 production GQA geometry


def tiled_supported(num_heads: int, num_kv_heads: int, head_dim: int) -> bool:
    """The tiled kernel is specialized to the v0 geometry (3 KV groups x
    3 reps x hd=64 -> P2 = 384 = 3 exact 128-lane tiles)."""
    return (
        num_kv_heads == _KV3_GEOM["KV"]
        and num_heads == _KV3_GEOM["KV"] * _KV3_GEOM["rep"]
        and head_dim == _KV3_GEOM["hd"]
    )


def build_q_tiled(qg: jax.Array) -> jax.Array:
    """(B, KV=3, rep=3, hd=64) roped queries -> the tiled kernel's
    (B, 16, 128) q layout: rows 0-2 = group-0 heads at lanes [0, 64),
    rows 3-5 = group-1 heads at lanes [64, 128), rows 8-10 = group-2
    heads at lanes [0, 64); all other rows/lanes zero. The row blocks
    are 8-aligned so the kernel's two M=8 score dots each see one
    128-lane tile of the packed cache row ([K0|K1] and [K2|V0])."""
    B, KV, rep, hd = qg.shape
    z = jnp.zeros((B, 8 - rep, hd), qg.dtype)
    zr = jnp.zeros((B, rep, hd), qg.dtype)
    t_left = jnp.concatenate([qg[:, 0], z], axis=1)  # (B, 8, 64) rows 0-2
    t_right = jnp.concatenate([zr, qg[:, 1], jnp.zeros((B, 8 - 2 * rep, hd), qg.dtype)], axis=1)
    top = jnp.concatenate([t_left, t_right], axis=2)  # (B, 8, 128)
    b_left = jnp.concatenate([qg[:, 2], z], axis=1)
    bot = jnp.concatenate([b_left, jnp.zeros((B, 8, hd), qg.dtype)], axis=2)
    return jnp.concatenate([top, bot], axis=1)  # (B, 16, 128)


def extract_o_tiled(out: jax.Array, dtype=None) -> jax.Array:
    """Tiled kernel output (B, 16, 256) -> (B, 1, 9*64) per-head outputs
    in head order h = g*rep + r. Lane map (see _kernel_tiled): rows 0-2
    own lanes [64,128) (V0 from the [K2|V0] tile), rows 3-5 lanes
    [128,192) (V1 from [V1|V2]), rows 8-10 lanes [64,128) of the second
    value dot pair = out lanes [64,128)."""
    B = out.shape[0]
    og0 = out[:, 0:3, 64:128]
    og1 = out[:, 3:6, 128:192]
    og2 = out[:, 8:11, 64:128]
    o = jnp.concatenate([og0, og1, og2], axis=1).reshape(B, 1, 9 * 64)
    return o if dtype is None else o.astype(dtype)


def _kernel_tiled(s_ref, q_ref, kv_ref, ex_ref, sc_ref, o_ref, kv_s, sc_s,
                  sem, *, B, S8, SP, P2, EP, CR, scale):
    """Group-tiled int8 decode attention (v0 geometry: KV=3, rep=3,
    hd=64, P2=384). The flat [K|V] row's three 128-lane tiles are
    [K0|K1], [K2|V0], [V1|V2]; with the build_q_tiled query layout the
    score side needs two M=8 K=128 int8 dots and the value side three
    M=8 N=128 int8 dots — 5x8x128 = 5,120 hw MACs per cache position vs
    the full-width kernel's 2x16x384 = 12,288 (2.4x fewer; the r4
    verdict's MAC-count attack, VERDICT.md item 1). DMA scaffolding is
    identical to _kernel."""
    layer = s_ref[0]
    flushed = s_ref[1]
    n_extra = s_ref[2]
    NC = B // CR

    def dma(slot, c):
        return [
            pltpu.make_async_copy(
                kv_ref.at[layer, pl.ds(c * CR, CR)], kv_s.at[slot],
                sem.at[slot, 0]),
            pltpu.make_async_copy(
                sc_ref.at[layer, pl.ds(c * CR, CR)], sc_s.at[slot],
                sem.at[slot, 1]),
        ]

    for d in dma(0, 0):
        d.start()

    cols = jax.lax.broadcasted_iota(jnp.int32, (HEAD_PAD, S8), 1)
    cmask = jnp.where(cols < flushed, 0.0, _NEG).astype(jnp.float32)
    ecols = jax.lax.broadcasted_iota(jnp.int32, (HEAD_PAD, EP), 1)
    emask = jnp.where(ecols < n_extra, 0.0, _NEG).astype(jnp.float32)

    def chunk(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < NC)
        def _():
            for d in dma(jax.lax.rem(c + 1, 2), c + 1):
                d.start()

        for d in dma(slot, c):
            d.wait()

        for r in range(CR):
            row = c * CR + r
            qf = q_ref[row].astype(jnp.float32)  # (16, 128)
            ex = ex_ref[row]  # (EP, P2) bf16
            kvb8 = kv_s[slot, r]  # (S8, 384) int8
            t0 = kvb8[:, 0:128]
            t1 = kvb8[:, 128:256]
            t2 = kvb8[:, 256:384]

            # Per-head-row int8 q (same numerics as the full-width
            # kernel: each row's 64 nonzero lanes set the same qmax).
            qmax = jnp.maximum(
                jnp.max(jnp.abs(qf), axis=1, keepdims=True), 1e-8
            )  # (16, 1) f32
            q8 = jnp.round(qf * (127.0 / qmax)).astype(jnp.int8)
            qA8, qB8 = q8[0:8], q8[8:16]
            sA = jax.lax.dot_general(
                qA8, t0, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)  # (8, S8)
            sB = jax.lax.dot_general(
                qB8, t1, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            s32 = jnp.concatenate([sA, sB], axis=0)  # (16, S8)
            ks_row = sc_s[slot, pl.ds(r, 1), pl.ds(0, S8)]  # (1, S8)
            s = (
                s32.astype(jnp.float32)
                * (qmax * (scale / 127.0))
                * ks_row.astype(jnp.float32)
            ) + cmask

            # Extras (bf16 dots; EP is tiny) with the same tile split.
            qA16 = qf[0:8].astype(ex.dtype)
            qB16 = qf[8:16].astype(ex.dtype)
            seA = jax.lax.dot_general(
                qA16, ex[:, 0:128], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            seB = jax.lax.dot_general(
                qB16, ex[:, 128:256], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s_e = jnp.concatenate([seA, seB], axis=0) * scale + emask

            m = jnp.maximum(
                jnp.max(s, axis=1, keepdims=True),
                jnp.max(s_e, axis=1, keepdims=True),
            )
            e = jnp.exp(s - m)
            e_e = jnp.exp(s_e - m)
            denom = (
                jnp.sum(e, axis=1, keepdims=True)
                + jnp.sum(e_e, axis=1, keepdims=True)
            )
            vs_row = sc_s[slot, pl.ds(r, 1), pl.ds(SP, S8)]
            w = e * vs_row.astype(jnp.float32)  # (16, S8)
            wmax = jnp.maximum(jnp.max(w, axis=1, keepdims=True), 1e-30)
            w8 = (w * (127.0 / wmax)).astype(jnp.int8)
            # Rows 0-2 (g0) need V0 = lanes [64,128) of t1; rows 3-5 (g1)
            # need V1 = lanes [0,64) of t2; rows 8-10 (g2) need V2 =
            # lanes [64,128) of t2. Two dots: rows 0-7 against t1 (g0's
            # V0) and ALL 16 rows against t2 (g1's V1 + g2's V2 land in
            # each row's own lane block). Off-block output lanes are
            # garbage weight sums (discarded by extract_o_tiled), same
            # contract as the full-width kernel's K-half columns. A
            # 3-dot (M=8 each) version was the first cut; merging the
            # t2 pair into one M=16 dot trades no MACs and drops one
            # fixed dot-pipeline fill per row.
            oA = jax.lax.dot_general(
                w8[0:8], t1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)  # (8, 128)
            oBC = jax.lax.dot_general(
                w8, t2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)  # (16, 128)
            # Extras value contributions (bf16), same split.
            e16 = e_e.astype(ex.dtype)
            oeA = jax.lax.dot_general(
                e16[0:8], ex[:, 128:256], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            oeBC = jax.lax.dot_general(
                e16, ex[:, 256:384], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            wm = wmax / 127.0
            left = (
                jnp.concatenate([oA, oBC[8:16]], axis=0).astype(jnp.float32)
                * wm
                + jnp.concatenate([oeA, oeBC[8:16]], axis=0)
            )  # rows 0-7: g0 V0 lanes; rows 8-15: g2 V2 lanes
            right = oBC.astype(jnp.float32) * wm + oeBC  # g1 V1 lanes
            o = jnp.concatenate([left, right], axis=1) / denom  # (16, 256)
            o_ref[row] = o.astype(o_ref.dtype)
        return _

    jax.lax.fori_loop(0, NC, chunk, None)


@functools.partial(jax.jit, static_argnames=("head_dim", "interpret"))
def flash_gqa_decode_tiled(
    q_tiled: jax.Array,  # (B, 16, 128) bf16 — build_q_tiled layout
    kv: jax.Array,       # (L, B, S8, 384) int8 packed cache
    scale_kv: jax.Array,  # (L, B, 2*SP) f32 merged [k|v] scales
    extra: jax.Array,    # (B, EP, 384) bf16 pending + current positions
    layer: jax.Array,
    flushed: jax.Array,
    n_extra: jax.Array,
    *,
    head_dim: int,
    interpret: bool = False,
) -> jax.Array:
    """Group-tiled int8 variant of flash_gqa_decode (v0 geometry only —
    gate with tiled_supported). Returns (B, 16, 256) bf16; extract
    per-head outputs with extract_o_tiled."""
    B, HP, QW = q_tiled.shape
    L, _, S8, P2 = kv.shape
    EP = extra.shape[1]
    if EP < 8:
        extra = jnp.pad(extra, ((0, 0), (0, 8 - EP), (0, 0)))
        EP = 8
    assert (HP, QW, P2) == (HEAD_PAD, 128, 384), (HP, QW, P2)
    assert S8 % 8 == 0, S8
    assert head_dim == 64, head_dim
    SP = lane_pad(S8)
    assert scale_kv is not None and scale_kv.shape == (L, B, 2 * SP)
    CR = min(CHUNK_ROWS, B)
    assert B % CR == 0, (B, CR)
    sm_scale = np.float32(1.0 / np.sqrt(head_dim))

    scalars = jnp.stack([
        jnp.asarray(layer, jnp.int32),
        jnp.asarray(flushed, jnp.int32),
        jnp.asarray(n_extra, jnp.int32),
    ])

    def kern(s_ref, q_ref, kv_ref, ex_ref, sc_ref, o_ref, kv_s, sc_s, sem):
        _kernel_tiled(
            s_ref, q_ref, kv_ref, ex_ref, sc_ref, o_ref, kv_s, sc_s, sem,
            B=B, S8=S8, SP=SP, P2=P2, EP=EP, CR=CR, scale=sm_scale,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # q_tiled
            pl.BlockSpec(memory_space=pl.ANY),      # kv (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # extras
            pl.BlockSpec(memory_space=pl.ANY),      # scales (manual DMA)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CR, S8, P2), kv.dtype),
            pltpu.VMEM((2, CR, 2 * SP), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, HP, 256), q_tiled.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 5 * B * 8 * (S8 + EP) * 128,
            bytes_accessed=B * S8 * P2 * kv.dtype.itemsize
            + extra.size * 2 + (q_tiled.size + B * HP * 256) * 2,
            transcendentals=B * HP * (S8 + EP),
        ),
    )(scalars, q_tiled, kv, extra, scale_kv)


def reference_packed_decode(q_dense, kv_layer, k_scale, v_scale, extra,
                            flushed, n_extra, *, head_dim):
    """jnp oracle with the kernel's layout contract, run at f32 WITHOUT
    the kernel's int8 q/w re-quantization (tests bound that error
    separately). kv_layer: (B, S8, P2) one layer's slab; k_scale/v_scale:
    (B, S8) or None; extra: (B, EP, P2). Returns (B, HP, P2) f32
    normalized (K-lane columns are the same garbage weight sums the
    kernel produces)."""
    B, HP, P2 = q_dense.shape
    S8 = kv_layer.shape[1]
    EP = extra.shape[1]
    scale = 1.0 / np.sqrt(head_dim)
    kvf = kv_layer.astype(jnp.float32)
    qf = q_dense.astype(jnp.float32)
    exf = extra.astype(jnp.float32)
    s = jnp.einsum("bhd,bsd->bhs", qf, kvf) * scale
    if k_scale is not None:
        s = s * k_scale[:, None, :]
    mask = jnp.arange(S8)[None, None, :] < flushed
    s = jnp.where(mask, s, _NEG)
    s_e = jnp.einsum("bhd,bed->bhe", qf, exf) * scale
    emask = jnp.arange(EP)[None, None, :] < n_extra
    s_e = jnp.where(emask, s_e, _NEG)
    m = jnp.maximum(s.max(-1, keepdims=True), s_e.max(-1, keepdims=True))
    e = jnp.exp(s - m)
    e_e = jnp.exp(s_e - m)
    d = e.sum(-1, keepdims=True) + e_e.sum(-1, keepdims=True)
    if v_scale is not None:
        e = e * v_scale[:, None, :]
    o = jnp.einsum("bhs,bsd->bhd", e, kvf)
    o = o + jnp.einsum("bhe,bed->bhd", e_e, exf)
    return o / d
