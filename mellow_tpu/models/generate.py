"""Jitted autoregressive generation with a static KV cache.

Replaces the reference's Python decode loop (mellow/wrapper.py:197-256) which
re-ran the full LM over the growing sequence each step with no KV cache
(SURVEY.md section 3.4 Q3). Semantics preserved exactly:

  * Decoding is greedy: the reference's top-p filter + argmax always selects
    the max-probability token (wrapper.py:220-232, SURVEY.md section 3.4 Q1), so the
    parity path is a single fused argmax. True top-p/temperature sampling is
    offered as a new, non-parity feature (``sample=True``).
  * No per-row early exit: the loop stops only when every row has emitted the
    stop token at least once, or after ``max_len`` steps (wrapper.py:247-248).
    Rows keep generating real tokens after their stop; the wrapper discards
    them at detokenize time, exactly like the reference's string split
    (wrapper.py:254).

The whole loop (prefill + while_loop over decode steps) is inside one jit:
no host round-trips per token.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mellow_tpu.models import llama
from mellow_tpu.models.llama import KVCache


class GenerateResult(NamedTuple):
    tokens: jax.Array  # (B, max_len) int32; valid up to num_steps
    num_steps: jax.Array  # scalar int32: steps actually executed
    cache: object = None  # final KV-cache buffers, returned iff the call
    # passed ``cache_buffers`` (donated) — recycle into the next call


def seen_mask(tokens: jax.Array, valid: jax.Array, vocab_size: int) -> jax.Array:
    """(B, V) bool: True where a row has emitted/contains that token.
    ``tokens``: (B, T) int ids; ``valid``: broadcastable bool over (B, T)."""
    B = tokens.shape[0]
    return jnp.zeros((B, vocab_size), bool).at[
        jnp.arange(B)[:, None], tokens
    ].max(jnp.broadcast_to(valid, tokens.shape))


def _apply_penalty(logits, seen, repetition_penalty):
    """CTRL/HF repetition penalty: divide positive, multiply negative
    logits of already-seen tokens."""
    pen = jnp.where(
        logits > 0, logits / repetition_penalty, logits * repetition_penalty
    )
    return jnp.where(seen, pen, logits)


def warp_logits(
    logits: jax.Array,  # (B, V)
    *,
    top_p: float = 1.0,
    temperature: float = 1.0,
    top_k: int = 0,
    repetition_penalty: float = 1.0,
    seen: Optional[jax.Array] = None,  # (B, V) bool: tokens to penalize
) -> jax.Array:
    """Filtered-logits transform, exactly the HF logits-processor stack in
    its default order (RepetitionPenaltyLogitsProcessor -> temperature ->
    TopKLogitsWarper -> TopPLogitsWarper); removed tokens become -inf.
    Cross-checked token-exact against the HF implementations in
    tests/test_sampling.py. The reference's (dead) top-p convention at
    /root/reference/mellow/wrapper.py:219-232 is the same keep-rule:
    smallest set of top tokens whose mass reaches top_p, top-1 always kept.
    """
    # NOTE: top_p / temperature / repetition_penalty may be TRACED values
    # (generate() takes them as jit arguments), so Python branches are only
    # allowed on concretely-Python numbers.
    def _concrete(x):
        return isinstance(x, (int, float))

    if seen is not None and not (_concrete(repetition_penalty) and repetition_penalty == 1.0):
        logits = _apply_penalty(logits, seen, repetition_penalty)
    # x / 1.0 is a bit-exact identity, so the division applies unconditionally.
    logits = logits / jnp.maximum(temperature, 1e-6)
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    if top_k:
        kth = sorted_logits[:, min(top_k, logits.shape[-1]) - 1][:, None]
        logits = jnp.where(logits >= kth, logits, -jnp.inf)
        sorted_logits = jnp.where(
            jnp.arange(sorted_logits.shape[-1])[None, :] < top_k,
            sorted_logits, -jnp.inf,
        )
    if not (_concrete(top_p) and top_p >= 1.0):
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep tokens whose exclusive cumulative prob < top_p; always keep
        # top-1 (HF min_tokens_to_keep=1).
        cutoff_mask = cum - probs < top_p
        cutoff_mask = cutoff_mask.at[:, 0].set(True)
        # Threshold logit: smallest kept logit per row.
        min_kept = jnp.min(
            jnp.where(cutoff_mask, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits >= min_kept, logits, -jnp.inf)
    return logits


_REJECT_MISS_TARGET = 1e-6  # acceptable all-miss (-> argmax fallback) prob
_REJECT_MIN_TOP_P = 0.35  # below this, draws needed > _REJECT_MAX_DRAWS
_REJECT_MAX_DRAWS = 32


def _reject_draws(top_p: float) -> int:
    """Draw count R such that the all-miss probability (1 - top_p)^R
    stays under _REJECT_MISS_TARGET — the kept mass is only guaranteed
    >= top_p, so a FIXED R=8 skews small-top_p rows toward the argmax
    fallback (ADVICE r4: at top_p=0.05 a fixed 8 misses ~66% of rows).
    Multiples of 8 keep the (B, R) draw tensors sublane-aligned."""
    import math

    p = min(max(float(top_p), 1e-3), 0.999)
    r = math.ceil(math.log(_REJECT_MISS_TARGET) / math.log1p(-p))
    return min(_REJECT_MAX_DRAWS, max(8, -(-r // 8) * 8))


def _reject_sample(
    logits: jax.Array, top_p, rng: jax.Array, *, draws: Optional[int] = None
) -> jax.Array:
    """Exact nucleus sampling with NO sort, for ANY logit distribution.

    warp_logits' kept set is value-thresholded: token t is kept iff
    ``logit_t >= min_kept``, which is equivalent to ``E_t < top_p`` where
    ``E_t = sum(probs[logits > logit_t])`` is the strictly-greater mass
    (the equivalence covers warp_logits' tie-group-superset semantics:
    every token tied at the boundary value is kept). So nucleus sampling
    is rejection sampling from the FULL softmax with membership test
    ``E_t < top_p`` — acceptance probability is the kept mass, >= top_p
    by construction.

    Per row we draw ``_reject_draws(top_p)`` iid candidates by inverse-CDF
    (cumsum + searchsorted — no sort; the CDF is reused across draws) and
    take the first accepted; a row whose draws all miss (probability
    (1-kept_mass)^R <= _REJECT_MISS_TARGET by the R schedule) falls back
    to its argmax, which is always in the kept set. Callers route
    top_p < _REJECT_MIN_TOP_P to the exact warp_logits sort instead
    (_fast_sample) — there the required R exceeds _REJECT_MAX_DRAWS.
    Cost is O(B*V) elementwise + an O(B*V*R) acceptance reduce — measured
    ~0.18 ms at (64, 49152) R=8 vs ~3.4 ms for the r3 full-vocab sort
    (which made sampled decode 5x slower than greedy).

    ``top_p`` may also be a traced (B,) vector (continuous batching's
    per-request knob); then ``draws`` must supply the static R (use the
    schedule for the smallest supported top_p).

    Two-STAGE draws (r5): the O(B*V*R) acceptance reduce is the
    sampler's dominant cost (it streams the (B, V) probs R times), and
    the r4 draw-count fix doubled R at the serving default — measured
    0.80x -> 0.73x of greedy. Stage 1 runs 8 draws (per-row miss
    probability (1-top_p)^8, 2.6e-6 at top_p=0.8); the remaining R-8
    draws live behind a ``lax.cond`` taken only when some row actually
    missed — the expensive branch compiles in but almost never executes
    at serving knobs, so the common-path cost is the old R=8 sampler
    while the all-miss guarantee (<= _REJECT_MISS_TARGET across the
    knob range, ADVICE r4) is unchanged."""
    B, V = logits.shape
    R = _reject_draws(top_p) if draws is None else draws
    lf = logits.astype(jnp.float32)
    probs = jax.nn.softmax(lf, axis=-1)
    cdf = jnp.cumsum(probs, axis=-1)  # (B, V) nondecreasing
    tpv = jnp.asarray(top_p, jnp.float32)
    tpb = tpv if tpv.ndim == 0 else tpv[:, None]

    def draw_pass(key, r):
        u = jax.random.uniform(key, (B, r), jnp.float32) * cdf[:, -1:]
        cand = jax.vmap(jnp.searchsorted)(cdf, u)  # (B, r) token ids
        cand = jnp.minimum(cand, V - 1).astype(jnp.int32)
        cl = jnp.take_along_axis(lf, cand, axis=1)  # (B, r) cand logits
        # Strictly-greater mass per candidate: one (B, V, r) reduce.
        E = jnp.sum(
            jnp.where(lf[:, :, None] > cl[:, None, :], probs[:, :, None], 0.0),
            axis=1,
        )  # (B, r)
        acc = E < tpb
        first = jnp.argmax(acc, axis=1)  # first accepted draw (0 if none)
        tok = jnp.take_along_axis(cand, first[:, None], axis=1)[:, 0]
        return jnp.any(acc, axis=1), tok

    gmax = jnp.argmax(lf, axis=-1).astype(jnp.int32)
    k1, k2 = jax.random.split(rng)
    R1 = min(R, 8)
    ok1, tok1 = draw_pass(k1, R1)
    if R <= R1:
        return jnp.where(ok1, tok1, gmax).astype(jnp.int32)

    def topup(_):
        ok2, tok2 = draw_pass(k2, R - R1)
        return jnp.where(ok1, tok1, jnp.where(ok2, tok2, gmax))

    return jax.lax.cond(
        jnp.all(ok1), lambda _: tok1, topup, operand=None
    ).astype(jnp.int32)


def _fast_sample(
    logits: jax.Array,  # (B, V)
    *,
    top_p: float,
    temperature: float,
    top_k: int,
    rng: jax.Array,
    repetition_penalty: float = 1.0,
    seen: Optional[jax.Array] = None,
) -> jax.Array:
    """Nucleus/top-k sampling WITHOUT a vocab-wide sort in the hot path.

    ``warp_logits`` (the exact HF-parity transform) sorts the full
    (B, 49152) vocabulary every step — measured as the dominant cost of
    sampled decode (~3.4 ms at B=64). Route by knobs:

    * pure top-p >= _REJECT_MIN_TOP_P (the serving default):
      ``_reject_sample`` — sort-free exact rejection sampling, ~0.18 ms,
      any distribution, draw count scaled to top_p. (The r4 first
      attempt used a ``lax.top_k(64)`` prefilter here; measured, TPU
      lowers top_k to a full sort — just as slow as what it replaced.)
    * pure top-p < _REJECT_MIN_TOP_P (rare near-greedy knob): the exact
      ``warp_logits`` sort — rejection would need > _REJECT_MAX_DRAWS
      draws per step to keep the argmax-fallback probability negligible
      (ADVICE r4), and correctness beats speed on an off-default knob.
    * ``top_k`` set: the prefilter below — ``lax.top_k``'s sort is then
      semantically required (the kept set is the top-k itself), and
      top-p applies inside the k candidates:

    Token ids drawn are always inside the exact HF kept set
    (tests/test_sampling.py); the draws consume the key differently from
    the r3 full-sort path for the same seed — valid draws from the
    identical filtered distribution.
    """
    if seen is not None and repetition_penalty != 1.0:
        logits = _apply_penalty(logits, seen, repetition_penalty)
    logits = logits / jnp.maximum(temperature, 1e-6)
    V = logits.shape[-1]
    want_top_k = 0 < top_k < V
    want_top_p = top_p < 1.0
    if not want_top_k and not want_top_p:
        return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)
    if want_top_p and not want_top_k:
        if top_p >= _REJECT_MIN_TOP_P:
            return _reject_sample(logits, top_p, rng)
        filtered = warp_logits(logits, top_p=top_p)
        return jax.random.categorical(rng, filtered, axis=-1).astype(jnp.int32)

    # top_k set: the sort is the kept-set rule itself. NOTE an edge case:
    # lax.top_k keeps exactly k entries while warp_logits' value threshold
    # (logits >= kth) keeps every token TIED at the k-th value, and those
    # ties also enter its top-p softmax denominator — so for tied logits
    # this draws from a strict SUBSET of the HF kept set with a slightly
    # smaller denominator (measure-zero for real checkpoints; the
    # membership tests in test_sampling.py remain valid since a subset
    # draw is still inside the HF kept set).
    k = min(V, top_k)
    vals, idx = jax.lax.top_k(logits, k)  # (B, k) descending

    def draw(r, cand_logits):
        c = jax.random.categorical(r, cand_logits, axis=-1)
        return jnp.take_along_axis(idx, c[:, None], axis=1)[:, 0].astype(
            jnp.int32
        )

    if not want_top_p:
        return draw(rng, vals)
    # top-p confined to the k candidates, probabilities under the
    # top_k-masked softmax (warp_logits' order: top-k mask, then top-p
    # over the masked row — the -inf'd tail contributes nothing to the
    # denominator).
    m = vals[:, :1]  # row max (top_k output is sorted)
    denom = jnp.sum(jnp.exp(vals - m), axis=-1, keepdims=True)
    probs = jnp.exp(vals - m) / denom
    cum = jnp.cumsum(probs, axis=-1)
    keep = cum - probs < top_p  # exclusive cumulative mass
    keep = keep.at[:, 0].set(True)
    kept_vals = jnp.where(keep, vals, -jnp.inf)
    return draw(rng, kept_vals)


def _sample_token(
    logits: jax.Array,
    *,
    greedy: bool,
    top_p: float,
    temperature: float,
    rng: Optional[jax.Array],
    top_k: int = 0,
    repetition_penalty: float = 1.0,
    prev_tokens: Optional[jax.Array] = None,  # (B, T) emitted so far
    step: Optional[jax.Array] = None,  # scalar: # valid cols in prev_tokens
    prompt_seen: Optional[jax.Array] = None,  # (B, V) bool: prompt tokens
) -> jax.Array:
    """Greedy parity path, or real nucleus sampling (new feature) with the
    standard serving knobs: ``top_k`` (0 = off), ``repetition_penalty``
    (>1.0 divides positive / multiplies negative logits of already-seen
    tokens, the CTRL/HF convention). ``prompt_seen`` seeds the penalty mask
    with the prompt's token ids (HF penalizes the full input_ids, not just
    generated tokens); the audio-prefix positions have no token ids and are
    never penalized."""
    seen = None
    if repetition_penalty != 1.0:
        if prev_tokens is not None:
            cols = jnp.arange(prev_tokens.shape[1])[None, :]
            seen = seen_mask(prev_tokens, cols < step, logits.shape[-1])
        if prompt_seen is not None:
            seen = prompt_seen if seen is None else jnp.logical_or(seen, prompt_seen)
    if greedy:
        # Fast path: temperature / top-k / top-p never change the argmax, so
        # only the penalty (which can) is applied.
        if seen is not None:
            logits = warp_logits(
                logits, repetition_penalty=repetition_penalty, seen=seen
            )
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if (
        isinstance(top_p, (int, float))
        and isinstance(temperature, (int, float))
        and isinstance(repetition_penalty, (int, float))
        and isinstance(top_k, int)
    ):
        # generate() declares the knobs static, so the decode loop always
        # lands here: the fast top-k-prefiltered sampler (no vocab-wide
        # sort per sub-step — VERDICT r3 item 2).
        return _fast_sample(
            logits, top_p=float(top_p), temperature=float(temperature),
            top_k=top_k, rng=rng,
            repetition_penalty=float(repetition_penalty), seen=seen,
        )
    filtered = warp_logits(
        logits, top_p=top_p, temperature=temperature, top_k=top_k,
        repetition_penalty=repetition_penalty, seen=seen,
    )
    return jax.random.categorical(rng, filtered, axis=-1).astype(jnp.int32)


def _fused_decode_auto(
    cfg, family: str, dtype, cache_dtype: str, B: int, S_total: int, W: int
) -> bool:
    """Gate for the packed-cache fused Pallas decode path
    (llama.decode_step_packed): llama family, bf16 compute on TPU,
    bf16/int8 cache, kernel VMEM footprint within budget.

    bf16 caches only, by the r3 measurement (the cache stream is
    bandwidth-bound and the packed layout's 25% byte cut wins — B=64:
    26.2k -> 29.0k tok/s, +10%). int8 caches KEEP THE EINSUM (measured
    r5): the group-tiled kernel cut the attention dots 2.4x and won the
    isolated chained-step harness at every batch (5.66 -> 5.01 ms/step
    at B=256, exp_decode_attn3.py), but in the REAL windowed generate
    loop it loses at every batch (B=64 -2.4%, B=128 -6.7%, B=256 -1.5%,
    B=512 -0.6%): per-op profiles attribute it — the einsum path's
    cache-read fusions already stream at the 706 GB/s roofline in the
    real loop (48+47 us/layer at B=256) while the tiled kernel runs
    compute-walled at ~106 us/layer (vs its 75 us DMA floor), and the
    packed path adds ~0.35 ms/step of extras-buffer machinery. The
    kernel remains available per-call with ``fused_decode=True``
    (benchmarks/README.md, r5 decode section).

    Kill switches: MELLOW_TPU_DISABLE_FUSED_ATTN (global, advisor r2) and
    MELLOW_TPU_DISABLE_FUSED_DECODE (this path only); tests force it on
    CPU with MELLOW_TPU_FORCE_FUSED_DECODE=interpret (trace-time reads,
    same jit-cache caveat as the other kernel knobs)."""
    import os

    if family != "llama":
        return False
    if os.environ.get("MELLOW_TPU_DISABLE_FUSED_ATTN") or os.environ.get(
        "MELLOW_TPU_DISABLE_FUSED_DECODE"
    ):
        return False
    forced = bool(os.environ.get("MELLOW_TPU_FORCE_FUSED_DECODE"))
    if not forced and not (
        jax.default_backend() in ("tpu", "axon") and dtype == jnp.bfloat16
    ):
        return False
    if jnp.dtype(cache_dtype) not in (jnp.int8, jnp.bfloat16, jnp.float32):
        return False
    if not forced and jnp.dtype(cache_dtype) == jnp.float32:
        return False  # fp32: parity mode keeps the einsum
    if jnp.dtype(cache_dtype) == jnp.int8:
        from mellow_tpu.ops.pallas_decode_attention import tiled_supported

        if not tiled_supported(cfg.num_heads, cfg.num_kv_heads, cfg.head_dim):
            return False  # tiled kernel is v0-geometry-specialized
        if not forced:
            return False  # int8: einsum wins the real loop (docstring)
    from mellow_tpu.ops.pallas_decode_attention import vmem_bytes

    S8 = -(-S_total // 8) * 8
    P2 = llama.PackedKVCache.packed_dim(cfg)
    itemsize = jnp.dtype(cache_dtype).itemsize
    return vmem_bytes(B, S8, P2, max(W, 8), itemsize) <= 14 * 1024 * 1024


class DecodeState(NamedTuple):
    """Decode while_loop state. Also the unit the cascade driver
    (``generate_cascade``) compacts between stages — every per-row field
    keeps batch as its leading axis (cache batch axis is 1)."""

    cache: KVCache  # or GPT2Cache / llama.PackedKVCache
    tokens: jax.Array  # (B, ML)
    last_hidden: jax.Array  # (B, D)
    t: jax.Array  # scalar int32, multiple of W
    done: jax.Array  # (B,) bool
    rng: jax.Array
    prompt_seen: Optional[jax.Array] = None  # (B, V) repetition-penalty seed


def _effective_window(flush_window, max_len: int, greedy: bool,
                      batch: int = 0) -> int:
    if flush_window is None:
        # Batch-adaptive default (measured, v5e-1 int8/int8 steady-state):
        # each pending entry a sub-step carries costs ~0.13 ms/step at
        # B=256 (per-entry slices/einsums), so large batches prefer a
        # shorter window — W=4: 49.6k vs W=8: 48.6k vs W=2: 48.0k tok/s
        # at B=256; at B=64 the entries are cheap and the flush save
        # dominates — W=8: 40.7k vs W=4: 39.3k (r2 sweep). Re-swept at
        # B=512 w8a8 (r5): W=4 50.4k / W=6 50.5k (noise) / W=8 49.6k /
        # W=2 48.4k — the optimum holds.
        flush_window = 4 if batch > 128 else 8
    # Sampling no longer caps the window: _fast_sample replaced the
    # per-sub-step vocab-wide sort with a top-64 prefilter (the r3 cap of
    # 2 existed to bound program size when every unrolled sub-step inlined
    # a full (B, 49152) sort).
    return max(1, min(flush_window, max_len))


def _flatten_cache(cache):
    """Cache pytree -> same pytree with every leaf reshaped to 1-D. The
    donation boundary uses FLAT leaves deliberately: a 1-D array has
    exactly one layout, so the donated parameter and the aliased output
    cannot disagree with the program's internal (default) layout. With
    4-D leaves, XLA's layout assignment picked {3,1,2,0} for the
    donated parameter/output pair and then inserted whole-cache relayout
    copies PLUS out-of-place commit DUS (~2 x 30 ms at B=256, profiled) —
    slower than the zero pad the donation was meant to remove. The
    in-program reshape from 1-D back to the default-layout 4-D view is a
    bitcast."""
    return jax.tree.map(lambda a: a.reshape(-1), cache)


def alloc_cache_buffers(
    cfg, B: int, P: int, *, max_len: int, cache_dtype: str,
    family: str = "llama", flush_window: Optional[int] = None,
    greedy: bool = True, fused_decode: Optional[bool] = None,
    dtype=jnp.bfloat16,
):
    """Allocate KV-cache buffers sized exactly as ``generate`` would for
    these call parameters (same W / fused-decode resolution), for use as
    its ``cache_buffers`` argument. One-time zeros cost; every subsequent
    generate call recycles ``result.cache`` and skips the in-program
    whole-buffer zero pad. ``P`` is the prefix length. The returned
    pytree's leaves are FLAT 1-D buffers (see _flatten_cache) — opaque to
    callers, meaningful only as ``cache_buffers``."""
    from mellow_tpu.models.decoders import get_decoder_ops

    W = _effective_window(flush_window, max_len, greedy, B)
    S = P + -(-max_len // W) * W
    if fused_decode is None:
        fused_decode = _fused_decode_auto(
            cfg, family, jnp.dtype(dtype), cache_dtype, B, S, W
        )
    if fused_decode:
        cache = llama.PackedKVCache.create(cfg, B, S, jnp.dtype(cache_dtype))
    else:
        cache = get_decoder_ops(family).create_cache(
            cfg, B, S, jnp.dtype(cache_dtype)
        )
    return _flatten_cache(cache)


def _reusable_cache(buffers, fused_decode, ref_cache):
    """Trace-time check + reconstruction: ``buffers`` (a prior call's
    final cache, flat leaves) matches the pytree structure, sizes and
    dtypes a fresh cache would have — then return it reshaped to the
    cache's shapes (bitcast views of the donated parameters, which makes
    the prefill commit an in-place row write instead of a whole-buffer
    zero pad). Returns None on any mismatch (caller keeps the fresh
    zeros cache)."""
    if buffers is None:
        return None
    if fused_decode != isinstance(buffers, llama.PackedKVCache):
        return None
    try:
        ok = jax.tree.all(
            jax.tree.map(
                lambda a, b: a.size == b.size and a.dtype == b.dtype
                and a.ndim == 1,
                buffers, ref_cache,
            )
        )
    except ValueError:  # mismatched pytree structure
        return None
    if not ok:
        return None
    return jax.tree.map(lambda a, b: a.reshape(b.shape), buffers, ref_cache)


def _init_state(
    params, cfg, prefix_embeds, *, max_len, cache_dtype, family, W, rng,
    initial_done, repetition_penalty, prompt_tokens, prompt_mask,
    prefill_chunk=None, w8a8=False, fused_decode=False, cache_buffers=None,
) -> DecodeState:
    """Prefill + initial decode state (cache.length == P: every prefix
    position is flushed; pending starts empty and is always empty again at
    window boundaries, so the loop state has a static pytree structure).

    ``cache_buffers``: a previous call's final cache (donated by the
    caller). When its shapes match, it replaces the zeros-create: XLA
    aliases the donated input, the prefill commit updates rows in place,
    and the whole-buffer zero pad (2.8 ms device at B=256 w8a8, profiled
    in benchmarks/README.md) disappears. Stale positions are harmless:
    every attention path masks by ``length``/``flushed`` before the
    softmax, pad lanes are ignored by the block-diagonal queries, and the
    values are finite (they were written by a previous run of this same
    program). ``length`` is reset to zero."""
    from mellow_tpu.models.decoders import get_decoder_ops

    ops = get_decoder_ops(family)
    B, P, D = prefix_embeds.shape
    ML = -(-max_len // W) * W  # token buffer rounded up to whole windows
    if fused_decode:
        cache = llama.PackedKVCache.create(cfg, B, P + ML, jnp.dtype(cache_dtype))
    else:
        cache = ops.create_cache(cfg, B, P + ML, jnp.dtype(cache_dtype))
    reused = _reusable_cache(cache_buffers, fused_decode, cache)
    if reused is not None:
        cache = reused._replace(length=jnp.zeros((), jnp.int32))
    if family == "llama":
        hidden, cache = ops.prefill(
            params, cfg, prefix_embeds, cache, chunk=prefill_chunk, w8a8=w8a8
        )
    else:
        if w8a8:
            raise ValueError("w8a8 prefill is llama-family only")
        hidden, cache = ops.prefill(params, cfg, prefix_embeds, cache)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    prompt_seen = None
    if repetition_penalty != 1.0 and prompt_tokens is not None:
        pm = (
            jnp.ones(prompt_tokens.shape, bool)
            if prompt_mask is None
            else prompt_mask
        )
        prompt_seen = seen_mask(
            prompt_tokens, pm, ops.embed_table(params).shape[0]
        )
    return DecodeState(
        cache=cache,
        tokens=jnp.zeros((B, ML), jnp.int32),
        last_hidden=hidden,
        t=jnp.zeros((), jnp.int32),
        done=jnp.zeros((B,), bool) if initial_done is None else initial_done,
        rng=rng,
        prompt_seen=prompt_seen,
    )


def _window_body(
    params, cfg, state: DecodeState, *, family, stop_token_id,
    greedy, top_p, temperature, top_k, repetition_penalty, W,
):
    """Build the one-flush-window step function over ``state``'s shapes:
    W unrolled sub-steps (sample token -> decode step) + one cache flush.
    Shared by the while_loop drivers (_decode_loop) and the streaming
    generator (generate_stream), which runs it one window per host
    iteration."""
    from mellow_tpu.models.decoders import get_decoder_ops

    ops = get_decoder_ops(family)
    dtype = state.last_hidden.dtype
    packed = isinstance(state.cache, llama.PackedKVCache)
    S_max = (state.cache.kv if packed else state.cache.k).shape[2]

    if family == "llama":
        cos_np, sin_np = llama.rope_tables(cfg, S_max, dtype)
        cos_full, sin_full = jnp.asarray(cos_np), jnp.asarray(sin_np)

        if packed:
            import os

            interp = (
                os.environ.get("MELLOW_TPU_FORCE_FUSED_DECODE") == "interpret"
            )

            def step_packed(tok_embed, cache, extras, i):
                return llama.decode_step_packed(
                    params, cfg, tok_embed, cache, cos_full, sin_full,
                    extras, i, interpret=interp,
                )

        def step(tok_embed, cache, pending):
            return llama.decode_step(
                params, cfg, tok_embed, cache, cos_full, sin_full, pending
            )
    else:

        def step(tok_embed, cache, pending):
            return ops.decode_step(params, cfg, tok_embed, cache, pending)

    embed_table = ops.embed_table(params)

    def body(s: DecodeState):
        cache, tokens, hidden, done, rng = (
            s.cache, s.tokens, s.last_hidden, s.done, s.rng
        )
        pending = None
        if packed:
            # The window's un-flushed k/v rows live in ONE fixed buffer
            # the fused kernel consumes (llama.decode_step_packed) — no
            # growing per-entry pending machinery.
            pending = jnp.zeros(
                (cfg.num_layers, tokens.shape[0], W,
                 llama.PackedKVCache.packed_dim(cfg)),
                dtype,
            )
        for i in range(W):  # static unroll: pending grows 0 -> W entries
            logits = ops.logits_from_hidden(params, cfg, hidden)
            step_rng, rng = jax.random.split(rng)
            next_tok = _sample_token(
                logits, greedy=greedy, top_p=top_p, temperature=temperature,
                rng=step_rng, top_k=top_k,
                repetition_penalty=repetition_penalty,
                prev_tokens=tokens, step=s.t + i, prompt_seen=s.prompt_seen,
            )
            tokens = jax.lax.dynamic_update_slice(
                tokens, next_tok[:, None], (0, s.t + i)
            )
            done = jnp.logical_or(done, next_tok == stop_token_id)
            tok_embed = embed_table[next_tok].astype(dtype)  # (B, D)
            if packed:
                hidden, pending = step_packed(tok_embed, cache, pending, i)
            else:
                hidden, cache, pending = step(tok_embed, cache, pending)
        if packed:
            cache = llama.flush_packed(cfg, cache, pending, W)
        else:
            cache = ops.flush_pending(cfg, cache, pending)
        return DecodeState(
            cache, tokens, hidden, s.t + W, done, rng, s.prompt_seen
        )

    return body


def _decode_loop(
    params, cfg, state: DecodeState, *, family, max_len, stop_token_id,
    greedy, top_p, temperature, top_k, repetition_penalty, W,
    alive_threshold: int = 0,
) -> DecodeState:
    """The windowed decode while_loop. Runs until ``max_len`` or until the
    number of unfinished rows drops to ``alive_threshold`` (0 = all done,
    the plain path; the cascade driver uses B/2 to trigger compaction)."""
    body = _window_body(
        params, cfg, state, family=family, stop_token_id=stop_token_id,
        greedy=greedy, top_p=top_p, temperature=temperature, top_k=top_k,
        repetition_penalty=repetition_penalty, W=W,
    )

    def cond(s: DecodeState):
        return jnp.logical_and(
            s.t < max_len, jnp.sum(~s.done) > alive_threshold
        )

    return jax.lax.while_loop(cond, body, state)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "family", "stop_token_id", "greedy", "top_p", "temperature",
        "top_k", "repetition_penalty", "W",
    ),
)
def _one_window(
    params, cfg, state: DecodeState, *, family, stop_token_id, greedy,
    top_p, temperature, top_k, repetition_penalty, W,
) -> DecodeState:
    """Exactly one flush window (W sub-steps + flush), jitted — the unit
    ``generate_stream`` advances between yields."""
    body = _window_body(
        params, cfg, state, family=family, stop_token_id=stop_token_id,
        greedy=greedy, top_p=top_p, temperature=temperature, top_k=top_k,
        repetition_penalty=repetition_penalty, W=W,
    )
    return body(state)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_len", "stop_token_id", "greedy", "cache_dtype", "family",
        "flush_window", "top_k", "repetition_penalty", "prefill_chunk",
        "w8a8", "fused_decode",
        # top_p/temperature are STATIC so the decode loop sees concrete
        # Python floats and takes the _fast_sample path (top-k prefilter,
        # no vocab-wide sort); greedy ignores them, and serving reuses a
        # handful of knob values — one compile each, like top_k.
        "top_p", "temperature",
    ),
    donate_argnames=("cache_buffers",),
)
def generate(
    params,
    cfg,  # LlamaConfig or GPT2Config (matching ``family``)
    prefix_embeds: jax.Array,  # (B, P, D)
    *,
    max_len: int,
    stop_token_id: int,
    greedy: bool = True,
    top_p: float = 0.8,
    temperature: float = 1.0,
    rng: Optional[jax.Array] = None,
    cache_dtype: str = "float32",
    initial_done: Optional[jax.Array] = None,  # (B,) bool: padding rows
    family: str = "llama",
    flush_window: Optional[int] = None,  # None = batch-adaptive (4 / 8)
    top_k: int = 0,
    repetition_penalty: float = 1.0,
    prompt_tokens: Optional[jax.Array] = None,  # (B, T) ids seeding the
    # repetition-penalty mask (HF penalizes prompt + generated tokens)
    prompt_mask: Optional[jax.Array] = None,  # (B, T) bool: real (non-pad)
    prefill_chunk: Optional[int] = None,  # llama.prefill batch chunking
    w8a8: bool = False,  # W8A8 prefill MLP (llama + int8 weights only)
    fused_decode: Optional[bool] = None,  # packed-cache Pallas decode
    # (None = auto: llama + bf16-on-TPU + int8/bf16 cache; sharded runs
    # pass False — the custom call does not partition under a mesh)
    cache_buffers=None,  # a prior same-shape call's ``result.cache``,
    # DONATED: removes the prefill commit's whole-buffer zero pad (the
    # result then carries the final cache to recycle into the next call)
) -> GenerateResult:
    """``flush_window`` (W): decode steps per KV-cache flush. The per-step
    cache scatter is RMW-tile bound — writing W rows costs the same as one
    (profiled 62 us/buffer at B=64) — so the loop body unrolls W sub-steps
    whose k/v ride as single-position ``pending`` entries and flushes once.
    Measured on v5e-1 at B=64 int8: W=1 38.8k, W=4 39.3k, W=8 40.7k tok/s
    steady-state (the win is bounded by the extra per-layer pending slices
    each sub-step streams). Token strings are unaffected in float-cache
    modes (identical math; stop handling may run up to W-1 extra discarded
    steps, which the reference's no-early-exit trim also produces,
    wrapper.py:247-254); int8 caches see slightly HIGHER fidelity for the
    trailing window (pending rides unquantized)."""
    B, P, _ = prefix_embeds.shape
    W = _effective_window(flush_window, max_len, greedy, B)
    if fused_decode is None:
        fused_decode = _fused_decode_auto(
            cfg, family, prefix_embeds.dtype, cache_dtype, B,
            P + -(-max_len // W) * W, W,
        )
    state = _init_state(
        params, cfg, prefix_embeds, max_len=max_len, cache_dtype=cache_dtype,
        family=family, W=W, rng=rng, initial_done=initial_done,
        repetition_penalty=repetition_penalty, prompt_tokens=prompt_tokens,
        prompt_mask=prompt_mask, prefill_chunk=prefill_chunk, w8a8=w8a8,
        fused_decode=fused_decode, cache_buffers=cache_buffers,
    )
    final = _decode_loop(
        params, cfg, state, family=family, max_len=max_len,
        stop_token_id=stop_token_id, greedy=greedy, top_p=top_p,
        temperature=temperature, top_k=top_k,
        repetition_penalty=repetition_penalty, W=W, alive_threshold=0,
    )
    return GenerateResult(
        tokens=final.tokens[:, :max_len],
        num_steps=jnp.minimum(final.t, max_len),
        # Flat leaves: one possible layout, so the aliased output and the
        # next call's donated parameter agree (see _flatten_cache).
        cache=_flatten_cache(final.cache) if cache_buffers is not None
        else None,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_len", "cache_dtype", "family", "W", "repetition_penalty",
        "prefill_chunk", "w8a8", "fused_decode",
    ),
)
def _cascade_prefill(
    params, cfg, prefix_embeds, rng, initial_done, prompt_tokens, prompt_mask,
    *, max_len, cache_dtype, family, W, repetition_penalty, prefill_chunk,
    w8a8=False, fused_decode=False,
) -> DecodeState:
    return _init_state(
        params, cfg, prefix_embeds, max_len=max_len, cache_dtype=cache_dtype,
        family=family, W=W, rng=rng, initial_done=initial_done,
        repetition_penalty=repetition_penalty, prompt_tokens=prompt_tokens,
        prompt_mask=prompt_mask, prefill_chunk=prefill_chunk, w8a8=w8a8,
        fused_decode=fused_decode,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "family", "max_len", "stop_token_id", "greedy", "top_p",
        "temperature", "top_k", "repetition_penalty", "W", "alive_threshold",
    ),
)
def _cascade_stage(
    params, cfg, state: DecodeState, *, family, max_len, stop_token_id,
    greedy, top_p, temperature, top_k, repetition_penalty, W,
    alive_threshold,
) -> DecodeState:
    return _decode_loop(
        params, cfg, state, family=family, max_len=max_len,
        stop_token_id=stop_token_id, greedy=greedy, top_p=top_p,
        temperature=temperature, top_k=top_k,
        repetition_penalty=repetition_penalty, W=W,
        alive_threshold=alive_threshold,
    )


@jax.jit
def _compact_state(state: DecodeState, perm: jax.Array) -> DecodeState:
    """Gather the rows in ``perm`` into a smaller batch. One whole-cache
    gather (≈ the cost of ~1 decode step's cache read) buys a halved
    per-step cost for every remaining step."""
    cache = state.cache
    if isinstance(cache, llama.PackedKVCache):
        upd = {"kv": cache.kv[:, perm]}
        if cache.scale is not None:
            upd["scale"] = cache.scale[:, perm]
    else:
        upd = {"k": cache.k[:, perm], "v": cache.v[:, perm]}
        for f in ("k_scale", "v_scale"):
            s = getattr(cache, f, None)
            if s is not None and s.ndim >= 2 and s.shape[1] == cache.k.shape[1]:
                upd[f] = s[:, perm]
    return DecodeState(
        cache=cache._replace(**upd),
        tokens=state.tokens[perm],
        last_hidden=state.last_hidden[perm],
        t=state.t,
        done=state.done[perm],
        rng=state.rng,
        prompt_seen=(
            None if state.prompt_seen is None else state.prompt_seen[perm]
        ),
    )


def generate_cascade(
    params,
    cfg,
    prefix_embeds: jax.Array,  # (B, P, D)
    *,
    max_len: int,
    stop_token_id: int,
    greedy: bool = True,
    top_p: float = 0.8,
    temperature: float = 1.0,
    rng: Optional[jax.Array] = None,
    cache_dtype: str = "float32",
    initial_done: Optional[jax.Array] = None,
    family: str = "llama",
    flush_window: Optional[int] = None,
    top_k: int = 0,
    repetition_penalty: float = 1.0,
    prompt_tokens: Optional[jax.Array] = None,
    prompt_mask: Optional[jax.Array] = None,
    prefill_chunk: Optional[int] = None,
    w8a8: bool = False,
    min_batch: int = 32,
    fused_decode: Optional[bool] = None,
) -> GenerateResult:
    """Cascade decode: reclaim the dead compute of finished rows.

    The reference keeps every row decoding until the LAST row finishes
    (wrapper.py:247-248) and so does ``generate`` — for heterogeneous
    answer lengths (1-2-token binary AQA mixed with ~100-token captions,
    the reference's own task mix) most of B x steps is dead work, because
    the decode step's cost is dominated by cache reads that scale with B.

    This driver runs the SAME windowed loop in stages: each stage exits
    when at most half its rows are still unfinished; the host then banks
    the finished rows' tokens, gathers the live rows into a batch of the
    next power of two (>= ``min_batch``), and continues in a smaller
    precompiled loop. All rows entered the batch together, so every live
    row sits at the same position t — no ragged attention, no per-row
    positions; static shapes per stage keep XLA happy. Each compaction
    costs one whole-cache gather (~1 step's worth of reads) and a (B,)
    done-mask + token-buffer fetch.

    Per-row outputs are IDENTICAL to ``generate`` up to each row's first
    stop token (greedy: bitwise — row math is batch-independent; the
    gather is exact). Tokens after a row's stop may differ (the static
    path keeps writing, the cascade freezes at drop time) — both are
    discarded by the stop-token trim, reference wrapper.py:254 semantics.
    Sampling streams diverge from the static path after the first
    compaction (rng consumption order changes) but stay valid draws.

    ``num_steps`` is the global step count the slowest row ran (same
    contract as ``generate``).
    """
    import numpy as np

    B = prefix_embeds.shape[0]
    W = _effective_window(flush_window, max_len, greedy, B)
    ML = -(-max_len // W) * W
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if fused_decode is None:
        fused_decode = _fused_decode_auto(
            cfg, family, prefix_embeds.dtype, cache_dtype, B,
            prefix_embeds.shape[1] + ML, W,
        )
    state = _cascade_prefill(
        params, cfg, prefix_embeds, rng, initial_done,
        prompt_tokens if repetition_penalty != 1.0 else None, prompt_mask,
        max_len=max_len, cache_dtype=cache_dtype, family=family, W=W,
        repetition_penalty=repetition_penalty, prefill_chunk=prefill_chunk,
        w8a8=w8a8, fused_decode=fused_decode,
    )

    out_tokens = np.zeros((B, ML), np.int32)
    orig = np.arange(B)  # active row -> original row index
    cur = B
    while True:
        thr = cur // 2 if cur > min_batch else 0
        state = _cascade_stage(
            params, cfg, state, family=family, max_len=max_len,
            stop_token_id=stop_token_id, greedy=greedy, top_p=top_p,
            temperature=temperature, top_k=top_k,
            repetition_penalty=repetition_penalty, W=W, alive_threshold=thr,
        )
        # ONE host sync per stage: the tunneled chip pays tens of ms per
        # round-trip, so done/t ride together.
        done, t_dev = jax.device_get((state.done, state.t))
        t_final = int(t_dev)
        if t_final >= max_len or done.all():
            break
        alive = np.nonzero(~done)[0]
        new_b = max(min_batch, 1 << int(np.ceil(np.log2(max(1, len(alive))))))
        assert new_b < cur, (new_b, cur, len(alive))  # thr guarantees this
        # Bank finished rows (their pre-stop tokens are final; post-stop
        # content is trimmed by the caller either way).
        toks = np.asarray(state.tokens)
        dropped = np.nonzero(done)[0]
        out_tokens[orig[dropped]] = toks[dropped]
        # Pad the live set to new_b with already-done rows (they stay done
        # and fall out at the next compaction).
        pad = new_b - len(alive)
        perm = np.concatenate([alive, dropped[:pad]]).astype(np.int32)
        state = _compact_state(state, jnp.asarray(perm))
        orig = orig[perm]
        cur = new_b

    out_tokens[orig] = np.asarray(state.tokens)
    return GenerateResult(
        tokens=jnp.asarray(out_tokens[:, :max_len]),
        num_steps=jnp.minimum(jnp.asarray(t_final, jnp.int32), max_len),
    )


def generate_stream(
    params,
    cfg,
    prefix_embeds: jax.Array,  # (B, P, D)
    *,
    max_len: int,
    stop_token_id: int,
    greedy: bool = True,
    top_p: float = 0.8,
    temperature: float = 1.0,
    rng: Optional[jax.Array] = None,
    cache_dtype: str = "float32",
    initial_done: Optional[jax.Array] = None,
    family: str = "llama",
    flush_window: Optional[int] = None,
    top_k: int = 0,
    repetition_penalty: float = 1.0,
    prompt_tokens: Optional[jax.Array] = None,
    prompt_mask: Optional[jax.Array] = None,
    prefill_chunk: Optional[int] = None,
    w8a8: bool = False,
    fused_decode: Optional[bool] = None,
):
    """Streaming variant of ``generate``: yields a ``GenerateResult``
    snapshot after every flush window (W tokens per yield), final one
    included, with identical token streams to ``generate`` (same jitted
    window body — the only difference is one host fetch + dispatch per
    window instead of one at the end; measured +39 ms/window on the
    TUNNELED bench chip — that is the tunnel round-trip, ~free on a
    locally-attached chip). The
    reference has no streaming surface at all (its Python loop decodes
    everything before returning, wrapper.py:216-256); this powers the
    server's incremental (SSE) endpoint."""
    import numpy as np

    B, P, _ = prefix_embeds.shape
    W = _effective_window(flush_window, max_len, greedy, B)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if fused_decode is None:
        fused_decode = _fused_decode_auto(
            cfg, family, prefix_embeds.dtype, cache_dtype, B,
            P + -(-max_len // W) * W, W,
        )
    state = _cascade_prefill(
        params, cfg, prefix_embeds, rng, initial_done,
        prompt_tokens if repetition_penalty != 1.0 else None, prompt_mask,
        max_len=max_len, cache_dtype=cache_dtype, family=family, W=W,
        repetition_penalty=repetition_penalty, prefill_chunk=prefill_chunk,
        w8a8=w8a8, fused_decode=fused_decode,
    )
    while True:
        state = _one_window(
            params, cfg, state, family=family, stop_token_id=stop_token_id,
            greedy=greedy, top_p=float(top_p), temperature=float(temperature),
            top_k=top_k, repetition_penalty=repetition_penalty, W=W,
        )
        # One host sync per window: tokens-so-far + done ride together.
        toks, done, t_dev = jax.device_get(
            (state.tokens, state.done, state.t)
        )
        t = min(int(t_dev), max_len)
        yield GenerateResult(
            tokens=jnp.asarray(toks[:, :max_len]),
            num_steps=jnp.asarray(t, jnp.int32),
        )
        if t >= max_len or np.asarray(done).all():
            return


def tokens_to_lists(result: GenerateResult, stop_token_id: int):
    """Host-side: trim each row at its first stop token (mirrors the
    reference's split at '<|endoftext|>', wrapper.py:254). Tokens emitted on
    steps >= num_steps are padding zeros and excluded via num_steps."""
    import numpy as np

    tokens = np.asarray(result.tokens)
    n = int(result.num_steps)
    out = []
    for row in tokens[:, :n]:
        idx = np.nonzero(row == stop_token_id)[0]
        out.append(row[: idx[0]].tolist() if len(idx) else row.tolist())
    return out
