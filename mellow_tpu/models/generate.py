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


def _sample_token(
    logits: jax.Array,
    *,
    greedy: bool,
    top_p: float,
    temperature: float,
    rng: Optional[jax.Array],
) -> jax.Array:
    """Greedy parity path or real nucleus sampling (new feature)."""
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    logits = logits / jnp.maximum(temperature, 1e-6)
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    # Keep tokens whose cumulative prob (exclusive) < top_p; always keep top-1.
    cutoff_mask = cum - jax.nn.softmax(sorted_logits, axis=-1) < top_p
    cutoff_mask = cutoff_mask.at[:, 0].set(True)
    # Threshold logit: smallest kept logit per row.
    min_kept = jnp.min(
        jnp.where(cutoff_mask, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    filtered = jnp.where(logits >= min_kept, logits, -jnp.inf)
    return jax.random.categorical(rng, filtered, axis=-1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_len", "stop_token_id", "greedy", "cache_dtype", "family"
    ),
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
) -> GenerateResult:
    from mellow_tpu.models.decoders import get_decoder_ops

    ops = get_decoder_ops(family)
    B, P, D = prefix_embeds.shape
    S_max = P + max_len
    dtype = prefix_embeds.dtype
    cache = ops.create_cache(cfg, B, S_max, jnp.dtype(cache_dtype))

    if family == "llama":
        cos_np, sin_np = llama.rope_tables(cfg, S_max, dtype)
        cos_full, sin_full = jnp.asarray(cos_np), jnp.asarray(sin_np)

        def step(tok_embed, cache, pending):
            return llama.decode_step(
                params, cfg, tok_embed, cache, cos_full, sin_full, pending
            )
    else:

        def step(tok_embed, cache, pending):
            return ops.decode_step(params, cfg, tok_embed, cache, pending)

    hidden, cache = ops.prefill(params, cfg, prefix_embeds, cache)
    # Seed the deferred-write pipeline with the last prefix position's k/v
    # (flushing it is a semantic no-op; see llama.decode_step docstring).
    axis = ops.cache_seq_axis
    pk0 = jax.lax.dynamic_slice_in_dim(cache.k, P - 1, 1, axis=axis)
    pv0 = jax.lax.dynamic_slice_in_dim(cache.v, P - 1, 1, axis=axis)
    if getattr(cache, "k_scale", None) is not None:
        # int8 cache: pending rides dequantized; requantization at flush is
        # exact for already-quantized values.
        ksc0 = jax.lax.dynamic_slice_in_dim(cache.k_scale, P - 1, 1, axis=axis)
        vsc0 = jax.lax.dynamic_slice_in_dim(cache.v_scale, P - 1, 1, axis=axis)
        pk0 = pk0.astype(dtype) * ksc0[..., None].astype(dtype)
        pv0 = pv0.astype(dtype) * vsc0[..., None].astype(dtype)
    pending0 = (pk0, pv0)

    if rng is None:
        rng = jax.random.PRNGKey(0)

    class State(NamedTuple):
        cache: KVCache
        pending: tuple
        tokens: jax.Array  # (B, max_len)
        last_hidden: jax.Array  # (B, D)
        t: jax.Array  # scalar int32
        done: jax.Array  # (B,) bool
        rng: jax.Array

    def cond(s: State):
        return jnp.logical_and(s.t < max_len, ~jnp.all(s.done))

    embed_table = ops.embed_table(params)

    def body(s: State):
        logits = ops.logits_from_hidden(params, cfg, s.last_hidden)
        step_rng, rng = jax.random.split(s.rng)
        next_tok = _sample_token(
            logits, greedy=greedy, top_p=top_p, temperature=temperature, rng=step_rng
        )
        tokens = jax.lax.dynamic_update_slice(s.tokens, next_tok[:, None], (0, s.t))
        done = jnp.logical_or(s.done, next_tok == stop_token_id)
        tok_embed = embed_table[next_tok].astype(dtype)  # (B, D)
        hidden, cache, pending = step(tok_embed, s.cache, s.pending)
        return State(cache, pending, tokens, hidden, s.t + 1, done, rng)

    init = State(
        cache=cache,
        pending=pending0,
        tokens=jnp.zeros((B, max_len), jnp.int32),
        last_hidden=hidden,
        t=jnp.zeros((), jnp.int32),
        done=jnp.zeros((B,), bool) if initial_done is None else initial_done,
        rng=rng,
    )
    final = jax.lax.while_loop(cond, body, init)
    return GenerateResult(tokens=final.tokens, num_steps=final.t)


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
