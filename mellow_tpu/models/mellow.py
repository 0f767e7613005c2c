"""Mellow model assembly: audio encoders + prefix + LM.

Functional equivalent of the reference's ``Mellow`` module
(mellow/model/mellow.py:70-108) and ``DecoderModel`` prefix logic
(mellow/model/decoder.py:20-55), with the decode loop fused into one jitted
program (prefill + while_loop; see mellow_tpu/models/generate.py).

Full param tree:
  params = {
    "encoder": {...},  "c2l": {...}, "projection": {...},   # audio side
    "decoder": {...},                                        # Llama LM
  }
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mellow_tpu.config import MellowConfig
from mellow_tpu.models import generate as gen
from mellow_tpu.models import htsat


def build_prefix(
    params,
    cfg: MellowConfig,
    audio_proj1: jax.Array,  # (B, 1025, 576)
    audio_proj2: jax.Array,
    text_ids: jax.Array,  # (B, 129) int32
    text_embeds: Optional[jax.Array] = None,  # overrides embed[text_ids]
    compact: bool = False,  # audio_proj* are (B, 33, D) compact forms
) -> jax.Array:
    """(B, 389, 576) = [a1(129) | sep | a2(129) | sep | text(129)]
    (reference: decoder.py:36-55; sep = embed(token 0) for smollm2).
    With ``compact=True`` the audio inputs are the 33-unique-row eval
    forms (htsat.encode_audio_compact) and the 8-token mean-pool becomes
    the exact 4x repeat (htsat.downsample_tokens_compact)."""
    from mellow_tpu.models.decoders import get_decoder_ops

    ds = htsat.downsample_tokens_compact if compact else htsat.downsample_tokens
    a1 = ds(audio_proj1)
    a2 = ds(audio_proj2)
    embed = get_decoder_ops(cfg.decoder_family).embed_table(params["decoder"])
    dtext = embed[text_ids].astype(a1.dtype) if text_embeds is None else text_embeds
    B = a1.shape[0]
    sep = jnp.broadcast_to(
        embed[cfg.sep_token_id][None, None, :], (B, 1, embed.shape[1])
    ).astype(a1.dtype)
    return jnp.concatenate([a1, sep, a2, sep, dtext], axis=1)


def encode_and_prefix(
    params, cfg: MellowConfig, audio1: jax.Array, audio2: jax.Array, text_ids: jax.Array
) -> jax.Array:
    """generate_prefix_inference equivalent (mellow.py:100-108). Inference
    path — uses the compact 33-row encoder form (the 1024 repeated frame
    rows are never materialized; exact, see htsat.encode_audio_compact)."""
    p1 = htsat.encode_audio_compact(audio1, params, cfg.frontend, cfg.encoder)
    p2 = htsat.encode_audio_compact(audio2, params, cfg.frontend, cfg.encoder)
    return build_prefix(params, cfg, p1, p2, text_ids, compact=True)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_len", "greedy", "cache_dtype", "stop_token_id",
        "top_k", "repetition_penalty", "prefill_chunk", "w8a8",
        "fused_decode", "top_p", "temperature",  # static: see gen.generate
    ),
)
def generate_tokens(
    params,
    cfg: MellowConfig,
    audio1: jax.Array,  # (B, 320000)
    audio2: jax.Array,
    text_ids: jax.Array,  # (B, 129)
    *,
    max_len: int,
    greedy: bool = True,
    top_p: float = 0.8,
    temperature: float = 1.0,
    rng: Optional[jax.Array] = None,
    cache_dtype: str = "float32",
    initial_done: Optional[jax.Array] = None,
    stop_token_id: Optional[int] = None,  # default: cfg.stop_token_id
    top_k: int = 0,
    repetition_penalty: float = 1.0,
    prefill_chunk: Optional[int] = None,  # 0 under a mesh (wrapper does)
    w8a8: bool = False,  # W8A8 prefill MLP (llama + int8 weights only)
    fused_decode: Optional[bool] = None,  # packed Pallas decode (gen.generate)
) -> gen.GenerateResult:
    """End-to-end: two waveforms + prompt ids -> generated token ids.
    One compiled program: encoder x2, prefix assembly, prefill, decode loop."""
    prefix = encode_and_prefix(params, cfg, audio1, audio2, text_ids)
    return gen.generate(
        params["decoder"],
        cfg.decoder,
        prefix,
        max_len=max_len,
        stop_token_id=(
            cfg.stop_token_id if stop_token_id is None else stop_token_id
        ),
        greedy=greedy,
        top_p=top_p,
        temperature=temperature,
        rng=rng,
        cache_dtype=cache_dtype,
        initial_done=initial_done,
        family=cfg.decoder_family,
        top_k=top_k,
        repetition_penalty=repetition_penalty,
        # HF's RepetitionPenaltyLogitsProcessor covers the full input_ids;
        # the text prompt ids (the only prefix positions that HAVE ids) seed
        # the penalty mask, pad ('!') rows excluded.
        prompt_tokens=text_ids,
        prompt_mask=text_ids != cfg.pad_token_id,
        prefill_chunk=prefill_chunk,
        w8a8=w8a8,
        fused_decode=fused_decode,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _encode_prefix_jit(params, cfg: MellowConfig, audio1, audio2, text_ids):
    return encode_and_prefix(params, cfg, audio1, audio2, text_ids)


def generate_tokens_dynamic(
    params,
    cfg: MellowConfig,
    audio1: jax.Array,
    audio2: jax.Array,
    text_ids: jax.Array,
    *,
    max_len: int,
    greedy: bool = True,
    top_p: float = 0.8,
    temperature: float = 1.0,
    rng: Optional[jax.Array] = None,
    cache_dtype: str = "float32",
    initial_done: Optional[jax.Array] = None,
    stop_token_id: Optional[int] = None,
    top_k: int = 0,
    repetition_penalty: float = 1.0,
    prefill_chunk: Optional[int] = None,
    w8a8: bool = False,
    min_batch: int = 32,
    fused_decode: Optional[bool] = None,
) -> gen.GenerateResult:
    """``generate_tokens`` with cascade batch compaction: finished rows stop
    costing decode steps (see generate.generate_cascade). Host-driven between
    jitted stages, so it cannot live inside one jit like ``generate_tokens``;
    encoder+prefix runs as its own jit, the decode stages as theirs."""
    prefix = _encode_prefix_jit(params, cfg, audio1, audio2, text_ids)
    return gen.generate_cascade(
        params["decoder"],
        cfg.decoder,
        prefix,
        max_len=max_len,
        stop_token_id=(
            cfg.stop_token_id if stop_token_id is None else stop_token_id
        ),
        greedy=greedy,
        top_p=top_p,
        temperature=temperature,
        rng=rng,
        cache_dtype=cache_dtype,
        initial_done=initial_done,
        family=cfg.decoder_family,
        top_k=top_k,
        repetition_penalty=repetition_penalty,
        prompt_tokens=text_ids,
        prompt_mask=text_ids != cfg.pad_token_id,
        prefill_chunk=prefill_chunk,
        w8a8=w8a8,
        min_batch=min_batch,
        fused_decode=fused_decode,
    )


@functools.lru_cache(maxsize=16)
def _sharded_generate_fn(
    cfg: MellowConfig, mesh, max_len, greedy, cache_dtype, stop_token_id,
    top_k, repetition_penalty, w8a8, top_p, temperature, _env_key="",
):
    """Build + cache the jitted shard_map program for one knob set.

    Pure data parallelism over ``mesh``'s combined axes: params replicated,
    batch rows split, and each device runs the COMPLETE single-chip
    program — encoder, prefix, chunked prefill, windowed decode loop,
    fused Pallas decode kernel — on its local rows with NO collectives.
    This is how the single-chip perf features survive a mesh (VERDICT r3
    item 4): under plain auto-SPMD jit the Pallas custom calls do not
    partition, so the r3 wrapper forced ``fused_decode=False`` and
    ``prefill_chunk=0`` on every sharded run. Inside shard_map the kernel
    sees ordinary local shapes. Each device's while_loop also exits as
    soon as its OWN rows are done — a free cascade-lite the global-batch
    loop cannot express.

    TP meshes (model axis > 1) cannot take this path (the decoder matmuls
    would need in-kernel collectives); the wrapper routes them through the
    auto-SPMD ``generate_tokens`` instead.
    """
    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names)

    def local_fn(params, audio1, audio2, text_ids, initial_done, rng):
        # Distinct sampling streams per shard: fold the device's linear
        # mesh index into the key (greedy ignores rng entirely).
        idx = jnp.int32(0)
        for a in axes:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        rng = jax.random.fold_in(rng, idx)
        res = generate_tokens(  # nested jit: inlined into this trace
            params, cfg, audio1, audio2, text_ids,
            max_len=max_len, greedy=greedy, rng=rng,
            top_p=top_p, temperature=temperature,
            cache_dtype=cache_dtype, initial_done=initial_done,
            stop_token_id=stop_token_id, top_k=top_k,
            repetition_penalty=repetition_penalty, w8a8=w8a8,
        )
        # num_steps is a per-shard scalar (shards may exit at different
        # window counts); lift to a length-1 axis so it can ride out as a
        # P(axes) array — the caller takes the max (= slowest row,
        # generate()'s num_steps contract).
        return res.tokens, res.num_steps[None]

    mapped = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(axes), P(axes), P(axes), P(axes), P()),
        out_specs=(P(axes), P(axes)),
        check_vma=False,
    )

    @jax.jit
    def run(params, audio1, audio2, text_ids, initial_done, rng):
        tokens, steps = mapped(
            params, audio1, audio2, text_ids, initial_done, rng
        )
        return gen.GenerateResult(
            tokens=tokens, num_steps=jnp.max(steps)
        )

    return run


def generate_tokens_sharded(
    params,
    cfg: MellowConfig,
    audio1: jax.Array,
    audio2: jax.Array,
    text_ids: jax.Array,
    *,
    mesh,
    max_len: int,
    greedy: bool = True,
    top_p: float = 0.8,
    temperature: float = 1.0,
    rng: Optional[jax.Array] = None,
    cache_dtype: str = "float32",
    initial_done: Optional[jax.Array] = None,
    stop_token_id: Optional[int] = None,
    top_k: int = 0,
    repetition_penalty: float = 1.0,
    w8a8: bool = False,
) -> gen.GenerateResult:
    """DP-sharded ``generate_tokens`` (see ``_sharded_generate_fn``).
    Requires every mesh axis to be a pure batch axis (the wrapper only
    routes ``model``-axis-size-1 meshes here) and the batch divisible by
    the device count. Token outputs are identical to the unsharded
    ``generate_tokens`` row-for-row (greedy; sampling uses per-shard
    streams)."""
    n = mesh.devices.size
    B = audio1.shape[0]
    if B % n:
        raise ValueError(f"batch {B} not divisible by mesh size {n}")
    if initial_done is None:
        initial_done = jnp.zeros((B,), bool)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if greedy:
        # Sampling knobs are baked into the cached program only when they
        # matter; greedy ignores them (parity with generate_tokens).
        top_p, temperature = 0.8, 1.0
    import os

    fn = _sharded_generate_fn(
        cfg, mesh, max_len, greedy, cache_dtype,
        cfg.stop_token_id if stop_token_id is None else stop_token_id,
        top_k, repetition_penalty, w8a8, float(top_p), float(temperature),
        # The kernel force/kill envs are read at trace time inside
        # _fused_decode_auto; key the cached program on them so tests that
        # flip the env don't collide (same caveat as the jit caches).
        _env_key=os.environ.get("MELLOW_TPU_FORCE_FUSED_DECODE", "")
        + "|" + os.environ.get("MELLOW_TPU_DISABLE_FUSED_ATTN", "")
        + "|" + os.environ.get("MELLOW_TPU_DISABLE_FUSED_DECODE", ""),
    )
    return fn(params, audio1, audio2, text_ids, initial_done, rng)


def forward_train(
    params,
    cfg: MellowConfig,
    audio1: jax.Array,
    audio2: jax.Array,
    text_ids: jax.Array,  # (B, 129) prompt
    answer_ids: jax.Array,  # (B, T_ans) target tokens
    answer_mask: jax.Array,  # (B, T_ans) 1 for real tokens
    *,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
    mixup_lambda: Optional[jax.Array] = None,  # (B,) train-time mixup weights
) -> Tuple[jax.Array, dict]:
    """Training objective (reference: decoder.py:57-90 + mellow.py:89-98):
    next-token CE over the answer span, prefix positions masked out.

    Note: the reference's training forward is unreachable dead code and
    crashes as written (``torch.cat((dummy_token, tokens))`` concatenates a
    dict, decoder.py:88); this implements the documented intent — prefix
    labels masked, CE over answer tokens (SURVEY.md section 3.5).

    ``mixup_lambda`` enables mixup (reference htsat.py:30-41,871-874): the
    spectrograms are mixed even-row/odd-row inside the HTSAT forward, text
    and answer INPUT embeddings are mixed with the same weights, and the
    label side uses the standard mixup-CE convex combination
    ``lam * CE(y_even) + (1-lam) * CE(y_odd)``. The batch halves.
    """
    rng1 = None if rng is None else jax.random.fold_in(rng, 0)
    rng2 = None if rng is None else jax.random.fold_in(rng, 1)
    p1 = htsat.encode_audio(audio1, params, cfg.frontend, cfg.encoder,
                            rng=rng1, mixup_lambda=mixup_lambda)
    p2 = htsat.encode_audio(audio2, params, cfg.frontend, cfg.encoder,
                            rng=rng2, mixup_lambda=mixup_lambda)

    from mellow_tpu.models.decoders import get_decoder_ops

    ops = get_decoder_ops(cfg.decoder_family)
    embed = ops.embed_table(params["decoder"])
    ans_emb = embed[answer_ids].astype(p1.dtype)
    if mixup_lambda is None:
        prefix = build_prefix(params, cfg, p1, p2, text_ids)  # (B, 389, D)
    else:
        from mellow_tpu.train.augment import mixup

        lam = mixup_lambda
        dtext = embed[text_ids].astype(p1.dtype)
        prefix = build_prefix(
            params, cfg, p1, p2, text_ids,
            text_embeds=mixup(dtext, lam.astype(dtext.dtype)),
        )
        ans_emb = mixup(ans_emb, lam.astype(ans_emb.dtype))
    seq = jnp.concatenate([prefix, ans_emb], axis=1)  # (B, 389+T, D)

    logits = ops.forward(params["decoder"], cfg.decoder, seq, remat=remat)
    P = prefix.shape[1]
    # Position P-1+t predicts answer token t.
    pred = logits[:, P - 1 : -1, :]  # (B, T_ans, V)
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    if mixup_lambda is None:
        tok_lp = jnp.take_along_axis(logp, answer_ids[..., None], axis=-1)[..., 0]
        mask = answer_mask.astype(jnp.float32)
        acc_ids, acc_mask = answer_ids, mask
    else:
        lp_even = jnp.take_along_axis(
            logp, answer_ids[0::2][..., None], axis=-1)[..., 0]
        lp_odd = jnp.take_along_axis(
            logp, answer_ids[1::2][..., None], axis=-1)[..., 0]
        lam_f = mixup_lambda.astype(jnp.float32)
        w_even = lam_f[0::2, None] * answer_mask[0::2].astype(jnp.float32)
        w_odd = lam_f[1::2, None] * answer_mask[1::2].astype(jnp.float32)
        tok_lp = lp_even * w_even + lp_odd * w_odd
        mask = w_even + w_odd  # per-token total weight
        # report accuracy against the dominant-row labels
        acc_ids = jnp.where(
            (lam_f[0::2] >= lam_f[1::2])[:, None], answer_ids[0::2], answer_ids[1::2]
        )
        acc_mask = jnp.where(w_even >= w_odd,
                             answer_mask[0::2], answer_mask[1::2]).astype(jnp.float32)
    if mixup_lambda is None:
        loss = -(tok_lp * mask).sum() / jnp.maximum(mask.sum(), 1.0)
    else:
        loss = -tok_lp.sum() / jnp.maximum(mask.sum(), 1.0)
    metrics = {
        "loss": loss,
        "num_answer_tokens": mask.sum(),
        "accuracy": ((jnp.argmax(pred, -1) == acc_ids) * acc_mask).sum()
        / jnp.maximum(acc_mask.sum(), 1.0),
    }
    return loss, metrics


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


def _decoder_init(cfg: MellowConfig, rng: jax.Array, dtype):
    from mellow_tpu.models.decoders import get_decoder_ops

    return get_decoder_ops(cfg.decoder_family).init_params(rng, cfg.decoder, dtype)


def init_params(rng: jax.Array, cfg: MellowConfig, dtype=jnp.float32):
    """Random full-model init (offline testing / training from scratch).
    Real inference weights come from tools/convert_ckpt.py."""
    import numpy as np

    enc_cfg = cfg.encoder
    # numpy RNG seeded from the JAX key: one host-side generator instead of
    # hundreds of tiny eagerly-compiled device programs (init is a testing /
    # training-bootstrap path; checkpoints are the production path).
    seed = int(np.asarray(jax.random.key_data(rng)).ravel()[-1])
    gen_np = np.random.default_rng(seed)

    def nrm(shape, std=0.02):
        return jnp.asarray(gen_np.normal(0.0, std, shape), dtype)

    def ln(dim):
        return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}

    def lin(i, o, bias=True):
        p = {"kernel": nrm((i, o))}
        if bias:
            p["bias"] = jnp.zeros((o,), dtype)
        return p

    stages = []
    res_dim = enc_cfg.embed_dim
    for si, depth in enumerate(enc_cfg.depths):
        heads = enc_cfg.num_heads[si]
        blocks = []
        for _ in range(depth):
            blocks.append(
                {
                    "norm1": ln(res_dim),
                    "qkv": lin(res_dim, 3 * res_dim),
                    "proj": lin(res_dim, res_dim),
                    "rel_bias_table": nrm(
                        ((2 * enc_cfg.window_size - 1) ** 2, heads)
                    ),
                    "norm2": ln(res_dim),
                    "fc1": lin(res_dim, 4 * res_dim),
                    "fc2": lin(4 * res_dim, res_dim),
                }
            )
        stage = {"blocks": blocks}
        if si < len(enc_cfg.depths) - 1:
            stage["downsample"] = {
                "norm": ln(4 * res_dim),
                "reduction": lin(4 * res_dim, 2 * res_dim, bias=False),
            }
            res_dim *= 2
        stages.append(stage)

    nf = enc_cfg.num_features
    nc = enc_cfg.num_classes
    encoder = {
        "bn0": {
            "scale": jnp.ones((64,), dtype),
            "bias": jnp.zeros((64,), dtype),
            "mean": jnp.zeros((64,), dtype),
            "var": jnp.ones((64,), dtype),
        },
        "patch_embed": {
            "kernel": nrm((enc_cfg.patch_size ** 2, enc_cfg.embed_dim)),
            "bias": jnp.zeros((enc_cfg.embed_dim,), dtype),
            "norm": ln(enc_cfg.embed_dim),
        },
        "stages": stages,
        "norm": ln(nf),
        "tscam_conv": {
            # Stored PRE-FLATTENED + PRE-TRANSPOSED (C*cfb*3, O) as the
            # im2col matmul RHS (htsat.tscam_head has the measured DMA
            # story: 4D filter = 14.85 ms/pass; (O, K) orientation =
            # 9.65 ms/pass transpose copy).
            "kernel": nrm((nf * 2 * 3, nc)),
            "bias": jnp.zeros((nc,), dtype),
        },
        "head": lin(nc, nc),
    }
    return {
        "encoder": encoder,
        "c2l": lin(nc, nf),
        "projection": {
            "linear1": lin(nf, cfg.d_proj, bias=False),
            "linear2": lin(cfg.d_proj, cfg.d_proj, bias=False),
            "layer_norm": ln(cfg.d_proj),
        },
        "decoder": _decoder_init(cfg, jax.random.fold_in(rng, 1), dtype),
    }
