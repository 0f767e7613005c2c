"""Training step: loss + grad + optax update, SPMD-ready.

The reference ships no training code (README.md:119-120 defers to an absent
'training' branch; its dead training forward at decoder.py:57-90 documents
the objective). This implements that objective (next-token CE over answer
tokens, prefix masked — see mellow_tpu/models/mellow.py::forward_train) as a
single jitted step compatible with a (data, model) mesh: params carry their
NamedShardings, the batch is DP-sharded on its leading axis, gradients are
averaged by XLA's collectives automatically.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from mellow_tpu.config import MellowConfig
from mellow_tpu.models import mellow as mellow_model


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 0.01,
    warmup_steps: int = 100,
    total_steps: int = 10_000,
    max_grad_norm: float = 1.0,
) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup_steps, total_steps
    )
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(schedule, weight_decay=weight_decay),
    )


def init_train_state(params: dict, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "optimizer", "remat", "mixup"),
    donate_argnames=("state",),
)
def train_step(
    state: TrainState,
    cfg: MellowConfig,
    optimizer: optax.GradientTransformation,
    batch: dict,  # audio1, audio2, text_ids, answer_ids, answer_mask
    rng: jax.Array,
    remat: bool = False,
    mixup: bool = False,
) -> Tuple[TrainState, dict]:
    mixup_lambda = None
    if mixup:
        from mellow_tpu.train.augment import sample_mixup_lambda

        mixup_lambda = sample_mixup_lambda(
            jax.random.fold_in(rng, 7), batch["audio1"].shape[0]
        )

    def loss_fn(params):
        return mellow_model.forward_train(
            params, cfg,
            batch["audio1"], batch["audio2"], batch["text_ids"],
            batch["answer_ids"], batch["answer_mask"], rng=rng, remat=remat,
            mixup_lambda=mixup_lambda,
        )

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics["grad_norm"] = optax.global_norm(grads)
    return TrainState(params, opt_state, state.step + 1), metrics


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "optimizer", "remat", "mixup", "accum_steps"),
    donate_argnames=("state",),
)
def train_step_accum(
    state: TrainState,
    cfg: MellowConfig,
    optimizer: optax.GradientTransformation,
    batch: dict,  # leading batch axis divisible by accum_steps
    rng: jax.Array,
    accum_steps: int,
    remat: bool = False,
    mixup: bool = False,
) -> Tuple[TrainState, dict]:
    """``train_step`` with gradient accumulation: the batch is split into
    ``accum_steps`` micro-batches scanned sequentially (one compiled body;
    activation memory is a micro-batch's, so effective batch scales past
    HBM), gradients averaged with the standard equal-micro-batch weighting,
    then ONE optimizer update. Loss/accuracy are averaged weighted by each
    micro-batch's answer-token count, so metrics match the equivalent
    single big batch."""
    assert accum_steps >= 1
    if accum_steps == 1:
        return train_step(
            state, cfg, optimizer, batch, rng, remat=remat, mixup=mixup
        )
    B = batch["audio1"].shape[0]
    assert B % accum_steps == 0, (B, accum_steps)
    micro = {
        k: v.reshape(accum_steps, B // accum_steps, *v.shape[1:])
        for k, v in batch.items()
    }

    def loss_fn(params, mb, mb_rng):
        mixup_lambda = None
        if mixup:
            from mellow_tpu.train.augment import sample_mixup_lambda

            mixup_lambda = sample_mixup_lambda(
                jax.random.fold_in(mb_rng, 7), mb["audio1"].shape[0]
            )
        return mellow_model.forward_train(
            params, cfg,
            mb["audio1"], mb["audio2"], mb["text_ids"],
            mb["answer_ids"], mb["answer_mask"], rng=mb_rng, remat=remat,
            mixup_lambda=mixup_lambda,
        )

    zero_grads = jax.tree.map(jnp.zeros_like, state.params)

    def body(carry, xs):
        grads_acc, loss_acc, acc_acc, ntok_acc = carry
        mb, i = xs
        # rng=None disables the stochastic paths (dropout/specaug) just
        # like train_step; otherwise each micro-batch gets its own stream.
        mb_rng = None if rng is None else jax.random.fold_in(rng, i)
        (loss, m), grads = jax.value_and_grad(
            lambda p: loss_fn(p, mb, mb_rng), has_aux=True
        )(state.params)
        grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
        ntok = m["num_answer_tokens"].astype(jnp.float32)
        return (
            grads_acc,
            loss_acc + loss * ntok,
            acc_acc + m["accuracy"] * ntok,
            ntok_acc + ntok,
        ), None

    (grads, loss_sum, acc_sum, ntok), _ = jax.lax.scan(
        body,
        (zero_grads, jnp.float32(0), jnp.float32(0), jnp.float32(0)),
        (micro, jnp.arange(accum_steps)),
    )
    grads = jax.tree.map(lambda g: g / accum_steps, grads)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = {
        "loss": loss_sum / jnp.maximum(ntok, 1.0),
        "accuracy": acc_sum / jnp.maximum(ntok, 1.0),
        "num_answer_tokens": ntok,
        "grad_norm": optax.global_norm(grads),
    }
    return TrainState(params, opt_state, state.step + 1), metrics
