"""Training loop driver: dataset -> sharded train steps -> metrics ->
periodic checkpoints, with resume (the subsystem SURVEY.md section 5.3/5.4
marks ABSENT in the reference)."""

from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np

from mellow_tpu.config import MellowConfig
from mellow_tpu.train import checkpoint as ckpt
from mellow_tpu.train import step as step_mod
from mellow_tpu.train.data import ReasonAQALoader
from mellow_tpu.utils.metrics import GLOBAL as metrics


def train(
    params: dict,
    cfg: MellowConfig,
    loader: ReasonAQALoader,
    *,
    num_epochs: int = 1,
    max_steps: Optional[int] = None,
    learning_rate: float = 1e-4,
    ckpt_dir: Optional[str] = None,
    ckpt_every: int = 500,
    resume: bool = True,
    mesh=None,
    log_every: int = 20,
    seed: int = 0,
    remat: bool = False,
    mixup: bool = False,  # reference htsat.py:871-874 train-time mixup
    accum_steps: int = 1,  # gradient accumulation (micro-batch scan)
) -> step_mod.TrainState:
    optimizer = step_mod.make_optimizer(learning_rate=learning_rate)
    # Private copy: train_step donates its state, which would otherwise
    # delete the CALLER's param arrays on the first step.
    params = jax.tree.map(lambda x: jax.numpy.array(x), params)
    if mesh is not None:
        from mellow_tpu.parallel import sharding as shd

        params = shd.shard_params(params, mesh)
    state = step_mod.init_train_state(params, optimizer)

    if resume and ckpt_dir:
        latest = ckpt.latest(ckpt_dir)
        if latest:
            state = ckpt.restore(latest, state)
            print(f"[train] resumed from {latest} (step {int(state.step)})")

    rng = jax.random.PRNGKey(seed)
    batch_sharding = None
    if mesh is not None:
        from mellow_tpu.parallel import sharding as shd

        batch_sharding = shd.batch_sharding(mesh)

    step_count = int(state.step)
    t_last = time.time()
    for epoch in range(num_epochs):
        for batch in loader.epoch(epoch):
            if max_steps is not None and step_count >= max_steps:
                return state
            if batch_sharding is not None:
                batch = {k: jax.device_put(v, batch_sharding) for k, v in batch.items()}
            step_rng = jax.random.fold_in(rng, step_count)
            with metrics.timer("train_step"):
                state, m = step_mod.train_step_accum(
                    state, cfg, optimizer, batch, step_rng,
                    accum_steps=accum_steps, remat=remat, mixup=mixup,
                )
            step_count += 1
            metrics.count("train_steps", 1)
            metrics.count(
                "answer_tokens", float(np.asarray(m["num_answer_tokens"]))
            )
            if step_count % log_every == 0:
                dt = time.time() - t_last
                t_last = time.time()
                print(
                    f"[train] step {step_count} loss {float(m['loss']):.4f} "
                    f"acc {float(m['accuracy']):.3f} "
                    f"gnorm {float(m['grad_norm']):.2f} "
                    f"({log_every / dt:.2f} steps/s)"
                )
            if ckpt_dir and step_count % ckpt_every == 0:
                path = ckpt.save(ckpt_dir, state)
                print(f"[train] checkpoint -> {path}")
    if ckpt_dir:
        ckpt.save(ckpt_dir, state)
    return state
