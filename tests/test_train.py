"""Training subsystem tests: augmentations, data pipeline, checkpoint
save/resume, and a short overfit run (loss must drop)."""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mellow_tpu.io.tokenizer import ByteTokenizer
from mellow_tpu.models import mellow as jmellow
from mellow_tpu.train import checkpoint as ckpt
from mellow_tpu.train import step as step_mod
from mellow_tpu.train.augment import mixup, sample_mixup_lambda, spec_augment
from mellow_tpu.train.data import ReasonAQALoader, load_json
from tests.test_wrapper import SMALL

REF_WAV1 = "/root/reference/resource/1.wav"
REF_WAV2 = "/root/reference/resource/2.wav"


def test_spec_augment_masks_stripes():
    x = jnp.ones((2, 100, 64))
    out = np.asarray(spec_augment(x, jax.random.PRNGKey(0)))
    assert out.shape == (2, 100, 64)
    assert ((out == 0) | (out == 1)).all()
    assert (out == 0).any()  # some stripes dropped
    # deterministic under the same key
    out2 = np.asarray(spec_augment(x, jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(out, out2)


def test_mixup_matches_reference_formula():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 5, 3).astype(np.float32))
    lam = sample_mixup_lambda(jax.random.PRNGKey(1), 4)
    out = np.asarray(mixup(x, lam))
    lam_np = np.asarray(lam)
    # htsat.py:30-41: out = x[0::2]*lam[0::2] + x[1::2]*lam[1::2]
    expect = (
        np.asarray(x)[0::2] * lam_np[0::2, None, None]
        + np.asarray(x)[1::2] * lam_np[1::2, None, None]
    )
    np.testing.assert_allclose(out, expect, rtol=1e-6)
    np.testing.assert_allclose(lam_np[0::2] + lam_np[1::2], 1.0, rtol=1e-6)


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    rows = [
        {
            "taskname": "audiocaps",
            "filepath1": REF_WAV1,
            "filepath2": "",
            "caption1": "street",
            "caption2": "",
            "input": "caption the audio.",
            "answer": "a busy street",
            "subtype": "AudioCaps.json",
        },
        {
            "taskname": "clothov21",
            "filepath1": REF_WAV2,
            "filepath2": REF_WAV1,
            "caption1": "x",
            "caption2": "y",
            "input": "explain the difference",
            "answer": "quite different sounds",
            "subtype": "ACD-1.json",
        },
    ] * 2
    p = tmp_path_factory.mktemp("data") / "train.json"
    p.write_text(json.dumps(rows))
    return str(p)


def test_loader_shapes(tiny_dataset):
    examples = load_json(tiny_dataset)
    assert len(examples) == 4
    loader = ReasonAQALoader(
        examples, ByteTokenizer(), SMALL, batch_size=2, answer_len=16
    )
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    b = batches[0]
    assert b["audio1"].shape == (2, 320000)
    assert b["audio2"].shape == (2, 320000)
    assert b["text_ids"].shape == (2, SMALL.text_tokenization_len)
    assert b["answer_ids"].shape == (2, 16)
    assert b["answer_mask"].shape == (2, 16)
    # answers end with the stop token inside the mask
    for row, mask in zip(b["answer_ids"], b["answer_mask"]):
        n = int(mask.sum())
        assert row[n - 1] == SMALL.stop_token_id


def test_overfit_one_batch_loss_drops(tiny_dataset):
    examples = load_json(tiny_dataset)
    loader = ReasonAQALoader(
        examples, ByteTokenizer(), SMALL, batch_size=2, answer_len=12
    )
    batch = next(loader.epoch(0))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    params = jmellow.init_params(jax.random.PRNGKey(0), SMALL)
    optimizer = step_mod.make_optimizer(learning_rate=3e-3, warmup_steps=1)
    state = step_mod.init_train_state(params, optimizer)

    losses = []
    for i in range(6):
        state, m = step_mod.train_step(
            state, SMALL, optimizer, batch, jax.random.PRNGKey(i)
        )
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 6


def test_forward_train_mixup_identity(tiny_dataset):
    """With lam = [1,0,1,0] the mixed batch IS the even rows, so the mixup
    loss must equal the plain loss on the even-row sub-batch (this pins both
    the htsat-side do_mixup wiring and the mixed-label CE formula)."""
    examples = load_json(tiny_dataset)
    loader = ReasonAQALoader(
        examples, ByteTokenizer(), SMALL, batch_size=4, answer_len=12
    )
    batch = {k: jnp.asarray(v) for k, v in next(loader.epoch(0)).items()}
    params = jmellow.init_params(jax.random.PRNGKey(0), SMALL)

    lam = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    loss_mix, m_mix = jmellow.forward_train(
        params, SMALL, batch["audio1"], batch["audio2"], batch["text_ids"],
        batch["answer_ids"], batch["answer_mask"], mixup_lambda=lam,
    )
    even = {k: v[0::2] for k, v in batch.items()}
    loss_even, m_even = jmellow.forward_train(
        params, SMALL, even["audio1"], even["audio2"], even["text_ids"],
        even["answer_ids"], even["answer_mask"],
    )
    np.testing.assert_allclose(float(loss_mix), float(loss_even), rtol=1e-5)
    np.testing.assert_allclose(
        float(m_mix["accuracy"]), float(m_even["accuracy"]), rtol=1e-5
    )


def test_train_step_mixup_runs(tiny_dataset):
    examples = load_json(tiny_dataset)
    loader = ReasonAQALoader(
        examples, ByteTokenizer(), SMALL, batch_size=4, answer_len=12
    )
    batch = {k: jnp.asarray(v) for k, v in next(loader.epoch(0)).items()}
    params = jmellow.init_params(jax.random.PRNGKey(0), SMALL)
    optimizer = step_mod.make_optimizer(learning_rate=3e-3, warmup_steps=1)
    state = step_mod.init_train_state(params, optimizer)
    state, m = step_mod.train_step(
        state, SMALL, optimizer, batch, jax.random.PRNGKey(0), mixup=True
    )
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1


def test_checkpoint_roundtrip(tmp_path):
    params = jmellow.init_params(jax.random.PRNGKey(0), SMALL)
    optimizer = step_mod.make_optimizer()
    state = step_mod.init_train_state(params, optimizer)
    path = ckpt.save(str(tmp_path), state)
    assert ckpt.latest(str(tmp_path)) == path
    restored = ckpt.restore(path, state)
    a = jax.tree.leaves(state)
    b = jax.tree.leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_remat_train_step_matches_plain(tiny_dataset):
    """jax.checkpoint path must give the same loss (it only changes what is
    stored vs recomputed in backward)."""
    examples = load_json(tiny_dataset)
    loader = ReasonAQALoader(
        examples, ByteTokenizer(), SMALL, batch_size=2, answer_len=12
    )
    batch = {k: jnp.asarray(v) for k, v in next(loader.epoch(0)).items()}
    params = jmellow.init_params(jax.random.PRNGKey(0), SMALL)
    optimizer = step_mod.make_optimizer()

    s1 = step_mod.init_train_state(jax.tree.map(jnp.array, params), optimizer)
    _, m_plain = step_mod.train_step(s1, SMALL, optimizer, batch, jax.random.PRNGKey(0))
    s2 = step_mod.init_train_state(jax.tree.map(jnp.array, params), optimizer)
    _, m_remat = step_mod.train_step(
        s2, SMALL, optimizer, batch, jax.random.PRNGKey(0), remat=True
    )
    np.testing.assert_allclose(
        float(m_plain["loss"]), float(m_remat["loss"]), rtol=1e-6
    )


def test_prefetch_loader_delegates_and_orders():
    from mellow_tpu.train.data import PrefetchLoader

    class Fake:
        batch_size = 4

        def epoch(self, i):
            for k in range(7):
                yield {"x": k, "epoch": i}

    pl = PrefetchLoader(Fake(), depth=2)
    assert pl.batch_size == 4
    assert [b["x"] for b in pl.epoch(3)] == list(range(7))
    assert next(iter(pl.epoch(3)))["epoch"] == 3


def test_prefetch_loader_propagates_errors():
    import pytest

    from mellow_tpu.train.data import PrefetchLoader

    class Boom:
        def epoch(self, i):
            yield {"x": 0}
            raise ValueError("producer failed")

    it = PrefetchLoader(Boom()).epoch(0)
    assert next(it)["x"] == 0
    with pytest.raises(ValueError, match="producer failed"):
        next(it)


def test_compile_cache_enable(tmp_path, monkeypatch):
    import jax

    from mellow_tpu.utils import compile_cache

    monkeypatch.setattr(compile_cache, "_enabled", False)
    monkeypatch.setenv("MELLOW_TPU_COMPILE_CACHE", str(tmp_path / "xla"))
    assert compile_cache.enable() == str(tmp_path / "xla")
    assert (tmp_path / "xla").is_dir()
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla")
    monkeypatch.setattr(compile_cache, "_enabled", False)
    monkeypatch.setenv("MELLOW_TPU_COMPILE_CACHE", "off")
    assert compile_cache.enable() is None


def test_grad_accumulation_matches_single_step():
    """train_step_accum(accum=2) must match train_step on the same batch
    when micro-batches carry equal answer-token counts (equal-weight
    averaging == token-weight averaging there)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mellow_tpu.train import step as step_mod

    cfg = SMALL
    params = jmellow.init_params(jax.random.PRNGKey(0), cfg)
    opt = step_mod.make_optimizer(learning_rate=1e-3)
    rng = np.random.RandomState(0)
    B, T = 4, 6
    batch = {
        "audio1": jnp.asarray(rng.randn(B, 320000) * 0.05, jnp.float32),
        "audio2": jnp.asarray(rng.randn(B, 320000) * 0.05, jnp.float32),
        "text_ids": jnp.asarray(rng.randint(2, 60, (B, cfg.text_tokenization_len)), jnp.int32),
        "answer_ids": jnp.asarray(rng.randint(2, 60, (B, T)), jnp.int32),
        "answer_mask": jnp.ones((B, T), jnp.float32),
    }
    # rng=None disables the stochastic paths (dropout/SpecAugment): the
    # micro-batch rng folds would otherwise draw different masks than the
    # single full-batch step by design.
    # train_step donates its state: each state needs a private param copy.
    s1 = step_mod.init_train_state(jax.tree.map(jnp.array, params), opt)
    s1, m1 = step_mod.train_step(s1, cfg, opt, batch, None)
    s2 = step_mod.init_train_state(jax.tree.map(jnp.array, params), opt)
    s2, m2 = step_mod.train_step_accum(
        s2, cfg, opt, batch, None, accum_steps=2
    )
    np.testing.assert_allclose(
        float(m2["loss"]), float(m1["loss"]), rtol=2e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4)
