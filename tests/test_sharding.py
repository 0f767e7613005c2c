"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(SURVEY.md section 4.4: the TPU analogue of multi-node testing without a
cluster)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mellow_tpu.io.tokenizer import ByteTokenizer
from mellow_tpu.models import mellow as jmellow
from mellow_tpu.parallel import sharding as shd
from mellow_tpu.wrapper import MellowWrapper
from tests.test_wrapper import SMALL

REF_WAV1 = "/root/reference/resource/1.wav"
REF_WAV2 = "/root/reference/resource/2.wav"


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = shd.make_mesh(8)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh6 = shd.make_mesh(6)
    assert mesh6.shape == {"data": 2, "model": 3}


def test_param_specs_structure():
    params = jmellow.init_params(jax.random.PRNGKey(0), SMALL)
    mesh = shd.make_mesh(6)
    specs = shd.mellow_param_specs(params, mesh, num_heads_kv=SMALL.decoder.num_kv_heads)
    assert jax.tree.structure(specs, is_leaf=lambda x: isinstance(x, P)) \
        == jax.tree.structure(params)
    # decoder MLP sharded on the model axis; encoder replicated
    assert specs["decoder"]["layers"]["w_gate"] == P(None, None, "model")
    assert specs["encoder"]["patch_embed"]["kernel"] == P()


def test_dp_inference_matches_unsharded():
    """Wrapper with an 8-way DP mesh must produce identical strings."""
    params = jmellow.init_params(jax.random.PRNGKey(0), SMALL)
    w_plain = MellowWrapper(
        "test_small", "v0", 0, params=params, tokenizer=ByteTokenizer()
    )
    mesh = shd.make_mesh(8)
    w_dp = MellowWrapper(
        "test_small", "v0", 0, params=params, tokenizer=ByteTokenizer(),
        mesh=mesh,
    )
    ex = [
        [REF_WAV1, REF_WAV1, "one"],
        [REF_WAV2, REF_WAV2, "two"],
        [REF_WAV1, REF_WAV2, "three"],
    ]
    a = w_plain.generate(ex, max_len=5, top_p=0.8, temperature=1.0)
    b = w_dp.generate(ex, max_len=5, top_p=0.8, temperature=1.0)
    assert a == b


def test_dp_tp_inference_matches_unsharded():
    """(4 data, 2 model) mesh: decoder weights actually sharded on the model
    axis (SMALL has 2 KV heads, so attention shards too) — strings must
    still be identical to the unsharded run (VERDICT r1 next #2)."""
    params = jmellow.init_params(jax.random.PRNGKey(0), SMALL)
    w_plain = MellowWrapper(
        "test_small", "v0", 0, params=params, tokenizer=ByteTokenizer()
    )
    mesh = shd.make_mesh(8, tp=2)
    assert mesh.shape == {"data": 4, "model": 2}
    w_tp = MellowWrapper(
        "test_small", "v0", 0, params=params, tokenizer=ByteTokenizer(),
        mesh=mesh,
    )
    # the decoder MLP kernels really are distributed, not replicated
    gate_sharding = w_tp.params["decoder"]["layers"]["w_gate"].sharding
    assert gate_sharding.spec == P(None, None, "model")
    ex = [
        [REF_WAV1, REF_WAV2, "one"],
        [REF_WAV2, REF_WAV1, "two"],
    ]
    a = w_plain.generate(ex, max_len=5)
    b = w_tp.generate(ex, max_len=5)
    assert a == b


def test_sharded_train_step_matches_unsharded_loss():
    rng = np.random.RandomState(0)
    batch = {
        "audio1": jnp.asarray((rng.randn(8, 320000) * 0.1).astype(np.float32)),
        "audio2": jnp.asarray((rng.randn(8, 320000) * 0.1).astype(np.float32)),
        "text_ids": jnp.asarray(rng.randint(2, 500, (8, 8)), jnp.int32),
        "answer_ids": jnp.asarray(rng.randint(2, 500, (8, 6)), jnp.int32),
        "answer_mask": jnp.ones((8, 6), jnp.float32),
    }
    from mellow_tpu.train import step as step_mod

    params = jmellow.init_params(jax.random.PRNGKey(0), SMALL)
    opt = step_mod.make_optimizer()

    state = step_mod.init_train_state(
        jax.tree.map(jnp.array, params), opt
    )
    _, m_plain = step_mod.train_step(state, SMALL, opt, batch, jax.random.PRNGKey(9))

    mesh = shd.make_mesh(8)
    sharded_params = shd.shard_params(jax.tree.map(jnp.array, params), mesh)
    state_s = step_mod.init_train_state(sharded_params, opt)
    batch_s = {k: jax.device_put(v, shd.batch_sharding(mesh)) for k, v in batch.items()}
    _, m_shard = step_mod.train_step(state_s, SMALL, opt, batch_s, jax.random.PRNGKey(9))

    np.testing.assert_allclose(
        float(m_plain["loss"]), float(m_shard["loss"]), rtol=1e-5
    )


def test_quantized_decoder_tp_specs():
    """int8-quantized decoder kernels must shard like their float
    counterparts under TP (values on the kernel's spec, per-out-channel
    scales on the kernel spec minus the contraction axis), and the
    quantized logits head must be vocab-sharded."""
    import jax
    from jax.sharding import PartitionSpec as P

    from mellow_tpu.config import get_config
    from mellow_tpu.models import llama, mellow as mellow_model
    from mellow_tpu.parallel.sharding import make_mesh, mellow_param_specs

    cfg = get_config("v0")
    params = mellow_model.init_params(jax.random.PRNGKey(0), cfg)
    params = {**params, "decoder": llama.quantize_decoder(params["decoder"], cfg.decoder)}
    mesh = make_mesh(6, tp=3)  # heads divisible: attention sharded too
    specs = mellow_param_specs(params, mesh)
    dec = specs["decoder"]
    assert dec["layers"]["w_gate"]["q"] == P(None, None, "model")
    assert dec["layers"]["w_gate"]["scale"] == P(None, "model")
    assert dec["layers"]["wq"]["q"] == P(None, None, "model")
    assert dec["layers"]["wo"]["q"] == P(None, "model", None)
    assert dec["layers"]["wo"]["scale"] == P(None, None)
    assert dec["lm_head_q"]["q"] == P(None, "model")
    assert dec["lm_head_q"]["scale"] == P("model")


def test_multihost_single_process():
    """On a single process initialize() is a no-op join that still reports
    a consistent topology; is_primary is True."""
    from mellow_tpu.parallel import multihost

    info = multihost.initialize()
    assert info["process_index"] == 0
    assert info["process_count"] == 1
    assert info["global_devices"] >= 1
    assert multihost.is_primary()


def test_dp_shard_map_keeps_fused_paths(monkeypatch):
    """Pure-DP meshes route through generate_tokens_sharded (shard_map):
    every device runs the full single-chip program, so the packed fused
    decode kernel + chunked prefill survive the mesh (VERDICT r3 item 4 —
    the r3 wrapper forced them OFF under any mesh). Tokens must match the
    unsharded run exactly with the kernel forced on both sides."""
    monkeypatch.setenv("MELLOW_TPU_FORCE_FUSED_DECODE", "interpret")
    params = jmellow.init_params(jax.random.PRNGKey(0), SMALL)
    w_plain = MellowWrapper(
        "test_small", "v0", 0, params=params, tokenizer=ByteTokenizer()
    )
    mesh = shd.make_mesh(8)
    assert mesh.shape["model"] == 1
    w_dp = MellowWrapper(
        "test_small", "v0", 0, params=params, tokenizer=ByteTokenizer(),
        mesh=mesh,
    )
    ex = [
        [REF_WAV1, REF_WAV2, "alpha"],
        [REF_WAV2, REF_WAV2, "beta"],
    ]
    a = w_plain.generate(ex, max_len=6)
    b = w_dp.generate(ex, max_len=6)
    assert a == b


def test_dp_shard_map_sampling_valid():
    """Sampling under the shard_map path: per-shard rng streams (folded
    device index) produce in-vocab draws; shapes and trimming hold."""
    params = jmellow.init_params(jax.random.PRNGKey(0), SMALL)
    mesh = shd.make_mesh(8)
    w_dp = MellowWrapper(
        "test_small", "v0", 0, params=params, tokenizer=ByteTokenizer(),
        mesh=mesh,
    )
    preds = w_dp.generate(
        [[REF_WAV1, REF_WAV2, "gamma"]], max_len=6, top_p=0.9,
        temperature=0.8, sample=True, seed=11,
    )
    assert len(preds) == 1 and isinstance(preds[0], str)


def test_generate_tokens_sharded_rejects_ragged_batch():
    params = jmellow.init_params(jax.random.PRNGKey(0), SMALL)
    mesh = shd.make_mesh(8)
    import numpy as _np
    with pytest.raises(ValueError, match="not divisible"):
        jmellow.generate_tokens_sharded(
            params, SMALL,
            jnp.zeros((3, 320000)), jnp.zeros((3, 320000)),
            jnp.zeros((3, 8), jnp.int32), mesh=mesh, max_len=4,
        )
