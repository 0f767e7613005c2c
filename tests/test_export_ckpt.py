"""Checkpoint round-trip: tools/export_ckpt must be the exact inverse of
tools/convert_ckpt over every learned parameter + BN statistic, so a
model fine-tuned here loads back into the reference PyTorch stack
(mellow/wrapper.py:74-82; constructed buffers are rebuilt by torch
__init__, export_ckpt module docstring)."""

import os
import sys

import numpy as np
import jax
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.convert_ckpt import convert_encoder_bundle, convert_llama  # noqa: E402
from tools.export_ckpt import export_mellow  # noqa: E402
from tests.oracles import torch_htsat as enc_oracle  # noqa: E402
from tests.oracles.hf_llama import build_hf_model  # noqa: E402
from mellow_tpu.config import LlamaConfig  # noqa: E402

DEC = LlamaConfig(
    vocab_size=512, hidden_size=64, intermediate_size=128, num_layers=3,
    num_heads=4, num_kv_heads=2, head_dim=16,
)


def _reference_sd(seed=0):
    torch.manual_seed(seed)
    audio_side = enc_oracle.OracleWrapper(d_proj=64, embed_dim=24)
    with torch.no_grad():
        bn = audio_side.htsat.bn0
        bn.running_mean.copy_(torch.randn(64))
        bn.running_var.copy_(torch.rand(64) * 2 + 0.5)
    sd = {}
    for k, v in audio_side.state_dict().items():
        if k.startswith("htsat.") or k.startswith("c2l."):
            sd["audio_encoder.base." + k] = v
        else:
            sd["audio_encoder.projection." + k] = v
    hf = build_hf_model(DEC, seed=seed + 1)
    for k, v in hf.state_dict().items():
        sd["caption_decoder.lm." + k] = v
    return sd


def test_roundtrip_encoder_and_decoder():
    sd = _reference_sd()
    params = convert_encoder_bundle(sd)
    params["decoder"] = convert_llama(sd, DEC.num_layers,
                                      prefix="caption_decoder.lm.")
    out = export_mellow(params)

    # 1) Every learned/BN key of the reference checkpoint is re-emitted
    #    with identical values.
    skip_suffixes = (
        "num_batches_tracked", "relative_position_index", "attn_mask",
        "rotary_emb.inv_freq",
    )
    checked = 0
    for k, v in sd.items():
        if any(k.endswith(s) or s in k for s in skip_suffixes):
            continue
        assert k in out, f"export missing {k}"
        np.testing.assert_array_equal(
            out[k], np.asarray(v.detach().numpy(), np.float32), err_msg=k
        )
        checked += 1
    assert checked > 50
    # 2) No stray keys beyond the reference's learned set.
    learned = {
        k for k in sd
        if not any(s in k for s in skip_suffixes)
    }
    assert set(out) == learned

    # 3) convert(export(params)) == params, leaf-exact.
    params2 = convert_encoder_bundle(
        {k: torch.from_numpy(v) for k, v in out.items()}
    )
    params2["decoder"] = convert_llama(
        {k: torch.from_numpy(v) for k, v in out.items()},
        DEC.num_layers, prefix="caption_decoder.lm.",
    )
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = dict(
        (jax.tree_util.keystr(p), l)
        for p, l in jax.tree_util.tree_leaves_with_path(params2)
    )
    for path, leaf in flat1:
        key = jax.tree_util.keystr(path)
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat2[key]), err_msg=key
        )


def test_reference_stack_loads_export():
    """The torch oracle modules load the exported state_dict cleanly
    (strict over their own learned keys) and produce identical outputs —
    the 'fine-tune here, deploy on the reference stack' contract."""
    sd = _reference_sd(seed=3)
    params = convert_encoder_bundle(sd)
    params["decoder"] = convert_llama(sd, DEC.num_layers,
                                      prefix="caption_decoder.lm.")
    out = export_mellow(params)

    torch.manual_seed(99)  # different init — loading must overwrite it
    audio_side = enc_oracle.OracleWrapper(d_proj=64, embed_dim=24)
    enc_sd = {}
    for k, v in out.items():
        if k.startswith("audio_encoder.base."):
            enc_sd[k[len("audio_encoder.base."):]] = torch.from_numpy(v)
        elif k.startswith("audio_encoder.projection."):
            enc_sd[k[len("audio_encoder.projection."):]] = torch.from_numpy(v)
    missing, unexpected = audio_side.load_state_dict(enc_sd, strict=False)
    assert not unexpected, unexpected
    # everything missing must be a constructed buffer, not a parameter
    assert all(
        "relative_position_index" in k or "attn_mask" in k
        or "num_batches_tracked" in k
        for k in missing
    ), missing

    hf = build_hf_model(DEC, seed=123)
    dec_sd = {
        k[len("caption_decoder.lm."):]: torch.from_numpy(v)
        for k, v in out.items()
        if k.startswith("caption_decoder.lm.")
    }
    missing, unexpected = hf.load_state_dict(dec_sd, strict=False)
    assert not unexpected, unexpected
    assert all("rotary_emb" in k for k in missing), missing

    # output parity vs the original oracle weights
    ref_side = enc_oracle.OracleWrapper(d_proj=64, embed_dim=24)
    ref_side.load_state_dict(
        {k[len("audio_encoder.base."):] if k.startswith("audio_encoder.base.")
         else k[len("audio_encoder.projection."):]: v
         for k, v in sd.items()},
        strict=False,
    )
    x = torch.randn(2, 1, 256, 256)  # (B, 1, spec, spec) oracle image input
    with torch.no_grad():
        a = audio_side(x)["projected"]
        b = ref_side(x)["projected"]
    np.testing.assert_allclose(a.numpy(), b.numpy(), atol=1e-6)
