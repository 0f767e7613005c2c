"""YAML config compatibility + model registry tests."""

import os

import pytest

from mellow_tpu.config import get_config
from mellow_tpu.config_yaml import load_yaml_config, register_yaml_config
from mellow_tpu.models.registry import get_model

V0_YAML = os.path.join(
    os.path.dirname(__file__), "..", "mellow_tpu", "configs", "v0.yaml"
)


def test_v0_yaml_matches_registry_config():
    cfg = load_yaml_config(V0_YAML, "v0_from_yaml")
    ref = get_config("v0")
    assert cfg.prefix_length == ref.prefix_length == 389
    assert cfg.d_proj == ref.d_proj == 576
    assert cfg.text_tokenization_len == ref.text_tokenization_len == 129
    assert cfg.frontend == ref.frontend
    assert cfg.encoder == ref.encoder
    assert cfg.decoder == ref.decoder
    assert cfg.decoder_family == "llama"


def test_yaml_rejects_unknown_encoder(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text(
        "data: {sampling_rate: 32000}\n"
        "model:\n  encoder: {audioenc_name: CNN14}\n  decoder: {}\n"
    )
    with pytest.raises(ValueError, match="unsupported audio encoder"):
        load_yaml_config(str(p))


def test_yaml_gpt2_family(tmp_path):
    p = tmp_path / "g.yaml"
    p.write_text(
        "data: {text_tokenization_len: 129}\n"
        "model:\n"
        "  encoder: {audioenc_name: HTSAT, d_proj: 768}\n"
        "  decoder: {text_decoder: gpt2, prefix_length: 389}\n"
        "decoder_arch: {hidden_size: 768, num_layers: 12, num_heads: 12}\n"
    )
    cfg = load_yaml_config(str(p))
    assert cfg.decoder_family == "gpt2"
    assert cfg.sep_token_id == 50256


def test_register_yaml_config():
    cfg = register_yaml_config("v0_yaml_reg", V0_YAML)
    assert get_config("v0_yaml_reg") is cfg


def test_model_registry():
    m = get_model("Mellow")
    assert callable(m.generate_tokens) and callable(m.forward_train)
    with pytest.raises(ValueError, match="not supported"):
        get_model("Adiff")


def test_audio_encoder_factory():
    from mellow_tpu.models.registry import get_audio_encoder

    enc = get_audio_encoder("HTSAT")
    assert callable(enc.encode_audio)
    with pytest.raises(ValueError, match="not supported"):
        get_audio_encoder("CNN14")
