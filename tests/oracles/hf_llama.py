"""Torch/HF oracle for the decoder: the reference drives exactly
``AutoModelForCausalLM`` (Llama architecture) via ``inputs_embeds``
(mellow/model/decoder.py:25, mellow/wrapper.py:217). With no network access
we construct the same architecture from a local ``LlamaConfig`` with random
weights — token/logit parity against this oracle validates our JAX Llama
bit-for-bit at the architecture level; real v0 weights only change numbers,
not code paths."""

import torch
from transformers import LlamaConfig as HFLlamaConfig
from transformers import LlamaForCausalLM

from mellow_tpu.config import LlamaConfig


def build_hf_model(cfg: LlamaConfig, seed: int = 0) -> LlamaForCausalLM:
    torch.manual_seed(seed)
    hf_cfg = HFLlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        tie_word_embeddings=cfg.tie_word_embeddings,
        max_position_embeddings=cfg.max_position_embeddings,
        attention_bias=False,
        mlp_bias=False,
    )
    model = LlamaForCausalLM(hf_cfg)
    model.eval()
    return model


def reference_greedy_decode(model, prefix_embeds: torch.Tensor, max_len: int, stop_id: int):
    """The reference decode loop semantics (mellow/wrapper.py:197-249):
    full recompute each step, top-p+argmax == greedy, stop when all rows
    have emitted the stop token."""
    generated = prefix_embeds
    tokens = None
    with torch.no_grad():
        for _ in range(max_len):
            logits = model(inputs_embeds=generated).logits[:, -1, :]
            next_token = torch.argmax(logits, -1).unsqueeze(1)
            emb = model.model.embed_tokens(next_token)
            tokens = next_token if tokens is None else torch.cat([tokens, next_token], 1)
            generated = torch.cat([generated, emb], dim=1)
            if ((tokens == stop_id).sum(dim=-1) > 0).all():
                break
    return tokens
