"""Decoder-family dispatch (reference: mellow/model/decoder.py branches on
'gpt2' vs 'smollm2' in the model name, decoder.py:26-31/41-52). Both
families expose the same functional protocol: create_cache / prefill /
decode_step / logits_from_hidden / embed_table."""

from __future__ import annotations

from types import SimpleNamespace


def get_decoder_ops(family: str) -> SimpleNamespace:
    if family == "llama":
        from mellow_tpu.models import llama as m

        return SimpleNamespace(
            family="llama",
            create_cache=m.KVCache.create,
            prefill=m.prefill,
            decode_step=m.decode_step,
            flush_pending=m.flush_pending,
            logits_from_hidden=m.logits_from_hidden,
            embed_table=lambda params: params["embed"],
            init_params=m.init_params,
            forward=m.forward,
        )
    if family == "gpt2":
        from mellow_tpu.models import gpt2 as m

        return SimpleNamespace(
            family="gpt2",
            create_cache=m.GPT2Cache.create,
            prefill=m.prefill,
            decode_step=m.decode_step,
            flush_pending=m.flush_pending,
            logits_from_hidden=m.logits_from_hidden,
            embed_table=lambda params: params["wte"],
            init_params=m.init_params,
            forward=m.forward,
        )
    raise ValueError(f"unknown decoder family '{family}' (llama|gpt2)")
