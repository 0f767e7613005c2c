"""Mesh + sharding layer (SPMD over TPU slices).

The reference has NO distributed machinery (SURVEY.md section 2.4: no
torch.distributed, no launcher, no NCCL). The TPU-native equivalent is
declarative: build a ``jax.sharding.Mesh``, annotate params/batch with
``NamedSharding``, and let XLA insert ICI collectives under jit.

Axes:
  * ``data``  — batch dimension (DP). Always available.
  * ``model`` — tensor parallelism (TP) over the decoder's MLP intermediate
    dim, vocab/embedding, and (when head counts divide) attention heads.

At Mellow's 167M-parameter scale DP is the strategy that matters for
throughput; TP is provided for generality and validated by the multi-chip
dry run. PP/EP/CP are explicit non-goals at this scale (SURVEY.md
section 2.4), revisit if model size grows.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, tp: Optional[int] = None
) -> Mesh:
    """Build a (data, model) mesh over the first ``n_devices`` devices.

    tp defaults to the largest factor of n_devices that also divides the
    decoder's KV-head count (3) — i.e. 3 when possible, else 1 (pure DP).
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if tp is None:
        tp = 3 if n % 3 == 0 else 1
    assert n % tp == 0, (n, tp)
    dp = n // tp
    dev_grid = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(dev_grid, ("data", "model"))


def _decoder_specs(tp: int, heads_divisible: bool) -> dict:
    """PartitionSpecs for the stacked-layer Llama tree (leading L axis is
    never sharded — it is scanned)."""
    attn = "model" if heads_divisible else None
    return {
        "embed": P("model", None),  # vocab-sharded; head matmul -> psum
        "layers": {
            "ln_attn": P(None, None),
            "ln_mlp": P(None, None),
            "wq": P(None, None, attn),
            "wk": P(None, None, attn),
            "wv": P(None, None, attn),
            "wo": P(None, attn, None),
            "w_gate": P(None, None, "model"),
            "w_up": P(None, None, "model"),
            "w_down": P(None, "model", None),
        },
        "norm_f": P(None),
        # int8-weight mode (llama.quantize_decoder): vocab-sharded logits head
        "lm_head": P(None, "model"),
        "lm_head_q": P(None, "model"),
    }


def mellow_param_specs(params: dict, mesh: Mesh, num_heads_kv: int = 3) -> dict:
    """Full-model PartitionSpec tree (same structure as ``params``): decoder
    TP-sharded, audio encoder replicated (it is ~30M params — replication is
    the right call at this scale; its batch dim is DP-sharded through the
    inputs)."""
    tp = mesh.shape["model"]
    heads_div = num_heads_kv % tp == 0
    dec = _decoder_specs(tp, heads_div)

    def lookup(path) -> P:
        # path: tuple of DictKey/SequenceKey entries from tree_map_with_path.
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if keys and keys[0] == "decoder":
            node = dec
            for k in keys[1:]:
                if isinstance(node, dict) and k in node:
                    node = node[k]
                elif isinstance(node, P) and k == "q":
                    # int8-quantized kernel {"q", "scale"}: values shard like
                    # the float kernel.
                    return node
                elif isinstance(node, P) and k == "scale":
                    # per-out-channel scale: kernel spec minus the
                    # contraction (second-to-last) axis.
                    return P(*(tuple(node)[:-2] + tuple(node)[-1:])) if len(node) >= 2 else P()
                else:
                    return P()
            return node if isinstance(node, P) else P()
        return P()

    return jax.tree_util.tree_map_with_path(lambda path, _: lookup(path), params)


def shard_params(params: dict, mesh: Mesh) -> dict:
    specs = mellow_param_specs(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis DP sharding for input batches."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
