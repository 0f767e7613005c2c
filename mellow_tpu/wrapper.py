"""MellowWrapper: the user-facing API, signature-compatible with the
reference (mellow/wrapper.py:25-287) but TPU-native underneath:

  * preprocessing (wav load, resample, repeat-pad / random-crop) is torch-free
    host code feeding fixed-shape device buffers;
  * encoder + prefix + the entire decode loop run as ONE jitted XLA program
    with a static KV cache (the reference re-ran the full LM per token with a
    Python loop, wrapper.py:216-217);
  * batch sizes are bucketed to powers of two so recompilation is bounded;
    padding rows start "done" and cannot alter real rows' tokens;
  * decoding semantics are bit-compatible: the reference's top-p + argmax is
    exactly greedy (SURVEY.md section 3.4 Q1), all rows run until every row has
    stopped (Q2), and outputs are split at the stop token string.

Differences from the reference (all additive):
  * ``params_path`` / ``MELLOW_TPU_PARAMS`` load a converted .npz instead of
    downloading from HF hub (this env has no network);
  * ``sample=True`` enables real nucleus sampling (new feature);
  * ``crop_start`` pins the >10 s random crop for reproducibility
    (SURVEY.md section 7.3 item 6); default keeps the reference's Python
    ``random.randrange`` behavior for parity.
"""

from __future__ import annotations

import os
import random
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mellow_tpu.config import MellowConfig, get_config
from mellow_tpu.io.resample import resample
from mellow_tpu.io.tokenizer import load_tokenizer
from mellow_tpu.io.wav import read_wav
from mellow_tpu.models import generate as gen
from mellow_tpu.models import mellow as mellow_model
from mellow_tpu.models.generate import GenerateResult

_HF_REPO = "soham97/mellow"
_MODEL_FILES = {"v0": "v0.ckpt", "v0_s": "v0_s.ckpt"}


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


class MellowWrapper:
    """Drop-in equivalent of the reference MellowWrapper (wrapper.py:25)."""

    model_repo = _HF_REPO
    model_name = _MODEL_FILES

    def __init__(
        self,
        config: str = "v0",
        model: str = "v0",
        device: int = 0,
        use_cuda: bool = True,  # accepted for API parity; TPU placement is
        # managed by JAX, the flag is ignored.
        *,
        params_path: Optional[str] = None,
        params: Optional[dict] = None,
        tokenizer=None,
        compute_dtype: Optional[str] = None,
        weight_dtype: Optional[str] = None,  # "int8": quantize decoder
        # matmul weights (perf mode, ~halves decode HBM traffic).
        # "int8-w8a8": additionally run the prefill MLP halves as W8A8
        # (in-kernel int8 activation quant, native int8 MXU dots — a
        # further lossy step; llama family only, measured -13% prefill)
        use_native_audio: Optional[bool] = None,  # None = auto-detect
        mesh=None,  # jax.sharding.Mesh for multi-chip data-parallel inference
    ):
        if model not in self.model_name:
            raise ValueError(
                f"The model {model} is not supported. The supported versions "
                f"are {str(self.model_name.keys())}"
            )
        from mellow_tpu.utils.compile_cache import enable as _enable_cache

        _enable_cache()  # persistent XLA cache (MELLOW_TPU_COMPILE_CACHE=off to skip)
        self.cfg: MellowConfig = get_config(config)
        if compute_dtype:
            self.cfg = self.cfg.replace(compute_dtype=compute_dtype)
        self.model_version = model
        self.device = device

        if use_native_audio is None:
            from mellow_tpu.native import binding as native_audio

            self._native = native_audio if native_audio.available() else None
        elif use_native_audio:
            from mellow_tpu.native import binding as native_audio

            assert native_audio.available(), "native audio lib not built"
            self._native = native_audio
        else:
            self._native = None

        self.mesh = mesh
        self.params = self._load_params(model, params_path, params)
        self._w8a8 = weight_dtype == "int8-w8a8"
        if self._w8a8 and self.cfg.decoder_family != "llama":
            raise ValueError("weight_dtype 'int8-w8a8' is llama-family only")
        if weight_dtype in ("int8", "int8-w8a8"):
            if self.cfg.decoder_family == "llama":
                from mellow_tpu.models.llama import quantize_decoder as _q
            else:
                from mellow_tpu.models.gpt2 import quantize_gpt2 as _q
            self.params = {
                **self.params,
                "decoder": _q(self.params["decoder"], self.cfg.decoder),
            }
        elif weight_dtype is not None:
            raise ValueError(f"unsupported weight_dtype {weight_dtype!r}")
        if mesh is not None:
            # DP(+TP) inference: batch sharded on the data axis, decoder
            # weights sharded on the model axis per mellow_param_specs (with
            # tp=1 every spec degenerates to replication) — SURVEY.md
            # section 2.4 TPU-native plan.
            from mellow_tpu.parallel.sharding import shard_params

            self.params = shard_params(self.params, mesh)
        self.tokenizer = tokenizer or load_tokenizer(
            "HuggingFaceTB/SmolLM2-135M"
        )
        n_params = mellow_model.count_params(self.params)
        print(
            f"model {model}, {config}, parameter count: {n_params}"
        )  # parity with wrapper.py:90-93

    # ------------------------------------------------------------------
    # weights
    # ------------------------------------------------------------------

    def _load_params(self, model: str, params_path, params):
        from mellow_tpu.utils.params_io import load_params

        if params is not None:
            return params
        path = params_path or os.environ.get("MELLOW_TPU_PARAMS")
        if path is None:
            ckpt = os.environ.get("MELLOW_TPU_CKPT")
            if ckpt:
                return self._convert_torch_ckpt(ckpt)
            try:
                from huggingface_hub import hf_hub_download

                ckpt = hf_hub_download(self.model_repo, self.model_name[model])
                return self._convert_torch_ckpt(ckpt)
            except Exception as e:  # offline env
                raise RuntimeError(
                    "No weights available: checkpoint download failed and "
                    "neither params_path, params=, MELLOW_TPU_PARAMS nor "
                    "MELLOW_TPU_CKPT is set. Convert a torch checkpoint with "
                    "tools/convert_ckpt.py first."
                ) from e
        if path.endswith(".ckpt") or path.endswith(".pt"):
            return self._convert_torch_ckpt(path)
        tree = load_params(path)
        return jax.tree.map(jnp.asarray, tree)

    def _convert_torch_ckpt(self, ckpt_path: str):
        import torch  # converter-only dependency

        from mellow_tpu.tools.convert_ckpt import convert_mellow

        sd = torch.load(ckpt_path, map_location="cpu")
        if any(k.startswith("module.") for k in sd):
            sd = {k[len("module."):]: v for k, v in sd.items()}
        tree = convert_mellow(sd, self.cfg.decoder.num_layers)
        return jax.tree.map(jnp.asarray, tree)

    # ------------------------------------------------------------------
    # preprocessing (host side; semantics of wrapper.py:141-195)
    # ------------------------------------------------------------------

    def load_audio_into_array(
        self, audio_path: str, audio_duration: int, do_resample: bool = True,
        crop_start: Optional[int] = None,
    ) -> np.ndarray:
        target_sr = self.cfg.frontend.sample_rate
        need = audio_duration * target_sr
        if self._native is not None:
            # C++ fast path: decode + resample + repeat-pad in one call; the
            # random crop draw stays in Python for reference parity.
            seg, full_len, needs_crop = self._native.load_segment(
                audio_path, target_sr, need, -1, do_resample
            )
            if not needs_crop:
                return seg
            start = (
                random.randrange(full_len - need)
                if crop_start is None
                else crop_start
            )
            seg, _, _ = self._native.load_segment(
                audio_path, target_sr, need, start, do_resample
            )
            return seg
        data, sr = read_wav(audio_path)
        target_sr = self.cfg.frontend.sample_rate
        if do_resample and sr != target_sr:
            data = resample(data, sr, target_sr)
        x = data.reshape(-1)  # channel concat, matching wrapper.py:149
        need = audio_duration * target_sr
        if need >= x.shape[0]:
            reps = int(np.ceil(need / x.shape[0]))
            x = np.tile(x, reps)[:need]  # wrapper.py:154-160
        else:
            start = (
                random.randrange(x.shape[0] - need)
                if crop_start is None
                else crop_start
            )  # wrapper.py:161-167 (random crop); crop_start pins it
            x = x[start : start + need]
        return x.astype(np.float32)

    def preprocess_audio(
        self, audio_files: Sequence[str], do_resample: bool,
        crop_start=None,
    ) -> np.ndarray:
        """``crop_start``: None = independent random draw per file (the
        reference draws per file, wrapper.py:161-167); an int pins every
        file; a sequence pins each file separately."""
        if crop_start is None or isinstance(crop_start, int):
            starts = [crop_start] * len(audio_files)
        else:
            assert len(crop_start) == len(audio_files), (
                "crop_start sequence must match the number of files"
            )
            starts = list(crop_start)
        segs = [
            self.load_audio_into_array(
                f, self.cfg.frontend.segment_seconds, do_resample, s
            )
            for f, s in zip(audio_files, starts)
        ]
        return np.stack(segs, axis=0)  # (B, 320000)

    def preprocess_text(self, prompts: Sequence[str]) -> np.ndarray:
        max_len = self.cfg.text_tokenization_len
        if self.cfg.decoder_family == "gpt2":
            # reference appends the eos string for gpt-family decoders
            # (wrapper.py:185)
            prompts = [p + " <|endoftext|>" for p in prompts]
        rows = [self.tokenizer.encode_padded(p, max_len) for p in prompts]
        return np.asarray(rows, dtype=np.int32)

    # ------------------------------------------------------------------
    # generation
    # ------------------------------------------------------------------

    def generate(
        self,
        examples: Sequence[Sequence[str]],
        max_len: int = 300,
        top_p: float = 0.8,
        temperature: float = 1.0,
        stop_token: str = "<|endoftext|>",
        audio_resample: bool = True,
        *,
        sample: bool = False,
        seed: int = 0,
        crop_start: Optional[int] = None,
        kv_cache_dtype: Optional[str] = None,  # e.g. "int8" (perf option)
        top_k: int = 0,  # sampling-mode extra (0 = off)
        repetition_penalty: float = 1.0,  # HF/CTRL convention; 1.0 = off
        dynamic_batch: bool = False,  # cascade batch compaction: finished
        # rows stop costing decode steps (generate.generate_cascade)
    ) -> List[str]:
        """Produce text for [audio1, audio2, prompt] examples
        (signature: reference wrapper.py:258)."""
        paths1 = [e[0] for e in examples]
        paths2 = [e[1] for e in examples]
        prompts = [e[2] for e in examples]

        from mellow_tpu.utils import profiling
        from mellow_tpu.utils.metrics import GLOBAL as metrics

        audio1 = self.preprocess_audio(paths1, audio_resample, crop_start)
        audio2 = self.preprocess_audio(paths2, audio_resample, crop_start)
        text_ids = self.preprocess_text(prompts)

        # The jitted loop's stop id is derived from the stop_token argument,
        # like the reference (wrapper.py:208: tokenizer.encode(stop_token)[0]).
        try:
            stop_token_id = int(self.tokenizer.encode(stop_token)[0])
        except Exception:
            stop_token_id = self.cfg.stop_token_id

        with profiling.trace(), metrics.timer("generate"):
            result, n_real = self._generate_device(
                audio1, audio2, text_ids, max_len, top_p, temperature,
                sample=sample, seed=seed, kv_cache_dtype=kv_cache_dtype,
                stop_token_id=stop_token_id, top_k=top_k,
                repetition_penalty=repetition_penalty,
                dynamic_batch=dynamic_batch,
            )
            texts = self._detokenize(result, n_real, stop_token)
        metrics.count("tokens", n_real * int(result.num_steps))
        metrics.count("clips", 2 * n_real)
        metrics.count("generate_calls", 1)
        return texts

    def _prepare_device_inputs(self, audio1, audio2, text_ids):
        """Pow-2 batch bucketing (bounds recompiles), padding rows marked
        done, params cast to the compute dtype, mesh sharding. Shared by
        the one-shot and streaming generate paths."""
        B = audio1.shape[0]
        Bp = _next_pow2(B)  # bucket to bound recompiles
        if self.mesh is not None:
            dp = self.mesh.shape["data"]
            Bp = max(Bp, dp)
            Bp = -(-Bp // dp) * dp  # divisible by the data axis
        if Bp != B:
            pad = Bp - B
            audio1 = np.concatenate([audio1, np.zeros((pad,) + audio1.shape[1:], audio1.dtype)])
            audio2 = np.concatenate([audio2, np.zeros((pad,) + audio2.shape[1:], audio2.dtype)])
            text_ids = np.concatenate(
                [text_ids, np.zeros((pad, text_ids.shape[1]), text_ids.dtype)]
            )

        dtype = jnp.dtype(self.cfg.compute_dtype)
        params = self.params
        if dtype != jnp.float32:
            params = jax.tree.map(
                lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
                params,
            )

        # Padding rows start "done": they cannot extend the decode loop nor
        # change real rows (each row is independent under causal attention).
        initial_done = jnp.asarray(np.arange(Bp) >= B)
        if self.mesh is not None:
            from mellow_tpu.parallel.sharding import batch_sharding

            bsh = batch_sharding(self.mesh)
            audio1 = jax.device_put(np.asarray(audio1), bsh)
            audio2 = jax.device_put(np.asarray(audio2), bsh)
            text_ids = jax.device_put(np.asarray(text_ids), bsh)
            initial_done = jax.device_put(np.asarray(initial_done), bsh)
        return params, audio1, audio2, text_ids, initial_done, B, dtype

    def _generate_device(
        self, audio1, audio2, text_ids, max_len, top_p, temperature,
        *, sample=False, seed=0, kv_cache_dtype=None, stop_token_id=None,
        top_k=0, repetition_penalty=1.0, dynamic_batch=False,
    ):
        (params, audio1, audio2, text_ids, initial_done, B, dtype) = (
            self._prepare_device_inputs(audio1, audio2, text_ids)
        )
        precision = "highest" if dtype == jnp.float32 else "default"
        if not sample:
            # Greedy ignores the sampling knobs; pin them so the static
            # top_p/temperature jit keys don't fragment the compile cache.
            top_p, temperature = 0.8, 1.0
        # Cascade compaction is a single-device optimization: its host-side
        # row gathers would fight the DP sharding (and per-device batches
        # under a mesh are small anyway).
        gen_fn = (
            mellow_model.generate_tokens_dynamic
            if dynamic_batch and self.mesh is None
            else mellow_model.generate_tokens
        )
        pure_dp = self.mesh is not None and self.mesh.shape.get("model", 1) == 1
        with jax.default_matmul_precision(precision):
            if pure_dp:
                # shard_map path: every device runs the full single-chip
                # program (fused decode kernel, chunked prefill, per-shard
                # early exit) on its local rows — the r3 hard-offs below
                # only apply to TP meshes now (VERDICT r3 item 4).
                result = mellow_model.generate_tokens_sharded(
                    params, self.cfg,
                    jnp.asarray(audio1, dtype), jnp.asarray(audio2, dtype),
                    jnp.asarray(text_ids),
                    mesh=self.mesh, max_len=max_len, greedy=not sample,
                    top_p=top_p, temperature=temperature,
                    rng=jax.random.PRNGKey(seed),
                    cache_dtype=kv_cache_dtype or str(dtype),
                    initial_done=initial_done, stop_token_id=stop_token_id,
                    top_k=top_k, repetition_penalty=repetition_penalty,
                    w8a8=self._w8a8,
                )
                return result, B
            result = gen_fn(
                params,
                self.cfg,
                jnp.asarray(audio1, dtype),
                jnp.asarray(audio2, dtype),
                jnp.asarray(text_ids),
                max_len=max_len,
                greedy=not sample,
                top_p=top_p,
                temperature=temperature,
                rng=jax.random.PRNGKey(seed),
                cache_dtype=kv_cache_dtype or str(dtype),
                initial_done=initial_done,
                stop_token_id=stop_token_id,
                top_k=top_k,
                repetition_penalty=repetition_penalty,
                w8a8=self._w8a8,
                **(
                    # TP mesh (model axis > 1): the decoder runs under
                    # auto-SPMD jit. A batch-axis slice would force
                    # cross-device gathers and the Pallas custom calls do
                    # not partition, so chunked prefill and the fused
                    # decode kernel stay off here; pure-DP meshes take the
                    # shard_map path above instead.
                    {"prefill_chunk": 0, "fused_decode": False}
                    if self.mesh is not None
                    else {}
                ),
            )
        return result, B

    def generate_stream(
        self,
        examples: Sequence[Sequence[str]],
        max_len: int = 300,
        top_p: float = 0.8,
        temperature: float = 1.0,
        stop_token: str = "<|endoftext|>",
        audio_resample: bool = True,
        *,
        sample: bool = False,
        seed: int = 0,
        crop_start: Optional[int] = None,
        kv_cache_dtype: Optional[str] = None,
        top_k: int = 0,
        repetition_penalty: float = 1.0,
    ):
        """Streaming ``generate``: yields the batch's partial texts (one
        list[str] per flush window, each already stop-token-trimmed like
        the final result) and ends with the complete texts. Token streams
        are identical to ``generate`` (same jitted window body —
        generate.generate_stream); the cost is one host fetch per W
        tokens. The reference has no incremental surface (its loop
        returns only at the end, wrapper.py:216-256); this powers the
        HTTP server's SSE endpoint."""
        paths1 = [e[0] for e in examples]
        paths2 = [e[1] for e in examples]
        prompts = [e[2] for e in examples]
        audio1 = self.preprocess_audio(paths1, audio_resample, crop_start)
        audio2 = self.preprocess_audio(paths2, audio_resample, crop_start)
        text_ids = self.preprocess_text(prompts)
        try:
            stop_token_id = int(self.tokenizer.encode(stop_token)[0])
        except Exception:
            stop_token_id = self.cfg.stop_token_id

        (params, audio1, audio2, text_ids, initial_done, B, dtype) = (
            self._prepare_device_inputs(audio1, audio2, text_ids)
        )
        text_ids = jnp.asarray(text_ids)
        precision = "highest" if dtype == jnp.float32 else "default"
        with jax.default_matmul_precision(precision):
            prefix = mellow_model._encode_prefix_jit(
                params, self.cfg,
                jnp.asarray(audio1, dtype), jnp.asarray(audio2, dtype),
                text_ids,
            )
            for result in gen.generate_stream(
                params["decoder"],
                self.cfg.decoder,
                prefix,
                max_len=max_len,
                stop_token_id=stop_token_id,
                greedy=not sample,
                top_p=top_p,
                temperature=temperature,
                rng=jax.random.PRNGKey(seed),
                cache_dtype=(kv_cache_dtype or str(dtype)),
                initial_done=initial_done,
                family=self.cfg.decoder_family,
                top_k=top_k,
                repetition_penalty=repetition_penalty,
                prompt_tokens=text_ids,
                prompt_mask=text_ids != self.cfg.pad_token_id,
                **({"fused_decode": False, "prefill_chunk": 0}
                   if self.mesh is not None else {}),
            ):
                yield self._detokenize(result, B, stop_token)

    def _detokenize(
        self, result: GenerateResult, n_real: int, stop_token: str
    ) -> List[str]:
        tokens = np.asarray(result.tokens)[:n_real]
        n = int(result.num_steps)
        out = []
        for row in tokens[:, :n]:
            text = self.tokenizer.decode(row.tolist())
            out.append(text.split(stop_token)[0])  # wrapper.py:254
        return out
