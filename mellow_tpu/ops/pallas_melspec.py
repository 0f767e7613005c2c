"""Fused Pallas log-mel front-end kernel.

One kernel computes frame -> hann-windowed DFT (as an MXU matmul against the
precomputed windowed basis) -> power -> mel projection -> 10*log10, entirely
in VMEM — the 513-bin power spectrum never round-trips to HBM (the reference
materializes it between two torch modules, mellow/model/htsat.py:864-865).

Layout:
  * host/XLA side reflect-pads the waveform (320000 -> 321024 samples) and
    pads the frame axis 1001 -> 1024;
  * grid (B, 8): each program owns 128 frames of one batch row;
  * the wave is viewed as (S/64, 64) chunks (64 = gcd(hop, n_fft)) so frame
    starts land on chunk boundaries; the whole padded row (1.25 MB fp32)
    sits in VMEM per program and frames are materialized by 128 sublane
    dynamic slices into a (128, 16, 64) scratch tile;
  * the windowed DFT runs as 16 accumulated (128, 64) @ (64, 1026) MXU
    matmuls (fp32 HIGHEST precision), then power -> mel -> log10 on the VPU;
  * max 3.5e-5 dB deviation vs the jnp pipeline. Measured crossover on
    v5e-1 (AFTER frontend.frame_signal's strided-slice rewrite doubled the
    jnp pipeline): the kernel wins only at B=1 (384 vs 325 clips/s, 1.2x)
    and loses at B>=8 — its per-frame VPU fill loop is the scaling wall
    while the jnp path is pure MXU matmuls. ``log_mel_auto`` dispatches
    here only at small batch; tables in benchmarks/README.md.

Use ``log_mel_spectrogram_pallas`` as a drop-in for
mellow_tpu.ops.frontend.log_mel_spectrogram.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mellow_tpu.config import FrontendConfig
from mellow_tpu.ops import frontend as fe

_FRAMES_PER_TILE = 128


_CHUNK = 64  # gcd(hop=320, n_fft=1024); wave is chunked (S/64, 64) so frame
# starts land on chunk boundaries (5 chunks/hop, 16 chunks/frame).


def _kernel(wave_ref, basis_ref, fb_ref, out_ref, frames_scratch, amin, ref_db):
    tile = pl.program_id(1)
    chunks_per_hop = 320 // _CHUNK  # 5
    chunks_per_frame = 1024 // _CHUNK  # 16

    def fill_frame(i, _):
        start = tile * _FRAMES_PER_TILE * chunks_per_hop + i * chunks_per_hop
        frames_scratch[i, :, :] = wave_ref[0, pl.ds(start, chunks_per_frame), :]
        return 0

    jax.lax.fori_loop(0, _FRAMES_PER_TILE, fill_frame, 0)

    # Windowed DFT as 16 accumulated MXU matmuls:
    # (128, 64) @ (64, 1026) per 64-sample chunk, fp32 accumulate.
    proj = jnp.zeros((_FRAMES_PER_TILE, 1026), jnp.float32)
    for c in range(chunks_per_frame):
        proj = proj + jnp.dot(
            frames_scratch[:, c, :],
            basis_ref[c, :, :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    re = proj[:, :513]
    im = proj[:, 513:1026]
    power = re * re + im * im  # (128, 513)

    mel = jnp.dot(
        power, fb_ref[:, :], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    mel = jnp.maximum(mel, amin)
    out_ref[0, :, :] = 10.0 * (jnp.log(mel) / np.float32(np.log(10.0))) - ref_db


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def log_mel_spectrogram_pallas(
    wave: jax.Array, cfg: FrontendConfig, *, interpret: bool = False
) -> jax.Array:
    """(B, 320000) float32 -> (B, 1001, 64) log-mel, fused on-chip."""
    assert cfg.n_fft == 1024 and cfg.hop_length == 320, "kernel is specialized"
    B = wave.shape[0]
    pad = cfg.n_fft // 2
    padded = jnp.pad(wave.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    # Frame axis padded 1001 -> 1024; the tail frames read past the real
    # signal, so extend the wave to cover them (values discarded at slice).
    frames_padded = 8 * _FRAMES_PER_TILE
    need = (frames_padded - 1) * cfg.hop_length + cfg.n_fft
    extra = need - padded.shape[1]
    if extra > 0:
        padded = jnp.pad(padded, ((0, 0), (0, extra)))

    # Round wave length up to a whole number of 64-sample chunks.
    S = padded.shape[1]
    if S % _CHUNK:
        padded = jnp.pad(padded, ((0, 0), (0, _CHUNK - S % _CHUNK)))
        S = padded.shape[1]
    wave_chunks = padded.reshape(B, S // _CHUNK, _CHUNK)
    basis = jnp.asarray(fe.dft_basis(cfg.n_fft)).reshape(
        cfg.n_fft // _CHUNK, _CHUNK, 2 * cfg.num_bins
    )  # (16, 64, 1026)
    fb = jnp.asarray(
        fe.mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    )  # (513, 64)
    amin = np.float32(cfg.amin)
    ref_db = np.float32(10.0 * np.log10(max(cfg.amin, cfg.ref)))

    out = pl.pallas_call(
        functools.partial(_kernel, amin=amin, ref_db=ref_db),
        grid=(B, frames_padded // _FRAMES_PER_TILE),
        in_specs=[
            pl.BlockSpec(
                (1, S // _CHUNK, _CHUNK),
                lambda b, t: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _FRAMES_PER_TILE, cfg.n_mels),
            lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, frames_padded, cfg.n_mels), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_FRAMES_PER_TILE, cfg.n_fft // _CHUNK, _CHUNK), jnp.float32)
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * frames_padded * cfg.n_fft * (2 * cfg.num_bins)
            + 2 * B * frames_padded * cfg.num_bins * cfg.n_mels,
            bytes_accessed=4 * B * (8 * padded.shape[1] + frames_padded * cfg.n_mels),
            transcendentals=B * frames_padded * cfg.n_mels,
        ),
    )(wave_chunks, basis, fb)
    return out[:, : cfg.num_frames, :]
