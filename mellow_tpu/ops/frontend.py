"""Log-mel front-end ops, TPU-first.

The reference computes the spectrogram with torchlibrosa's conv1d-DFT
``Spectrogram`` and ``LogmelFilterBank`` (mellow/model/htsat.py:647-653).
Here the STFT is framed + windowed + rFFT-as-matmul: the (n_fft, 2*n_bins)
DFT basis matrix is MXU-friendly, shapes are fully static
(320000 samples -> 1001 frames x 513 bins), and XLA fuses power/mel/log.
A fused Pallas kernel variant lives in mellow_tpu/ops/pallas_melspec.py.

All constants (window, DFT basis, mel filterbank, bicubic matrix) are
computed once in float64 numpy and cached per-config.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mellow_tpu.config import FrontendConfig


# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

def hann_window(n: int) -> np.ndarray:
    """Periodic ('fftbins') Hann window, matching
    scipy.signal.get_window('hann', n, fftbins=True) used by torchlibrosa."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float64)


@functools.lru_cache(maxsize=4)
def dft_basis(n_fft: int) -> np.ndarray:
    """Windowed real-DFT basis, (n_fft, 2*n_bins): columns are
    [cos_k ... | -sin_k ...] each multiplied by the Hann window, so
    frames @ basis yields [real | imag] parts of the onesided FFT."""
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    win = hann_window(n_fft)[:, None]
    real = np.cos(ang) * win
    imag = -np.sin(ang) * win
    return np.concatenate([real, imag], axis=1).astype(np.float32)


def hz_to_mel(hz):
    """Slaney mel scale (librosa htk=False): linear below 1 kHz,
    logarithmic above."""
    hz = np.asarray(hz, dtype=np.float64)
    f_sp = 200.0 / 3.0
    mel = hz / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = hz >= min_log_hz
    mel = np.where(log_region, min_log_mel + np.log(np.maximum(hz, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def mel_to_hz(mel):
    mel = np.asarray(mel, dtype=np.float64)
    f_sp = 200.0 / 3.0
    hz = mel * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mel >= min_log_mel
    hz = np.where(log_region, min_log_hz * np.exp(logstep * (mel - min_log_mel)), hz)
    return hz


@functools.lru_cache(maxsize=4)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, (n_bins, n_mels).
    Reimplements librosa.filters.mel(htk=False, norm='slaney') from its
    published algorithm (the filterbank torchlibrosa bakes into its frozen
    Linear layer, htsat.py:651-653)."""
    n_bins = n_fft // 2 + 1
    fftfreqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))

    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]  # (n_mels+2, n_bins)

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))  # (n_mels, n_bins)

    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # (n_bins, n_mels)


def cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """PyTorch's bicubic convolution kernel (a = -0.75)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0,
        np.where(ax < 2.0, a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=4)
def bicubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) matrix reproducing torch's 1-D cubic interpolation with
    align_corners=True (the time-axis 1001 -> 1024 resize at htsat.py:837;
    F-axis is already 64 so only one axis interpolates -> bicubic degenerates
    to 1-D cubic). jax.image.resize uses different conventions, so we build
    the explicit matrix (SURVEY.md section 7.3 item 1).

    Numerics note: torch computes the source position AND the polynomial
    weights in float32 (upsample_bicubic2d CPU/CUDA kernels); computing them
    in float64 drifts up to ~3e-4 at high frame indices, so we replicate the
    fp32 arithmetic step by step."""
    W = np.zeros((n_out, n_in), dtype=np.float64)
    scale = (
        np.float32(n_in - 1) / np.float32(n_out - 1) if n_out > 1 else np.float32(0.0)
    )
    A = np.float32(-0.75)
    one, five, eight, four = (np.float32(v) for v in (1.0, 5.0, 8.0, 4.0))

    def cc1(x):  # |x| <= 1 branch, torch cubic_convolution1, fp32
        x = np.float32(x)
        return ((A + np.float32(2.0)) * x - (A + np.float32(3.0))) * x * x + one

    def cc2(x):  # 1 < |x| < 2 branch, torch cubic_convolution2, fp32
        x = np.float32(x)
        return ((A * x - five * A) * x + eight * A) * x - four * A

    for i in range(n_out):
        src = np.float32(np.float32(i) * scale)
        f = int(np.floor(src))
        t = np.float32(src - np.float32(f))
        coeffs = [cc2(t + one), cc1(t), cc1(one - t), cc2(np.float32(2.0) - t)]
        for off, wj in zip((-1, 0, 1, 2), coeffs):
            j = min(max(f + off, 0), n_in - 1)
            W[i, j] += float(wj)
    return W.astype(np.float32)


# ---------------------------------------------------------------------------
# jax ops
# ---------------------------------------------------------------------------

def _frame_parts(x: jax.Array, cfg: FrontendConfig):
    """Framing decomposed into q + 1 CONTIGUOUS slices.

    View the (reflect-padded) wave as chunks of size ``hop``: every frame
    start lands on a chunk boundary, so frame t is chunks [t, t + q) plus
    the first r samples of chunk t + q (q = n_fft // hop, r = n_fft -
    q * hop). Slice i over all frames is then ONE stride-1 slice of the
    chunk axis — cheap bulk copies. (The r3 form used gcd(hop, n_fft)=64
    chunks: 16 STRIDE-5 slices, each of which the TPU executes at a
    fraction of stream rate — profiled ~1.0 ms of the B=32 encoder pass.
    The contiguous form's 3+1 slices are ~10x cheaper, same elements.)

    Returns ([(part, col)], n_frames): ``part`` is (B, n_frames, w)
    covering frame columns [col, col + w)."""
    pad = cfg.n_fft // 2
    B = x.shape[0]
    hop, n_fft = cfg.hop_length, cfg.n_fft
    n_frames = 1 + x.shape[1] // hop
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    q, r = divmod(n_fft, hop)
    need_chunks = n_frames + q
    total = need_chunks * hop
    if x.shape[1] < total:
        x = jnp.pad(x, ((0, 0), (0, total - x.shape[1])))
    chunks = x[:, :total].reshape(B, need_chunks, hop)
    parts = [
        (jax.lax.slice(chunks, (0, i, 0), (B, i + n_frames, hop)), i * hop)
        for i in range(q)
    ]
    if r:
        parts.append(
            (jax.lax.slice(chunks, (0, q, 0), (B, q + n_frames, r)), q * hop)
        )
    return parts, n_frames


def frame_signal(x: jax.Array, cfg: FrontendConfig) -> jax.Array:
    """(B, T) -> (B, n_frames, n_fft) with center=True reflect padding
    (torchlibrosa semantics, htsat.py:647-649). n_frames derives from the
    static input length (1 + T // hop), so arbitrary-length waves work.
    See ``_frame_parts`` for the construction; values are bit-identical
    to the one-shot gather (same elements)."""
    parts, n_frames = _frame_parts(x, cfg)
    return jnp.concatenate([p for p, _ in parts], axis=2)


def power_spectrogram(x: jax.Array, cfg: FrontendConfig) -> jax.Array:
    """(B, T) waveform -> (B, n_frames, n_bins) power spectrum |STFT|^2.

    ONE (B*F, n_fft) @ (n_fft, 2*n_bins) matmul over the concatenated
    frame parts. A split-K variant (one matmul per contiguous part, no
    frame concat) was profiled SLOWER: the four partial products chain as
    f32 (B, 1001, 1026) adds in HBM (~131 MB each way per add, 3x0.42 ms)
    because XLA does not fuse matmul outputs — the 65 MB bf16 frame
    concat + single matmul is the cheaper shape."""
    frames = frame_signal(x, cfg)  # (B, F, n_fft)
    basis = jnp.asarray(dft_basis(cfg.n_fft))  # (n_fft, 2*n_bins)
    proj = frames @ basis  # (B, F, 2*n_bins)  [MXU]
    re, im = jnp.split(proj, 2, axis=-1)
    return re * re + im * im


def logmel(power: jax.Array, cfg: FrontendConfig) -> jax.Array:
    """Power spectrum -> log-mel, matching torchlibrosa LogmelFilterBank
    (ref=1.0, amin=1e-10, top_db=None -> plain 10*log10(clamp))."""
    fb = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax))
    mel = power @ fb  # (B, F, n_mels)
    mel = jnp.clip(mel, cfg.amin, None)
    out = 10.0 * jnp.log10(mel)
    ref_db = 10.0 * np.log10(np.maximum(cfg.amin, cfg.ref))
    out = out - ref_db
    if cfg.top_db is not None:
        out = jnp.maximum(out, jnp.max(out) - cfg.top_db)
    return out


def log_mel_spectrogram(wave: jax.Array, cfg: FrontendConfig) -> jax.Array:
    """(B, 320000) -> (B, 1001, 64)."""
    return logmel(power_spectrogram(wave, cfg), cfg)


# Measured v5e-1 crossover (benchmarks/microbench.py --component melspec).
# After frame_signal's strided-slice rewrite the jnp pipeline beats the
# fused Pallas kernel everywhere except B=1 (jnp/pallas clips/s —
# B=1: 325/384, B=8: 2749/2061, B=16: 4360/3065, B=32: 7158/3973,
# B=64: 8756/4622): the kernel's per-frame fill loop is its scaling wall,
# while the pipeline is now pure MXU matmuls + copies. The kernel keeps
# the single-clip latency case only.
_PALLAS_MAX_BATCH = 1


def log_mel_auto(wave: jax.Array, cfg: FrontendConfig) -> jax.Array:
    """Backend-dispatched log-mel: the fused Pallas kernel on TPU for small
    batches (when the shapes match its specialization), the jnp reference
    elsewhere. Batch size is static under jit so this is a trace-time pick."""
    if (
        jax.default_backend() in ("tpu", "axon")
        and wave.shape[0] <= _PALLAS_MAX_BATCH
        and cfg.n_fft == 1024
        and cfg.hop_length == 320
        and wave.shape[1] == cfg.num_samples
    ):
        from mellow_tpu.ops.pallas_melspec import log_mel_spectrogram_pallas

        return log_mel_spectrogram_pallas(wave, cfg)
    return log_mel_spectrogram(wave, cfg)


def batchnorm_mel(x: jax.Array, bn: dict, eps: float = 1e-5) -> jax.Array:
    """Eval-mode BatchNorm2d over the mel axis (reference: bn0 applied with
    mel-as-channels via transpose, htsat.py:657,868-870). x: (B, T, n_mels)."""
    inv = jax.lax.rsqrt(bn["var"] + eps)
    return (x - bn["mean"]) * inv * bn["scale"] + bn["bias"]


def resize_time_bicubic(x: jax.Array, n_out: int) -> jax.Array:
    """(B, T, F) -> (B, n_out, F) cubic resize along time, torch
    align_corners=True convention, realized as one static matmul. The
    weight matrix follows x's dtype so bf16 perf mode is not silently
    promoted to fp32."""
    W = jnp.asarray(bicubic_matrix(x.shape[1], n_out), dtype=x.dtype)
    return jnp.einsum("ot,btf->bof", W, x)


def fold_time_to_freq(x: jax.Array, freq_ratio: int) -> jax.Array:
    """reshape_wav2img (htsat.py:830-845) as pure static reshapes:
    (B, T=1024, F=64) -> (B, H=freq_ratio*F=256, W=T/freq_ratio=256)
    with H indexed (chunk, mel) and W = time within chunk."""
    B, T, F = x.shape
    chunk = T // freq_ratio  # 256
    x = jnp.transpose(x, (0, 2, 1))  # (B, F, T)
    x = x.reshape(B, F, freq_ratio, chunk)  # split time into chunks
    x = jnp.transpose(x, (0, 2, 1, 3))  # (B, chunk_idx, F, chunk)
    return x.reshape(B, freq_ratio * F, chunk)


def frontend_image(
    wave: jax.Array,
    fe_cfg: FrontendConfig,
    bn0: dict,
    freq_ratio: int,
    target_frames: int,
    *,
    augment_rng=None,
) -> jax.Array:
    """Full front-end: waveform -> (B, 256, 256) spectrogram image ready for
    patch embedding. Mirrors htsat.py:864-874 + 937-938 (SpecAugment applied
    after bn0 at train time, exactly the reference's order)."""
    # The fused kernel computes in fp32; keep the pipeline in the caller's
    # compute dtype (bf16 perf mode would otherwise be silently promoted).
    x = log_mel_auto(wave, fe_cfg).astype(wave.dtype)  # (B, 1001, 64)
    x = batchnorm_mel(x, bn0)
    if augment_rng is not None:
        from mellow_tpu.train.augment import spec_augment

        x = spec_augment(x, augment_rng)
    x = resize_time_bicubic(x, target_frames)  # (B, 1024, 64)
    return fold_time_to_freq(x, freq_ratio)  # (B, 256, 256)
