"""Torch oracle for the sinc resampler, realized as a strided conv1d.

torchaudio is absent in this environment (SURVEY.md §7.3 item 2's
bit-parity golden vectors cannot be captured offline), so this restates
torchaudio 2.0's published resampling algorithm — hann-windowed sinc
polyphase filter applied as conv1d with stride=orig_freq
(torchaudio.functional._get_sinc_resample_kernel /
_apply_sinc_resample_kernel; reference usage mellow/wrapper.py:146-148) —
in pure torch. It is a structurally DIFFERENT realization from
mellow_tpu/io/resample.py's numpy strided correlation (conv with padding
vs explicit frame loop), so agreement validates the filter design and the
polyphase indexing, not just self-consistency.
"""

import math

import torch


def sinc_resample_kernel(orig_freq: int, new_freq: int,
                         lowpass_filter_width: int = 6,
                         rolloff: float = 0.99):
    """(new_freq, 1, 2*width + orig_freq) float64 kernel + width."""
    gcd = math.gcd(orig_freq, new_freq)
    orig_freq, new_freq = orig_freq // gcd, new_freq // gcd
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)

    idx = torch.arange(-width, width + orig_freq, dtype=torch.float64)[None, :] / orig_freq
    t = torch.arange(0, -new_freq, -1, dtype=torch.float64)[:, None] / new_freq + idx
    t = (t * base_freq).clamp_(-lowpass_filter_width, lowpass_filter_width)

    window = torch.cos(t * math.pi / lowpass_filter_width / 2) ** 2
    t = t * math.pi
    scale = base_freq / orig_freq
    kernels = torch.where(t == 0, torch.tensor(1.0, dtype=torch.float64), t.sin() / t)
    kernels = kernels * window * scale
    return kernels.unsqueeze(1), width, orig_freq, new_freq


def resample_oracle(waveform, orig_freq: int, new_freq: int,
                    lowpass_filter_width: int = 6, rolloff: float = 0.99):
    """waveform: (..., time) float tensor -> resampled (..., new_time)."""
    kernel, width, orig, new = sinc_resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff
    )
    shape = waveform.shape
    x = waveform.reshape(-1, 1, shape[-1]).to(torch.float64)
    length = shape[-1]
    x = torch.nn.functional.pad(x, (width, width + orig))
    y = torch.nn.functional.conv1d(x, kernel, stride=orig)  # (N, new, frames)
    y = y.transpose(1, 2).reshape(x.shape[0], -1)
    target_len = int(math.ceil(new * length / orig))
    return y[:, :target_len].reshape(shape[:-1] + (target_len,)).to(torch.float32)
