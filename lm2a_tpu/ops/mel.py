"""Mel-spectrogram extraction as jit-compiled XLA ops.

Re-implements the exact mel convention the reference gets from BigVGAN's
``get_mel_spectrogram`` (called at ``/root/reference/preprocess.py:56`` with
hparams from ``/root/reference/preprocess.py:26-38``):

1. reflect-pad the waveform by ``(n_fft - hop) // 2`` on each side,
2. STFT with a periodic Hann window, ``center=False``,
3. magnitude ``sqrt(re^2 + im^2 + 1e-9)``,
4. mel filterbank in the librosa Slaney convention (htk=False, norm='slaney'),
5. dynamic-range compression ``log(clip(mel, 1e-5))``.

For a 6 s / 22.05 kHz clip this yields the canonical (516, 80) mel
(``/root/reference/sometest/testnpz.py:58-67``). The framing is one gather +
one batched rFFT + one matmul, so the whole pipeline is a single fused XLA
program instead of the reference's librosa-CPU + torch-CUDA hop.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lm2a_tpu.core.config import MelConfig


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


def slaney_mel_filterbank(
    sample_rate: int,
    n_fft: int,
    num_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> np.ndarray:
    """Triangular Slaney-normalized mel filterbank, shape (num_mels, n_fft//2+1).

    Equivalent to ``librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax)`` with
    the defaults (htk=False, norm='slaney'), which is what BigVGAN's
    meldataset uses. Computed in float64 on host, cached per-config.
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), num_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney-style energy normalization
    enorm = 2.0 / (hz_pts[2 : num_mels + 2] - hz_pts[:num_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _cached_filterbank(sr, n_fft, num_mels, fmin, fmax):
    return slaney_mel_filterbank(sr, n_fft, num_mels, fmin, fmax)


def hann_window_periodic(win_size: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = np.arange(win_size, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_size))).astype(np.float32)


def frame_count(num_samples: int, cfg: MelConfig) -> int:
    """Number of STFT frames for a waveform of ``num_samples`` samples."""
    pad = (cfg.n_fft - cfg.hop_size) // 2
    padded = num_samples + 2 * pad
    return 1 + (padded - cfg.n_fft) // cfg.hop_size


def stft_magnitude(wav: jax.Array, cfg: MelConfig) -> jax.Array:
    """Magnitude STFT ``(..., frames, n_fft//2+1)`` of waveform ``(..., T)``."""
    pad = (cfg.n_fft - cfg.hop_size) // 2
    x = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode="reflect")
    n_frames = 1 + (x.shape[-1] - cfg.n_fft) // cfg.hop_size

    window = jnp.asarray(hann_window_periodic(cfg.win_size))
    if cfg.win_size < cfg.n_fft:  # torch.stft center-pads short windows
        lpad = (cfg.n_fft - cfg.win_size) // 2
        window = jnp.pad(window, (lpad, cfg.n_fft - cfg.win_size - lpad))

    idx = (
        jnp.arange(n_frames)[:, None] * cfg.hop_size + jnp.arange(cfg.n_fft)[None, :]
    )
    frames = x[..., idx] * window  # (..., frames, n_fft)
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    return jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)


def mel_spectrogram(wav: jax.Array, cfg: MelConfig = MelConfig()) -> jax.Array:
    """Log-mel spectrogram ``(..., frames, num_mels)`` — channels-last.

    The on-disk npz schema stores mel as (80, T) for parity with the
    reference; transpose at the serialization boundary, not here.
    """
    mag = stft_magnitude(wav, cfg)
    fb = jnp.asarray(
        _cached_filterbank(
            cfg.sample_rate, cfg.n_fft, cfg.num_mels, float(cfg.fmin), cfg.fmax
        )
    )
    mel = mag @ fb.T  # (..., frames, num_mels)
    return jnp.log(jnp.clip(mel, min=1e-5))


mel_spectrogram_jit = jax.jit(mel_spectrogram, static_argnums=1)
