"""Spectrogram inversion — device-side Griffin-Lim.

Capability of librosa's ``mel_to_audio`` used by the reference's hover-to-
play scrubber (audio_visualizer.py:63-69, D6 in SURVEY.md). The iteration is
a ``lax.fori_loop`` over STFT/iSTFT round trips, so the whole inversion jits
and runs on TPU; the mel->linear lift uses the filterbank pseudo-inverse
(computed once on host, cached).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from asr_shap.audio.mel import mel_filterbank


def _hann(n_fft):
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(n_fft) / n_fft)


def istft(
    spec: jnp.ndarray, n_fft: int, hop_length: int, length: int
) -> jnp.ndarray:
    """Inverse STFT with hann-window overlap-add. spec: [frames, n_fft//2+1]
    complex (centered framing). Returns [length]."""
    win = _hann(n_fft)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * win  # [T, n_fft]
    t = frames.shape[0]
    total = n_fft + hop_length * (t - 1)

    idx = (jnp.arange(t)[:, None] * hop_length + jnp.arange(n_fft)[None, :]).reshape(-1)
    sig = jnp.zeros((total,), frames.dtype).at[idx].add(frames.reshape(-1))
    norm = jnp.zeros((total,), frames.dtype).at[idx].add(
        jnp.broadcast_to(win**2, (t, n_fft)).reshape(-1)
    )
    sig = sig / jnp.maximum(norm, 1e-8)
    start = n_fft // 2  # undo center padding
    return lax.dynamic_slice(sig, (start,), (length,))


def _stft_complex(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    pad = [(n_fft // 2, n_fft // 2)]
    xp = jnp.pad(x, pad, mode="reflect")
    n_frames = 1 + (xp.shape[-1] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return jnp.fft.rfft(xp[idx] * _hann(n_fft), axis=-1)


def griffin_lim(
    magnitude: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 512,
    length: int | None = None,
    n_iter: int = 32,
) -> jnp.ndarray:
    """Phase retrieval from an STFT magnitude [frames, n_fft//2+1]."""
    t = magnitude.shape[0]
    if length is None:
        length = hop_length * (t - 1)
    angles = jnp.zeros_like(magnitude)  # zero initial phase (deterministic)
    spec = magnitude * jnp.exp(1j * angles)

    def body(_, spec):
        x = istft(spec, n_fft, hop_length, length)
        rebuilt = _stft_complex(x, n_fft, hop_length)[:t]
        phase = rebuilt / jnp.maximum(jnp.abs(rebuilt), 1e-10)
        return magnitude * phase

    spec = lax.fori_loop(0, n_iter, body, spec)
    return istft(spec, n_fft, hop_length, length)


@functools.lru_cache(maxsize=8)
def _mel_pinv(sr, n_fft, n_mels, scale, norm) -> np.ndarray:
    fb = mel_filterbank(sr, n_fft, n_mels, scale=scale, norm=norm)  # [F, M]
    return np.linalg.pinv(fb).astype(np.float32)  # [M, F]


def mel_to_audio(
    mel_power: jnp.ndarray,
    sr: int = 16_000,
    n_fft: int = 1024,
    hop_length: int = 512,
    length: int | None = None,
    n_iter: int = 32,
    scale: str = "slaney",
    norm: str | None = "slaney",
) -> jnp.ndarray:
    """Mel power spectrogram [frames, n_mels] -> waveform (librosa
    mel_to_audio capability)."""
    n_mels = mel_power.shape[-1]
    pinv = jnp.asarray(_mel_pinv(sr, n_fft, n_mels, scale, norm))
    power = jnp.maximum(mel_power @ pinv, 0.0)  # [frames, F]
    return griffin_lim(jnp.sqrt(power), n_fft, hop_length, length, n_iter)
