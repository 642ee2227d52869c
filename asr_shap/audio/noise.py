"""Controlled noise injection at a target SNR.

This is the reference's core experimental mechanism: white noise mixed at a
known SNR with the noise signal kept for ground-truth speech/noise dominance
masks (shap_calculation.py:55-60 ``_add_noise``; the training-time general
mixer is train_asr.py:169-179 ``_mix_at_snr``). Unlike the reference, the
noise draw is seeded (explicit key) so test sets are reproducible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def add_white_noise_at_snr(
    key: jax.Array, audio: jnp.ndarray, snr_db: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (noisy_audio, noise) with white Gaussian noise at ``snr_db``.

    Semantics of shap_calculation.py:55-60: noise_power =
    signal_power / 10^(snr/10); noise ~ N(0, sqrt(noise_power)).
    """
    audio = audio.astype(jnp.float32)
    signal_power = jnp.mean(jnp.square(audio))
    noise_power = signal_power / (10.0 ** (snr_db / 10.0))
    noise = jax.random.normal(key, audio.shape, dtype=jnp.float32) * jnp.sqrt(
        noise_power
    )
    return audio + noise, noise


def colored_noise(key: jax.Array, n: int, alpha: float = 1.0) -> jnp.ndarray:
    """Unit-variance noise with power spectral density proportional to
    1/f^alpha (alpha=1: pink, alpha=2: brown), via FFT spectrum shaping of
    seeded white noise. The reference's training design contemplates
    non-white noise sources (CHiME/SSN/network noise, train_asr.py:19-104);
    this is the stationary colored member of that family for stressing
    eta_raw's speech-dominance logic beyond white noise."""
    white = jax.random.normal(key, (n,), dtype=jnp.float32)
    spec = jnp.fft.rfft(white)
    f = jnp.fft.rfftfreq(n)
    scale = jnp.where(f > 0, jnp.where(f > 0, f, 1.0) ** (-alpha / 2.0), 0.0)
    out = jnp.fft.irfft(spec * scale, n).astype(jnp.float32)
    return out / (jnp.std(out) + 1e-12)


def scale_noise_to_snr(
    audio: jnp.ndarray, noise: jnp.ndarray, snr_db: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scale an arbitrary noise signal so the mix sits at ``snr_db`` and
    return (noisy_audio, scaled_noise) — the add_white_noise_at_snr contract
    (noise kept as ITM ground truth) generalized to any noise source."""
    audio = audio.astype(jnp.float32)
    noise = noise.astype(jnp.float32)
    p_s = jnp.mean(jnp.square(audio), axis=-1, keepdims=True)
    p_n = jnp.maximum(jnp.mean(jnp.square(noise), axis=-1, keepdims=True), 1e-12)
    scaled = noise * jnp.sqrt(p_s / (p_n * (10.0 ** (snr_db / 10.0))))
    return audio + scaled, scaled


def mix_at_snr(
    speech: jnp.ndarray, noise: jnp.ndarray, snr_db: float
) -> jnp.ndarray:
    """Mix an arbitrary noise signal into speech at ``snr_db``
    (train_asr.py:169-179 capability: tile/truncate the noise to the speech
    length, then apply the single SNR-scaling rule in
    ``scale_noise_to_snr`` so the dB convention lives in one place)."""
    speech = speech.astype(jnp.float32)
    noise = noise.astype(jnp.float32)
    n = speech.shape[-1]
    if noise.shape[-1] < n:
        reps = -(-n // noise.shape[-1])
        noise = jnp.tile(noise, reps)
    mixed, _ = scale_noise_to_snr(speech, noise[..., :n], snr_db)
    return mixed
