"""Device-side STFT / mel spectrogram front-end.

The reference computes mels on host via librosa (visualization.py:159-160,
w2v2conformer.py:149-152) and torchaudio (test_shap_audio.py:87-94). Here the
front-end is a jittable JAX function: framing + windowed rFFT (XLA) followed
by a mel filterbank matmul — the matmul rides the MXU, and the whole chain
fuses into downstream compute, so metrics and Conformer inputs never leave
the device. Both mel conventions used by the reference's dependencies are
supported: "slaney" (librosa default) and "htk" (torchaudio default).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _hz_to_mel(f, scale: str):
    if scale == "htk":
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)
    # slaney: linear below 1 kHz, log above
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    safe_f = np.maximum(f, 1e-10)
    return np.where(
        f >= min_log_hz, min_log_mel + np.log(safe_f / min_log_hz) / logstep, mels
    )


def _mel_to_hz(m, scale: str):
    if scale == "htk":
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@functools.lru_cache(maxsize=32)
def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = None,
    scale: str = "slaney",
    norm: str | None = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank, shape [n_fft//2 + 1, n_mels] (host numpy,
    cached; becomes a device constant inside jit)."""
    if fmax is None:
        fmax = sr / 2.0
    fft_freqs = np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel(fmin, scale), _hz_to_mel(fmax, scale), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, scale)

    fb = np.zeros((n_fft // 2 + 1, n_mels), dtype=np.float64)
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        fb *= enorm[np.newaxis, :]
    return fb.astype(np.float32)


def _frame(x: jnp.ndarray, n_fft: int, hop: int, center: bool) -> jnp.ndarray:
    """[..., N] -> [..., n_frames, n_fft] frames (gather-based; static shapes)."""
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode="reflect")
    n = x.shape[-1]
    n_frames = 1 + (n - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return x[..., idx]


def stft_magnitude(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 512,
    window: str = "hann",
    center: bool = True,
    power: float = 2.0,
) -> jnp.ndarray:
    """Power (or magnitude) spectrogram, [..., n_frames, n_fft//2+1]."""
    frames = _frame(x.astype(jnp.float32), n_fft, hop_length, center)
    if window == "hann":
        # periodic hann, matching librosa/torchaudio defaults
        win = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(n_fft) / n_fft)
    elif window == "ones":
        win = jnp.ones((n_fft,), jnp.float32)
    else:
        raise ValueError(f"unknown window {window}")
    spec = jnp.fft.rfft(frames * win, axis=-1)
    mag = jnp.abs(spec)
    if power == 1.0:
        return mag
    return mag**power


def log_mel_spectrogram(
    x: jnp.ndarray,
    sr: int = 16_000,
    n_fft: int = 1024,
    hop_length: int = 512,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = None,
    scale: str = "slaney",
    norm: str | None = "slaney",
    log: str = "db",
    top_db: float | None = 80.0,
) -> jnp.ndarray:
    """Log-mel spectrogram, [..., n_frames, n_mels].

    log="db" reproduces librosa.power_to_db(ref=max) used for display
    (visualization.py:161-163); log="natural" is ln(mel + eps) as used by
    NeMo-style preprocessors; log="none" returns raw mel power.
    """
    power = stft_magnitude(x, n_fft, hop_length, center=True, power=2.0)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax, scale, norm))
    mel = power @ fb  # MXU matmul
    if log == "none":
        return mel
    if log == "natural":
        return jnp.log(mel + 1e-10)
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    ref = jnp.max(db, axis=(-2, -1), keepdims=True)
    db = db - ref
    if top_db is not None:
        db = jnp.maximum(db, -top_db)
    return db
