"""Controlled test-set generation: clean clips + seeded white noise at fixed
SNRs, keeping the noise signal as ground truth for the ITM
(reference semantics: shap_calculation.py:63-108).

Data sources, in order of preference:
  1. a caller-supplied iterable of (audio, text) pairs (e.g. HF datasets'
     librispeech_asr_dummy when network/cache is available — D5 in SURVEY.md);
  2. the built-in seeded synthetic-speech generator, which produces
     harmonic, amplitude-modulated, pause-structured signals — enough
     structure for the speech/noise-dominance oracle to be meaningful
     offline.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from asr_shap.audio.noise import add_white_noise_at_snr
from asr_shap.audio.resample import resample
from asr_shap.core.config import TestSetConfig
from asr_shap.core.prng import fold


def synthetic_speech(key: jax.Array, n: int, sr: int = 16_000) -> np.ndarray:
    """Speech-like clip: voiced harmonic stacks with wandering f0, formant-ish
    band emphasis, syllabic AM, and silent gaps. Deterministic per key."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    t = jnp.arange(n) / sr

    f0 = 110.0 + 40.0 * jnp.sin(2 * jnp.pi * 0.7 * t + jax.random.uniform(k1) * 6.28)
    phase = jnp.cumsum(f0) / sr
    voiced = sum(
        (0.6 / h) * jnp.sin(2 * jnp.pi * h * phase) for h in range(1, 6)
    )

    # syllabic envelope ~4 Hz with random phase, squared for contrast
    env = jnp.maximum(0.0, jnp.sin(2 * jnp.pi * 3.7 * t + jax.random.uniform(k2) * 6.28))
    env = env**2

    # pause structure: ~30% of 250 ms blocks silent; the first block is
    # always voiced so short/truncated clips never degenerate to silence
    n_blocks = n // (sr // 4) + 1
    gates = (jax.random.uniform(k3, (n_blocks,)) > 0.3).astype(jnp.float32)
    gates = gates.at[0].set(1.0)
    gate = jnp.repeat(gates, sr // 4)[:n]

    # light aspiration noise during voiced parts
    asp = 0.02 * jax.random.normal(k4, (n,))
    sig = (voiced * env + asp) * gate
    sig = sig / (jnp.max(jnp.abs(sig)) + 1e-9) * 0.5
    return np.asarray(sig, dtype=np.float32)


def _synthetic_provider(cfg: TestSetConfig):
    key = jax.random.key(cfg.seed)
    i = 0
    while True:
        # clips a bit over min_length, like LibriSpeech >=100k filter
        n = cfg.min_length + (i % 4) * (cfg.sample_rate // 2)
        audio = synthetic_speech(fold(key, 1000 + i), n, cfg.sample_rate)
        yield audio, f"SYNTHETIC UTTERANCE NUMBER {i}"
        i += 1


def load_librispeech_dummy() -> Optional[Iterable[Tuple[np.ndarray, str]]]:
    """The reference's dataset fixture (shap_calculation.py:66-68), if the HF
    hub/cache is reachable; None otherwise."""
    import os

    if not os.environ.get("ASR_SHAP_ALLOW_DOWNLOAD"):
        # zero-egress default: fail fast to the synthetic provider instead of
        # burning a minute on HF hub retries
        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        os.environ.setdefault("HF_DATASETS_OFFLINE", "1")
    try:
        from datasets import load_dataset

        ds = load_dataset(
            "patrickvonplaten/librispeech_asr_dummy", "clean", split="validation"
        )
        return (
            (
                np.asarray(s["audio"]["array"], np.float32),
                s["text"],
                int(s["audio"].get("sampling_rate", 16_000)),
            )
            for s in ds
        )
    except Exception:
        return None


def create_test_set(
    cfg: TestSetConfig = TestSetConfig(),
    source: Optional[Iterable[Tuple[np.ndarray, str]]] = None,
) -> List[Dict]:
    """Build the clean+noisy evaluation set.

    Per clip of length >= cfg.min_length: one clean entry (snr=inf,
    noise=zeros) plus one noisy entry per SNR in cfg.snrs_db with
    noise = noisy - clean retained (shap_calculation.py:80-105 semantics,
    but seeded)."""
    if source is None:
        source = load_librispeech_dummy() or _synthetic_provider(cfg)

    key = jax.random.key(cfg.seed)
    test_set: List[Dict] = []
    count = 0
    for item in source:
        if count >= cfg.num_samples:
            break
        # (audio, text) at cfg.sample_rate, or (audio, text, sr) at any rate —
        # non-16 kHz sources go through the device-side resampler, the
        # reference's torchaudio.Resample step (lime_shap_wav2vec2_comparison
        # .py:42-43).
        if len(item) == 3:
            audio, text, sr = item
            if int(sr) != cfg.sample_rate:
                audio = np.asarray(
                    resample(jnp.asarray(audio), int(sr), cfg.sample_rate)
                )
        else:
            audio, text = item
        if len(audio) < cfg.min_length:
            continue  # length filter, shap_calculation.py:75-78
        if cfg.max_length and len(audio) > cfg.max_length:
            audio = audio[: cfg.max_length]
        test_set.append(
            {
                "type": "clean",
                "audio": audio,
                "text": text,
                "snr": float("inf"),
                "noise": np.zeros_like(audio),
            }
        )
        for j, snr in enumerate(cfg.snrs_db):
            noisy, noise = add_white_noise_at_snr(
                fold(key, count, j), jnp.asarray(audio), snr
            )
            test_set.append(
                {
                    "type": "noisy",
                    "audio": np.asarray(noisy),
                    "text": text,
                    "snr": float(snr),
                    "noise": np.asarray(noise),
                }
            )
        count += 1
    return test_set
