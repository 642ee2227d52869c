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

from asr_shap.audio.noise import (
    add_white_noise_at_snr,
    colored_noise,
    scale_noise_to_snr,
)
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


def babble_noise(
    key: jax.Array, n: int, num_speakers: int = 6, sr: int = 16_000
) -> np.ndarray:
    """Speech-shaped noise: ``num_speakers`` independent synthetic-speech
    streams (distinct pitch tracks, envelopes, and pause structure per key)
    overlapped and normalized to unit variance. The adversarial noise family
    for eta_raw — its segments carry harmonic speech structure, so the
    speech/noise-dominance ITM is measured against competition that *looks*
    like speech (the CHiME/babble case of train_asr.py:19-104)."""
    keys = jax.random.split(key, num_speakers)
    mix = np.zeros(n, np.float32)
    for i in range(num_speakers):
        s = synthetic_speech(keys[i], n, sr)
        # decorrelate pause structure across speakers with a seeded shift
        shift = int(jax.random.randint(fold(keys[i], 1), (), 0, max(1, n)))
        mix += np.roll(s, shift)
    return mix / (mix.std() + 1e-12)


def make_noise_signal(key: jax.Array, n: int, kind: str) -> jnp.ndarray:
    """Unit-scale noise of the configured family (TestSetConfig.noise_kind);
    scaled to the target SNR by the caller via scale_noise_to_snr."""
    if kind == "pink":
        return colored_noise(key, n, alpha=1.0)
    if kind == "babble":
        return jnp.asarray(babble_noise(key, n))
    raise ValueError(f"unknown noise kind {kind!r} (white|pink|babble)")


# ----------------------------------------------------------------------
# Text-conditional synthesis: utterance text DETERMINES the signal, so a
# CTC model trained on this corpus genuinely transcribes (greedy decode
# recovers the text) and the eta_raw-vs-WER study is scientifically
# meaningful offline — the role LibriSpeech + the pretrained checkpoint
# play for the reference (shap_calculation.py:66-68, :217-220), which zero
# egress blocks here.
# ----------------------------------------------------------------------

# Fixed word list for seeded text generation (uppercase, wav2vec2 vocab
# characters only; one apostrophe word exercises vocab id 27).
SYNTH_LEXICON: tuple = (
    "THE", "AND", "WATER", "STONE", "BLUE", "NORTH", "RIVER", "LIGHT",
    "SOUND", "GREEN", "HOUSE", "PAPER", "WIND", "GLASS", "FIELD", "CLOUD",
    "TRAIN", "VOICE", "NIGHT", "MORNING", "SILVER", "GARDEN", "WINTER",
    "SUMMER", "BIRD", "HORSE", "TABLE", "CHAIR", "SMALL", "LARGE", "QUICK",
    "ZEBRA", "JUMP", "FOX", "DON'T", "OVER", "UNDER", "SEVEN", "YELLOW",
    "PURPLE",
)

# samples per character at 16 kHz (100 ms -> 5 encoder frames at x320,
# comfortably above CTC's 1-frame-per-label minimum)
CHAR_DURATION = 1_600

# characters with a synthesis pattern: A-Z and ' (wav2vec2 vocab ids 5..27
# plus letters; space/| is silence)
_SYNTH_CHARS = "ABCDEFGHIJKLMNOPQRSTUVWXYZ'"


def _char_table(sr: int):
    """Per-character synthesis parameters: fundamental on a log scale over
    150-620 Hz (>= 2 cycles inside the conv stack's ~25 ms receptive field)
    and a character-dependent harmonic tilt, so each symbol has a distinct
    pitch AND timbre."""
    idx = np.arange(len(_SYNTH_CHARS))
    f0 = 150.0 * (620.0 / 150.0) ** (idx / (len(_SYNTH_CHARS) - 1))
    tilt = 0.4 + 1.2 * ((idx * 7) % len(_SYNTH_CHARS)) / len(_SYNTH_CHARS)
    return f0, tilt


def synthesize_text(
    key,
    text: str,
    sr: int = 16_000,
    char_duration: int = CHAR_DURATION,
    jitter: float = 0.02,
) -> np.ndarray:
    """Deterministic text -> waveform: each character is a ``char_duration``
    harmonic burst (4 harmonics, char-specific f0 + spectral tilt, hann-like
    attack/decay envelope); spaces are silence. ``key`` adds small
    per-utterance pitch/amplitude jitter (speaker variation) so models must
    generalize rather than memorize waveforms.

    ``key`` is a jax PRNG key OR an ``np.random.Generator`` — the numpy mode
    keeps corpus generation entirely host-side (a jax call per utterance is
    a device round-trip on remote-execution backends, which would starve the
    training loop's prefetch)."""
    f0_table, tilt_table = _char_table(sr)
    char_to_idx = {c: i for i, c in enumerate(_SYNTH_CHARS)}

    ids = np.array([char_to_idx.get(c, -1) for c in text.upper()], np.int32)
    if isinstance(key, np.random.Generator):
        pitch_jit = 1.0 + jitter * float(key.standard_normal())
        amp_jit = 0.85 + 0.15 * float(key.random())
    else:
        k1, k2 = jax.random.split(key)
        pitch_jit = 1.0 + jitter * float(jax.random.normal(k1))
        amp_jit = 0.85 + 0.15 * float(jax.random.uniform(k2))

    t = np.arange(char_duration) / sr
    # hann-flavored envelope with 10 ms attack/decay
    ramp = int(0.010 * sr)
    env = np.ones(char_duration, np.float32)
    win = 0.5 - 0.5 * np.cos(np.pi * np.arange(ramp) / ramp)
    env[:ramp] = win
    env[-ramp:] = win[::-1]

    voiced = ids >= 0
    f0 = np.where(voiced, f0_table[np.maximum(ids, 0)], 0.0) * pitch_jit  # [K]
    tilt = np.where(voiced, tilt_table[np.maximum(ids, 0)], 1.0)          # [K]
    seg = np.zeros((len(ids), char_duration), np.float32)
    for h in range(1, 5):
        w = (1.0 / h ** tilt)[:, None]                                   # [K,1]
        seg += (w * np.sin(2 * np.pi * h * f0[:, None] * t[None, :])).astype(
            np.float32
        )
    seg *= env[None, :] * voiced[:, None].astype(np.float32)
    sig = seg.reshape(-1)
    peak = np.abs(sig).max()
    if peak > 0:
        sig = sig / peak * 0.5 * amp_jit
    return sig.astype(np.float32)


def synthetic_text(key, num_words: int) -> str:
    """Seeded word sequence from the fixed lexicon (jax key or numpy
    Generator, see :func:`synthesize_text`)."""
    if isinstance(key, np.random.Generator):
        idx = key.integers(0, len(SYNTH_LEXICON), size=num_words)
    else:
        idx = np.asarray(
            jax.random.randint(key, (num_words,), 0, len(SYNTH_LEXICON))
        )
    return " ".join(SYNTH_LEXICON[i] for i in idx)


def synthetic_utterance(
    key: jax.Array, n_samples: int, sr: int = 16_000
) -> Tuple[np.ndarray, str]:
    """(audio, text) pair of >= ``n_samples`` samples: seeded text long
    enough to fill the window, synthesized then zero-padded to length."""
    kt, ka = jax.random.split(key)
    # average word+space length in characters (lexicon mean ~5.4 + 1)
    avg_chars = sum(len(w) for w in SYNTH_LEXICON) / len(SYNTH_LEXICON) + 1.0
    num_words = max(1, int(np.ceil(n_samples / CHAR_DURATION / avg_chars)) + 1)
    text = synthetic_text(kt, num_words)
    audio = synthesize_text(ka, text)
    if len(audio) < n_samples:
        audio = np.pad(audio, (0, n_samples - len(audio)))
    return audio, text


def _synthetic_provider(cfg: TestSetConfig):
    key = jax.random.key(cfg.seed)
    i = 0
    while True:
        # clips a bit over min_length, like LibriSpeech >=100k filter
        n = cfg.min_length + (i % 4) * (cfg.sample_rate // 2)
        audio, text = synthetic_utterance(fold(key, 1000 + i), n)
        yield audio, text
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
            if cfg.noise_kind == "white":
                # the reference mechanism, kept as the bitwise-stable default
                noisy, noise = add_white_noise_at_snr(
                    fold(key, count, j), jnp.asarray(audio), snr
                )
            else:
                raw = make_noise_signal(
                    fold(key, count, j), len(audio), cfg.noise_kind
                )
                noisy, noise = scale_noise_to_snr(jnp.asarray(audio), raw, snr)
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
