"""Real-checkpoint transcript pins (scripts/pin_checkpoints.py).

These tests run only where the pinned checkpoint is actually reachable —
zero-egress CI skips them; an environment with the HF cache or .nemo file
re-verifies that conversion + forward + decode still reproduce the recorded
transcripts (reference flows test_wav2vec2.py:1-19 and
conformer_visualization.py:20-22, 85-91)."""

import json
import os

import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _load_fixture(name):
    path = os.path.join(FIXTURES, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not pinned (run scripts/pin_checkpoints.py "
                    "where the checkpoint is available)")
    return np.load(path)


def _checkpoint_reachable_hf(name: str) -> bool:
    try:
        from huggingface_hub import try_to_load_from_cache

        return os.path.isdir(name) or try_to_load_from_cache(
            name, "config.json"
        ) is not None
    except Exception:
        return os.path.isdir(name)


def test_wav2vec2_pinned_transcripts():
    fix = _load_fixture("wav2vec2_pinned.npz")
    name = str(fix["checkpoint"])
    if not _checkpoint_reachable_hf(name):
        pytest.skip(f"checkpoint {name} not in cache")

    import jax.numpy as jnp

    from asr_shap.audio.normalize import zero_mean_unit_var
    from asr_shap.models.convert_hf import load_pretrained
    from asr_shap.models.wav2vec2 import wav2vec2_logits
    from asr_shap.ops.ctc import ctc_decode_batch
    from scripts.pin_checkpoints import _dummy_clips

    params, cfg = load_pretrained(name)
    pinned = json.loads(str(fix["transcripts"]))
    clips = _dummy_clips(int(fix["n_clips"]))
    for (audio, _), want, want_mean in zip(clips, pinned, fix["logit_means"]):
        logits = wav2vec2_logits(
            params, cfg, zero_mean_unit_var(jnp.asarray(audio))[None]
        )
        assert ctc_decode_batch(logits)[0] == want
        np.testing.assert_allclose(float(np.asarray(logits).mean()),
                                   want_mean, rtol=1e-3)


def test_nemo_pinned_transcripts():
    fix = _load_fixture("nemo_pinned.npz")
    path = str(fix["checkpoint"])
    if not os.path.exists(path):
        pytest.skip(f".nemo archive {path} not present")

    import jax.numpy as jnp

    from asr_shap.audio.mel import log_mel_spectrogram
    from asr_shap.models.nemo_ctc import (
        load_nemo_checkpoint,
        nemo_ctc_decode,
        nemo_ctc_logits,
    )
    from scripts.pin_checkpoints import _dummy_clips

    params, cfg, vocab = load_nemo_checkpoint(path)
    pinned = json.loads(str(fix["transcripts"]))
    clips = _dummy_clips(int(fix["n_clips"]))
    for (audio, _), want in zip(clips, pinned):
        mel = log_mel_spectrogram(
            jnp.asarray(audio), n_fft=512, hop_length=160,
            n_mels=cfg.input_dim, log="natural",
        )
        mel = (mel - mel.mean(axis=0)) / (mel.std(axis=0) + 1e-5)
        logits = nemo_ctc_logits(params, cfg, mel[None])
        assert nemo_ctc_decode(logits, vocab)[0] == want
