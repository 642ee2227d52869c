"""Train a CTC model that actually transcribes — on the text-conditional
synthetic corpus (pipeline/testset.py::synthesize_text).

The reference's study depends on a PRETRAINED model (shap_calculation.py:
217-220, facebook/wav2vec2-base-960h): attributions of a model that cannot
transcribe say nothing about speech relevance. Zero egress blocks the HF
checkpoint here, so this module supplies the missing ingredient natively:
a seeded synthetic language whose utterance text determines the waveform,
a corpus generator, and a training driver around pipeline/train.py's
``train()`` (CTC loss, AdamW, early stopping, the L8 layer) that runs until
greedy-decode WER on held-out utterances is genuinely low. The resulting
params make the eta_raw-vs-WER sweep (nraw_vs_wer.py:91-182 capability) a
real experiment: WER rises as SNR falls, and attribution quality can be
scored against transcripts that mean something.

Corpus contract: train/val/test draw from DISJOINT utterance-key ranges of
the same seeded generator; the evaluation test set (create_test_set, seed 0,
fold(key, 1000+i)) uses yet another range, so study clips are never seen in
training.
"""

from __future__ import annotations

import logging
import time
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from asr_shap.audio.normalize import zero_mean_unit_var
from asr_shap.core.config import TrainConfig, WAV2VEC2_VOCAB, Wav2Vec2Config
from asr_shap.metrics.wer import batch_wer
from asr_shap.models.wav2vec2 import feature_lengths, wav2vec2_logits
from asr_shap.ops.ctc import ctc_decode_batch, text_to_ids
from asr_shap.pipeline.testset import CHAR_DURATION, synthesize_text, synthetic_text

logger = logging.getLogger(__name__)

# utterance-key namespaces (fold offsets): keep corpus splits and the
# evaluation test set (testset.py uses 1000+i) disjoint
TRAIN_OFFSET = 1_000_000
VAL_OFFSET = 2_000_000


def make_utterance(key, clip_samples: int) -> Tuple[np.ndarray, str, int]:
    """One (audio, text, real_length) triple whose synthesis fits inside
    ``clip_samples`` (no truncation — labels always match the waveform).
    ``key``: jax PRNG key or np.random.Generator (host-fast path)."""
    if isinstance(key, np.random.Generator):
        kt, ka = key.spawn(2)
    else:
        kt, ka = jax.random.split(key)
    max_chars = clip_samples // CHAR_DURATION
    # draw words until the next one would overflow the char budget
    words = synthetic_text(kt, 32).split(" ")
    text, used = [], 0
    for w in words:
        need = len(w) + (1 if text else 0)
        if used + need > max_chars:
            break
        text.append(w)
        used += need
    if not text:  # clip shorter than any word: single truncated word
        text = [words[0][: max(1, max_chars)]]
    text_s = " ".join(text)
    audio = synthesize_text(ka, text_s)
    n_real = min(len(audio), clip_samples)
    if len(audio) < clip_samples:
        audio = np.pad(audio, (0, clip_samples - len(audio)))
    return audio[:clip_samples], text_s, n_real


def synthetic_batches(
    seed: int,
    num_batches: int,
    batch_size: int,
    clip_samples: int,
    max_label_len: int,
    snrs_db: Tuple[float, ...] = (),
    offset: int = TRAIN_OFFSET,
    noise_prob: float = 0.5,
) -> Iterable[Dict]:
    """Seeded batch stream for ``pipeline.train.train()``.

    Each utterance key is ``fold(key(seed), offset + i)`` — disjoint splits
    come from disjoint offsets, fresh data per epoch from advancing ``seed``.
    With ``snrs_db`` non-empty, each clip is independently mixed with white
    noise at a random SNR from the list with probability ``noise_prob``
    (train_asr.py:106-179 capability, seeded).

    Entirely host-side (numpy SeedSequence-derived Generators, no per-item
    jax calls) so a prefetch worker can keep the device fed."""
    i = 0
    for _ in range(num_batches):
        audios, lengths, labels, label_lens, texts = [], [], [], [], []
        for _ in range(batch_size):
            rng = np.random.default_rng(np.random.SeedSequence([seed, offset + i]))
            audio, text, n_real = make_utterance(rng, clip_samples)
            if snrs_db and rng.random() < noise_prob:
                snr_db = float(snrs_db[rng.integers(0, len(snrs_db))])
                # white noise at target SNR over the REAL (unpadded) span,
                # mirroring audio/noise.py::add_white_noise_at_snr host-side
                sig_pow = float(np.mean(audio[:n_real] ** 2)) or 1e-12
                noise_pow = sig_pow / (10.0 ** (snr_db / 10.0))
                audio = audio + rng.standard_normal(len(audio)).astype(
                    np.float32
                ) * np.sqrt(noise_pow)
            ids = text_to_ids(text)[:max_label_len]
            audios.append(audio)
            lengths.append(n_real)
            labels.append(ids + [0] * (max_label_len - len(ids)))
            label_lens.append(len(ids))
            texts.append(text)
            i += 1
        yield {
            "audio": np.stack(audios).astype(np.float32),
            "audio_lengths": np.asarray(lengths, np.int32),
            "labels": np.asarray(labels, np.int32),
            "label_lengths": np.asarray(label_lens, np.int32),
            "_texts": texts,  # host-only; stripped before the device step
        }


def _device_batch(batch: Dict) -> Dict:
    return {k: v for k, v in batch.items() if not k.startswith("_")}


def greedy_wer(
    params,
    model_cfg: Wav2Vec2Config,
    batches: Iterable[Dict],
    vocab=WAV2VEC2_VOCAB,
) -> Tuple[float, List[Tuple[str, str]]]:
    """Corpus-level greedy-decode WER over ``batches`` (weighted by reference
    word counts, like jiwer over the concatenated corpus)."""

    from asr_shap.pipeline.train import model_logits_fn

    family_logits = model_logits_fn(model_cfg)

    @jax.jit
    def logits_fn(p, x, lens):
        xx = zero_mean_unit_var(x, lens)
        return family_logits(p, model_cfg, xx, lengths=lens)

    pairs: List[Tuple[str, str]] = []
    for batch in batches:
        lens = jnp.asarray(batch["audio_lengths"])
        logits = logits_fn(params, jnp.asarray(batch["audio"]), lens)
        f_lens = np.asarray(feature_lengths(model_cfg, lens))
        hyps = ctc_decode_batch(logits, lengths=f_lens, vocab=vocab)
        pairs.extend(zip(batch["_texts"], hyps))
    refs = [r for r, _ in pairs]
    hyps = [h for _, h in pairs]
    wers = batch_wer(refs, hyps)
    weights = np.asarray([len(r.split()) for r in refs], np.float64)
    wer = float(np.sum(np.asarray(wers) * weights) / np.sum(weights))
    return wer, pairs


def train_synthetic(
    model_cfg: Wav2Vec2Config,
    train_cfg: Optional[TrainConfig] = None,
    params=None,
    clip_seconds: float = 2.0,
    batches_per_epoch: int = 100,
    val_batches_count: int = 8,
    target_wer: float = 0.1,
    seed: int = 0,
    sr: int = 16_000,
    mesh=None,
    checkpointer=None,
) -> Tuple[Dict, Dict]:
    """Train ``model_cfg`` from scratch (or continue ``params``) on the
    synthetic corpus until early stopping; returns (params, summary).

    Runs pipeline/train.py::train() — the full L8 loop (CTC loss, AdamW,
    clip, val, early stopping, optional orbax checkpointing) — then measures
    held-out greedy WER.
    """
    from asr_shap.core.config import Wav2Vec2ConformerConfig
    from asr_shap.models.wav2vec2 import init_wav2vec2_params
    from asr_shap.pipeline.train import train

    train_cfg = train_cfg or TrainConfig(
        learning_rate=3e-4, num_epochs=40, batch_size=8,
        early_stopping_patience=5, freeze_feature_encoder=False, seed=seed,
        # clean training by default, matching the CLI's --train-snrs default:
        # TrainConfig's own snrs_db default is the fine-tuning noise ladder
        # (train_asr.py:112), which would silently augment library callers
        snrs_db=(),
    )
    if train_cfg.freeze_feature_encoder:
        raise ValueError(
            "training from scratch requires freeze_feature_encoder=False "
            "(a frozen random conv stack cannot learn the synthesis patterns)"
        )
    if params is None:
        if isinstance(model_cfg, Wav2Vec2ConformerConfig):
            from asr_shap.models.w2v2_conformer import (
                init_w2v2_conformer_params,
            )

            params = init_w2v2_conformer_params(jax.random.key(seed),
                                                model_cfg)
        else:
            params = init_wav2vec2_params(jax.random.key(seed), model_cfg)

    clip_samples = int(round(clip_seconds * sr))
    max_label_len = max(8, clip_samples // CHAR_DURATION + 2)
    epoch_counter = {"n": 0}

    def train_stream():
        # fresh utterances every epoch (infinite-data regime)
        s = seed + 31 * epoch_counter["n"]
        epoch_counter["n"] += 1
        return (
            _device_batch(b)
            for b in synthetic_batches(
                s, batches_per_epoch, train_cfg.batch_size, clip_samples,
                max_label_len, snrs_db=train_cfg.snrs_db, offset=TRAIN_OFFSET,
            )
        )

    def val_stream():
        return (
            _device_batch(b)
            for b in synthetic_batches(
                seed, val_batches_count, train_cfg.batch_size, clip_samples,
                max_label_len, snrs_db=(), offset=VAL_OFFSET,
            )
        )

    t0 = time.perf_counter()
    params, _, history = train(
        params, model_cfg, train_cfg, train_stream, val_stream,
        mesh=mesh, checkpointer=checkpointer,
    )
    wall = time.perf_counter() - t0

    val_eval = list(
        synthetic_batches(seed, val_batches_count, train_cfg.batch_size,
                          clip_samples, max_label_len, snrs_db=(),
                          offset=VAL_OFFSET)
    )
    wer, pairs = greedy_wer(params, model_cfg, val_eval)
    summary = {
        "epochs_run": len(history),
        "final_train_loss": history[-1]["train_loss"] if history else None,
        "final_val_loss": history[-1]["val_loss"] if history else None,
        "heldout_greedy_wer": round(wer, 4),
        "target_wer": target_wer,
        "reached_target": wer <= target_wer,
        "train_wall_s": round(wall, 1),
        "n_eval_utterances": len(pairs),
        "example_pairs": pairs[:3],
    }
    logger.info("train_synthetic: %s", summary)
    return params, summary
