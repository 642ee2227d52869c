"""Deletion/insertion faithfulness curves for waveform attributions.

A second attribution-quality axis, complementary to eta_raw: eta_raw asks
"do the top-attributed segments coincide with speech?" (needs the persisted
noise signal, calculate_metric.py:74-149); the deletion curve asks the
model itself — "does removing the top-attributed samples actually destroy
the transcript faster than removing random ones?" — and therefore needs no
ground-truth mask. This is the standard occlusion-based faithfulness test
from the XAI literature (RISE/ROAR-style deletion AUC), absent from the
reference, which motivates exactly this reading of its attributions via
per-character masking (visualization.py:349-368) without ever scoring it.

Protocol, per sample:
  * importance[n] = sum_t |phi[n, t]| — the same per-sample total relevance
    eta_raw segments (metrics/eta_raw.py), so both metrics grade one ranking;
  * for each fraction f: mask (deletion) or keep (insertion) the top-f
    fraction of samples by importance, fill with zeros or seeded noise,
    transcribe, and score WER against the reference text;
  * controls: the same fractions with seeded uniform-random rankings;
  * summary: area under the WER-vs-fraction curve (trapezoid). Faithful
    attributions give deletion AUC well ABOVE the random control (WER rises
    faster when informative samples go first) and insertion AUC well BELOW
    it (transcripts recover faster when informative samples return first).

All masked variants of one clip are scored in ONE batched jitted forward
(the variants axis is the batch), so a full curve costs one device call.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from asr_shap.audio.normalize import zero_mean_unit_var
from asr_shap.core.config import WAV2VEC2_VOCAB
from asr_shap.metrics.wer import batch_wer
from asr_shap.ops.ctc import ctc_greedy_decode, ctc_ids_to_text

DEFAULT_FRACTIONS = (0.01, 0.02, 0.05, 0.1, 0.2)


def importance_per_sample(shap_matrix: np.ndarray, n_audio: int) -> np.ndarray:
    """[N, T] / [T, N] / [N] attribution -> per-sample importance [N]
    (same orientation fix-up and |.|-sum reduction as metrics/eta_raw.py)."""
    phi = np.asarray(shap_matrix)
    if phi.ndim == 1:
        return np.abs(phi)
    if phi.shape[0] != n_audio and phi.shape[1] == n_audio:
        phi = phi.T
    return np.abs(phi).sum(axis=-1)


def _topk_mask(order: np.ndarray, n: int, fraction: float) -> np.ndarray:
    """Boolean [n] mask that is True on the first ceil(f*n) entries of
    ``order`` (the samples to delete/insert)."""
    k = int(np.ceil(fraction * n))
    mask = np.zeros(n, bool)
    mask[order[:k]] = True
    return mask


def masked_variants(
    audio: np.ndarray,
    importance: np.ndarray,
    fractions: Sequence[float],
    mode: str = "deletion",
    fill: str = "zero",
    n_random: int = 3,
    seed: int = 0,
) -> tuple[np.ndarray, List[Dict]]:
    """Build the batch of masked clips for one faithfulness curve.

    Returns (variants [1 + len(fractions)*(1+n_random), N], meta) where
    meta[i] = {"kind": "orig"|"topk"|"random", "fraction": f, "rep": r}.
    ``mode="deletion"`` masks the selected samples; ``mode="insertion"``
    masks everything EXCEPT the selected samples. ``fill`` is "zero" or
    "noise" (seeded gaussian at the clip's RMS, so filled regions carry
    typical energy but no structure).
    """
    if mode not in ("deletion", "insertion"):
        raise ValueError(f"unknown mode {mode!r}")
    audio = np.asarray(audio, np.float32)
    n = audio.shape[0]
    rng = np.random.default_rng(seed)
    if fill == "zero":
        filler = np.zeros(n, np.float32)
    elif fill == "noise":
        rms = float(np.sqrt(np.mean(np.square(audio)))) or 1.0
        filler = rng.standard_normal(n).astype(np.float32) * rms
    else:
        raise ValueError(f"unknown fill {fill!r}")

    orders = {"topk": np.argsort(-np.asarray(importance), kind="stable")}
    for r in range(n_random):
        orders[f"random{r}"] = rng.permutation(n)

    variants = [audio]
    meta: List[Dict] = [{"kind": "orig", "fraction": 0.0, "rep": 0}]
    for f in fractions:
        for name, order in orders.items():
            sel = _topk_mask(order, n, f)
            if mode == "insertion":
                sel = ~sel
            variants.append(np.where(sel, filler, audio))
            meta.append({
                "kind": "topk" if name == "topk" else "random",
                "fraction": float(f),
                "rep": 0 if name == "topk" else int(name[6:]),
            })
    return np.stack(variants), meta


def curve_auc(fractions: Sequence[float], wers: Sequence[float]) -> float:
    """Trapezoid area under WER(fraction), anchored at fraction 0 with the
    unmasked WER prepended by the caller; normalized by the fraction span
    so curves over different grids compare."""
    f = np.asarray(fractions, np.float64)
    w = np.asarray(wers, np.float64)
    span = f[-1] - f[0]
    return float(np.trapezoid(w, f) / span) if span > 0 else float(w.mean())


def faithfulness_curve(
    transcribe_fn: Callable[[np.ndarray], List[str]],
    audio: np.ndarray,
    shap_matrix: np.ndarray,
    reference_text: str,
    fractions: Sequence[float] = DEFAULT_FRACTIONS,
    mode: str = "deletion",
    fill: str = "zero",
    n_random: int = 3,
    seed: int = 0,
) -> Dict:
    """One sample's faithfulness record.

    ``transcribe_fn([B, N] float32) -> B transcripts`` is the model under
    test (any family). Returns {base_wer, points: [{fraction, wer_topk,
    wer_random (mean over reps)}], auc_topk, auc_random, auc_gap} where
    auc_gap = auc_topk - auc_random for deletion (positive = faithful) and
    auc_random - auc_topk for insertion (positive = faithful).
    """
    audio = np.asarray(audio, np.float32)
    importance = importance_per_sample(shap_matrix, audio.shape[0])
    variants, meta = masked_variants(
        audio, importance, fractions, mode, fill, n_random, seed
    )
    texts = transcribe_fn(variants)
    wers = batch_wer([reference_text] * len(texts), texts)

    base = wers[0]
    points = []
    for f in fractions:
        topk = [w for w, m in zip(wers, meta)
                if m["kind"] == "topk" and m["fraction"] == float(f)]
        rand = [w for w, m in zip(wers, meta)
                if m["kind"] == "random" and m["fraction"] == float(f)]
        points.append({
            "fraction": float(f),
            "wer_topk": float(np.mean(topk)),
            "wer_random": float(np.mean(rand)),
        })

    grid = [0.0] + [p["fraction"] for p in points]
    auc_topk = curve_auc(grid, [base] + [p["wer_topk"] for p in points])
    auc_random = curve_auc(grid, [base] + [p["wer_random"] for p in points])
    gap = auc_topk - auc_random if mode == "deletion" else auc_random - auc_topk
    return {
        "mode": mode,
        "fill": fill,
        "base_wer": float(base),
        "points": points,
        "auc_topk": auc_topk,
        "auc_random": auc_random,
        "auc_gap": float(gap),
    }


def make_transcribe_fn(
    params,
    model_cfg,
    logits_fn=None,
    vocab: Sequence[str] = WAV2VEC2_VOCAB,
) -> Callable[[np.ndarray], List[str]]:
    """Batched greedy transcription closure over a model family — one jitted
    call per distinct (batch, length) shape; decode string assembly on host."""
    if logits_fn is None:
        from asr_shap.models.wav2vec2 import wav2vec2_logits

        logits_fn = wav2vec2_logits

    @jax.jit
    def step(p, batch):
        logits = logits_fn(p, model_cfg, zero_mean_unit_var(batch))
        return ctc_greedy_decode(logits)

    def transcribe(batch: np.ndarray) -> List[str]:
        ids, keep = step(params, jnp.asarray(batch))
        ids, keep = np.asarray(ids), np.asarray(keep)
        return [ctc_ids_to_text(i, k, vocab) for i, k in zip(ids, keep)]

    return transcribe


def faithfulness_summary(records: Sequence[Dict],
                         n_boot: int = 2000, seed: int = 0) -> Dict:
    """Aggregate per-sample records: mean AUCs, mean gap, and a bootstrap
    CI + sign test on the paired per-sample gap (positive gap = the
    attribution ranking beats random)."""
    gaps = np.asarray([r["auc_gap"] for r in records], np.float64)
    rng = np.random.default_rng(seed)
    if len(gaps) > 1:
        idx = rng.integers(0, len(gaps), size=(n_boot, len(gaps)))
        boots = gaps[idx].mean(axis=1)
        lo, hi = np.percentile(boots, [2.5, 97.5])
    else:
        lo = hi = float(gaps.mean()) if len(gaps) else 0.0
    return {
        "n": len(records),
        "mean_auc_topk": float(np.mean([r["auc_topk"] for r in records])),
        "mean_auc_random": float(np.mean([r["auc_random"] for r in records])),
        "mean_auc_gap": float(gaps.mean()) if len(gaps) else 0.0,
        "gap_ci95": [float(lo), float(hi)],
        "frac_gap_positive": float(np.mean(gaps > 0)) if len(gaps) else 0.0,
    }
