"""eta_raw-vs-WER evaluation sweep over the attribution store — the
equivalent of ``python nraw_vs_wer.py`` (call stack SURVEY.md section 3.3),
with the model forward, greedy decode prep, and eta_raw all device-side.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from asr_shap.audio.normalize import zero_mean_unit_var
from asr_shap.core.config import MetricConfig, WAV2VEC2_VOCAB, Wav2Vec2Config
from asr_shap.core.store import AttributionStore
from asr_shap.metrics.eta_raw import eta_raw
from asr_shap.metrics.wer import wer
from asr_shap.models.wav2vec2 import wav2vec2_logits
from asr_shap.ops.ctc import ctc_greedy_decode, ctc_ids_to_text

logger = logging.getLogger(__name__)


def eta_wer_sweep(
    params,
    model_cfg: Wav2Vec2Config,
    store: AttributionStore,
    metric_cfg: MetricConfig = MetricConfig(),
    logits_fn=None,
    vocab=WAV2VEC2_VOCAB,
) -> List[Dict]:
    """For every stored (audio, noise, shap, text) quadruple: transcribe the
    mixed audio, compute WER against the reference text and eta_raw against
    the ITM; returns one record per sample (the scatter data of
    nraw_vs_wer.py:160-182).

    ``logits_fn(params, cfg, x[1, N]) -> [1, T, V]`` swaps the decoding
    model (e.g. ``w2v2_conformer_logits``); default is the reference's
    Wav2Vec2. ``vocab`` swaps the id->symbol table alongside it.
    """
    logits_fn = logits_fn or wav2vec2_logits

    # params as a jit ARGUMENT: closing over large weight trees bakes them
    # into the HLO as constants (same rationale as run_shap._sample_step)
    @jax.jit
    def decode_step(p, x):
        logits = logits_fn(p, model_cfg, x[None, :])
        ids, keep = ctc_greedy_decode(logits)
        return ids[0], keep[0]

    @jax.jit
    def eta_step(clean, noise, phi):
        return eta_raw(clean, noise, phi, metric_cfg)

    records = []
    for sample in store.iter_samples():
        mixed = np.asarray(sample["audio"], np.float32)
        noise = np.asarray(sample["noise"], np.float32)
        clean = mixed - noise  # nraw_vs_wer.py:141-142
        phi = np.asarray(sample["shap_values"], np.float32)

        ids, keep = decode_step(params, zero_mean_unit_var(jnp.asarray(mixed)))
        hyp = ctc_ids_to_text(np.asarray(ids), np.asarray(keep), vocab)
        ref = sample["text"]
        sample_wer = wer(ref, hyp) if ref.strip() else float("nan")
        eta = float(eta_step(jnp.asarray(clean), jnp.asarray(noise), jnp.asarray(phi)))

        key = sample["key"]
        records.append(
            {
                "index": key.index,
                "type": key.type,
                "snr": key.snr,
                "wer": sample_wer,
                "eta_raw": eta,
                "reference": ref,
                "hypothesis": hyp,
            }
        )
        logger.info(
            "sample %d %s snr=%s: wer=%.3f eta_raw=%.3f",
            key.index, key.type, key.snr, sample_wer, eta,
        )
    return records


def correlation(records: List[Dict]) -> Optional[float]:
    """Pearson correlation of (wer, eta_raw) across the sweep."""
    pts = [(r["wer"], r["eta_raw"]) for r in records if np.isfinite(r["wer"])]
    if len(pts) < 2:
        return None
    w, e = np.asarray(pts).T
    if w.std() == 0 or e.std() == 0:
        return None
    return float(np.corrcoef(w, e)[0, 1])
