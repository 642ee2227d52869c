"""End-to-end attribution pipeline — the equivalent of running
``python shap_calculation.py`` (reference call stack in SURVEY.md section 3.1),
redesigned so the hot loop is a single jitted, optionally mesh-sharded
computation per sample and the host only moves data at the edges.

Per sample: normalize (D2) -> confidence + greedy transcript (one forward)
-> expected-gradients attribution matrix -> persist the
(audio, noise, shap_values, text) quadruple under the reference npy naming
contract. Resumable: samples already complete in the store are skipped
(capability absent upstream — SURVEY.md section 5 checkpoint/resume).
"""

from __future__ import annotations

import logging
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from asr_shap.audio.normalize import zero_mean_unit_var
from asr_shap.core.config import PipelineConfig, WAV2VEC2_VOCAB
from asr_shap.core.prng import fold
from asr_shap.core.store import AttributionStore, key_for
from asr_shap.explain.baselines import zeros_noise_background
from asr_shap.explain.expected_gradients import (
    expected_gradients,
    expected_gradients_sharded,
)
from asr_shap.metrics.confidence import mean_max_softmax_confidence
from asr_shap.models.heads import aggregation_head
from asr_shap.models.wav2vec2 import wav2vec2_logits
from asr_shap.ops.ctc import ctc_greedy_decode, ctc_ids_to_text
from asr_shap.utils.debug import check_finite

logger = logging.getLogger(__name__)


def _build_step(cfg: PipelineConfig, mesh=None):
    """One jitted computation per input length: logits diagnostics + the
    full attribution matrix. ``params`` is a jit ARGUMENT (not a closure) so
    the weights stay device-resident data instead of being baked into the
    HLO as constants — at 94M params a closure bloats the program past what
    compile services accept."""
    mc, ec = cfg.model, cfg.explainer

    def step(params, x, key):
        def f(xx):
            logits = wav2vec2_logits(params, mc, xx[None, :], remat=ec.remat)
            return aggregation_head(
                logits, ec.aggregation, ec.token_timestep, ec.token_id
            )[0]

        bg = zeros_noise_background(
            fold(key, 0), x.shape[0], ec.num_background, ec.background_sigma
        )
        logits = wav2vec2_logits(params, mc, x[None, :])
        conf = mean_max_softmax_confidence(logits)[0]
        ids, keep = ctc_greedy_decode(logits)
        if mesh is None:
            expl = expected_gradients(f, x, bg, fold(key, 1), ec)
        else:
            expl = expected_gradients_sharded(f, x, bg, fold(key, 1), mesh, ec)
        return expl.values, conf, ids[0], keep[0]

    return jax.jit(step)


def run_shap_pipeline(
    params,
    cfg: PipelineConfig,
    test_set: List[Dict],
    store: Optional[AttributionStore] = None,
    mesh=None,
    resume: bool = True,
) -> List[Dict]:
    """Compute and persist attributions for every sample in ``test_set``.

    Returns per-sample result dicts (shap matrix, transcription, confidence,
    wall-clock). jit caches one executable per distinct audio length."""
    store = store or AttributionStore(cfg.data_dir)
    step = _build_step(cfg, mesh)
    key = jax.random.key(cfg.seed)

    results = []
    for i, sample in enumerate(test_set):
        skey = key_for(i, sample["type"], sample["snr"])
        if resume and store.completed(skey):
            logger.info("sample %d (%s) already computed — skipping", i, skey)
            continue

        x = zero_mean_unit_var(jnp.asarray(sample["audio"]))
        t0 = time.perf_counter()
        phi, conf, ids, keep = step(params, x, fold(key, i))
        phi = np.asarray(phi)  # device->host once, at the end
        wall = time.perf_counter() - t0
        check_finite(phi, f"shap_values[sample {i}]")

        transcription = ctc_ids_to_text(np.asarray(ids), np.asarray(keep), WAV2VEC2_VOCAB)
        store.save(skey, sample["audio"], sample["noise"], phi, sample["text"])
        results.append(
            {
                "key": skey,
                "shap_values": phi,
                "transcription": transcription,
                "confidence": float(conf),
                "wall_s": wall,
                "snr": sample["snr"],
                "type": sample["type"],
            }
        )
        logger.info(
            "sample %d (%s, snr=%s): %.2fs, conf=%.3f, '%s'",
            i, sample["type"], sample["snr"], wall, float(conf), transcription[:50],
        )
    store.write_manifest()
    return results
