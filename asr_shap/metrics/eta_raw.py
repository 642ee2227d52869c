"""eta_raw — the Raw Audio Speech Relevance Score, device-side.

Reference semantics (both variants reproduced exactly):
  * calculate_metric.py:74-149 — ITM = (E_c > 0.5 * E_u), "half"
  * nraw_vs_wer.py:20-62      — ITM = (E_c > E_u), "strict" (sweep default)

Definition: split clean/noise signals into segments of ``segment_ms``;
a segment is speech-dominated if its clean energy exceeds the (scaled) noise
energy (the Ideal Time-domain Mask). Per-segment relevance is the segment
mean of the per-sample total attribution sum_t |phi[n, t]|; tau is the
``percentile``-th percentile of those segment relevances; eta_raw is the
fraction of above-tau segments that are speech-dominated.

The whole computation is jnp (jit/vmap-able) so the eta_raw-vs-WER sweep
never leaves the device. Percentile uses linear interpolation, matching
np.percentile's default.
"""

from __future__ import annotations

import jax.numpy as jnp

from asr_shap.core.config import MetricConfig


def eta_raw(
    clean_audio: jnp.ndarray,
    noise_audio: jnp.ndarray,
    shap_matrix: jnp.ndarray,
    config: MetricConfig = MetricConfig(),
) -> jnp.ndarray:
    """eta_raw for one sample. shap_matrix: [N_audio, T_frames] (or [N_audio]
    if the per-sample total has already been reduced)."""
    sr = config.sample_rate
    seg = int(sr * (config.segment_ms / 1000.0))
    if seg == 0:
        raise ValueError("segment_ms too small: 0 samples per segment")

    if shap_matrix.ndim == 1:
        phi_total = jnp.abs(shap_matrix)
    else:
        # Shape fix-up per calculate_metric.py:93-99: accept a transposed
        # [T_frames, N_audio] matrix (static check, safe under jit).
        if (
            shap_matrix.shape[0] != clean_audio.shape[0]
            and shap_matrix.shape[1] == clean_audio.shape[0]
        ):
            shap_matrix = shap_matrix.T
        phi_total = jnp.sum(jnp.abs(shap_matrix), axis=-1)  # [N_audio]

    min_len = min(clean_audio.shape[0], noise_audio.shape[0], phi_total.shape[0])
    num_segments = min_len // seg
    if num_segments == 0:
        return jnp.asarray(0.0)
    trunc = num_segments * seg

    clean_seg = clean_audio[:trunc].reshape(num_segments, seg).astype(jnp.float32)
    noise_seg = noise_audio[:trunc].reshape(num_segments, seg).astype(jnp.float32)
    e_c = jnp.sum(jnp.square(clean_seg), axis=1)
    e_u = jnp.sum(jnp.square(noise_seg), axis=1)
    if config.itm_variant == "half":
        itm = e_c > 0.5 * e_u  # calculate_metric.py:118
    elif config.itm_variant == "strict":
        itm = e_c > e_u        # nraw_vs_wer.py:46
    else:
        raise ValueError(f"unknown itm_variant {config.itm_variant!r}")

    bar_phi = jnp.mean(phi_total[:trunc].reshape(num_segments, seg), axis=1)
    tau = jnp.percentile(bar_phi, config.percentile, method="linear")
    # Tie-aware relevance: the reference compares strictly
    # (calculate_metric.py:143 `relevant_segments = bar_phi > tau`), which is
    # well-defined for its continuous gradient attributions — the linearly
    # interpolated tau falls strictly between order statistics, so >= and >
    # select the same set. For tie-heavy attributions (segment-level
    # explainers like KernelSHAP/LIME broadcast one value across thousands
    # of samples) the strict form degenerates: when the top tied block spans
    # more than (100 - percentile)%, tau equals the maximum and NO segment is
    # strictly above it, forcing eta_raw to 0 regardless of where the
    # attribution mass sits. >= keeps the reference semantics on every
    # reference-reachable input and grades the whole top block otherwise.
    relevant = bar_phi >= tau
    denom = jnp.sum(relevant)
    num = jnp.sum(relevant & itm)
    return jnp.where(denom == 0, 0.0, num / jnp.maximum(denom, 1))
