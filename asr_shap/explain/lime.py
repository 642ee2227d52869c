"""LIME for audio — perturbation-based linear surrogate, TPU-native.

Capability of the reference's LIME-vs-SHAP comparison
(lime_shap_wav2vec2_comparison.py:60-90: LimeTabularExplainer over raw
waveform features, 500 perturbations, regression mode). The reference calls
a host library that loops perturbations through the model one at a time;
here the perturbation axis is a vmapped batch inside one jitted computation,
and the weighted ridge solve runs on device too.

Formulation (standard LIME-for-audio): the waveform is divided into S equal
segments; M binary coalition masks z ~ Bernoulli(keep_prob) produce masked
inputs x_z = b + upsample(z) * (x - b) against baseline b; sample weights
use the exponential kernel on cosine distance to the all-ones coalition; the
attribution for each output is the weighted-ridge coefficient of each
segment, broadcast back to samples. Returns the same [N, T_out] layout as
the other explainers.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from asr_shap.core.config import ExplainerConfig


class LimeExplanation(NamedTuple):
    values: jnp.ndarray          # [N, T_out] per-sample attribution
    segment_values: jnp.ndarray  # [S, T_out] per-segment coefficients
    intercept: jnp.ndarray       # [T_out]
    model_output: jnp.ndarray    # [T_out]


def lime_attributions(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    key: jax.Array,
    num_segments: int = 64,
    num_samples: int = 500,
    keep_prob: float = 0.5,
    ridge_alpha: float = 1.0,
    kernel_width: float = 0.25,
    baseline: Optional[jnp.ndarray] = None,
    batch: int = 16,
) -> LimeExplanation:
    """Explain f: [N] -> [T_out] at x with a LIME linear surrogate."""
    n = x.shape[0]
    if baseline is None:
        baseline = jnp.zeros_like(x)
    seg_len = -(-n // num_segments)
    pad = seg_len * num_segments - n

    def upsample(z):  # [S] -> [N]
        return jnp.repeat(z, seg_len)[: n]

    k_mask, = jax.random.split(key, 1)
    masks = jax.random.bernoulli(
        k_mask, keep_prob, (num_samples, num_segments)
    ).astype(jnp.float32)
    # LIME convention: the first sample is the full coalition (the instance)
    masks = masks.at[0].set(1.0)

    def eval_masked(z):
        xz = baseline + upsample(z) * (x - baseline)
        return f(xz)

    # chunked vmap over perturbations (bounded memory, fused compute)
    n_chunks = -(-num_samples // batch)
    total = n_chunks * batch
    masks_p = jnp.pad(masks, ((0, total - num_samples), (0, 0)))
    ys = lax.map(jax.vmap(eval_masked), masks_p.reshape(n_chunks, batch, -1))
    ys = ys.reshape(total, -1)[:num_samples]          # [M, T_out]

    # cosine distance to all-ones, exponential kernel
    ones = jnp.ones((num_segments,))
    cos = (masks @ ones) / (
        jnp.linalg.norm(masks, axis=1) * jnp.linalg.norm(ones) + 1e-12
    )
    dist = 1.0 - cos
    w = jnp.exp(-(dist**2) / (kernel_width**2))       # [M]

    # weighted ridge with intercept: Z = [masks, 1]
    z = jnp.concatenate([masks, jnp.ones((num_samples, 1))], axis=1)  # [M, S+1]
    zw = z * w[:, None]
    a = z.T @ zw + ridge_alpha * jnp.eye(num_segments + 1)
    a = a.at[-1, -1].add(-ridge_alpha)                # don't penalize intercept
    b = zw.T @ ys                                     # [S+1, T_out]
    beta = jnp.linalg.solve(a, b)
    seg_vals, intercept = beta[:-1], beta[-1]

    per_sample = jnp.repeat(seg_vals, seg_len, axis=0)[: n]
    return LimeExplanation(
        values=per_sample,
        segment_values=seg_vals,
        intercept=intercept,
        model_output=ys[0],
    )
