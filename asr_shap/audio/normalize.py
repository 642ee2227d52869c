"""Waveform normalization — the Wav2Vec2 feature-extractor input contract.

The reference delegates this to ``Wav2Vec2Processor``
(shap_calculation.py:117, :218); test_feature_extractor.py:40-45 demonstrates
the behavior is exactly per-utterance zero-mean/unit-variance of the raw
waveform. HF uses biased variance with eps=1e-7 inside the sqrt.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-7


def zero_mean_unit_var(x: jnp.ndarray, lengths: jnp.ndarray | None = None) -> jnp.ndarray:
    """Normalize waveform(s) to zero mean / unit variance per utterance.

    x: [..., N]. If ``lengths`` is given (shape [...]), statistics are
    computed only over the first ``lengths`` samples of each row (padded
    batches), and padded positions are zeroed — matching HF's
    attention-mask-aware normalization.
    """
    x = x.astype(jnp.float32)
    if lengths is None:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) / jnp.sqrt(var + _EPS)

    n = x.shape[-1]
    idx = jnp.arange(n)
    mask = (idx < lengths[..., None]).astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1.0)
    mean = jnp.sum(x * mask, axis=-1, keepdims=True) / cnt
    var = jnp.sum(jnp.square(x - mean) * mask, axis=-1, keepdims=True) / cnt
    return (x - mean) / jnp.sqrt(var + _EPS) * mask
