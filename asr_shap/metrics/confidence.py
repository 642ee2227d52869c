"""Model confidence = mean over frames of max softmax probability
(reference: shap_calculation.py:184-188)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mean_max_softmax_confidence(logits: jnp.ndarray) -> jnp.ndarray:
    """logits: [..., T, V] -> scalar per leading batch dims."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.mean(jnp.max(probs, axis=-1), axis=-1)
