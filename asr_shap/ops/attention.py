"""Multi-head attention dispatch: XLA reference path or Pallas flash kernel.

The explainer is gradient-hungry (every SHAP draw backpropagates to the raw
waveform, SURVEY.md section 7 "differentiable everything"), so both paths are
fully differentiable; the Pallas path carries a custom VJP (flash backward).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _xla_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, bias: jnp.ndarray | None
) -> jnp.ndarray:
    """q,k,v: [B, H, T, D]. bias: additive [B, 1, 1, T] or [B, H, T, T]."""
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    impl: str = "xla",
) -> jnp.ndarray:
    """Scaled dot-product attention over [B, H, T, D] tensors."""
    if impl == "pallas":
        from asr_shap.kernels.flash_attention import flash_attention

        return flash_attention(q, k, v, bias)
    return _xla_attention(q, k, v, bias)
