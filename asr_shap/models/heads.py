"""Aggregation heads — first-class definition of *what gets explained*.

The reference buries these in ad-hoc ModelWrapper classes (SURVEY.md
section 3.5): max over vocab (shap_calculation.py:50), mean over vocab
(test_shap_asr.py:36), a single (timestep, token) logit
(w2v2conformer.py:40-43), and mean over vocab+time
(lime_shap_wav2vec2_comparison.py:71). Here they are pure functions on the
logits, selected by ``ExplainerConfig.aggregation``.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from asr_shap.core.config import ExplainerConfig, Wav2Vec2Config


def aggregation_head(
    logits: jnp.ndarray, kind: str, token_timestep: int = 0, token_id: int = 0
) -> jnp.ndarray:
    """logits: [..., T, V] -> explained outputs [..., T_out].

    T_out = T for "max"/"mean", 1 for "token"/"mean_time".
    """
    if kind == "max":
        return jnp.max(logits, axis=-1)
    if kind == "mean":
        return jnp.mean(logits, axis=-1)
    if kind == "token":
        return logits[..., token_timestep, token_id][..., None]
    if kind == "mean_time":
        return jnp.mean(logits, axis=(-2, -1))[..., None]
    raise ValueError(f"unknown aggregation head {kind!r}")


def model_logits_fn(model_cfg: Wav2Vec2Config):
    """Model-family dispatch on the config type: Wav2Vec2ConformerConfig is
    a Wav2Vec2Config subclass, so every consumer (explainer heads, the
    pipeline, training) selects the right forward from the config alone."""
    from asr_shap.core.config import Wav2Vec2ConformerConfig

    if isinstance(model_cfg, Wav2Vec2ConformerConfig):
        from asr_shap.models.w2v2_conformer import w2v2_conformer_logits

        return w2v2_conformer_logits
    from asr_shap.models.wav2vec2 import wav2vec2_logits

    return wav2vec2_logits


def make_explained_fn(
    params,
    model_config: Wav2Vec2Config,
    explainer_config: ExplainerConfig,
    remat: bool | None = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build f: normalized waveform [N] -> explained outputs [T_out].

    Single-sample signature by design — the explainer vmaps it over
    interpolation draws and jacobian rows. The forward is chosen by the
    config's type (``model_logits_fn``), so a Wav2Vec2ConformerConfig gets
    the conformer forward here just as it does in the pipeline.
    """
    logits_fn = model_logits_fn(model_config)

    use_remat = explainer_config.remat if remat is None else remat
    ec = explainer_config

    def f(x: jnp.ndarray) -> jnp.ndarray:
        logits = logits_fn(params, model_config, x[None, :], remat=use_remat)
        out = aggregation_head(logits, ec.aggregation, ec.token_timestep, ec.token_id)
        return out[0]

    return f
