"""Convert HuggingFace Wav2Vec2ForCTC checkpoints to asr_shap params.

The reference loads ``facebook/wav2vec2-base-960h`` via transformers
(shap_calculation.py:217-220). This converter maps a torch ``state_dict``
(or a safetensors file) onto the functional params pytree of
``models/wav2vec2.py``. Torch is only needed at conversion time — the
resulting pytree is plain jnp arrays and can be saved with orbax.

Handles both weight-norm layouts of the positional conv embedding:
legacy ``weight_g``/``weight_v`` and the parametrized
``parametrizations.weight.original{0,1}``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from asr_shap.core.config import Wav2Vec2Config


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _linear(sd: Mapping[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    p = {"kernel": jnp.asarray(_np(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return p


def _norm(sd: Mapping[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    return {
        "scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }


def _weight_normed_conv(sd: Mapping[str, Any], prefix: str) -> np.ndarray:
    """Materialize the effective weight of a torch weight_norm(dim=2) conv.
    Returns torch layout [out, in/groups, K]."""
    if f"{prefix}.weight_g" in sd:
        g = _np(sd[f"{prefix}.weight_g"])
        v = _np(sd[f"{prefix}.weight_v"])
    elif f"{prefix}.parametrizations.weight.original0" in sd:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
    else:
        return _np(sd[f"{prefix}.weight"])
    # norm over all dims except the one where g is broadcast (dim=2 for w2v2)
    norm_dims = tuple(i for i, s in enumerate(g.shape) if s == 1)
    norm = np.sqrt(np.sum(v**2, axis=norm_dims, keepdims=True))
    return g * v / norm


def convert_wav2vec2_state_dict(
    sd: Mapping[str, Any], config: Wav2Vec2Config
) -> Dict[str, Any]:
    """torch state_dict -> asr_shap params pytree (float32)."""
    cfg = config
    conv_layers = []
    for i in range(len(cfg.conv_dim)):
        pre = f"wav2vec2.feature_extractor.conv_layers.{i}"
        # torch conv weight [out, in, K] -> WIO [K, in, out]
        w = _np(sd[f"{pre}.conv.weight"]).transpose(2, 1, 0)
        layer: Dict[str, Any] = {"conv": {"kernel": jnp.asarray(w)}}
        if f"{pre}.conv.bias" in sd:
            layer["conv"]["bias"] = jnp.asarray(_np(sd[f"{pre}.conv.bias"]))
        if f"{pre}.layer_norm.weight" in sd:
            layer["norm"] = _norm(sd, f"{pre}.layer_norm")
        conv_layers.append(layer)

    pos_w = _weight_normed_conv(sd, "wav2vec2.encoder.pos_conv_embed.conv")

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"wav2vec2.encoder.layers.{i}"
        layers.append(
            {
                "attention": {
                    "q": _linear(sd, f"{pre}.attention.q_proj"),
                    "k": _linear(sd, f"{pre}.attention.k_proj"),
                    "v": _linear(sd, f"{pre}.attention.v_proj"),
                    "out": _linear(sd, f"{pre}.attention.out_proj"),
                },
                "layer_norm": _norm(sd, f"{pre}.layer_norm"),
                "ffn": {
                    "intermediate": _linear(sd, f"{pre}.feed_forward.intermediate_dense"),
                    "output": _linear(sd, f"{pre}.feed_forward.output_dense"),
                },
                "final_layer_norm": _norm(sd, f"{pre}.final_layer_norm"),
            }
        )
    import jax

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    return {
        "feature_encoder": conv_layers,
        "feature_projection": {
            "layer_norm": _norm(sd, "wav2vec2.feature_projection.layer_norm"),
            "projection": _linear(sd, "wav2vec2.feature_projection.projection"),
        },
        "encoder": {
            "pos_conv": {
                "kernel": jnp.asarray(pos_w.transpose(2, 1, 0)),  # [K, in/g, out]
                "bias": jnp.asarray(_np(sd["wav2vec2.encoder.pos_conv_embed.conv.bias"])),
            },
            "layer_norm": _norm(sd, "wav2vec2.encoder.layer_norm"),
            "layers": stacked,
        },
        "lm_head": _linear(sd, "lm_head"),
    }


def convert_wav2vec2_conformer_state_dict(
    sd: Mapping[str, Any], config
) -> Dict[str, Any]:
    """torch ``Wav2Vec2ConformerForCTC`` state_dict -> asr_shap params pytree
    for models/w2v2_conformer.py (reference study model, w2v2conformer.py:57-59).

    The HF encoder's conv positional embedding is constructed but never used
    in its forward, so its weights are intentionally dropped here; the same
    goes for ``masked_spec_embed`` (training-time SpecAugment only).
    """
    import jax

    cfg = config
    conv_layers = []
    for i in range(len(cfg.conv_dim)):
        pre = f"wav2vec2_conformer.feature_extractor.conv_layers.{i}"
        w = _np(sd[f"{pre}.conv.weight"]).transpose(2, 1, 0)
        layer: Dict[str, Any] = {"conv": {"kernel": jnp.asarray(w)}}
        if f"{pre}.conv.bias" in sd:
            layer["conv"]["bias"] = jnp.asarray(_np(sd[f"{pre}.conv.bias"]))
        if f"{pre}.layer_norm.weight" in sd:
            layer["norm"] = _norm(sd, f"{pre}.layer_norm")
        conv_layers.append(layer)

    def ffn(pre):
        return {
            "norm": _norm(sd, f"{pre}_layer_norm"),
            "intermediate": _linear(sd, f"{pre}.intermediate_dense"),
            "output": _linear(sd, f"{pre}.output_dense"),
        }

    def pointwise(prefix):
        # torch Conv1d k=1 weight [out, in, 1] == a linear kernel [in, out]
        return {"kernel": jnp.asarray(_np(sd[f"{prefix}.weight"])[:, :, 0].T)}

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"wav2vec2_conformer.encoder.layers.{i}"
        attn: Dict[str, Any] = {
            "norm": _norm(sd, f"{pre}.self_attn_layer_norm"),
            "q": _linear(sd, f"{pre}.self_attn.linear_q"),
            "k": _linear(sd, f"{pre}.self_attn.linear_k"),
            "v": _linear(sd, f"{pre}.self_attn.linear_v"),
            "out": _linear(sd, f"{pre}.self_attn.linear_out"),
        }
        if cfg.position_embeddings_type == "relative":
            attn["pos"] = _linear(sd, f"{pre}.self_attn.linear_pos")
            attn["bias_u"] = jnp.asarray(_np(sd[f"{pre}.self_attn.pos_bias_u"]))
            attn["bias_v"] = jnp.asarray(_np(sd[f"{pre}.self_attn.pos_bias_v"]))
        layers.append(
            {
                "ffn1": ffn(f"{pre}.ffn1"),
                "attn": attn,
                "conv": {
                    "norm": _norm(sd, f"{pre}.conv_module.layer_norm"),
                    "pw1": pointwise(f"{pre}.conv_module.pointwise_conv1"),
                    "depthwise": {
                        "kernel": jnp.asarray(
                            _np(sd[f"{pre}.conv_module.depthwise_conv.weight"])
                            .transpose(2, 1, 0)
                        )
                    },
                    "bn": {
                        "scale": jnp.asarray(_np(sd[f"{pre}.conv_module.batch_norm.weight"])),
                        "bias": jnp.asarray(_np(sd[f"{pre}.conv_module.batch_norm.bias"])),
                        "mean": jnp.asarray(_np(sd[f"{pre}.conv_module.batch_norm.running_mean"])),
                        "var": jnp.asarray(_np(sd[f"{pre}.conv_module.batch_norm.running_var"])),
                    },
                    "pw2": pointwise(f"{pre}.conv_module.pointwise_conv2"),
                },
                "ffn2": ffn(f"{pre}.ffn2"),
                "final_norm": _norm(sd, f"{pre}.final_layer_norm"),
            }
        )

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "feature_encoder": conv_layers,
        "feature_projection": {
            "layer_norm": _norm(sd, "wav2vec2_conformer.feature_projection.layer_norm"),
            "projection": _linear(sd, "wav2vec2_conformer.feature_projection.projection"),
        },
        "encoder": {
            "layers": stacked,
            "layer_norm": _norm(sd, "wav2vec2_conformer.encoder.layer_norm"),
        },
        "lm_head": _linear(sd, "lm_head"),
    }


def load_pretrained_conformer(model_name_or_path: str, config=None):
    """Load an HF Wav2Vec2ConformerForCTC checkpoint and return
    (params, config). Requires torch+transformers at call time."""
    from transformers import Wav2Vec2ConformerForCTC

    from asr_shap.core.config import Wav2Vec2ConformerConfig

    model = Wav2Vec2ConformerForCTC.from_pretrained(model_name_or_path)
    hf = model.config
    if config is None:
        config = Wav2Vec2ConformerConfig(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_hidden_layers=hf.num_hidden_layers,
            num_attention_heads=hf.num_attention_heads,
            intermediate_size=hf.intermediate_size,
            conv_dim=tuple(hf.conv_dim),
            conv_stride=tuple(hf.conv_stride),
            conv_kernel=tuple(hf.conv_kernel),
            conv_bias=hf.conv_bias,
            feat_extract_norm=hf.feat_extract_norm,
            layer_norm_eps=hf.layer_norm_eps,
            feat_proj_dim=hf.conv_dim[-1],
            position_embeddings_type=hf.position_embeddings_type,
            rotary_embedding_base=getattr(hf, "rotary_embedding_base", 10_000),
            conv_depthwise_kernel_size=hf.conv_depthwise_kernel_size,
            hidden_act=hf.hidden_act,
        )
    params = convert_wav2vec2_conformer_state_dict(model.state_dict(), config)
    return params, config


def load_pretrained(model_name_or_path: str, config: Wav2Vec2Config | None = None):
    """Load an HF Wav2Vec2ForCTC checkpoint (local path or hub name) and
    return (params, config). Requires torch+transformers at call time."""
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2ForCTC

    model = Wav2Vec2ForCTC.from_pretrained(model_name_or_path)
    hf_cfg: HFConfig = model.config
    if config is None:
        config = Wav2Vec2Config(
            vocab_size=hf_cfg.vocab_size,
            hidden_size=hf_cfg.hidden_size,
            num_hidden_layers=hf_cfg.num_hidden_layers,
            num_attention_heads=hf_cfg.num_attention_heads,
            intermediate_size=hf_cfg.intermediate_size,
            conv_dim=tuple(hf_cfg.conv_dim),
            conv_stride=tuple(hf_cfg.conv_stride),
            conv_kernel=tuple(hf_cfg.conv_kernel),
            conv_bias=hf_cfg.conv_bias,
            feat_extract_norm=hf_cfg.feat_extract_norm,
            num_conv_pos_embeddings=hf_cfg.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=hf_cfg.num_conv_pos_embedding_groups,
            do_stable_layer_norm=hf_cfg.do_stable_layer_norm,
            layer_norm_eps=hf_cfg.layer_norm_eps,
            feat_proj_dim=hf_cfg.conv_dim[-1],
        )
    params = convert_wav2vec2_state_dict(model.state_dict(), config)
    return params, config
