"""Wav2Vec2-Conformer CTC model — pure-JAX, TPU-first.

Capability target: ``transformers.Wav2Vec2ConformerForCTC`` as used by the
reference's Conformer SHAP studies — the rel-pos large checkpoint at
w2v2conformer.py:57-59 and the rope-large checkpoint in
conformer_test.ipynb (SURVEY.md D1/R12/R24). Round 1's Conformer could only
run random-init torchaudio-style blocks; this module adds the pieces that
make the pretrained studies reproducible:

  * Transformer-XL relative-position self-attention (the pos-projected
    sinusoidal embedding, the u/v biases, and the relative-shift trick —
    expressed as one extra einsum feeding the attention bias, so the same
    XLA/Pallas attention kernels serve both position schemes);
  * rotary embeddings (applied to the pre-projection hidden states, matching
    the HF formulation exactly — a quirk, but parity requires it);
  * conformer blocks (half-residual FFNs, GLU conv module with depthwise
    conv + inference-mode batchnorm) over the wav2vec2 conv feature encoder
    and feature projection, which are reused from models/wav2vec2.py;
  * an HF checkpoint converter (models/convert_hf.py) with random-init torch
    parity tests (tests/test_w2v2_conformer_parity.py).

Like wav2vec2.py the layers are scan-stacked, remat-able, and the
nonlinearities are pluggable (``Rules`` + ``gelu``) so the DeepSHAP rescale
custom-VJPs run on dual arrays through the full model.

Parity notes vs HF (verified against modeling_wav2vec2_conformer.py):
the encoder constructs a conv positional embedding but never applies it in
forward — only the relative/rotary embedding is active; we reproduce that
(and omit the dead module's params entirely). BatchNorm runs in inference
mode (running stats), the only mode the explainer needs.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from asr_shap.core.config import Wav2Vec2ConformerConfig
from asr_shap.models.conformer import PLAIN_RULES, Rules
from asr_shap.models.wav2vec2 import (
    _gelu,
    _init_linear,
    _init_norm,
    _layer_norm,
    _linear,
    cast_params_for_compute,
    feature_encoder,
)
from asr_shap.ops.attention import multi_head_attention, rel_pos_embedding, rel_shift

Params = Dict[str, Any]


# --------------------------------------------------------------------- init

def init_w2v2_conformer_params(
    key: jax.Array, cfg: Wav2Vec2ConformerConfig
) -> Params:
    """Random init mirroring the HF shapes (u/v biases start at zero)."""
    from asr_shap.models.wav2vec2 import init_wav2vec2_params

    base = init_wav2vec2_params(key, cfg)  # reuse conv encoder/projection/head
    keys = iter(jax.random.split(jax.random.fold_in(key, 1), 8 * cfg.num_hidden_layers + 8))
    d = cfg.hidden_size
    nh, hd = cfg.num_attention_heads, cfg.head_dim

    def init_ffn(k):
        k1, k2 = jax.random.split(k)
        return {
            "norm": _init_norm(d),
            "intermediate": _init_linear(k1, d, cfg.intermediate_size),
            "output": _init_linear(k2, cfg.intermediate_size, d),
        }

    def init_layer(k):
        ks = iter(jax.random.split(k, 12))
        attn: Params = {
            "norm": _init_norm(d),
            "q": _init_linear(next(ks), d, d),
            "k": _init_linear(next(ks), d, d),
            "v": _init_linear(next(ks), d, d),
            "out": _init_linear(next(ks), d, d),
        }
        if cfg.position_embeddings_type == "relative":
            attn["pos"] = _init_linear(next(ks), d, d, bias=False)
            attn["bias_u"] = jnp.zeros((nh, hd), jnp.float32)
            attn["bias_v"] = jnp.zeros((nh, hd), jnp.float32)
        return {
            "ffn1": init_ffn(next(ks)),
            "attn": attn,
            "conv": {
                "norm": _init_norm(d),
                "pw1": _init_linear(next(ks), d, 2 * d, bias=False),
                "depthwise": {
                    "kernel": jax.random.normal(
                        next(ks), (cfg.conv_depthwise_kernel_size, 1, d), jnp.float32
                    )
                    * math.sqrt(1.0 / cfg.conv_depthwise_kernel_size)
                },
                "bn": {
                    "scale": jnp.ones((d,), jnp.float32),
                    "bias": jnp.zeros((d,), jnp.float32),
                    "mean": jnp.zeros((d,), jnp.float32),
                    "var": jnp.ones((d,), jnp.float32),
                },
                "pw2": _init_linear(next(ks), d, d, bias=False),
            },
            "ffn2": init_ffn(next(ks)),
            "final_norm": _init_norm(d),
        }

    layers = [init_layer(next(keys)) for _ in range(cfg.num_hidden_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    return {
        "feature_encoder": base["feature_encoder"],
        "feature_projection": base["feature_projection"],
        "encoder": {"layers": stacked, "layer_norm": _init_norm(d)},
        "lm_head": base["lm_head"],
    }


# ------------------------------------------------------- position embeddings

def _apply_rotary(h: jnp.ndarray, nh: int, hd: int, base: float) -> jnp.ndarray:
    """Rotary embedding on pre-projection hidden states [B, T, D] (the HF
    Wav2Vec2-Conformer formulation rotates the shared q/k input)."""
    b, t, d = h.shape
    inv = 1.0 / (base ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    freqs = jnp.arange(t, dtype=jnp.float32)[:, None] * inv[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [T, hd]
    cos = jnp.cos(emb)[None, :, None, :]
    sin = jnp.sin(emb)[None, :, None, :]
    hs = h.reshape(b, t, nh, hd)
    h1, h2 = hs[..., : hd // 2], hs[..., hd // 2 :]
    rot = jnp.concatenate([-h2, h1], axis=-1)
    return (hs * cos + rot * sin).reshape(b, t, d)


# ------------------------------------------------------------------ forward

def _ffn(p: Params, x, act, eps):
    h = _linear(p["intermediate"], _layer_norm(p["norm"], x, eps))
    return _linear(p["output"], act(h))


def _attention(layer: Params, cfg: Wav2Vec2ConformerConfig, x, pe, bias):
    p = layer
    b, t, d = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    eps = cfg.layer_norm_eps
    scale = hd**-0.5

    xn = _layer_norm(p["norm"], x, eps)
    qk_in = xn
    if cfg.position_embeddings_type == "rotary":
        qk_in = _apply_rotary(xn, nh, hd, float(cfg.rotary_embedding_base))

    def proj(pp, v):
        return _linear(pp, v).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)

    q = proj(p["q"], qk_in)  # [B, H, T, hd]
    k = proj(p["k"], qk_in)
    v = proj(p["v"], xn)

    attn_bias = bias
    q_attn = q
    if cfg.position_embeddings_type == "relative":
        # content-position scores: (q + bias_v) @ proj(pe)^T, then rel-shift.
        # Pre-scaled so it adds to the kernel's already-scaled qk scores —
        # (ac + bd)/sqrt(hd) overall, the Transformer-XL decomposition.
        p_proj = _linear(p["pos"], pe).reshape(-1, nh, hd)  # [2T-1, H, hd]
        q_v = q + p["bias_v"][None, :, None, :]
        scores_bd = jnp.einsum("bhtd,rhd->bhtr", q_v, p_proj)
        rel = rel_shift(scores_bd) * scale  # [B, H, T, T]
        attn_bias = rel if bias is None else rel + bias
        q_attn = q + p["bias_u"][None, :, None, :]

    o = multi_head_attention(q_attn, k, v, attn_bias, impl=cfg.attention_impl)
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return _linear(p["out"], o)


def _conv_module(p: Params, cfg: Wav2Vec2ConformerConfig, x, rules: Rules):
    # NOTE: no pad re-masking here — HF's conv module lets padded positions
    # (which evolve through the residual stream) leak into boundary frames
    # via the depthwise conv; parity with Wav2Vec2ConformerForCTC requires
    # reproducing that (tests/test_w2v2_conformer_parity.py padded-batch
    # test). The NeMo-style conformer (models/conformer.py) masks, as NeMo
    # does.
    eps = cfg.layer_norm_eps
    h = _layer_norm(p["norm"], x, eps)
    h = _linear(p["pw1"], h)       # [B, T, 2d], no bias
    h = rules.glu(h, -1)           # [B, T, d]

    ksz = cfg.conv_depthwise_kernel_size
    pad = (ksz - 1) // 2
    h = lax.conv_general_dilated(
        h,
        p["depthwise"]["kernel"],
        window_strides=(1,),
        padding=[(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=h.shape[-1],
    )

    bn = p["bn"]
    h = (h - bn["mean"]) * lax.rsqrt(bn["var"] + 1e-5) * bn["scale"] + bn["bias"]
    h = rules.silu(h)
    return _linear(p["pw2"], h)


def _conformer_block(layer, cfg: Wav2Vec2ConformerConfig, x, pe, bias,
                     rules: Rules, gelu):
    eps = cfg.layer_norm_eps
    act = rules.silu if cfg.hidden_act in ("swish", "silu") else gelu
    x = x + 0.5 * _ffn(layer["ffn1"], x, act, eps)
    x = x + _attention(layer["attn"], cfg, x, pe, bias)
    x = x + _conv_module(layer["conv"], cfg, x, rules)
    x = x + 0.5 * _ffn(layer["ffn2"], x, act, eps)
    return _layer_norm(layer["final_norm"], x, eps)


def w2v2_conformer_logits(
    params: Params,
    config: Wav2Vec2ConformerConfig,
    input_values: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    remat: bool = False,
    rules: Rules = PLAIN_RULES,
    gelu=_gelu,
) -> jnp.ndarray:
    """Normalized waveform [B, N] -> CTC logits [B, T_frames, vocab].

    ``rules``/``gelu`` plug the DeepSHAP rescale ops in for dual-mode
    forwards (pass ``conformer.deepshap_rules()`` and
    ``deepshap.gelu_rescale`` with the batch axis as the dual pair).
    ``config.dtype="bfloat16"`` runs params+activations in bf16 with f32
    norm statistics; logits always return float32.
    """
    cfg = config
    compute_dtype = jnp.dtype(cfg.dtype)
    if compute_dtype != jnp.float32:
        params = cast_params_for_compute(params, compute_dtype)
        input_values = input_values.astype(compute_dtype)
    with jax.default_matmul_precision(cfg.matmul_precision):
        feats = feature_encoder(params, cfg, input_values, gelu)
        fp = params["feature_projection"]
        h = _linear(
            fp["projection"], _layer_norm(fp["layer_norm"], feats, cfg.layer_norm_eps)
        )

        bias = None
        frame_mask = None
        if lengths is not None:
            from asr_shap.models.wav2vec2 import feature_lengths

            t = h.shape[1]
            fl = feature_lengths(cfg, lengths)
            frame_mask = (jnp.arange(t)[None, :] < fl[:, None]).astype(h.dtype)
            h = h * frame_mask[..., None]
            bias = jnp.where(frame_mask[:, None, None, :], 0.0, -1e9).astype(h.dtype)

        pe = None
        if cfg.position_embeddings_type == "relative":
            pe = rel_pos_embedding(h.shape[1], cfg.hidden_size).astype(h.dtype)

        def body(carry, layer):
            out = _conformer_block(layer, cfg, carry, pe, bias, rules, gelu)
            return out, None

        if remat:
            body = jax.checkpoint(body)
        h, _ = lax.scan(body, h, params["encoder"]["layers"])

        h = _layer_norm(params["encoder"]["layer_norm"], h, cfg.layer_norm_eps)
        return _linear(params["lm_head"], h).astype(jnp.float32)
