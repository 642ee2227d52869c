"""Conformer CTC encoder on log-mel features — pure-JAX, TPU-first.

Capability targets (SURVEY.md D3/D10, R9/R13):
  * torchaudio.models.Conformer as used by the mel-domain SHAP study
    (test_shap_audio.py:36-65: input_dim=80, 4 layers, GLU conv module,
    GroupNorm option, depthwise kernel 31) with a linear CTC head;
  * NeMo-style conformers (conformer_visualization.py:20-22) via the
    optional conv subsampling front-end;
  * the Wav2Vec2-Conformer study's single-token-logit explanation mode
    (w2v2conformer.py:26-43) via models/heads.py.

Design notes:
  * the activation set is *pluggable* (``Rules``): the same forward runs with
    plain ops or with the DeepSHAP rescale custom-VJPs
    (explain/deepshap.py) on dual arrays — hooks become types, replacing the
    reference's monkey-patching of shap internals (custom_shap_handlers.py).
  * layers are scan-stacked like wav2vec2.py; attention dispatches to the
    Pallas flash kernel under ``attention_impl="pallas"``.
  * BatchNorm runs in inference mode (affine with stored running stats) —
    the GroupNorm variant is the one the reference's study trains.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from asr_shap.core.config import ConformerConfig
from asr_shap.ops.attention import multi_head_attention, rel_pos_embedding, rel_shift

Params = Dict[str, Any]


class Rules(NamedTuple):
    """Pluggable nonlinearities. Plain ops for inference/training; rescale
    custom-VJP ops (explain/deepshap.py) for DeepSHAP dual-mode forwards."""

    silu: Callable
    glu: Callable  # (x, axis) -> gated half


def _plain_glu(x, axis=-1):
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


PLAIN_RULES = Rules(silu=jax.nn.silu, glu=_plain_glu)


def deepshap_rules() -> Rules:
    from asr_shap.explain.deepshap import glu_rescale, silu_rescale

    return Rules(silu=silu_rescale, glu=glu_rescale)


# --------------------------------------------------------------------- init

def _init_linear(key, d_in, d_out) -> Params:
    bound = 1.0 / math.sqrt(d_in)
    return {
        "kernel": jax.random.uniform(key, (d_in, d_out), jnp.float32, -bound, bound),
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def _init_norm(dim) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def init_conformer_params(key: jax.Array, cfg: ConformerConfig) -> Params:
    keys = iter(jax.random.split(key, 16 + 8 * cfg.num_layers))
    d = cfg.hidden_size
    ffn = d * cfg.ffn_expansion

    def init_layer(k):
        ks = iter(jax.random.split(k, 12))
        layer = {
            "ffn1": {
                "norm": _init_norm(d),
                "in": _init_linear(next(ks), d, ffn),
                "out": _init_linear(next(ks), ffn, d),
            },
            "attn": {
                "norm": _init_norm(d),
                "q": _init_linear(next(ks), d, d),
                "k": _init_linear(next(ks), d, d),
                "v": _init_linear(next(ks), d, d),
                "out": _init_linear(next(ks), d, d),
            },
            "conv": {
                "norm": _init_norm(d),
                "pointwise1": _init_linear(next(ks), d, 2 * d),
                "depthwise": {
                    "kernel": jax.random.normal(
                        next(ks), (cfg.conv_kernel_size, 1, d), jnp.float32
                    ) * math.sqrt(1.0 / cfg.conv_kernel_size),
                    "bias": jnp.zeros((d,), jnp.float32),
                },
                "bn": {
                    "scale": jnp.ones((d,), jnp.float32),
                    "bias": jnp.zeros((d,), jnp.float32),
                    "mean": jnp.zeros((d,), jnp.float32),
                    "var": jnp.ones((d,), jnp.float32),
                },
                "pointwise2": _init_linear(next(ks), d, d),
            },
            "ffn2": {
                "norm": _init_norm(d),
                "in": _init_linear(next(ks), d, ffn),
                "out": _init_linear(next(ks), ffn, d),
            },
            "final_norm": _init_norm(d),
        }
        return layer

    layers = []
    for _ in range(cfg.num_layers):
        layer = init_layer(next(keys))
        if cfg.pos_encoding == "relative":
            kp = next(keys)
            layer["attn"]["pos"] = {
                "kernel": jax.random.uniform(
                    kp, (d, d), jnp.float32, -1.0 / math.sqrt(d), 1.0 / math.sqrt(d)
                )
            }
            layer["attn"]["bias_u"] = jnp.zeros((cfg.num_attention_heads, cfg.head_dim))
            layer["attn"]["bias_v"] = jnp.zeros((cfg.num_attention_heads, cfg.head_dim))
        layers.append(layer)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    params: Params = {"layers": stacked, "head": _init_linear(next(keys), d, cfg.vocab_size)}
    if cfg.subsampling == "striding":
        params["subsampling"] = init_subsampling_params(next(keys), cfg)
    elif cfg.input_dim != cfg.hidden_size:
        params["input_proj"] = _init_linear(next(keys), cfg.input_dim, d)
    return params


def init_subsampling_params(key: jax.Array, cfg: ConformerConfig) -> Params:
    """Striding conv-subsampling front-end (NeMo-style, SURVEY.md D10):
    ``subsampling_layers`` stacked 2D convs (kernel 3, stride 2, pad 1, ReLU)
    over (time, mel) followed by a linear onto hidden_size."""
    ch = cfg.subsampling_conv_channels or cfg.hidden_size
    n_layers = cfg.subsampling_layers
    keys = jax.random.split(key, n_layers + 1)
    convs = []
    c_in = 1
    for i in range(n_layers):
        fan_in = 9 * c_in
        convs.append(
            {
                # HWIO layout for lax.conv over (time, freq)
                "kernel": jax.random.normal(keys[i], (3, 3, c_in, ch), jnp.float32)
                * math.sqrt(2.0 / fan_in),
                "bias": jnp.zeros((ch,), jnp.float32),
            }
        )
        c_in = ch
    f_out = cfg.input_dim
    for _ in range(n_layers):
        f_out = (f_out + 2 - 3) // 2 + 1
    return {
        "convs": convs,
        "out": _init_linear(keys[-1], ch * f_out, cfg.hidden_size),
    }


# ------------------------------------------------------------------ forward

def _ln(p, x, eps):
    # f32 statistics regardless of compute dtype (mixed-precision stability)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def _lin(p, x):
    return jnp.einsum("...i,io->...o", x, p["kernel"]) + p["bias"]


def _ffn(p, x, rules: Rules, eps):
    h = _lin(p["in"], _ln(p["norm"], x, eps))
    return _lin(p["out"], rules.silu(h))


def _attention(p, cfg: ConformerConfig, x, bias, eps, pe=None):
    *lead, t, d = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    xn = _ln(p["norm"], x, eps)

    def proj(pp, v):
        return _lin(pp, v).reshape(*lead, t, nh, hd)

    q = jnp.moveaxis(proj(p["q"], xn), -2, -3)  # [..., H, T, D]
    k = jnp.moveaxis(proj(p["k"], xn), -2, -3)
    v = jnp.moveaxis(proj(p["v"], xn), -2, -3)
    if len(lead) == 0:
        q, k, v = q[None], k[None], v[None]

    if pe is not None:
        # NeMo-style Transformer-XL rel-pos scores feeding the attention bias
        # (same decomposition as models/w2v2_conformer.py).
        p_proj = jnp.einsum("ri,io->ro", pe, p["pos"]["kernel"]).reshape(-1, nh, hd)
        q_v = q + p["bias_v"][None, :, None, :]
        rel = rel_shift(jnp.einsum("bhtd,rhd->bhtr", q_v, p_proj)) * hd**-0.5
        bias = rel if bias is None else rel + bias
        q = q + p["bias_u"][None, :, None, :]

    o = multi_head_attention(q, k, v, bias, impl=cfg.attention_impl)
    if len(lead) == 0:
        o = o[0]
    o = jnp.moveaxis(o, -3, -2).reshape(*lead, t, d)
    return _lin(p["out"], o)


def conv_subsampling(p: Params, cfg: ConformerConfig, x: jnp.ndarray,
                     relu=jax.nn.relu) -> jnp.ndarray:
    """Mel features [..., T, F] -> subsampled hidden [..., T', hidden_size]
    via stacked stride-2 2D convs + linear (NeMo "striding" front-end)."""
    lead = x.shape[:-2]
    t, f = x.shape[-2:]
    h = x.reshape(-1, t, f, 1)  # NHWC over (time, freq)
    for conv in p["convs"]:
        h = lax.conv_general_dilated(
            h, conv["kernel"],
            window_strides=(2, 2),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + conv["bias"]
        h = relu(h)
    b, t2, f2, c = h.shape
    # channel-major flatten (C, F) matches the NeMo weight layout the
    # converter maps onto (models/nemo_ctc.py)
    h = h.transpose(0, 1, 3, 2).reshape(b, t2, c * f2)
    h = _lin(p["out"], h)
    return h.reshape(*lead, t2, cfg.hidden_size)


def _conv_module(p, cfg: ConformerConfig, x, rules: Rules, eps, frame_mask=None):
    h = _ln(p["norm"], x, eps)
    h = _lin(p["pointwise1"], h)               # [..., T, 2d]
    h = rules.glu(h, -1)                        # [..., T, d]
    if frame_mask is not None:
        h = h * frame_mask[..., None]

    # depthwise conv over time, SAME padding
    lead = h.shape[:-2]
    t, d = h.shape[-2:]
    h2 = h.reshape(-1, t, d)
    pad = (cfg.conv_kernel_size - 1) // 2
    h2 = lax.conv_general_dilated(
        h2, p["depthwise"]["kernel"],
        window_strides=(1,),
        padding=[(pad, cfg.conv_kernel_size - 1 - pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=d,
    ) + p["depthwise"]["bias"]
    h = h2.reshape(*lead, t, d)

    bn = p["bn"]
    if cfg.conv_norm == "batch":
        # inference-mode batchnorm: affine with running stats (linear)
        h = (h - bn["mean"]) * lax.rsqrt(bn["var"] + eps) * bn["scale"] + bn["bias"]
    else:  # group norm over (T, C/G), torch semantics; f32 statistics
        g = cfg.num_conv_groups
        hg = h.astype(jnp.float32).reshape(*lead, t, g, d // g)
        mean = jnp.mean(hg, axis=(-3, -1), keepdims=True)
        var = jnp.var(hg, axis=(-3, -1), keepdims=True)
        hg = (hg - mean) * lax.rsqrt(var + eps)
        h = (hg.reshape(*lead, t, d) * bn["scale"] + bn["bias"]).astype(h.dtype)

    h = rules.silu(h)
    return _lin(p["pointwise2"], h)


def _conformer_layer(layer, cfg: ConformerConfig, x, rules: Rules, bias, frame_mask,
                     pe=None):
    eps = cfg.layer_norm_eps
    x = x + 0.5 * _ffn(layer["ffn1"], x, rules, eps)
    x = x + _attention(layer["attn"], cfg, x, bias, eps, pe)
    x = x + _conv_module(layer["conv"], cfg, x, rules, eps, frame_mask)
    x = x + 0.5 * _ffn(layer["ffn2"], x, rules, eps)
    return _ln(layer["final_norm"], x, eps)


def conformer_encode(
    params: Params,
    cfg: ConformerConfig,
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    rules: Rules = PLAIN_RULES,
    remat: bool = False,
) -> jnp.ndarray:
    """Features [..., T, input_dim] -> encoded [..., T', hidden]. The leading
    axes may be a batch, or the dual axis of a DeepSHAP forward. With a
    "striding" subsampler T' = cfg.subsampled_length(T); ``lengths`` are
    then given in subsampled frames. ``cfg.dtype="bfloat16"`` casts params
    and activations to bf16 (f32 norm statistics)."""
    from asr_shap.models.wav2vec2 import cast_params_for_compute

    compute_dtype = jnp.dtype(cfg.dtype)
    if compute_dtype != jnp.float32:
        params = cast_params_for_compute(params, compute_dtype)
        x = x.astype(compute_dtype)
    with jax.default_matmul_precision("highest" if compute_dtype == jnp.float32
                                      else "default"):
        if "subsampling" in params:
            x = conv_subsampling(params["subsampling"], cfg, x)
        elif "input_proj" in params:
            x = _lin(params["input_proj"], x)
        if cfg.input_scale:
            x = x * math.sqrt(cfg.hidden_size)

        bias = None
        frame_mask = None
        if lengths is not None:
            t = x.shape[-2]
            frame_mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(x.dtype)
            bias = jnp.where(frame_mask[:, None, None, :], 0.0, -1e9).astype(x.dtype)
            x = x * frame_mask[..., None]

        pe = None
        if cfg.pos_encoding == "relative":
            pe = rel_pos_embedding(x.shape[-2], cfg.hidden_size).astype(x.dtype)

        def body(carry, layer):
            return _conformer_layer(layer, cfg, carry, rules, bias, frame_mask, pe), None

        if remat:
            body = jax.checkpoint(body)
        x, _ = lax.scan(body, x, params["layers"])
        return x


def conformer_logits(
    params: Params,
    cfg: ConformerConfig,
    features: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    rules: Rules = PLAIN_RULES,
    remat: bool = False,
) -> jnp.ndarray:
    """Log-mel features -> CTC logits [..., T, vocab]."""
    h = conformer_encode(params, cfg, features, lengths, rules, remat)
    with jax.default_matmul_precision("highest"):
        head = params["head"]
        if h.dtype != jnp.float32:
            head = jax.tree.map(lambda a: a.astype(h.dtype), head)
        return _lin(head, h).astype(jnp.float32)
