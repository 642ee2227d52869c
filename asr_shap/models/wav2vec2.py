"""Wav2Vec2 CTC model — a pure-JAX, TPU-first implementation.

Capability target: ``transformers.Wav2Vec2ForCTC`` as used by the reference
(shap_calculation.py:219; logits contract ``model(x, attention_mask).logits
-> [B, T_frames, 32]``, SURVEY.md D1). This is NOT a port of the HF torch
module tree — it is a functional params-pytree design:

  * params are plain nested dicts of jnp arrays (shardable with jax.sharding,
    checkpointable with orbax, convertible from HF safetensors/state_dicts);
  * the 12 encoder layers are *stacked* along a leading axis and executed
    with ``lax.scan`` — one traced layer body, fast compiles, and
    ``jax.checkpoint`` per scan step gives the rematerialized backward the
    explainer needs (SURVEY.md section 7 "SHAP-matrix memory");
  * everything is differentiable end-to-end (the explainer backpropagates to
    the raw waveform);
  * attention dispatches to either an XLA einsum path or the Pallas flash
    kernel (asr_shap.kernels.flash_attention).

Numerical contract verified by tests/test_wav2vec2_parity.py: logits match a
randomly-initialized torch ``Wav2Vec2ForCTC`` after weight conversion.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from asr_shap.core.config import Wav2Vec2Config
from asr_shap.kernels import conv_dgrad
from asr_shap.ops.attention import multi_head_attention

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    # HF "gelu" is the exact erf formulation, not the tanh approximation.
    return jax.nn.gelu(x, approximate=False)


# GELU is the model's only pluggable nonlinearity: passing
# ``explain.deepshap.gelu_rescale`` here (with the batch axis carrying a
# (actual, reference) dual pair) turns the whole forward into a DeepSHAP
# dual-mode forward — the DeepExplainer-on-Wav2Vec2 capability
# (reference test_shap_asr.py:66-67). Norm layers keep their plain gradient,
# the DeepLIFT "linear_1d" treatment the reference's handlers use
# (custom_shap_handlers.py:35-42, 53-60).


def _layer_norm(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    # statistics in float32 regardless of compute dtype (bf16 mean/var is
    # the classic mixed-precision instability), output in input dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * lax.rsqrt(var + eps)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def _group_norm(p: Params, x: jnp.ndarray, num_groups: int, eps: float) -> jnp.ndarray:
    """x: [B, T, C]; normalize per group over (T, C//G) — torch GroupNorm
    semantics on a [B, C, T] tensor."""
    b, t, c = x.shape
    g = num_groups
    xg = x.astype(jnp.float32).reshape(b, t, g, c // g)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xg = (xg - mean) * lax.rsqrt(var + eps)
    return (xg.reshape(b, t, c) * p["scale"] + p["bias"]).astype(x.dtype)


def _linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.einsum("...i,io->...o", x, p["kernel"])
    if "bias" in p:
        y = y + p["bias"]
    return y


def _conv1d_gemm(
    x: jnp.ndarray, kernel: jnp.ndarray, stride: int
) -> jnp.ndarray:
    """Strided valid conv as stride-blocked GEMMs.

    MEASURED NEGATIVE RESULT (kept for the record + as the compile-friendly
    backward formulation): an interleaved A/B at the bench config
    (artifacts/bench_sweep_tpu.jsonl r3_conv_ab) put this formulation 25%
    behind ``lax.conv`` end-to-end (1,167 vs 1,457 passes/s) — XLA's native
    conv + dgrad is already well-tiled here. BUT the lax dgrad at >=2-draw
    cotangent batches crashes this host's compile helper, while this
    formulation's plain-matmul backward compiles — so it serves as the
    custom-VJP backward of ``impl="hybrid"``. Reshaping time into stride
    blocks turns the conv into m = ceil(K/stride) dense matmuls over
    [s*C_in, C_out]; identical math (same f32 accumulation),
    reassociation-level float noise only.

      xb[u] = x[s*u : s*u + s]              (a view: row-major reshape)
      y[t]  = sum_q xb[t+q] @ Wq,  Wq[r*C_in + c, o] = w[s*q + r, c, o]
              (zero-padded where s*q + r >= K)
    """
    b, t, cin = x.shape
    k, _, cout = kernel.shape
    s = stride
    t_out = (t - k) // s + 1
    m = -(-k // s)
    need = (t_out + m - 1) * s  # >= (t_out-1)*s + k, since m*s >= k
    if need > t:
        x = jnp.pad(x, ((0, 0), (0, need - t), (0, 0)))
    xb = x[:, :need].reshape(b, t_out + m - 1, s * cin)
    wq = jnp.pad(kernel, ((0, m * s - k), (0, 0), (0, 0))).reshape(
        m, s, cin, cout
    ).reshape(m, s * cin, cout)
    y = xb[:, 0:t_out] @ wq[0]
    for q in range(1, m):
        y = y + xb[:, q : q + t_out] @ wq[q]
    return y


def _conv1d_lax(
    x: jnp.ndarray, kernel: jnp.ndarray, stride: int, padding: int, groups: int
) -> jnp.ndarray:
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv1d_hybrid(x: jnp.ndarray, kernel: jnp.ndarray, stride: int):
    """lax.conv forward (fastest measured, r3_conv_ab) with the
    stride-blocked-GEMM formulation's backward (the lax dgrad at multi-draw
    cotangent batches crashes this host's compile helper; the GEMM
    transpose is plain matmuls and compiles everywhere)."""
    return _conv1d_lax(x, kernel, stride, 0, 1)


def _conv1d_hybrid_fwd(x, kernel, stride):
    return _conv1d_hybrid(x, kernel, stride), (x, kernel)


def _conv1d_hybrid_bwd(stride, res, ct):
    x, kernel = res
    _, vjp_fn = jax.vjp(lambda xx, kk: _conv1d_gemm(xx, kk, stride), x, kernel)
    return vjp_fn(ct)


_conv1d_hybrid.defvjp(_conv1d_hybrid_fwd, _conv1d_hybrid_bwd)


def _conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
    bias: Optional[jnp.ndarray] = None,
    impl: str = "lax",
) -> jnp.ndarray:
    """x: [B, T, C_in], kernel: [K, C_in // groups, C_out] -> [B, T', C_out].

    ``impl`` selects the formulation for strided/ungrouped/unpadded convs
    (the feature-encoder shape): "lax" (default — fastest measured,
    r3_conv_ab), "gemm" (stride-blocked GEMMs both ways), "hybrid"
    (lax forward + GEMM backward; compiles at multi-draw cotangent batches
    where the lax dgrad crashes the compile helper), "pallas" (lax forward +
    fused polyphase Pallas dgrad, kernels/conv_dgrad.py — lane-degenerate
    layers such as the C_in=1 first layer fall back to lax). Grouped or
    padded convs (the positional conv embedding) always use ``lax.conv``.
    """
    eligible = groups == 1 and padding == 0 and stride > 1
    if impl == "gemm" and eligible:
        y = _conv1d_gemm(x, kernel, stride)
    elif impl == "hybrid" and eligible:
        y = _conv1d_hybrid(x, kernel, stride)
    elif (impl == "pallas" and eligible
          and conv_dgrad.eligible(kernel.shape[1], kernel.shape[2],
                                  stride, groups, padding)):
        y = conv_dgrad.conv1d_pallas(x, kernel, stride)
    else:
        y = _conv1d_lax(x, kernel, stride, padding, groups)
    if bias is not None:
        y = y + bias
    return y


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_linear(key, d_in, d_out, bias=True) -> Params:
    k1, _ = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    p = {"kernel": jax.random.uniform(k1, (d_in, d_out), jnp.float32, -bound, bound)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _init_norm(dim) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def init_wav2vec2_params(key: jax.Array, config: Wav2Vec2Config) -> Params:
    """Random initialization (HF-equivalent fan-in uniform for linears,
    he-normal for convs) — used for tests and from-scratch training; real runs
    convert a pretrained HF checkpoint (models/convert_hf.py)."""
    keys = iter(jax.random.split(key, 64))
    cfg = config

    conv_layers = []
    in_ch = 1
    for i, (dim, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        layer: Params = {
            "conv": {
                "kernel": jax.random.normal(next(keys), (k, in_ch, dim), jnp.float32)
                * math.sqrt(2.0 / (k * in_ch))
            }
        }
        if cfg.conv_bias:
            layer["conv"]["bias"] = jnp.zeros((dim,), jnp.float32)
        if (cfg.feat_extract_norm == "group" and i == 0) or cfg.feat_extract_norm == "layer":
            layer["norm"] = _init_norm(dim)
        conv_layers.append(layer)
        in_ch = dim

    h = cfg.hidden_size
    pos_k = cfg.num_conv_pos_embeddings
    pos_groups = cfg.num_conv_pos_embedding_groups

    def init_layer(key) -> Params:
        ks = iter(jax.random.split(key, 8))
        return {
            "attention": {
                "q": _init_linear(next(ks), h, h),
                "k": _init_linear(next(ks), h, h),
                "v": _init_linear(next(ks), h, h),
                "out": _init_linear(next(ks), h, h),
            },
            "layer_norm": _init_norm(h),
            "ffn": {
                "intermediate": _init_linear(next(ks), h, cfg.intermediate_size),
                "output": _init_linear(next(ks), cfg.intermediate_size, h),
            },
            "final_layer_norm": _init_norm(h),
        }

    layer_keys = jax.random.split(next(keys), cfg.num_hidden_layers)
    layers = [init_layer(k) for k in layer_keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    params: Params = {
        "feature_encoder": conv_layers,
        "feature_projection": {
            "layer_norm": _init_norm(cfg.feat_proj_dim),
            "projection": _init_linear(next(keys), cfg.feat_proj_dim, h),
        },
        "encoder": {
            "pos_conv": {
                "kernel": jax.random.normal(
                    next(keys), (pos_k, h // pos_groups, h), jnp.float32
                )
                * math.sqrt(4.0 / (pos_k * h)),
                "bias": jnp.zeros((h,), jnp.float32),
            },
            "layer_norm": _init_norm(h),
            "layers": stacked,
        },
        "lm_head": _init_linear(next(keys), h, cfg.vocab_size),
    }
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def cast_params_for_compute(params: Params, compute_dtype) -> Params:
    """Cast floating param leaves to the compute dtype (shared by every
    model's bf16 speed path); float32 is a no-op."""
    if compute_dtype == jnp.float32:
        return params
    return jax.tree.map(
        lambda a: a.astype(compute_dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        params,
    )


def feature_lengths(config: Wav2Vec2Config, lengths: jnp.ndarray) -> jnp.ndarray:
    """Audio-sample lengths -> conv feature-encoder frame lengths."""
    out = lengths
    for k, s in zip(config.conv_kernel, config.conv_stride):
        out = (out - k) // s + 1
    return out


def feature_encoder(
    params: Params, config: Wav2Vec2Config, x: jnp.ndarray, gelu=_gelu
) -> jnp.ndarray:
    """Raw waveform [B, N] -> features [B, T, 512]. x320 total stride."""
    h = x[..., None]  # [B, N, 1]
    if h.dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
        h = h.astype(jnp.float32)
    for i, layer in enumerate(params["feature_encoder"]):
        h = _conv1d(
            h,
            layer["conv"]["kernel"],
            stride=config.conv_stride[i],
            bias=layer["conv"].get("bias"),
            impl=config.conv_impl,
        )
        if config.feat_extract_norm == "group" and i == 0:
            h = _group_norm(layer["norm"], h, num_groups=config.conv_dim[0],
                            eps=config.layer_norm_eps)
        elif config.feat_extract_norm == "layer":
            h = _layer_norm(layer["norm"], h, eps=config.layer_norm_eps)
        h = gelu(h)
    return h


def _pos_conv_embedding(
    params: Params, config: Wav2Vec2Config, h: jnp.ndarray, gelu=_gelu
) -> jnp.ndarray:
    """Grouped conv positional embedding; even kernels drop the final frame
    (the 'same-pad' trim), then GELU."""
    p = params["encoder"]["pos_conv"]
    pad = config.num_conv_pos_embeddings // 2
    y = _conv1d(
        h,
        p["kernel"],
        stride=1,
        padding=pad,
        groups=config.num_conv_pos_embedding_groups,
        bias=p["bias"],
    )
    if config.num_conv_pos_embeddings % 2 == 0:
        y = y[:, :-1, :]
    return gelu(y)


def _encoder_layer(
    layer: Params,
    config: Wav2Vec2Config,
    h: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    gelu=_gelu,
) -> jnp.ndarray:
    """One transformer encoder layer. Post-LN ("base") or pre-LN
    ("do_stable_layer_norm", large variants)."""
    cfg = config
    b, t, d = h.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim

    def attend(x):
        q = _linear(layer["attention"]["q"], x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = _linear(layer["attention"]["k"], x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        v = _linear(layer["attention"]["v"], x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        o = multi_head_attention(q, k, v, bias, impl=cfg.attention_impl)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        return _linear(layer["attention"]["out"], o)

    def ffn(x):
        return _linear(
            layer["ffn"]["output"], gelu(_linear(layer["ffn"]["intermediate"], x))
        )

    if cfg.do_stable_layer_norm:
        h = h + attend(_layer_norm(layer["layer_norm"], h, cfg.layer_norm_eps))
        h = h + ffn(_layer_norm(layer["final_layer_norm"], h, cfg.layer_norm_eps))
    else:
        h = _layer_norm(layer["layer_norm"], h + attend(h), cfg.layer_norm_eps)
        h = _layer_norm(layer["final_layer_norm"], h + ffn(h), cfg.layer_norm_eps)
    return h


def encoder(
    params: Params,
    config: Wav2Vec2Config,
    h: jnp.ndarray,
    frame_mask: Optional[jnp.ndarray] = None,
    remat: bool = False,
    gelu=_gelu,
) -> jnp.ndarray:
    """Transformer encoder over features [B, T, H]."""
    cfg = config
    bias = None
    if frame_mask is not None:
        h = h * frame_mask[..., None]
        bias = jnp.where(frame_mask[:, None, None, :], 0.0, -1e9).astype(h.dtype)

    h = h + _pos_conv_embedding(params, cfg, h, gelu)
    if not cfg.do_stable_layer_norm:
        h = _layer_norm(params["encoder"]["layer_norm"], h, cfg.layer_norm_eps)

    def body(carry, layer):
        return _encoder_layer(layer, cfg, carry, bias, gelu), None

    if remat:
        # remat_policy "dots": save matmul outputs, recompute only the
        # elementwise ops — the explainer's forward runs at batch 1, so the
        # saved activations are tiny (~20 MB for base) while the backward
        # skips replaying the matmuls. "full" replays everything.
        policy = (
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            if cfg.remat_policy == "dots" else None
        )
        body = jax.checkpoint(body, policy=policy)
    h, _ = lax.scan(body, h, params["encoder"]["layers"])

    if cfg.do_stable_layer_norm:
        h = _layer_norm(params["encoder"]["layer_norm"], h, cfg.layer_norm_eps)
    return h


def wav2vec2_logits(
    params: Params,
    config: Wav2Vec2Config,
    input_values: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    remat: bool = False,
    gelu=_gelu,
) -> jnp.ndarray:
    """Normalized waveform [B, N] (see audio.normalize) -> CTC logits
    [B, T_frames, vocab] (always float32 out). ``lengths`` enables padded
    batching. ``config.dtype="bfloat16"`` runs activations AND params in
    bf16 (norm statistics stay f32; the explainer's phi accumulator is f32
    independently) — the full mixed-precision speed path."""
    cfg = config
    compute_dtype = jnp.dtype(cfg.dtype)
    if compute_dtype != jnp.float32:
        params = cast_params_for_compute(params, compute_dtype)
        input_values = input_values.astype(compute_dtype)
    with jax.default_matmul_precision(cfg.matmul_precision):
        feats = feature_encoder(params, cfg, input_values, gelu)  # [B, T, 512]
        fp = params["feature_projection"]
        h = _linear(
            fp["projection"], _layer_norm(fp["layer_norm"], feats, cfg.layer_norm_eps)
        )

        frame_mask = None
        if lengths is not None:
            t = h.shape[1]
            fl = feature_lengths(cfg, lengths)
            frame_mask = (jnp.arange(t)[None, :] < fl[:, None]).astype(h.dtype)

        h = encoder(params, cfg, h, frame_mask, remat=remat, gelu=gelu)
        return _linear(params["lm_head"], h).astype(jnp.float32)
