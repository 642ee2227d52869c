"""Multi-head attention dispatch: XLA reference path or Pallas flash kernel.

The explainer is gradient-hungry (every SHAP draw backpropagates to the raw
waveform, SURVEY.md section 7 "differentiable everything"), so both paths are
fully differentiable; the Pallas path carries a custom VJP (flash backward).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def rel_pos_embedding(t: int, d: int) -> jnp.ndarray:
    """Transformer-XL sinusoidal relative-position table [2T-1, d]: row i
    encodes relative position (T-1-i), positives (keys to the left) first.
    Shared by the Wav2Vec2-Conformer rel-pos attention (w2v2conformer.py
    study) and the NeMo-style conformer (conformer_visualization.py)."""
    pos = jnp.arange(t, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, d, 2, dtype=jnp.float32) * (-math.log(10_000.0) / d)
    )[None, :]
    pe_pos = jnp.zeros((t, d)).at[:, 0::2].set(jnp.sin(pos * div))
    pe_pos = pe_pos.at[:, 1::2].set(jnp.cos(pos * div))
    pe_neg = jnp.zeros((t, d)).at[:, 0::2].set(jnp.sin(-pos * div))
    pe_neg = pe_neg.at[:, 1::2].set(jnp.cos(-pos * div))
    return jnp.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, 2T-1] raw (query, rel-embedding) scores -> [B, H, T, T]
    aligned (query, key) scores, via the zero-pad/reshape shift trick."""
    b, h, t, r = x.shape
    x = jnp.concatenate([jnp.zeros((b, h, t, 1), x.dtype), x], axis=-1)
    x = x.reshape(b, h, r + 1, t)[:, :, 1:].reshape(b, h, t, r)
    return x[..., : r // 2 + 1]


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


# impl="auto" resolution. Round 3 dispatched to the flash kernel at
# T >= 1024 off a +4% pallas win at T=1,499; round 4's same-session 2x2
# (r4_flash_full rows, artifacts/bench_sweep_tpu.jsonl) did not reproduce
# it — full-explainer wall at 480k samples was xla+remat 166 s vs
# pallas+remat 247 s, and the r3 "795 s pallas compile" turned out to be
# remat x long-T, hitting BOTH impls equally (406 s xla vs 422 s pallas).
# Per artifacts/kernel_decision.md's own retirement rule (keep only if it
# beats XLA by >=10% somewhere reachable with a sane compile), "auto" now
# always resolves to XLA; the kernel stays available as an explicit
# impl="pallas" opt-in for the memory-bound regime (it keeps [rows, H, T, T]
# probabilities out of HBM when capacity, not time, binds).
AUTO_PALLAS_MIN_T = None  # retired (kept for import compatibility)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    impl: str = "xla",
) -> jnp.ndarray:
    """Scaled dot-product attention over [B, H, T, D] tensors.

    impl: "xla" (default/reference path), "pallas" (flash kernel; supports
    both [B, 1, 1, T] masks and differentiable [B, H, T, T] score biases),
    or "auto" (resolves to "xla" since round 4 — the r3 long-form pallas win
    did not reproduce under a same-session A/B; see AUTO_PALLAS_MIN_T note
    and artifacts/kernel_decision.md).

    Gradient contract for ``bias``: a [B, H, T, T] bias is differentiable on
    every path. A [B, 1, 1, T] bias is treated as a CONSTANT padding mask by
    the pallas kernel (its cotangent is zero), while the XLA path propagates
    real gradients. The only in-tree producer of that shape is the
    non-differentiated length mask; a future differentiable rank-1 bias must
    use the [B, H, T, T] form (broadcast it) or impl="xla".
    """
    if impl == "auto":
        impl = "xla"
    if impl == "pallas":
        if bias is not None and bias.ndim != 4:
            # the flash kernel's bias-cotangent unbroadcast assumes rank 4
            # ([B, 1, 1, T] masks or [B, H, T, T] scores); other broadcast-
            # able ranks get correct values AND grads from the XLA path
            return _xla_attention(q, k, v, bias)
        from asr_shap.kernels.flash_attention import flash_attention

        return flash_attention(q, k, v, bias)
    return _xla_attention(q, k, v, bias)
