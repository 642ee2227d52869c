"""KernelSHAP for audio — model-agnostic Shapley values, TPU-native.

Completes the shap-library explainer family the reference delegates to
(SURVEY.md D4: the reference uses shap.GradientExplainer,
shap.DeepExplainer and shap.kmeans; shap's third core explainer,
KernelExplainer, is the model-agnostic one). Like the in-repo LIME
(explain/lime.py, same segment/masking conventions so the two are directly
comparable), the coalition axis is a vmapped batch inside one jitted
computation and the weighted solve runs on device.

Formulation (Lundberg & Lee 2017, the Shapley-kernel weighted regression):
the waveform is divided into S equal segments; coalitions z in {0,1}^S
produce masked inputs x_z = b + upsample(z) * (x - b); the Shapley kernel
weights pi(z) = (S-1) / (C(S,|z|) * |z| * (S-|z|)) make the weighted
least-squares solution of  y(z) ~ phi_0 + sum_i phi_i z_i  equal the exact
Shapley values of the segment coalition game. The two constraints
(phi_0 = f(b), sum_i phi_i = f(x) - f(b)) are imposed by substitution, so
efficiency holds exactly by construction.

Two regimes:
  * ``enumerate_all=True`` (S <= ~16): all 2^S - 2 proper coalitions with
    analytic kernel weights — EXACT Shapley values of the segment game for
    any f (tested against brute-force enumeration).
  * sampled (default): coalition sizes are drawn proportional to the
    size-marginal of the kernel, p(s) ∝ (S-1)/(s(S-s)), members uniform
    within a size, and each draw is paired with its complement (shap's
    paired sampling, which halves variance and symmetrizes the design);
    because coalitions are drawn ∝ their kernel weight, the regression is
    then UNWEIGHTED (importance sampling absorbs pi).

Returns the same [N, T_out] layout as the other explainers (per-segment
coefficients broadcast to samples, LIME convention).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["KernelShapExplanation", "kernel_shap_attributions"]


class KernelShapExplanation(NamedTuple):
    values: jnp.ndarray          # [N, T_out] per-sample attribution
    segment_values: jnp.ndarray  # [S, T_out] per-segment Shapley values
    base_value: jnp.ndarray      # [T_out] f(baseline) (phi_0)
    model_output: jnp.ndarray    # [T_out] f(x)


def _all_coalitions(num_segments: int) -> tuple[np.ndarray, np.ndarray]:
    """All proper coalitions (sizes 1..S-1) and their Shapley-kernel
    weights. Host-side (static shapes); 2^S - 2 rows."""
    s = num_segments
    codes = np.arange(1, 2**s - 1, dtype=np.uint64)
    masks = ((codes[:, None] >> np.arange(s, dtype=np.uint64)) & 1).astype(
        np.float32
    )
    sizes = masks.sum(axis=1).astype(np.int64)
    # pi = (S-1) / (C(S,|z|) |z| (S-|z|))
    comb = np.array([math.comb(s, int(k)) for k in range(s + 1)], np.float64)
    w = (s - 1.0) / (comb[sizes] * sizes * (s - sizes))
    return masks, w.astype(np.float32)


def _sample_coalitions(
    key: jax.Array, num_segments: int, num_samples: int
) -> jnp.ndarray:
    """Paired coalition sampling ∝ the Shapley kernel: sizes from
    p(s) ∝ 1/(s(S-s)), members uniform within size, each row paired with
    its complement."""
    s = num_segments
    half = num_samples // 2
    k_size, k_mem = jax.random.split(key)
    sizes_support = jnp.arange(1, s, dtype=jnp.float32)        # 1..S-1
    logits = -jnp.log(sizes_support * (s - sizes_support))
    sizes = 1 + jax.random.categorical(k_size, logits, shape=(half,))
    u = jax.random.uniform(k_mem, (half, s))
    ranks = jnp.argsort(jnp.argsort(u, axis=1), axis=1)        # 0..S-1 perm
    masks = (ranks < sizes[:, None]).astype(jnp.float32)
    paired = jnp.concatenate([masks, 1.0 - masks], axis=0)
    if paired.shape[0] < num_samples:  # odd num_samples: repeat first row
        paired = jnp.concatenate([paired, paired[:1]], axis=0)
    return paired


def kernel_shap_attributions(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    key: jax.Array,
    num_segments: int = 32,
    num_samples: int = 512,
    baseline: Optional[jnp.ndarray] = None,
    batch: int = 16,
    ridge_alpha: float = 1e-6,
    enumerate_all: bool = False,
) -> KernelShapExplanation:
    """Explain f: [N] -> [T_out] at x with segment-level KernelSHAP."""
    n = x.shape[0]
    s = num_segments
    if baseline is None:
        baseline = jnp.zeros_like(x)
    seg_len = -(-n // s)

    def upsample(z):  # [S] -> [N]
        return jnp.repeat(z, seg_len)[:n]

    if enumerate_all:
        if s > 16:
            raise ValueError(
                f"enumerate_all builds 2^{s}-2 coalitions; use sampled mode "
                "for num_segments > 16"
            )
        masks_np, w_np = _all_coalitions(s)
        masks = jnp.asarray(masks_np)
        w = jnp.asarray(w_np)
    else:
        masks = _sample_coalitions(key, s, num_samples)
        w = jnp.ones((masks.shape[0],), jnp.float32)  # kernel absorbed by IS

    def eval_masked(z):
        xz = baseline + upsample(z) * (x - baseline)
        return f(xz)

    fx = f(x)                                          # [T_out]
    fb = f(baseline)
    delta = fx - fb

    m = masks.shape[0]
    n_chunks = -(-m // batch)
    total = n_chunks * batch
    masks_p = jnp.pad(masks, ((0, total - m), (0, 0)))
    ys = lax.map(jax.vmap(eval_masked), masks_p.reshape(n_chunks, batch, -1))
    ys = ys.reshape(total, -1)[:m]                     # [M, T_out]

    # Impose phi_0 = f(b) and sum_i phi_i = delta by substitution
    # (phi_S = delta - sum_{i<S} phi_i):
    #   y - f(b) - z_S * delta  ~  sum_{i<S} phi_i (z_i - z_S)
    z_last = masks[:, -1:]                             # [M, 1]
    feats = masks[:, :-1] - z_last                     # [M, S-1]
    targ = ys - fb[None, :] - z_last * delta[None, :]  # [M, T_out]
    fw = feats * w[:, None]
    a = feats.T @ fw + ridge_alpha * jnp.eye(s - 1, dtype=feats.dtype)
    b_mat = fw.T @ targ                                # [S-1, T_out]
    phi_head = jnp.linalg.solve(a, b_mat)              # [S-1, T_out]
    phi_last = delta[None, :] - phi_head.sum(axis=0, keepdims=True)
    seg_vals = jnp.concatenate([phi_head, phi_last], axis=0)  # [S, T_out]

    per_sample = jnp.repeat(seg_vals, seg_len, axis=0)[:n]
    return KernelShapExplanation(
        values=per_sample,
        segment_values=seg_vals,
        base_value=fb,
        model_output=fx,
    )
