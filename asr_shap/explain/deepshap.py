"""DeepSHAP — DeepLIFT rescale-rule attributions as JAX custom VJPs.

The reference enables ``shap.DeepExplainer`` on Conformer-style nets by
monkey-patching the shap library's torch hook registry with handlers for
LayerNorm/SiLU/GroupNorm/GLU (custom_shap_handlers.py:8-177; hook mechanism
documented by silu_dict.py:7-9). Its GLU rule is visibly unfinished — dead
code after an early return and an ad-hoc 5e-6 scale
(custom_shap_handlers.py:78-80).

Here the hooks become *types*: a forward is written against dual arrays with
a leading axis of size 2 — ``d[0]`` the actual activation, ``d[1]`` the
reference (background) activation. Linear ops apply to both halves
unchanged; each nonlinearity is a ``custom_vjp`` whose backward substitutes
the DeepLIFT multiplier for the local gradient:

  * rescale rule (SiLU/GELU/sigmoid/tanh/ReLU — "nonlinear_1d"):
      m = (f(x) - f(r)) / (x - r)   when |x - r| > eps, else f'(x)
  * linear rule (LayerNorm/GroupNorm — "linear_1d"): plain gradient, which
    the dual forward provides for free (no custom op needed).
  * GLU split-gate rule: the exact 2-player Shapley decomposition of the
    product a*sigmoid(b) — replacing the reference's unfinished rule:
      phi_a = (a - a_r) * (sig(b) + sig(b_r)) / 2
      phi_b = (a + a_r) / 2 * (sig(b) - sig(b_r))
    expressed as multipliers m_a = (sig(b)+sig(b_r))/2 and
    m_b = (a+a_r)/2 * rescale(sigmoid) (validated against the analytic
    oracle pattern of visualize_glu_shap.py:23-49 in tests).

``deep_shap_values`` then runs one Jacobian per background row (the same
batched-VJP machinery as expected-gradients) and averages — the
DeepExplainer contract (test_shap_asr.py:67, w2v2conformer.py:139-142).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from asr_shap.explain.expected_gradients import _jacobian

_EPS = 1e-6


def dual(x: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Stack (actual, reference) into a dual array [2, ...]."""
    return jnp.stack([x, ref])


def actual(d: jnp.ndarray) -> jnp.ndarray:
    return d[0]


def _make_rescale(f: Callable) -> Callable:
    """Elementwise nonlinearity on dual arrays with the rescale-rule VJP."""

    @jax.custom_vjp
    def op(d):
        return jnp.stack([f(d[0]), f(d[1])])

    def fwd(d):
        return op(d), d

    def bwd(d, g):
        x, r = d[0], d[1]
        delta = x - r
        grad_f = jax.grad(lambda v: jnp.sum(f(v)))(x)
        safe_delta = jnp.where(jnp.abs(delta) > _EPS, delta, 1.0)
        m = jnp.where(jnp.abs(delta) > _EPS, (f(x) - f(r)) / safe_delta, grad_f)
        # both halves receive the multiplier on their own cotangent; the
        # reference half's pullback mirrors with -m is irrelevant to phi and
        # kept zero for clarity.
        return (jnp.stack([g[0] * m, jnp.zeros_like(g[1])]),)

    op.defvjp(fwd, bwd)
    return op


silu_rescale = _make_rescale(jax.nn.silu)
gelu_rescale = _make_rescale(lambda x: jax.nn.gelu(x, approximate=False))
sigmoid_rescale = _make_rescale(jax.nn.sigmoid)
tanh_rescale = _make_rescale(jnp.tanh)
relu_rescale = _make_rescale(jax.nn.relu)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def glu_rescale(d: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    a, b = jnp.split(d, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def _glu_fwd(d, axis):
    return glu_rescale(d, axis), d


def _glu_bwd(axis, d, g):
    a_x, b_x = jnp.split(d[0], 2, axis=axis)
    a_r, b_r = jnp.split(d[1], 2, axis=axis)
    sig_x, sig_r = jax.nn.sigmoid(b_x), jax.nn.sigmoid(b_r)

    # exact 2-player Shapley split of Delta(a * sig(b))
    m_a = 0.5 * (sig_x + sig_r)
    delta_b = b_x - b_r
    dsig = jnp.where(
        jnp.abs(delta_b) > _EPS,
        (sig_x - sig_r) / jnp.where(jnp.abs(delta_b) > _EPS, delta_b, 1.0),
        sig_x * (1.0 - sig_x),
    )
    m_b = 0.5 * (a_x + a_r) * dsig

    gx = g[0]
    grad_actual = jnp.concatenate([gx * m_a, gx * m_b], axis=axis)
    zeros = jnp.zeros_like(grad_actual)
    return (jnp.stack([grad_actual, zeros]),)


glu_rescale.defvjp(_glu_fwd, _glu_bwd)


class DeepExplanation(NamedTuple):
    values: jnp.ndarray        # [N_input, T_out]
    base_values: jnp.ndarray   # [T_out]
    model_output: jnp.ndarray  # [T_out]


def deep_shap_values(
    f_dual: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    background: jnp.ndarray,
    output_chunk: int = 0,
) -> DeepExplanation:
    """DeepSHAP attributions of ``f_dual`` at x against each background row.

    f_dual: dual input [2, N] -> output [T_out] of the ACTUAL half (built
    from the rescale ops above). Deterministic — no sampling beyond the
    background set (DeepExplainer semantics).
    """

    # lax.scan over background rows, NOT vmap: vmapping the Jacobian
    # machinery multiplies both the compiled program and the backward batch
    # by B, which is what pushed full-model dual programs past the bench
    # host's compile helper above ~50k-sample clips (r3). The scanned body
    # stays single-row sized, and the phi mean accumulates in f32 on device
    # instead of materializing the [B, T, N] stack (~625 MB at reference
    # length with B=5).
    t_out = jax.eval_shape(
        lambda xx: f_dual(dual(xx, background[0])), x
    ).shape[0]

    def step(acc, ref):
        g = lambda xx: f_dual(dual(xx, ref))
        jac = _jacobian(g, x, output_chunk)          # [T, N] of multipliers
        phi_r = jac * (x - ref)[None, :]
        return acc + phi_r.astype(jnp.float32), None

    acc, _ = jax.lax.scan(
        step, jnp.zeros((t_out, x.shape[0]), jnp.float32), background
    )
    phi = (acc / background.shape[0]).T              # [N, T]

    fx = f_dual(dual(x, x))
    base = jnp.mean(jax.vmap(lambda r: f_dual(dual(r, r)))(background), axis=0)
    return DeepExplanation(values=phi, base_values=base, model_output=fx)


def wav2vec2_dual_fn(
    params,
    model_config,
    explainer_config,
    remat: Optional[bool] = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """DeepSHAP dual forward on the full Wav2Vec2 CTC model.

    Returns f_dual: dual waveform [2, N] -> explained outputs [T_out] of the
    ACTUAL half. The model's batch axis carries the (actual, reference) pair
    and its GELUs run the rescale rule; norm layers and attention keep their
    plain gradient — exactly the reference handler assignment (LayerNorm/
    GroupNorm -> linear_1d, activations -> nonlinear rescale,
    custom_shap_handlers.py:35-60). This is DeepExplainer-on-Wav2Vec2
    (test_shap_asr.py:66-67), which round 1 could not express.
    """
    from asr_shap.models.heads import aggregation_head
    from asr_shap.models.wav2vec2 import wav2vec2_logits

    ec = explainer_config
    use_remat = ec.remat if remat is None else remat

    def f_dual(d: jnp.ndarray) -> jnp.ndarray:
        logits = wav2vec2_logits(
            params, model_config, d, remat=use_remat, gelu=gelu_rescale
        )  # [2, T, V]
        out = aggregation_head(logits, ec.aggregation, ec.token_timestep, ec.token_id)
        return out[0]

    return f_dual


def w2v2_conformer_dual_fn(
    params,
    model_config,
    explainer_config,
    remat: Optional[bool] = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """DeepSHAP dual forward on the Wav2Vec2-Conformer: GELU rescale in the
    conv feature encoder plus SiLU/GLU rescale in the conformer blocks
    (the w2v2conformer.py DeepExplainer study, reference :139-142)."""
    from asr_shap.models.conformer import deepshap_rules
    from asr_shap.models.heads import aggregation_head
    from asr_shap.models.w2v2_conformer import w2v2_conformer_logits

    ec = explainer_config
    use_remat = ec.remat if remat is None else remat
    rules = deepshap_rules()

    def f_dual(d: jnp.ndarray) -> jnp.ndarray:
        logits = w2v2_conformer_logits(
            params, model_config, d, remat=use_remat, rules=rules,
            gelu=gelu_rescale,
        )
        out = aggregation_head(logits, ec.aggregation, ec.token_timestep, ec.token_id)
        return out[0]

    return f_dual


def deep_explain_wav2vec2(
    params,
    model_config,
    x: jnp.ndarray,
    background: jnp.ndarray,
    explainer_config,
) -> DeepExplanation:
    """One-call DeepSHAP attribution of a Wav2Vec2 model at waveform ``x``
    (already normalized) against each background row."""
    f_dual = wav2vec2_dual_fn(params, model_config, explainer_config)
    return deep_shap_values(
        f_dual, x, background, output_chunk=explainer_config.output_chunk
    )
