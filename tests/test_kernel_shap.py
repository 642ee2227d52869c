"""KernelSHAP explainer tests (explain/kernel_shap.py).

Oracle strategy mirrors the LIME linear-recovery test: for a LINEAR model
Shapley values are exact and analytic; for nonlinear models, exact-mode
KernelSHAP must reproduce brute-force Shapley enumeration of the segment
coalition game (the defining property of the Shapley-kernel regression,
Lundberg & Lee 2017). Reference capability anchor: the shap library the
reference delegates its explainers to (SURVEY.md D4)."""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from asr_shap.explain.kernel_shap import kernel_shap_attributions  # noqa: E402


def _brute_force_shapley(v, s):
    """Exact Shapley values of the coalition game v: {0,1}^S -> R^T."""
    phi = [np.zeros_like(np.asarray(v(np.zeros(s)))) for _ in range(s)]
    for i in range(s):
        for code in range(2**s):
            if (code >> i) & 1:
                continue
            z = np.array([(code >> j) & 1 for j in range(s)], np.float32)
            zi = z.copy()
            zi[i] = 1.0
            size = int(z.sum())
            w = (
                math.factorial(size)
                * math.factorial(s - size - 1)
                / math.factorial(s)
            )
            phi[i] = phi[i] + w * (np.asarray(v(zi)) - np.asarray(v(z)))
    return np.stack(phi, axis=0)  # [S, T]


def test_exact_mode_matches_brute_force_enumeration(rng):
    """enumerate_all=True must equal brute-force Shapley for a NONLINEAR
    model (products across segments), any baseline."""
    s, seg_len = 6, 4
    n = s * seg_len
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal(n), jnp.float32)
    a1 = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    a2 = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)

    def f(xx):  # nonlinear: product of two projections + quadratic
        return (xx @ a1) * (xx @ a2) + (xx**2) @ a1

    out = kernel_shap_attributions(
        f, x, jax.random.key(0), num_segments=s, baseline=b,
        enumerate_all=True,
    )

    def game(z):
        zz = jnp.repeat(jnp.asarray(z, jnp.float32), seg_len)[:n]
        return f(b + zz * (x - b))

    oracle = _brute_force_shapley(game, s)
    np.testing.assert_allclose(
        np.asarray(out.segment_values), oracle, atol=1e-3, rtol=1e-4
    )
    # efficiency holds exactly by construction
    np.testing.assert_allclose(
        np.asarray(out.segment_values.sum(0)),
        np.asarray(f(x) - f(b)), atol=1e-4, rtol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(out.base_value), np.asarray(f(b)),
                               atol=1e-6)


def test_linear_model_recovery_sampled(rng):
    """For linear f, phi_seg = sum_{j in seg} A[j] (x_j - b_j) exactly, and
    the sampled regression recovers it regardless of which coalitions were
    drawn (linear f lies in the surrogate class)."""
    s, seg_len = 8, 5
    n = s * seg_len
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    a = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)

    def f(xx):
        return xx @ a

    out = kernel_shap_attributions(
        f, x, jax.random.key(1), num_segments=s, num_samples=128,
    )
    contrib = (x[:, None] * a).reshape(s, seg_len, 4).sum(axis=1)
    np.testing.assert_allclose(np.asarray(out.segment_values), contrib,
                               atol=2e-3, rtol=1e-3)
    # per-sample layout matches the LIME broadcast convention
    assert out.values.shape == (n, 4)
    np.testing.assert_allclose(np.asarray(out.values[:seg_len]),
                               np.tile(np.asarray(out.segment_values[:1]),
                                       (seg_len, 1)), atol=1e-6)


def test_sampled_mode_converges_to_exact(rng):
    """Paired importance-sampled KernelSHAP converges to the exact values
    on a nonlinear game; efficiency holds exactly at any sample count."""
    s, seg_len = 6, 3
    n = s * seg_len
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    a1 = jnp.asarray(rng.standard_normal((n, 2)), jnp.float32)
    a2 = jnp.asarray(rng.standard_normal((n, 2)), jnp.float32)

    def f(xx):
        return jnp.tanh(xx @ a1) * (xx @ a2)

    exact = kernel_shap_attributions(
        f, x, jax.random.key(0), num_segments=s, enumerate_all=True,
    ).segment_values
    approx = kernel_shap_attributions(
        f, x, jax.random.key(2), num_segments=s, num_samples=2000,
    )
    scale = float(jnp.abs(exact).mean())
    err = float(jnp.abs(approx.segment_values - exact).mean())
    assert err < 0.1 * scale, (err, scale)
    np.testing.assert_allclose(
        np.asarray(approx.segment_values.sum(0)),
        np.asarray(f(x) - f(jnp.zeros_like(x))), atol=1e-3, rtol=1e-4,
    )


def test_enumerate_all_guard():
    with pytest.raises(ValueError):
        kernel_shap_attributions(
            lambda xx: xx.sum()[None], jnp.zeros(64), jax.random.key(0),
            num_segments=32, enumerate_all=True,
        )
