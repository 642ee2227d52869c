"""Explainer tests: analytic oracles (linear exactness, completeness) and
mesh-sharding equivalence — the parity strategy from SURVEY.md section 7
("explainer statistical parity") without a shap-library dependency."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asr_shap.core.config import ExplainerConfig
from asr_shap.explain import (
    GradientExplainer,
    expected_gradients,
    expected_gradients_sharded,
    kmeans_background,
    zeros_noise_background,
)
from asr_shap.parallel import make_mesh


def test_linear_model_exact(rng):
    """For f(x) = W^T x the Jacobian is constant, so expected gradients is
    exactly W * (x - b) for a single baseline — independent of the draws."""
    n, t = 16, 5
    w = jnp.asarray(rng.standard_normal((n, t)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    f = lambda v: jnp.einsum('i,it->t', v, w, precision='highest')
    cfg = ExplainerConfig(nsamples=4, draw_chunk=2)
    res = expected_gradients(f, x, b, jax.random.key(0), cfg)
    expected = np.asarray(w) * np.asarray(x - b[0])[:, None]
    np.testing.assert_allclose(np.asarray(res.values), expected, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.model_output), np.asarray(f(x)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.base_values), np.asarray(f(b[0])), rtol=1e-5)


def test_completeness_nonlinear(rng):
    """Sum of attributions converges to f(x) - f(b) (integrated-gradients
    completeness) for a smooth nonlinear function, single baseline."""
    n, t = 8, 3
    a1 = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32) * 0.5)
    a2 = jnp.asarray(rng.standard_normal((16, t)).astype(np.float32) * 0.5)

    def f(v):
        h = jnp.einsum('i,ih->h', v, a1, precision='highest')
        return jnp.einsum('h,ht->t', jnp.tanh(h), a2, precision='highest')

    b = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    cfg = ExplainerConfig(nsamples=4000, draw_chunk=50)
    res = jax.jit(lambda xx, kk: expected_gradients(f, xx, b, kk, cfg))(
        x, jax.random.key(1)
    )
    total = np.asarray(res.values).sum(axis=0)
    target = np.asarray(f(x) - f(b[0]))
    np.testing.assert_allclose(total, target, rtol=0.08, atol=0.02)


def test_multi_background_mean(rng):
    """With a constant-Jacobian f and several baselines, phi converges to
    W * E_b[x - b] (uniform over backgrounds)."""
    n, t, nb = 8, 2, 4
    w = jnp.asarray(rng.standard_normal((n, t)).astype(np.float32))
    bg = jnp.asarray(rng.standard_normal((nb, n)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    f = lambda v: jnp.einsum('i,it->t', v, w, precision='highest')

    cfg = ExplainerConfig(nsamples=8000, draw_chunk=100)
    res = expected_gradients(f, x, bg, jax.random.key(2), cfg)
    expected = np.asarray(w) * np.asarray(x - bg.mean(0))[:, None]
    np.testing.assert_allclose(np.asarray(res.values), expected, rtol=0.1, atol=0.02)


def test_output_chunking_identical(rng):
    """Chunked cotangent batching must be numerically identical to the
    all-at-once Jacobian."""
    n, t = 12, 7
    a = jnp.asarray(rng.standard_normal((n, t)).astype(np.float32))

    def f(v):
        return jnp.einsum('i,it->t', jnp.sin(v), a, precision='highest')

    b = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    r1 = expected_gradients(f, x, b, jax.random.key(3),
                            ExplainerConfig(nsamples=8, draw_chunk=4, output_chunk=0))
    r2 = expected_gradients(f, x, b, jax.random.key(3),
                            ExplainerConfig(nsamples=8, draw_chunk=4, output_chunk=3))
    np.testing.assert_allclose(np.asarray(r1.values), np.asarray(r2.values),
                               rtol=1e-5, atol=1e-7)


def test_sharded_matches_unsharded(rng):
    """The mesh-sharded sampler must reproduce the single-device result
    bitwise-modulo-reduction-order (global draw ids -> same per-draw keys)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh (CPU run provides 8 virtual)")
    mesh = make_mesh()
    n, t = 10, 4
    a = jnp.asarray(rng.standard_normal((n, t)).astype(np.float32))
    f = lambda v: jnp.einsum('i,it->t', jnp.tanh(v), a, precision='highest')
    b = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    cfg = ExplainerConfig(nsamples=16, draw_chunk=2)
    r_single = expected_gradients(f, x, b, jax.random.key(7), cfg)
    r_shard = expected_gradients_sharded(f, x, b, jax.random.key(7), mesh, cfg)
    np.testing.assert_allclose(
        np.asarray(r_single.values), np.asarray(r_shard.values), rtol=1e-5, atol=1e-6
    )


def test_gradient_explainer_on_tiny_wav2vec2(tiny_config):
    """End-to-end API: explainer on the real model graph produces the
    [N_audio, T_frames] matrix (reference contract, visualization.py:337-344),
    finite and deterministic per key."""
    from asr_shap.models import init_wav2vec2_params, make_explained_fn

    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    ec = ExplainerConfig(nsamples=4, draw_chunk=2, num_background=2, aggregation="max")
    f = make_explained_fn(params, tiny_config, ec)

    n = 800
    bg = zeros_noise_background(jax.random.key(1), n, ec.num_background, ec.background_sigma)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32))

    ex = GradientExplainer(f, bg, ec)
    phi1 = ex.shap_values(x, key=jax.random.key(5))
    phi2 = ex.shap_values(x, key=jax.random.key(5))
    t_frames = tiny_config.frames_for_samples(n)
    assert phi1.shape == (n, t_frames)
    assert np.isfinite(phi1).all()
    np.testing.assert_array_equal(phi1, phi2)
    assert np.abs(phi1).sum() > 0


def test_kmeans_background_separated_clusters(rng):
    pts = np.concatenate([
        rng.standard_normal((20, 3)).astype(np.float32) * 0.05 + 5.0,
        rng.standard_normal((20, 3)).astype(np.float32) * 0.05 - 5.0,
    ])
    cents = np.asarray(kmeans_background(jax.random.key(0), jnp.asarray(pts), 2))
    assert cents.shape == (2, 3)
    vals = sorted(cents.mean(axis=1))
    assert abs(vals[0] + 5.0) < 0.5 and abs(vals[1] - 5.0) < 0.5


def test_zeros_noise_background_stats():
    bg = zeros_noise_background(jax.random.key(0), 4000, 5, 0.01)
    assert bg.shape == (5, 4000)
    assert abs(float(bg.mean())) < 1e-3
    assert abs(float(bg.std()) - 0.01) < 2e-3
