"""LIME tests: linear-model recovery (the surrogate should find the true
per-segment contributions), intercept behavior, determinism."""

import numpy as np
import jax
import jax.numpy as jnp

from asr_shap.explain import lime_attributions


def test_lime_recovers_linear_contributions(rng):
    n, s = 256, 8
    w = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    f = lambda v: jnp.einsum("i,i->", v, w, precision="highest")[None]

    res = lime_attributions(
        f, x, jax.random.key(0), num_segments=s, num_samples=2000,
        ridge_alpha=1e-4, batch=64,
    )
    seg_true = np.asarray((w * x).reshape(s, -1).sum(axis=1))
    np.testing.assert_allclose(
        np.asarray(res.segment_values)[:, 0], seg_true, rtol=0.05, atol=0.02
    )
    # intercept ~ f(baseline)=0 for the zero baseline
    assert abs(float(res.intercept[0])) < 0.1
    # per-sample layout: [N, T_out]
    assert res.values.shape == (n, 1)


def test_lime_multi_output(rng):
    n, s, t = 128, 4, 3
    w = jnp.asarray(rng.standard_normal((n, t)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    f = lambda v: jnp.einsum("i,it->t", v, w, precision="highest")

    res = lime_attributions(f, x, jax.random.key(1), num_segments=s,
                            num_samples=1500, ridge_alpha=1e-4, batch=50)
    seg_true = np.asarray((np.asarray(w) * np.asarray(x)[:, None])
                          .reshape(s, -1, t).sum(axis=1))
    np.testing.assert_allclose(
        np.asarray(res.segment_values), seg_true, rtol=0.08, atol=0.05
    )


def test_lime_deterministic_and_batch_invariant(rng):
    n = 64
    w = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    f = lambda v: (v @ w)[None]

    r1 = lime_attributions(f, x, jax.random.key(2), num_segments=4,
                           num_samples=100, batch=10)
    r2 = lime_attributions(f, x, jax.random.key(2), num_segments=4,
                           num_samples=100, batch=25)
    np.testing.assert_allclose(np.asarray(r1.segment_values),
                               np.asarray(r2.segment_values), rtol=1e-4, atol=1e-6)
    r3 = lime_attributions(f, x, jax.random.key(3), num_segments=4,
                           num_samples=100, batch=10)
    assert not np.allclose(np.asarray(r1.segment_values),
                           np.asarray(r3.segment_values))
