"""Background (baseline) generators for the explainers.

* ``zeros_noise_background`` — the main pipeline's background: rows of zeros
  plus sigma-scaled Gaussian noise (reference shap_calculation.py:126-127,
  num_background=5, sigma=0.01), here seeded.
* ``kmeans_background`` — equivalent of ``shap.kmeans(data, k)`` background
  summarization used by the Conformer DeepExplainer study
  (w2v2conformer.py:134-137): Lloyd's k-means, returning the k centroids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def zeros_noise_background(
    key: jax.Array, n_input: int, num_background: int = 5, sigma: float = 0.01
) -> jnp.ndarray:
    """[num_background, n_input] near-zero baseline rows."""
    return sigma * jax.random.normal(key, (num_background, n_input), jnp.float32)


def kmeans_background(
    key: jax.Array, data: jnp.ndarray, k: int, num_iters: int = 25
) -> jnp.ndarray:
    """Summarize [M, N] background rows into k centroids (Lloyd's algorithm,
    k-means++-free random init, fixed iteration count — jittable)."""
    m = data.shape[0]
    if k >= m:
        return data
    init_idx = jax.random.choice(key, m, (k,), replace=False)
    centroids = data[init_idx]

    def step(c, _):
        d = jnp.sum((data[:, None, :] - c[None, :, :]) ** 2, axis=-1)  # [M, k]
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=data.dtype)  # [M, k]
        counts = jnp.maximum(onehot.sum(axis=0), 1.0)
        new_c = (onehot.T @ data) / counts[:, None]
        # keep old centroid if a cluster emptied
        new_c = jnp.where((onehot.sum(axis=0) > 0)[:, None], new_c, c)
        return new_c, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=num_iters)
    return centroids
