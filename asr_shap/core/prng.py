"""Deterministic PRNG handling.

The reference uses unseeded global numpy RNG for noise injection and SHAP
backgrounds (shap_calculation.py:58, :127), making runs irreproducible.
Here every stochastic component takes an explicit ``jax.random`` key derived
from a single run seed, so attributions are bit-reproducible per (seed,
sample, draw) — a requirement for the parity tests (SURVEY.md section 7
"explainer statistical parity").
"""

from __future__ import annotations

import jax


def run_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def fold(key: jax.Array, *indices: int) -> jax.Array:
    """Derive a subkey by folding a path of integer indices into the key."""
    for idx in indices:
        key = jax.random.fold_in(key, idx)
    return key
