"""Observability: profiler tracing and numerical-stability guards.

The reference's only profiling is time.time() wall-clocks
(runtime_analysis.py:121-131) and its only 'sanitizers' are epsilon guards
and extreme-value print statements (custom_shap_handlers.py:130-164,
SURVEY.md section 5). Here:

  * ``trace_to(dir)`` wraps a block in a jax.profiler trace (XLA/TPU
    timeline, viewable in TensorBoard/Perfetto);
  * ``check_finite(tree, name)`` raises with per-leaf diagnostics when any
    NaN/Inf appears — used at explainer output boundaries;
  * ``enable_nan_debugging()`` flips jax_debug_nans for interactive hunts.
"""

from __future__ import annotations

import contextlib
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace_to(log_dir: str) -> Iterator[None]:
    """Profile a block: ``with trace_to("/tmp/trace"): run()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def check_finite(tree: Any, name: str = "value") -> Any:
    """Host-side NaN/Inf check over a pytree; returns the tree unchanged.
    Raises FloatingPointError with the offending leaf paths and stats."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        n_nan = int(np.isnan(arr).sum())
        n_inf = int(np.isinf(arr).sum())
        if n_nan or n_inf:
            bad.append(
                f"{name}{jax.tree_util.keystr(path)}: "
                f"{n_nan} NaN, {n_inf} Inf of {arr.size} "
                f"(finite range [{np.nanmin(arr):.3g}, {np.nanmax(arr):.3g}])"
            )
    if bad:
        raise FloatingPointError("non-finite values:\n  " + "\n  ".join(bad))
    return tree


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def finite_or_zero(x: jnp.ndarray) -> jnp.ndarray:
    """In-graph guard: replace non-finite entries with zero (the
    visualization fallback pattern, visualization.py:253-268)."""
    return jnp.where(jnp.isfinite(x), x, 0.0)
