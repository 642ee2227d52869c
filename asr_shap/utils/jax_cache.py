"""Persistent XLA compilation cache, shared by every entry point.

Full-model executables take 30-300 s to compile on TPU hosts with remote
compile services; the persistent cache turns every re-run, resume-after-crash,
and per-length sweep recompile into a disk hit (measured cross-process on the
bench v5e: 93.2 s -> 0.9 s first call). The CLI, bench.py, and the probe
scripts all call :func:`enable_compile_cache` before building executables.

Opt out with ASR_SHAP_NO_COMPILE_CACHE=1; relocate with ASR_SHAP_COMPILE_CACHE.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def enable_compile_cache() -> None:
    if os.environ.get("ASR_SHAP_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "ASR_SHAP_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "asr_shap",
                         "jax_compile"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception as e:  # cache is an optimization, never a hard fail
        logger.warning("compile cache disabled: %s", e)
