"""Round-5 TPU probes.

(a) r5_conv_bwd — the one cell the r3/r4 throughput campaign never measured:
    conv_impl="hybrid" (lax forward + stride-blocked-GEMM backward) at
    draw_chunk=1. Motivation: r4_bwd_decomp shows the conv dgrad is 36 ms of
    the 82 ms per-draw Jacobian backward at ~31% of MXU peak — XLA lowers the
    stride-2 dgrad as a dilated convolution, which spends half its MACs on
    inserted zeros, while the GEMM formulation's VJP is polyphase (zero-free
    dense matmuls). r3_conv_ab only A/B'd lax-vs-gemm BOTH ways (the gemm
    *forward* is the slow part), and every hybrid row in r3/r4 was taken at
    draw_chunk>=2 where chunking itself regressed. Two measurements:
      * conv-only [T_out]-row batched VJP, scan-32, per impl in
        {lax, hybrid, gemm};
      * full explainer end-to-end, lax vs hybrid, interleaved in-process
        (the relay drifts +-15-25% day to day; only interleaved A/Bs decide).
    Attribution parity is asserted via |phi| checksum between the two impls.

Appends JSON rows (tagged "probe": "r5_*") to artifacts/bench_sweep_tpu.jsonl.
Run ON the TPU host: python scripts/tpu_r5_probe.py [conv_bwd ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asr_shap.utils.jax_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

OUT = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "bench_sweep_tpu.jsonl")

AUDIO_LEN = int(os.environ.get("PROBE_AUDIO_LEN", 48_000))
NSAMPLES = int(os.environ.get("PROBE_NSAMPLES", 32))


def _sync(a):
    np.asarray(np.ravel(np.asarray(a))[:1])


def _emit(fh, rec):
    fh.write(json.dumps(rec) + "\n")
    fh.flush()
    print(json.dumps(rec))


def probe_conv_bwd(fh):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from asr_shap.core.config import ExplainerConfig, Wav2Vec2Config
    from asr_shap.explain.baselines import zeros_noise_background
    from asr_shap.explain.expected_gradients import expected_gradients
    from asr_shap.models import wav2vec2 as w2v
    from asr_shap.models.heads import make_explained_fn
    from asr_shap.models.wav2vec2 import init_wav2vec2_params

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(AUDIO_LEN).astype(np.float32))
    n_draws = 32

    # --- part 1: conv-only batched VJP per impl --------------------------
    base_cfg = Wav2Vec2Config(matmul_precision="default", dtype="bfloat16")
    params = init_wav2vec2_params(jax.random.key(0), base_cfg)
    t_out = base_cfg.frames_for_samples(AUDIO_LEN)

    def conv_only(cfg):
        def f(p, xi):
            p = w2v.cast_params_for_compute(p, jnp.bfloat16)
            with jax.default_matmul_precision(cfg.matmul_precision):
                return w2v.feature_encoder(p, cfg, xi[None].astype(jnp.bfloat16))
        return f

    feats0 = jax.jit(conv_only(base_cfg))(params, x)
    _sync(feats0)
    ct_feats = jnp.asarray(
        rng.standard_normal((t_out,) + tuple(feats0.shape)), feats0.dtype
    )

    for impl in ("lax", "hybrid", "gemm"):
        cfg = Wav2Vec2Config(matmul_precision="default", dtype="bfloat16",
                             conv_impl=impl)
        fwd = conv_only(cfg)

        @jax.jit
        def run(p, b):
            def body(carry, i):
                xi = b * (1.0 + 1e-4 * i.astype(jnp.float32))
                y, vjp_fn = jax.vjp(lambda xx: fwd(p, xx), xi)
                rows = jax.vmap(lambda ct: vjp_fn(ct)[0])(ct_feats)
                return carry + jnp.sum(rows.astype(jnp.float32)), None

            acc, _ = lax.scan(body, jnp.asarray(0.0, jnp.float32),
                              jnp.arange(n_draws))
            return acc

        try:
            t0 = time.perf_counter()
            acc = run(params, x)
            _sync(acc)
            compile_s = time.perf_counter() - t0
            walls = []
            for _ in range(2):
                t0 = time.perf_counter()
                acc = run(params, x)
                _sync(acc)
                walls.append(time.perf_counter() - t0)
            wall = min(walls)
        except Exception as e:
            _emit(fh, {"probe": "r5_conv_bwd", "variant": f"jac_conv_{impl}",
                       "audio_len": AUDIO_LEN,
                       "error": f"{type(e).__name__}: {str(e)[:300]}"})
            continue
        _emit(fh, {"probe": "r5_conv_bwd", "variant": f"jac_conv_{impl}",
                   "audio_len": AUDIO_LEN, "n_draws": n_draws,
                   "compile_s": round(compile_s, 1), "wall_s": round(wall, 4),
                   "ms_per_iter": round(wall / n_draws * 1e3, 2)})

    # --- part 2: full explainer, lax vs hybrid, interleaved --------------
    ecfg = ExplainerConfig(nsamples=NSAMPLES, draw_chunk=1, output_chunk=0,
                           num_background=5, remat=True)
    bg = zeros_noise_background(jax.random.key(1), AUDIO_LEN, 5, 0.01)

    runs = {}
    for impl in ("lax", "hybrid"):
        cfg = Wav2Vec2Config(matmul_precision="default", dtype="bfloat16",
                             attention_impl="xla", conv_impl=impl)

        @jax.jit
        def run(p, xx, kk, _cfg=cfg):
            f = make_explained_fn(p, _cfg, ecfg)
            return expected_gradients(f, xx, bg, kk, ecfg).values

        runs[impl] = run

    checks = {}
    try:
        for impl, run in runs.items():
            t0 = time.perf_counter()
            phi = run(params, x, jax.random.key(2))
            checks[impl] = float(jnp.sum(jnp.abs(phi)))
            compile_s = time.perf_counter() - t0
            _emit(fh, {"probe": "r5_conv_bwd", "variant": f"e2e_compile_{impl}",
                       "audio_len": AUDIO_LEN, "compile_s": round(compile_s, 1)})
    except Exception as e:
        _emit(fh, {"probe": "r5_conv_bwd", "variant": "e2e",
                   "error": f"{type(e).__name__}: {str(e)[:300]}"})
        return

    walls = {"lax": [], "hybrid": []}
    for rep in range(4):
        for impl in ("lax", "hybrid"):
            t0 = time.perf_counter()
            phi = runs[impl](params, x, jax.random.key(3 + rep))
            _sync(phi)
            walls[impl].append(time.perf_counter() - t0)
    for impl in ("lax", "hybrid"):
        wall = min(walls[impl])
        _emit(fh, {"probe": "r5_conv_bwd", "variant": f"e2e_{impl}",
                   "audio_len": AUDIO_LEN, "nsamples": NSAMPLES,
                   "dtype": "bfloat16", "draw_chunk": 1,
                   "walls_interleaved": [round(w, 3) for w in walls[impl]],
                   "wall_s": round(wall, 4),
                   "passes_per_sec": round(NSAMPLES * t_out / wall, 1),
                   "phi_checksum": checks[impl]})


def probe_conv_pallas(fh):
    """lax dgrad vs the fused polyphase Pallas dgrad
    (kernels/conv_dgrad.py): conv-only [T_out]-row batched VJP per impl,
    then the full explainer interleaved, phi-checksummed. Same protocol as
    probe_conv_bwd so rows are directly comparable."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from asr_shap.core.config import ExplainerConfig, Wav2Vec2Config
    from asr_shap.explain.baselines import zeros_noise_background
    from asr_shap.explain.expected_gradients import expected_gradients
    from asr_shap.models import wav2vec2 as w2v
    from asr_shap.models.heads import make_explained_fn
    from asr_shap.models.wav2vec2 import init_wav2vec2_params

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(AUDIO_LEN).astype(np.float32))
    n_draws = 32

    # --- part 1: conv-only batched VJP per impl --------------------------
    base_cfg = Wav2Vec2Config(matmul_precision="default", dtype="bfloat16")
    params = init_wav2vec2_params(jax.random.key(0), base_cfg)
    t_out = base_cfg.frames_for_samples(AUDIO_LEN)

    def conv_only(cfg):
        def f(p, xi):
            p = w2v.cast_params_for_compute(p, jnp.bfloat16)
            with jax.default_matmul_precision(cfg.matmul_precision):
                return w2v.feature_encoder(p, cfg, xi[None].astype(jnp.bfloat16))
        return f

    feats0 = jax.jit(conv_only(base_cfg))(params, x)
    _sync(feats0)
    ct_feats = jnp.asarray(
        rng.standard_normal((t_out,) + tuple(feats0.shape)), feats0.dtype
    )

    for impl in ("lax", "pallas"):
        cfg = Wav2Vec2Config(matmul_precision="default", dtype="bfloat16",
                             conv_impl=impl)
        fwd = conv_only(cfg)

        @jax.jit
        def run(p, b):
            def body(carry, i):
                xi = b * (1.0 + 1e-4 * i.astype(jnp.float32))
                y, vjp_fn = jax.vjp(lambda xx: fwd(p, xx), xi)
                rows = jax.vmap(lambda ct: vjp_fn(ct)[0])(ct_feats)
                return carry + jnp.sum(rows.astype(jnp.float32)), None

            acc, _ = lax.scan(body, jnp.asarray(0.0, jnp.float32),
                              jnp.arange(n_draws))
            return acc

        try:
            t0 = time.perf_counter()
            acc = run(params, x)
            _sync(acc)
            compile_s = time.perf_counter() - t0
            walls = []
            for _ in range(2):
                t0 = time.perf_counter()
                acc = run(params, x)
                _sync(acc)
                walls.append(time.perf_counter() - t0)
            wall = min(walls)
        except Exception as e:
            _emit(fh, {"probe": "r5_conv_pallas",
                       "variant": f"jac_conv_{impl}", "audio_len": AUDIO_LEN,
                       "error": f"{type(e).__name__}: {str(e)[:300]}"})
            continue
        _emit(fh, {"probe": "r5_conv_pallas", "variant": f"jac_conv_{impl}",
                   "audio_len": AUDIO_LEN, "n_draws": n_draws,
                   "compile_s": round(compile_s, 1), "wall_s": round(wall, 4),
                   "ms_per_iter": round(wall / n_draws * 1e3, 2),
                   "jac_checksum": float(acc)})

    # --- part 2: full explainer, lax vs pallas, interleaved --------------
    ecfg = ExplainerConfig(nsamples=NSAMPLES, draw_chunk=1, output_chunk=0,
                           num_background=5, remat=True)
    bg = zeros_noise_background(jax.random.key(1), AUDIO_LEN, 5, 0.01)

    runs = {}
    for impl in ("lax", "pallas"):
        cfg = Wav2Vec2Config(matmul_precision="default", dtype="bfloat16",
                             attention_impl="xla", conv_impl=impl)

        @jax.jit
        def run(p, xx, kk, _cfg=cfg):
            f = make_explained_fn(p, _cfg, ecfg)
            return expected_gradients(f, xx, bg, kk, ecfg).values

        runs[impl] = run

    checks = {}
    try:
        for impl, run in runs.items():
            t0 = time.perf_counter()
            phi = run(params, x, jax.random.key(2))
            checks[impl] = float(jnp.sum(jnp.abs(phi)))
            compile_s = time.perf_counter() - t0
            _emit(fh, {"probe": "r5_conv_pallas",
                       "variant": f"e2e_compile_{impl}",
                       "audio_len": AUDIO_LEN,
                       "compile_s": round(compile_s, 1)})
    except Exception as e:
        _emit(fh, {"probe": "r5_conv_pallas", "variant": "e2e",
                   "error": f"{type(e).__name__}: {str(e)[:300]}"})
        return

    walls = {"lax": [], "pallas": []}
    for rep in range(4):
        for impl in ("lax", "pallas"):
            t0 = time.perf_counter()
            phi = runs[impl](params, x, jax.random.key(3 + rep))
            _sync(phi)
            walls[impl].append(time.perf_counter() - t0)
    for impl in ("lax", "pallas"):
        wall = min(walls[impl])
        _emit(fh, {"probe": "r5_conv_pallas", "variant": f"e2e_{impl}",
                   "audio_len": AUDIO_LEN, "nsamples": NSAMPLES,
                   "dtype": "bfloat16", "draw_chunk": 1,
                   "walls_interleaved": [round(w, 3) for w in walls[impl]],
                   "wall_s": round(wall, 4),
                   "passes_per_sec": round(NSAMPLES * t_out / wall, 1),
                   "phi_checksum": checks[impl]})


PROBES = {"conv_bwd": probe_conv_bwd, "conv_pallas": probe_conv_pallas}


def main():
    names = sys.argv[1:] or list(PROBES)
    with open(OUT, "a") as fh:
        for name in names:
            try:
                PROBES[name](fh)
            except Exception:
                traceback.print_exc()
                _emit(fh, {"probe": f"r5_{name}", "error": "driver-level",
                           "traceback": traceback.format_exc()[-600:]})


if __name__ == "__main__":
    main()
