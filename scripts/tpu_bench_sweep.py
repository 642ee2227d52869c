"""TPU tuning sweep for the flagship explainer benchmark.

Grids over the knobs VERDICT round 1 called untested on real hardware —
attention_impl (xla vs pallas flash), draw_chunk, matmul precision — and
records passes/sec, wall-clock per full explanation, and an MFU estimate
(XLA cost-analysis FLOPs / wall / v5e bf16 peak). Results append to
artifacts/bench_sweep_tpu.jsonl; the measured winner becomes bench.py's
default configuration.

Run ON the TPU host (several minutes: each config pays a remote compile):
    python scripts/tpu_bench_sweep.py
"""

from __future__ import annotations

import dataclasses
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIO_LEN = int(os.environ.get("BENCH_AUDIO_LEN", 48000))
NSAMPLES = int(os.environ.get("BENCH_NSAMPLES", 32))
OUT = os.path.join(os.path.dirname(__file__), "..", "artifacts", "bench_sweep_tpu.jsonl")

V5E_BF16_PEAK_FLOPS = 197e12  # per chip


def run_config(attention_impl: str, draw_chunk: int, precision: str):
    import jax
    import jax.numpy as jnp

    from asr_shap.core.config import ExplainerConfig, Wav2Vec2Config
    from asr_shap.explain.baselines import zeros_noise_background
    from asr_shap.explain.expected_gradients import expected_gradients
    from asr_shap.models.heads import make_explained_fn
    from asr_shap.models.wav2vec2 import init_wav2vec2_params

    cfg = Wav2Vec2Config(matmul_precision=precision, attention_impl=attention_impl)
    t_frames = cfg.frames_for_samples(AUDIO_LEN)
    params = init_wav2vec2_params(jax.random.key(0), cfg)
    ecfg = ExplainerConfig(nsamples=NSAMPLES, draw_chunk=draw_chunk,
                           num_background=5, remat=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(AUDIO_LEN).astype(np.float32))
    bg = zeros_noise_background(jax.random.key(1), AUDIO_LEN, 5, 0.01)

    @jax.jit
    def run(p, xx, kk):
        f = make_explained_fn(p, cfg, ecfg)
        return expected_gradients(f, xx, bg, kk, ecfg).values

    t_c0 = time.perf_counter()
    compiled = run.lower(params, x, jax.random.key(2)).compile()
    compile_s = time.perf_counter() - t_c0

    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    def sync(a):
        np.asarray(a.ravel()[:1])  # relay-safe completion barrier

    phi = compiled(params, x, jax.random.key(2))
    sync(phi)
    walls = []
    for i in range(3):
        t0 = time.perf_counter()
        phi = compiled(params, x, jax.random.key(3 + i))
        sync(phi)
        walls.append(time.perf_counter() - t0)
    wall = min(walls)

    chunk = max(1, draw_chunk)
    total_draws = -(-NSAMPLES // chunk) * chunk
    passes = total_draws * t_frames
    rec = {
        "attention_impl": attention_impl,
        "draw_chunk": draw_chunk,
        "precision": precision,
        "audio_len": AUDIO_LEN,
        "nsamples": NSAMPLES,
        "t_frames": t_frames,
        "wall_per_explanation_s": round(wall, 4),
        "passes_per_sec": round(passes / wall, 2),
        "compile_s": round(compile_s, 1),
        "flops_per_run": flops,
        "tflops_effective": round(flops / wall / 1e12, 2) if flops else None,
        "mfu_vs_v5e_bf16_peak": round(flops / wall / V5E_BF16_PEAK_FLOPS, 4)
        if flops else None,
        "phi_checksum": float(np.abs(np.asarray(phi)).mean()),
    }
    return rec


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    grid = list(itertools.product(
        ["xla", "pallas"], [1, 4, 8], ["highest", "default"],
    ))
    results = []
    with open(OUT, "a") as fh:
        for attn, chunk, prec in grid:
            label = f"{attn}/chunk{chunk}/{prec}"
            try:
                rec = run_config(attn, chunk, prec)
                print(label, "->", rec["passes_per_sec"], "passes/s,",
                      rec["wall_per_explanation_s"], "s/expl", flush=True)
            except Exception as e:
                rec = {"attention_impl": attn, "draw_chunk": chunk,
                       "precision": prec, "error": repr(e)[:500]}
                print(label, "FAILED:", repr(e)[:200], flush=True)
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            results.append(rec)

    ok = [r for r in results if "error" not in r]
    if ok:
        best = max(ok, key=lambda r: r["passes_per_sec"])
        print("WINNER:", json.dumps(best))


if __name__ == "__main__":
    main()
