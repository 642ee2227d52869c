"""Explainer runtime benchmark — the capability of runtime_analysis.py
(R7 in SURVEY.md): wall-clock of a full expected-gradients explanation
against input length {2500, 5000, 10000, 20000, 40000, 80000} samples,
OOM-guarded, printed as a table — plus what the reference lacks: effective
perturbation passes/sec/chip and a JSON artifact.

Run: ``python -m asr_shap.pipeline.benchmarks [--lengths ...] [--nsamples N]``
"""

from __future__ import annotations

import argparse
import json
import time
from typing import List, Optional

import numpy as np

DEFAULT_LENGTHS = (2500, 5000, 10000, 20000, 40000, 80000)  # runtime_analysis.py:111


def run_length_sweep(
    lengths=DEFAULT_LENGTHS,
    nsamples: int = 16,
    draw_chunk: int = 1,
    model_config=None,
    params=None,
    plot_path: Optional[str] = None,
    json_path: Optional[str] = None,
) -> List[dict]:
    import jax
    import jax.numpy as jnp

    from asr_shap.core.config import ExplainerConfig, Wav2Vec2Config
    from asr_shap.explain.baselines import zeros_noise_background
    from asr_shap.explain.expected_gradients import expected_gradients
    from asr_shap.models.heads import make_explained_fn
    from asr_shap.models.wav2vec2 import init_wav2vec2_params

    # throughput protocol: default to the TUNED numerics (bf16 activations,
    # bf16 MXU passes — the measured winners, bench.py header). Pass an
    # explicit model_config for the f32 parity-path timing.
    cfg = model_config or Wav2Vec2Config(
        dtype="bfloat16", matmul_precision="default"
    )
    if params is None:
        params = init_wav2vec2_params(jax.random.key(0), cfg)

    ecfg = ExplainerConfig(nsamples=nsamples, draw_chunk=draw_chunk, remat=True)
    results = []
    rng = np.random.default_rng(0)
    for n in lengths:
        t_frames = cfg.frames_for_samples(n)
        try:
            x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            bg = zeros_noise_background(jax.random.key(1), n, ecfg.num_background)

            # params as jit argument — see bench.py note on HLO constants
            @jax.jit
            def run(p, xx, kk):
                f = make_explained_fn(p, cfg, ecfg)
                return expected_gradients(f, xx, bg, kk, ecfg).values

            def sync(a):
                # block_until_ready is a no-op through remote-execution
                # relays; a device->host transfer is the reliable barrier
                np.asarray(a.ravel()[:1])

            t0 = time.perf_counter()
            sync(run(params, x, jax.random.key(2)))
            compile_s = time.perf_counter() - t0
            # min over repeats: wall-clock through the remote relay is noisy
            wall = float("inf")
            for r in range(3):
                t0 = time.perf_counter()
                sync(run(params, x, jax.random.key(3 + r)))
                wall = min(wall, time.perf_counter() - t0)
            chunk = max(1, draw_chunk)
            total_draws = -(-nsamples // chunk) * chunk
            results.append(
                {
                    "length": n,
                    "t_frames": t_frames,
                    "nsamples": total_draws,
                    "wall_s": wall,
                    "compile_s": compile_s,
                    "passes_per_s": total_draws * t_frames / wall,
                    "status": "ok",
                }
            )
        except Exception as e:  # OOM guard (runtime_analysis.py:128-130)
            results.append({"length": n, "status": f"failed: {type(e).__name__}"})
            break

    _print_table(results)
    if plot_path:
        _plot(results, plot_path)
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(results, fh, indent=2)
    return results


def _print_table(results: List[dict]) -> None:
    print(f"{'length':>8} {'frames':>7} {'draws':>6} {'wall[s]':>9} "
          f"{'compile[s]':>11} {'passes/s':>10}")
    for r in results:
        if r["status"] != "ok":
            print(f"{r['length']:>8} {r['status']}")
            continue
        print(
            f"{r['length']:>8} {r['t_frames']:>7} {r['nsamples']:>6} "
            f"{r['wall_s']:>9.3f} {r['compile_s']:>11.1f} {r['passes_per_s']:>10.1f}"
        )


def _plot(results: List[dict], path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ok = [r for r in results if r["status"] == "ok"]
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot([r["length"] for r in ok], [r["wall_s"] for r in ok], "o-")
    ax.set_xlabel("input length [samples]")
    ax.set_ylabel("wall-clock per explanation [s]")
    ax.set_title("expected-gradients runtime vs input length")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--lengths", type=int, nargs="+", default=list(DEFAULT_LENGTHS))
    ap.add_argument("--nsamples", type=int, default=16)
    ap.add_argument("--draw-chunk", type=int, default=1)
    ap.add_argument("--tiny", action="store_true",
                    help="use a tiny model (CPU smoke runs)")
    ap.add_argument("--plot", type=str, default=None)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    model_config = None
    if args.tiny:
        from asr_shap.core.config import Wav2Vec2Config

        model_config = Wav2Vec2Config(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=128, conv_dim=(32, 32), conv_stride=(5, 2),
            conv_kernel=(10, 3), num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4, feat_proj_dim=32,
        )
    run_length_sweep(
        lengths=tuple(args.lengths), nsamples=args.nsamples,
        draw_chunk=args.draw_chunk, model_config=model_config,
        plot_path=args.plot, json_path=args.json,
    )


if __name__ == "__main__":
    main()
