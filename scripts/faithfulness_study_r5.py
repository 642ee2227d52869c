"""Round-5 cross-family faithfulness study driver.

For each explainer family's attribution store (expected gradients, DeepSHAP,
KernelSHAP, LIME — all over the same 10-clip x 7-SNR synthetic corpus and
the same trained study weights), compute deletion AND insertion occlusion
curves (metrics/faithfulness.py: does masking the top-attributed samples
destroy/restore the transcript faster than masking random ones?) with
seeded random-ranking controls, plus each sample's eta_raw — so the
ground-truth-based quality axis (eta_raw, which needs the persisted noise
signal, calculate_metric.py:74-149) and the purely model-based one
(occlusion AUC gap, which needs no ground truth at all) can be correlated
per sample. The reference motivates exactly this occlusion reading of its
attributions (per-character masking, visualization.py:349-368) without
ever scoring it.

Runs everything in ONE process so the batched transcribe executable is
compiled once per (variant-count, audio-length) shape and shared across
all families and both modes (deletion/insertion use equally sized fraction
grids on purpose).

Usage (TPU):
  python scripts/faithfulness_study_r5.py \
      --families grad=data_faith_grad deep=data_faith_deep \
                 kernel=data_faith_kernel lime=data_faith_lime \
      --out artifacts/study_r5_faithfulness
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 7 fractions per mode, SAME count so deletion and insertion batches share
# one executable shape (1 + 7*(1+n_random) variants). Deletion needs
# resolution at small fractions (WER rises fast); insertion needs fractions
# reaching far enough that transcripts actually recover.
DELETION_FRACTIONS = (0.01, 0.02, 0.05, 0.1, 0.2, 0.35, 0.5)
INSERTION_FRACTIONS = (0.02, 0.05, 0.1, 0.2, 0.35, 0.5, 0.75)
N_RANDOM = 3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="artifacts/params_synthetic_study.npz")
    ap.add_argument("--families", nargs="+", required=True,
                    help="name=data_dir pairs")
    ap.add_argument("--out", default="artifacts/study_r5_faithfulness")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from asr_shap.core.config import MetricConfig
    from asr_shap.core.params_io import load_config, load_params
    from asr_shap.core.store import AttributionStore
    from asr_shap.metrics.eta_raw import eta_raw
    from asr_shap.metrics.faithfulness import (
        faithfulness_curve,
        faithfulness_summary,
        make_transcribe_fn,
    )
    from asr_shap.models.heads import model_logits_fn
    from asr_shap.pipeline.sweep import correlation_stats
    from asr_shap.utils.jax_cache import enable_compile_cache

    enable_compile_cache()
    os.makedirs(args.out, exist_ok=True)

    params = load_params(args.params)
    cfg = load_config(args.params)
    transcribe = make_transcribe_fn(params, cfg, model_logits_fn(cfg))
    mcfg = MetricConfig()  # strict ITM, 1-sample segments — the sweep default

    families = dict(f.split("=", 1) for f in args.families)
    summary: dict = {"families": {}, "fractions": {
        "deletion": list(DELETION_FRACTIONS),
        "insertion": list(INSERTION_FRACTIONS),
    }, "n_random": N_RANDOM}

    for fam, data_dir in families.items():
        store = AttributionStore(data_dir)
        fam_out: dict = {}
        recs_by_mode: dict = {"deletion": [], "insertion": []}
        t_fam = time.time()
        for i, data in enumerate(store.iter_samples()):
            if args.limit and i >= args.limit:
                break
            audio = np.asarray(data["audio"])
            noise = np.asarray(data["noise"])
            phi = np.asarray(data["shap_values"])
            k = data["key"]
            key_s = f"sample_{k.index}_{k.type}_{k.snr}"
            # ground-truth axis: eta_raw from the persisted noise
            # (clean = mixed - noise, the sweep convention)
            e = float(eta_raw(audio - noise, noise, phi, mcfg))
            for mode, fracs in (("deletion", DELETION_FRACTIONS),
                                ("insertion", INSERTION_FRACTIONS)):
                rec = faithfulness_curve(
                    transcribe, audio, phi, str(data["text"]),
                    fractions=fracs, mode=mode, fill="zero",
                    n_random=N_RANDOM, seed=args.seed + k.index,
                )
                rec["key"] = key_s
                rec["snr"] = k.snr
                rec["type"] = k.type
                rec["eta_raw"] = e
                recs_by_mode[mode].append(rec)
                print(f"{fam} {mode} {key_s}: gap={rec['auc_gap']:+.3f} "
                      f"eta={e:.3f}", flush=True)
        for mode, recs in recs_by_mode.items():
            path = os.path.join(args.out, f"records_{fam}_{mode}.jsonl")
            with open(path, "w") as fh:
                for r in recs:
                    fh.write(json.dumps(r) + "\n")
            fam_out[mode] = faithfulness_summary(recs)
        # do the two quality axes agree? eta_raw vs deletion AUC gap on the
        # noisy rows (clean rows: eta_raw ~ 1 by construction, no variance)
        noisy = [r for r in recs_by_mode["deletion"] if r["type"] == "noisy"]
        if noisy:
            fam_out["eta_vs_deletion_gap_noisy"] = correlation_stats(
                np.asarray([r["eta_raw"] for r in noisy]),
                np.asarray([r["auc_gap"] for r in noisy]),
            )
        fam_out["wall_s"] = round(time.time() - t_fam, 1)
        summary["families"][fam] = fam_out
        print(f"== {fam}: deletion gap {fam_out['deletion']['mean_auc_gap']:+.4f} "
              f"CI {fam_out['deletion']['gap_ci95']}, insertion gap "
              f"{fam_out['insertion']['mean_auc_gap']:+.4f} "
              f"CI {fam_out['insertion']['gap_ci95']} "
              f"({fam_out['wall_s']}s)", flush=True)

    with open(os.path.join(args.out, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)

    # figures: per-mode mean curves, one color per family
    from asr_shap.viz.static import plot_faithfulness_curves

    for mode in ("deletion", "insertion"):
        by_label = {}
        for fam in families:
            path = os.path.join(args.out, f"records_{fam}_{mode}.jsonl")
            with open(path) as fh:
                by_label[fam] = [json.loads(l) for l in fh]
        plot_faithfulness_curves(
            by_label, out_path=os.path.join(args.out, f"curves_{mode}.png")
        )
    print("done")


if __name__ == "__main__":
    main()
