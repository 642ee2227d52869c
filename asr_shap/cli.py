"""Command-line entry points — the reference's per-script UX
(README.md:31-77: shap_calculation.py, nraw_vs_wer.py, calculate_metric.py,
visualization.py) consolidated into subcommands of ``python -m asr_shap``,
flag-driven instead of module-level side effects and input() prompts
(SURVEY.md section 1 CLI-layer note calls those out as anti-patterns).

  run-shap   : build the controlled test set, compute+persist attributions
  sweep      : eta_raw-vs-WER sweep over data/ (+ scatter plot)
  metric     : single-sample eta_raw from stored npy files
  visualize  : interactive per-character attribution viewer
  compare    : LIME-vs-SHAP comparison on one clip (4-panel figure + wavs)
  bench      : explainer runtime-vs-length sweep
  train      : CTC training on the text-conditional synthetic corpus
  transcribe : greedy CTC transcription of wav/npy clips (the reference's
               minimal load->process->logits->argmax->decode flow,
               test_wav2vec2.py:1-19)
  faithfulness : deletion/insertion occlusion curves over a stored
               attribution set — does masking the top-attributed samples
               destroy the transcript faster than masking random ones?
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def _add_model_args(ap):
    ap.add_argument("--arch", choices=["wav2vec2", "w2v2-conformer"],
                    default="wav2vec2",
                    help="model family (w2v2-conformer = the rel-pos "
                         "conformer of the reference's R12 study)")
    ap.add_argument("--params", type=str, default=None,
                    help=".npz params (core/params_io.py)")
    ap.add_argument("--hf", type=str, default=None,
                    help="HF checkpoint name/path (needs torch+network/cache)")
    ap.add_argument("--random-init", action="store_true",
                    help="random weights (smoke runs / benchmarks)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny architecture (CPU smoke runs; x10 downsample)")
    ap.add_argument("--small", action="store_true",
                    help="small architecture with the full 7-layer conv "
                         "stack (x320 downsample, realistic frame counts)")
    ap.add_argument("--hidden", type=int, default=0,
                    help="override encoder hidden size of --tiny/--small")
    ap.add_argument("--layers", type=int, default=0,
                    help="override encoder layer count of --tiny/--small")
    ap.add_argument("--heads", type=int, default=0,
                    help="override attention head count of --tiny/--small")
    ap.add_argument("--conv-channels", type=int, default=0,
                    help="override conv feature-encoder channels of "
                         "--tiny/--small")


def _load_model(args):
    import jax

    from asr_shap.core.config import Wav2Vec2Config, Wav2Vec2ConformerConfig

    conformer = getattr(args, "arch", "wav2vec2") == "w2v2-conformer"
    small_kw = dict(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, feat_proj_dim=32,
    )
    if getattr(args, "hidden", 0):
        small_kw["hidden_size"] = args.hidden
        small_kw["intermediate_size"] = 2 * args.hidden
    if getattr(args, "layers", 0):
        small_kw["num_hidden_layers"] = args.layers
    if getattr(args, "heads", 0):
        small_kw["num_attention_heads"] = args.heads
    cc = getattr(args, "conv_channels", 0) or 32
    # feat_proj_dim is the conv-encoder output width (the projection maps
    # conv_dim[-1] -> hidden), so it must track the conv channels
    small_kw["feat_proj_dim"] = cc
    if args.tiny:
        kw = dict(small_kw, conv_dim=(cc, cc), conv_stride=(5, 2),
                  conv_kernel=(10, 3))
    elif getattr(args, "small", False):
        # full x320 conv stack (realistic T_frames ~= N/320, which bounds
        # the Jacobian row count) with a small encoder
        kw = dict(small_kw, conv_dim=(cc,) * 7)
    else:
        kw = None

    if conformer:
        cfg = (Wav2Vec2ConformerConfig(**kw, conv_depthwise_kernel_size=7)
               if kw else Wav2Vec2ConformerConfig())
    elif kw:
        cfg = Wav2Vec2Config(**kw, num_conv_pos_embeddings=16,
                             num_conv_pos_embedding_groups=4)
    else:
        cfg = Wav2Vec2Config()

    if args.hf:
        if conformer:
            from asr_shap.models.convert_hf import load_pretrained_conformer

            return load_pretrained_conformer(args.hf)
        from asr_shap.models.convert_hf import load_pretrained

        return load_pretrained(args.hf)
    if args.params:
        from asr_shap.core.params_io import load_config, load_params

        # the archive's embedded architecture (when present) beats preset
        # flags — the weights know what they are
        embedded = load_config(args.params)
        return load_params(args.params), embedded or cfg
    if not args.random_init:
        logging.warning(
            "no --params/--hf given; falling back to random init "
            "(transcripts will be garbage — fine for runtime testing)"
        )
    if conformer:
        from asr_shap.models.w2v2_conformer import init_w2v2_conformer_params

        return init_w2v2_conformer_params(jax.random.key(0), cfg), cfg
    from asr_shap.models.wav2vec2 import init_wav2vec2_params

    return init_wav2vec2_params(jax.random.key(0), cfg), cfg


def cmd_run_shap(args):
    from asr_shap.core.config import (
        ExplainerConfig, PipelineConfig, TestSetConfig,
    )
    from asr_shap.core.store import AttributionStore
    from asr_shap.parallel.mesh import make_mesh
    from asr_shap.pipeline.run_shap import run_shap_pipeline
    from asr_shap.pipeline.testset import create_test_set

    params, cfg = _load_model(args)
    tcfg = TestSetConfig(num_samples=args.num_samples, snrs_db=tuple(args.snrs),
                         min_length=args.min_length, max_length=args.max_length,
                         seed=args.seed, noise_kind=args.noise_kind)
    pcfg = PipelineConfig(
        model=cfg,
        explainer=ExplainerConfig(nsamples=args.nsamples,
                                  draw_chunk=args.draw_chunk,
                                  output_chunk=args.output_chunk,
                                  host_draw_chunk=args.host_draw_chunk,
                                  method=args.method,
                                  num_background=args.num_background,
                                  kmeans_background=args.kmeans,
                                  kernel_num_segments=args.kernel_segments,
                                  # --method lime reads the shared flags:
                                  # --nsamples = perturbations, --kernel-
                                  # segments = coalition features
                                  lime_num_samples=args.nsamples,
                                  lime_num_segments=args.kernel_segments),
        testset=tcfg, data_dir=args.data_dir, seed=args.seed,
        sample_batch=args.sample_batch,
    )
    test_set = create_test_set(tcfg)
    mesh = None
    if args.mesh:
        import jax

        if len(jax.devices()) > 1:
            mesh = make_mesh()
    store = AttributionStore(args.data_dir, async_writes=args.async_writes)
    results = run_shap_pipeline(params, pcfg, test_set, store, mesh=mesh,
                                resume=not args.no_resume)
    print(json.dumps({
        "computed": len(results),
        "total_wall_s": round(sum(r["wall_s"] for r in results), 2),
        "data_dir": args.data_dir,
    }))


def cmd_sweep(args):
    from asr_shap.core.config import MetricConfig
    from asr_shap.core.store import AttributionStore
    from asr_shap.pipeline.sweep import eta_wer_sweep, sweep_summary

    params, cfg = _load_model(args)
    store = AttributionStore(args.data_dir)
    mcfg = MetricConfig(segment_ms=args.segment_ms, percentile=args.percentile,
                        itm_variant=args.itm)
    logits_fn = None
    if getattr(args, "arch", "wav2vec2") == "w2v2-conformer":
        from asr_shap.models.w2v2_conformer import w2v2_conformer_logits

        logits_fn = w2v2_conformer_logits
    records = eta_wer_sweep(params, cfg, store, mcfg, logits_fn=logits_fn,
                            batch=args.batch)
    for r in records:
        print(json.dumps(r))
    summary = sweep_summary(records)
    # headline r excludes snr=inf rows, whose eta_raw==1.0 by construction
    print(json.dumps({"pearson_r": summary["pearson_r_noisy"],
                      "n": len(records), **summary}))
    if args.plot:
        from asr_shap.viz.static import plot_eta_wer_scatter

        plot_eta_wer_scatter(records, out_path=args.plot)
        print(f"wrote {args.plot}")


def cmd_metric(args):
    import jax.numpy as jnp
    import numpy as np

    from asr_shap.core.config import MetricConfig
    from asr_shap.metrics.eta_raw import eta_raw

    mixed = np.load(args.audio)
    noise = np.load(args.noise)
    shap = np.load(args.shap)
    clean = mixed - noise
    mcfg = MetricConfig(segment_ms=args.segment_ms, percentile=args.percentile,
                        itm_variant=args.itm)
    val = float(eta_raw(jnp.asarray(clean), jnp.asarray(noise),
                        jnp.asarray(shap), mcfg))
    print(json.dumps({"eta_raw": val, "segment_ms": args.segment_ms,
                      "percentile": args.percentile, "itm": args.itm}))


def cmd_visualize(args):
    import numpy as np

    from asr_shap.core.store import AttributionStore
    from asr_shap.viz.interactive import AttributionViewer, load_attribution_view

    params, cfg = _load_model(args)
    store = AttributionStore(args.data_dir)
    keys = store.keys()
    if not keys:
        sys.exit(f"no samples found in {args.data_dir}")
    key = keys[args.sample]
    data = store.load(key)
    view = load_attribution_view(params, cfg, np.asarray(data["audio"]),
                                 np.asarray(data["shap_values"]))
    viewer = AttributionViewer(view)
    if args.save:
        viewer.savefig(args.save)
        print(f"wrote {args.save}")
    else:
        viewer.show()


def cmd_compare(args):
    import jax
    import numpy as np

    from asr_shap.core.config import ExplainerConfig, TestSetConfig
    from asr_shap.pipeline.compare import comparison_record, lime_shap_comparison

    params, cfg = _load_model(args)
    if args.audio:
        audio = np.load(args.audio)
    else:
        from asr_shap.pipeline.testset import synthetic_speech

        n = int(round(args.clip_seconds * 16_000))
        audio = synthetic_speech(jax.random.key(args.seed), n)
    ecfg = ExplainerConfig(
        nsamples=args.nsamples,
        lime_num_samples=args.lime_samples,
        lime_num_segments=args.lime_segments,
        lime_keep_prob=args.lime_keep_prob,
        lime_ridge_alpha=args.ridge_alpha,
    )
    logits_fn = None
    if getattr(args, "arch", "wav2vec2") == "w2v2-conformer":
        from asr_shap.models.w2v2_conformer import w2v2_conformer_logits

        logits_fn = w2v2_conformer_logits
    result = lime_shap_comparison(
        params, cfg, ecfg, audio, key=jax.random.key(args.seed),
        clip_seconds=args.clip_seconds, out_dir=args.out_dir,
        logits_fn=logits_fn,
    )
    print(comparison_record(result))


def cmd_train(args):
    from asr_shap.core.config import TrainConfig
    from asr_shap.core.params_io import save_params
    from asr_shap.pipeline.train_synthetic import train_synthetic

    params, cfg = _load_model(args)
    tcfg = TrainConfig(
        learning_rate=args.lr, num_epochs=args.epochs,
        batch_size=args.batch_size, snrs_db=tuple(args.train_snrs),
        early_stopping_patience=args.patience,
        freeze_feature_encoder=False, seed=args.seed,
    )
    params, summary = train_synthetic(
        cfg, tcfg,
        params=None if args.random_init or not (args.params or args.hf)
        else params,
        clip_seconds=args.clip_seconds,
        batches_per_epoch=args.batches_per_epoch,
        target_wer=args.target_wer, seed=args.seed,
    )
    save_params(args.out, params, config=cfg)
    summary["params_path"] = args.out
    print(json.dumps(summary))


def cmd_faithfulness(args):
    from asr_shap.core.store import AttributionStore
    from asr_shap.metrics.faithfulness import (
        faithfulness_curve, faithfulness_summary, make_transcribe_fn,
    )
    from asr_shap.models.heads import model_logits_fn

    import numpy as np

    params, cfg = _load_model(args)
    store = AttributionStore(args.data_dir)
    transcribe = make_transcribe_fn(params, cfg, model_logits_fn(cfg))

    records = []
    out_fh = open(args.out, "w") if args.out else None
    for i, data in enumerate(store.iter_samples()):
        if args.limit and i >= args.limit:
            break
        rec = faithfulness_curve(
            transcribe, np.asarray(data["audio"]),
            np.asarray(data["shap_values"]), str(data["text"]),
            fractions=tuple(args.fractions), mode=args.mode, fill=args.fill,
            n_random=args.n_random, seed=args.seed + i,
        )
        k = data["key"]
        rec["key"] = f"sample_{k.index}_{k.type}_{k.snr}"
        records.append(rec)
        line = json.dumps(rec)
        print(line)
        if out_fh:
            out_fh.write(line + "\n")
            out_fh.flush()
    summary = faithfulness_summary(records)
    summary["mode"] = args.mode
    summary["fill"] = args.fill
    summary["fractions"] = list(args.fractions)
    print(json.dumps(summary))
    if out_fh:
        out_fh.write(json.dumps(summary) + "\n")
        out_fh.close()
    if args.plot:
        from asr_shap.viz.static import plot_faithfulness_curves

        plot_faithfulness_curves({args.data_dir: records}, out_path=args.plot)
        print(f"wrote {args.plot}")


def cmd_transcribe(args):
    import jax.numpy as jnp
    import numpy as np

    from asr_shap.audio.normalize import zero_mean_unit_var
    from asr_shap.metrics.confidence import mean_max_softmax_confidence
    from asr_shap.models.heads import model_logits_fn
    from asr_shap.ops.ctc import ctc_greedy_decode, ctc_ids_to_text

    params, cfg = _load_model(args)
    logits_fn = model_logits_fn(cfg)

    for path in args.inputs:
        if path.endswith(".npy"):
            audio = np.load(path).astype(np.float32).ravel()
            sr = args.sr
        else:
            from asr_shap.viz.wav_io import read_wav

            audio, sr = read_wav(path)
            audio = np.asarray(audio, np.float32).ravel()
        if sr != 16_000:
            from asr_shap.audio.resample import resample

            audio = np.asarray(resample(jnp.asarray(audio), sr, 16_000))
        x = zero_mean_unit_var(jnp.asarray(audio))[None]
        logits = logits_fn(params, cfg, x)
        ids, keep = ctc_greedy_decode(logits)
        text = ctc_ids_to_text(np.asarray(ids[0]), np.asarray(keep[0]))
        conf = float(mean_max_softmax_confidence(logits[0]))
        print(json.dumps({
            "path": path,
            "transcript": text,
            "confidence": round(conf, 4),
            "samples": int(audio.shape[0]),
            "frames": int(logits.shape[1]),
        }))


def cmd_bench(args):
    from asr_shap.core.config import Wav2Vec2Config
    from asr_shap.pipeline.benchmarks import run_length_sweep

    numerics = dict(dtype=args.dtype, matmul_precision=args.precision,
                    attention_impl=args.attn)
    if args.tiny:
        model_config = Wav2Vec2Config(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=128, conv_dim=(32, 32), conv_stride=(5, 2),
            conv_kernel=(10, 3), num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4, feat_proj_dim=32, **numerics,
        )
    else:
        model_config = Wav2Vec2Config(**numerics)
    run_length_sweep(lengths=tuple(args.lengths), nsamples=args.nsamples,
                     model_config=model_config, plot_path=args.plot,
                     json_path=args.json)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="asr_shap", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("run-shap", help="compute+persist attributions")
    _add_model_args(p)
    p.add_argument("--data-dir", default="data")
    p.add_argument("--num-samples", type=int, default=20)
    p.add_argument("--snrs", type=float, nargs="+", default=[5.0, 2.0, 1.0])
    p.add_argument("--min-length", type=int, default=100_000)
    p.add_argument("--max-length", type=int, default=0)
    p.add_argument("--noise-kind", choices=["white", "pink", "babble"],
                   default="white",
                   help="noise family mixed at each SNR (white = the "
                        "reference mechanism; babble = overlapped synthetic "
                        "speakers, the speech-shaped stress case for "
                        "eta_raw)")
    p.add_argument("--nsamples", type=int, default=200)
    p.add_argument("--draw-chunk", type=int, default=1)
    p.add_argument("--output-chunk", type=int, default=128,
                   help="cotangent rows per backward batch (0 = all "
                        "T_frames at once — fastest when it fits; the "
                        "default bounds backward memory so reference-length "
                        "clips >=100k samples don't overrun a 16 GB chip)")
    p.add_argument("--host-draw-chunk", type=int, default=0,
                   help="split the draw loop over ceil(nsamples/N) separate "
                        "device calls of N draws each (0 = one call). Use "
                        "when a single long execution hits an environment "
                        "deadline and kills the worker (the r4 conformer "
                        "study's longest bucket)")
    p.add_argument("--sample-batch", type=int, default=0,
                   help="samples explained per jitted call (0 = auto: 2 "
                        "only for short clips (<100k samples) under small "
                        "draw budgets (nsamples<32), else 1 — the measured "
                        "optimum, r4_group_len rows; 1 = serial)")
    p.add_argument("--async-writes", action="store_true",
                   help="write npy files through the native C++ writer pool "
                        "(overlaps disk IO with device compute)")
    p.add_argument("--method", choices=["grad", "deep", "kernel", "lime"],
                   default="grad",
                   help="grad = GradientExplainer (expected gradients); "
                        "deep = DeepExplainer (DeepSHAP rescale rules); "
                        "kernel = KernelSHAP (model-agnostic Shapley-kernel "
                        "regression over waveform segments); lime = LIME "
                        "linear surrogate over the same segments")
    p.add_argument("--kernel-segments", type=int, default=32,
                   help="coalition segments over the waveform "
                        "(--method kernel/lime)")
    p.add_argument("--num-background", type=int, default=5,
                   help="background rows (zeros + sigma*noise, "
                        "shap_calculation.py:126-127)")
    p.add_argument("--kmeans", type=int, default=0,
                   help=">0: summarize the background to k centroids before "
                        "explaining (shap.kmeans, w2v2conformer.py:134-137)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh", action="store_true", help="shard draws over devices")
    p.add_argument("--no-resume", action="store_true")
    p.set_defaults(fn=cmd_run_shap)

    p = sub.add_parser("sweep", help="eta_raw-vs-WER sweep over data/")
    _add_model_args(p)
    p.add_argument("--data-dir", default="data")
    p.add_argument("--segment-ms", type=float, default=0.0625)
    p.add_argument("--percentile", type=float, default=99.0)
    p.add_argument("--itm", choices=["strict", "half"], default="strict")
    p.add_argument("--batch", type=int, default=8,
                   help="samples per jitted decode+eta call (length buckets)")
    p.add_argument("--plot", type=str, default="wer_vs_eta_raw_plot.png")
    p.set_defaults(fn=cmd_sweep)

    p = sub.add_parser("compare",
                       help="LIME-vs-SHAP comparison on one clip "
                            "(reference lime_shap_wav2vec2_comparison.py)")
    _add_model_args(p)
    p.add_argument("--audio", type=str, default=None,
                   help=".npy waveform; default = a seeded synthetic clip")
    p.add_argument("--clip-seconds", type=float, default=2.0)
    p.add_argument("--nsamples", type=int, default=200,
                   help="SHAP expected-gradients draws")
    p.add_argument("--lime-samples", type=int, default=500,
                   help="LIME perturbations (reference :89)")
    p.add_argument("--lime-segments", type=int, default=64)
    p.add_argument("--lime-keep-prob", type=float, default=0.5)
    p.add_argument("--ridge-alpha", type=float, default=1.0)
    p.add_argument("--out-dir", type=str, default="artifacts")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_compare)

    p = sub.add_parser("metric", help="single-sample eta_raw")
    p.add_argument("--audio", required=True)
    p.add_argument("--noise", required=True)
    p.add_argument("--shap", required=True)
    p.add_argument("--segment-ms", type=float, default=0.0625)
    p.add_argument("--percentile", type=float, default=99.0)
    p.add_argument("--itm", choices=["strict", "half"], default="half")
    p.set_defaults(fn=cmd_metric)

    p = sub.add_parser("visualize", help="interactive attribution viewer")
    _add_model_args(p)
    p.add_argument("--data-dir", default="data")
    p.add_argument("--sample", type=int, default=0)
    p.add_argument("--save", type=str, default=None,
                   help="render headless to this png instead of showing")
    p.set_defaults(fn=cmd_visualize)

    p = sub.add_parser("train",
                       help="CTC training on the text-conditional synthetic "
                            "corpus until greedy decode works (L8)")
    _add_model_args(p)
    p.add_argument("--out", type=str, default="params_synthetic.npz",
                   help="output .npz params path")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batches-per-epoch", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--clip-seconds", type=float, default=2.0)
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--train-snrs", type=float, nargs="*", default=[],
                   help="optional noise-augmentation SNRs "
                        "(train_asr.py:112 capability; empty = clean)")
    p.add_argument("--target-wer", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("faithfulness",
                       help="deletion/insertion faithfulness curves over "
                            "a stored attribution set (occlusion AUC vs "
                            "seeded random-ranking controls)")
    _add_model_args(p)
    p.add_argument("--data-dir", default="data")
    p.add_argument("--fractions", type=float, nargs="+",
                   default=[0.01, 0.02, 0.05, 0.1, 0.2])
    p.add_argument("--mode", choices=["deletion", "insertion"],
                   default="deletion")
    p.add_argument("--fill", choices=["zero", "noise"], default="zero")
    p.add_argument("--n-random", type=int, default=3,
                   help="random-ranking control repetitions per fraction")
    p.add_argument("--limit", type=int, default=0,
                   help="stop after N samples (0 = all)")
    p.add_argument("--out", type=str, default=None,
                   help="also append records+summary JSONL here")
    p.add_argument("--plot", type=str, default=None,
                   help="write the mean WER-vs-fraction curves figure here")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_faithfulness)

    p = sub.add_parser("transcribe",
                       help="greedy CTC transcription of wav/npy clips "
                            "(reference test_wav2vec2.py flow)")
    _add_model_args(p)
    p.add_argument("inputs", nargs="+",
                   help=".wav or .npy waveform files (npy assumed --sr)")
    p.add_argument("--sr", type=int, default=16_000,
                   help="sample rate of .npy inputs (resampled to 16 kHz "
                        "when different; .wav files carry their own rate)")
    p.set_defaults(fn=cmd_transcribe)

    p = sub.add_parser("bench", help="runtime-vs-length sweep")
    p.add_argument("--lengths", type=int, nargs="+",
                   default=[2500, 5000, 10000, 20000, 40000, 80000])
    p.add_argument("--nsamples", type=int, default=16)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--plot", type=str, default=None)
    p.add_argument("--json", type=str, default=None)
    # numerics default to the tuned throughput winners (bench.py header);
    # use --dtype float32 --precision highest for the parity-path timing
    p.add_argument("--dtype", choices=["bfloat16", "float32"],
                   default="bfloat16")
    p.add_argument("--precision", choices=["default", "highest"],
                   default="default")
    p.add_argument("--attn", choices=["xla", "pallas", "auto"], default="xla")
    p.set_defaults(fn=cmd_bench)

    return ap


def main(argv=None):
    from asr_shap.utils.jax_cache import enable_compile_cache

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(levelname)s - %(message)s")
    enable_compile_cache()
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
