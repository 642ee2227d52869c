"""Round-3 TPU probes: (a) confirm WHY grouped/chunked executables failed on
the bench chip (HBM at compile-time memory planning, not program size),
(b) find a working draw_chunk>1 configuration via output_chunk capping,
(c) measure the flash kernel vs XLA at the 80k-sample length-sweep row
(T~2,500) where VMEM residency should win, and (d) prove >1 sample per
executable works via the scan-grouped pipeline step.

Appends JSON records (tagged with "probe") to artifacts/bench_sweep_tpu.jsonl.
Run ON the TPU host: python scripts/tpu_r3_probe.py [probe ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asr_shap.utils.jax_cache import enable_compile_cache  # noqa: E402

# probe iteration re-runs near-identical programs; without the persistent
# cache each rerun pays 30-300 s of remote compile (the r3_chunk_grid rows
# paid 285 s and 253 s for the SAME dc=1 program twice)
enable_compile_cache()

OUT = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "bench_sweep_tpu.jsonl")


def _sync(a):
    np.asarray(np.ravel(np.asarray(a))[:1])


def _emit(fh, rec):
    fh.write(json.dumps(rec) + "\n")
    fh.flush()
    print(json.dumps(rec), flush=True)


def _build(audio_len, nsamples, draw_chunk, output_chunk, dtype="bfloat16",
           attention_impl="xla", precision="default", conv_impl="lax"):
    import jax
    import jax.numpy as jnp

    from asr_shap.core.config import ExplainerConfig, Wav2Vec2Config
    from asr_shap.explain.baselines import zeros_noise_background
    from asr_shap.explain.expected_gradients import expected_gradients
    from asr_shap.models.heads import make_explained_fn
    from asr_shap.models.wav2vec2 import init_wav2vec2_params

    cfg = Wav2Vec2Config(matmul_precision=precision, dtype=dtype,
                         attention_impl=attention_impl, conv_impl=conv_impl)
    params = init_wav2vec2_params(jax.random.key(0), cfg)
    ecfg = ExplainerConfig(nsamples=nsamples, draw_chunk=draw_chunk,
                           output_chunk=output_chunk, num_background=5,
                           remat=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(audio_len).astype(np.float32))
    bg = zeros_noise_background(jax.random.key(1), audio_len, 5, 0.01)

    @jax.jit
    def run(p, xx, kk):
        f = make_explained_fn(p, cfg, ecfg)
        return expected_gradients(f, xx, bg, kk, ecfg).values

    return run, params, x, cfg, ecfg


def probe_memory_and_chunks(fh):
    """Compile (and when viable, time) draw_chunk x output_chunk combos at the
    flagship 48k length; record XLA's memory analysis when exposed."""
    import jax

    for draw_chunk, output_chunk in [
        (1, 0), (2, 0), (4, 0), (8, 0),
    ]:
        rec = {"probe": "r3_chunk_grid", "audio_len": 48000, "nsamples": 32,
               "dtype": "bfloat16", "draw_chunk": draw_chunk,
               "output_chunk": output_chunk}
        try:
            run, params, x, cfg, ecfg = _build(48000, 32, draw_chunk,
                                               output_chunk)
            t0 = time.perf_counter()
            compiled = run.lower(params, x, jax.random.key(2)).compile()
            rec["compile_s"] = round(time.perf_counter() - t0, 1)
            try:
                ma = compiled.memory_analysis()
                if isinstance(ma, list):
                    ma = ma[0]
                rec["temp_bytes"] = int(getattr(ma, "temp_size_in_bytes", 0))
                rec["peak_gb"] = round(
                    (getattr(ma, "temp_size_in_bytes", 0)
                     + getattr(ma, "argument_size_in_bytes", 0)
                     + getattr(ma, "output_size_in_bytes", 0)) / 2**30, 2)
            except Exception as e:
                rec["memory_analysis"] = f"unavailable: {type(e).__name__}"
            phi = compiled(params, x, jax.random.key(2))
            _sync(phi)
            walls = []
            for i in range(3):
                t0 = time.perf_counter()
                phi = compiled(params, x, jax.random.key(3 + i))
                _sync(phi)
                walls.append(time.perf_counter() - t0)
            wall = min(walls)
            chunk = max(1, draw_chunk)
            draws = -(-32 // chunk) * chunk
            t_frames = cfg.frames_for_samples(48000)
            rec.update(wall_s=round(wall, 3),
                       passes_per_sec=round(draws * t_frames / wall, 1))
        except Exception as e:
            rec["error"] = repr(e)[:300]
        _emit(fh, rec)


def probe_long_seq_kernel(fh):
    """Where does the flash kernel win? The reference length sweep tops out
    at 80k samples (runtime_analysis.py:111) = 5 s = T~250 frames — XLA's
    materialized [rows, H, T, T] probabilities are still modest there. The
    real VMEM-residency case is long-form audio: 480k samples (30 s,
    T~1,500), where XLA's probability tensors hit ~GB per layer while the
    flash kernel keeps them in VMEM. output_chunk bounds the row batch so
    both fit."""
    import jax

    grid = [
        (80000, 4, [8, 16]),     # reference sweep's longest row
        (480000, 2, [16]),       # long-form audio (framework extension)
    ]
    for audio_len, nsamples, chunks in grid:
        for attn in ["xla", "pallas"]:
            for output_chunk in chunks:
                _long_seq_row(fh, audio_len, nsamples, output_chunk, attn)


def _long_seq_row(fh, audio_len, nsamples, output_chunk, attn):
    import jax

    rec = {"probe": "r3_long_seq", "audio_len": audio_len,
           "nsamples": nsamples, "dtype": "bfloat16",
           "attention_impl": attn, "draw_chunk": 1,
           "output_chunk": output_chunk}
    try:
        run, params, x, cfg, ecfg = _build(
            audio_len, nsamples, 1, output_chunk, attention_impl=attn)
        t0 = time.perf_counter()
        compiled = run.lower(params, x, jax.random.key(2)).compile()
        rec["compile_s"] = round(time.perf_counter() - t0, 1)
        phi = compiled(params, x, jax.random.key(2))
        _sync(phi)
        walls = []
        for i in range(2):
            t0 = time.perf_counter()
            phi = compiled(params, x, jax.random.key(3 + i))
            _sync(phi)
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        t_frames = cfg.frames_for_samples(audio_len)
        rec.update(
            t_frames=t_frames, wall_s=round(wall, 3),
            passes_per_sec=round(nsamples * t_frames / wall, 1),
            phi_checksum=float(np.abs(np.asarray(phi)).mean()),
        )
    except Exception as e:
        rec["error"] = repr(e)[:300]
    _emit(fh, rec)


def probe_scan_groups(fh):
    """Full-model sample groups through the ACTUAL pipeline step builder
    (lax.scan over samples): the round-2 vmap form failed to compile at
    g>=2; the scan form must compile and run."""
    import jax
    import jax.numpy as jnp

    from asr_shap.core.config import (
        ExplainerConfig, PipelineConfig, Wav2Vec2Config,
    )
    from asr_shap.pipeline.run_shap import _build_group_step

    for g in [2, 4]:
        rec = {"probe": "r3_scan_groups", "audio_len": 48000, "nsamples": 8,
               "dtype": "bfloat16", "sample_batch": g}
        try:
            cfg = PipelineConfig(
                model=Wav2Vec2Config(matmul_precision="default",
                                     dtype="bfloat16"),
                explainer=ExplainerConfig(nsamples=8, draw_chunk=1,
                                          num_background=5),
                sample_batch=g,
            )
            from asr_shap.models.wav2vec2 import init_wav2vec2_params

            params = init_wav2vec2_params(jax.random.key(0), cfg.model)
            step = _build_group_step(cfg, None, g)
            rng = np.random.default_rng(0)
            xs = jnp.asarray(rng.standard_normal((g, 48000)).astype(np.float32))
            keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(7), i))(
                jnp.arange(g))
            t0 = time.perf_counter()
            phis, confs, ids, keeps = step(params, xs, keys)
            _sync(phis)
            wall0 = time.perf_counter() - t0  # includes compile
            t0 = time.perf_counter()
            phis, confs, ids, keeps = step(params, xs, keys)
            _sync(phis)
            wall = time.perf_counter() - t0
            rec.update(first_call_s=round(wall0, 1),
                       steady_wall_s=round(wall, 3),
                       per_sample_s=round(wall / g, 3),
                       phi_shape=list(np.asarray(phis).shape))
        except Exception as e:
            rec["error"] = repr(e)[:300]
        _emit(fh, rec)


def probe_decomposition(fh):
    """Where does the explanation wall-clock go? Times, at the bench config
    (48k samples, bf16, draw_chunk=1, full-T cotangent basis):
      * full        — forward + T-row batched VJP through the whole model
      * enc_only    — stop_gradient at the conv-encoder output. CAVEAT
                      (what the r3 measurements showed): df/dx is then
                      identically zero, so JAX/XLA dead-code-eliminates the
                      ENTIRE backward — this variant measures the per-draw
                      batch-1 FORWARD cost (plus scan machinery), not
                      "backward minus conv". full - enc_only ~= the batched
                      backward (incl. remat replay); enc_only / draws ~= the
                      per-op-overhead-bound batch-1 forward (~35 ms vs
                      0.74 ms/pass when batched, see fwd_only_batchT) —
                      which is why draw_chunk batching, not kernel work,
                      is the single-chip MFU lever.
      * fwd_only_batchT — T_frames forwards in ONE batch: the amortized
                      floor a batched forward can reach."""
    import jax
    import jax.numpy as jnp

    from asr_shap.core.config import Wav2Vec2Config
    from asr_shap.models.heads import aggregation_head
    from asr_shap.models.wav2vec2 import init_wav2vec2_params, wav2vec2_logits
    from asr_shap.models import wav2vec2 as w2v

    cfg = Wav2Vec2Config(matmul_precision="default", dtype="bfloat16")
    params = init_wav2vec2_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(48000).astype(np.float32))
    t_frames = cfg.frames_for_samples(48000)

    def logits_with_cut(p, xi, cut_conv):
        # mirrors wav2vec2_logits with an optional stop_gradient at the
        # conv-encoder output, so backward covers transformer+proj only
        p = w2v.cast_params_for_compute(p, jnp.bfloat16)
        xv = xi[None].astype(jnp.bfloat16)
        with jax.default_matmul_precision(cfg.matmul_precision):
            feats = w2v.feature_encoder(p, cfg, xv)
            if cut_conv:
                feats = jax.lax.stop_gradient(feats)
            fp = p["feature_projection"]
            h = w2v._linear(
                fp["projection"],
                w2v._layer_norm(fp["layer_norm"], feats, cfg.layer_norm_eps),
            )
            h = w2v.encoder(p, cfg, h, None, remat=True)
            return w2v._linear(p["lm_head"], h).astype(jnp.float32)

    def explained(p, xx, cut_conv):
        def f(xi):
            return aggregation_head(logits_with_cut(p, xi, cut_conv), "max")[0]

        y, vjp_fn = jax.vjp(f, xx)
        jac = jax.vmap(lambda ct: vjp_fn(ct)[0])(jnp.eye(y.shape[0], dtype=y.dtype))
        return jac

    def fwd_batch(p, xs):
        return jax.vmap(
            lambda xi: aggregation_head(
                wav2vec2_logits(p, cfg, xi[None], remat=False), "max")[0]
        )(xs)

    variants = {
        "full": jax.jit(lambda p, xx: explained(p, xx, False)),
        "enc_only": jax.jit(lambda p, xx: explained(p, xx, True)),
    }
    for name, fn in variants.items():
        rec = {"probe": "r3_decomp", "variant": name, "audio_len": 48000,
               "dtype": "bfloat16"}
        try:
            out = fn(params, x)
            _sync(out)
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(params, x)
                _sync(out)
                walls.append(time.perf_counter() - t0)
            rec.update(wall_s=round(min(walls), 4), t_frames=t_frames)
        except Exception as e:
            rec["error"] = repr(e)[:300]
        _emit(fh, rec)

    # same decomposition inside the EXACT bench computation (scan over 32
    # draws through expected_gradients) — isolated single calls carry ~0.5s
    # of relay dispatch overhead that the scan amortizes, so only this
    # framing gives trustworthy shares
    from asr_shap.core.config import ExplainerConfig
    from asr_shap.explain.baselines import zeros_noise_background
    from asr_shap.explain.expected_gradients import expected_gradients

    ecfg = ExplainerConfig(nsamples=32, draw_chunk=1, output_chunk=0,
                           num_background=5, remat=True)
    bg = zeros_noise_background(jax.random.key(1), 48000, 5, 0.01)
    for name, cut in [("scan32_full", False), ("scan32_enc_only", True)]:
        rec = {"probe": "r3_decomp", "variant": name, "audio_len": 48000,
               "nsamples": 32, "dtype": "bfloat16"}
        try:
            # params as a jit ARGUMENT (closures bake 94M constants into the
            # HLO and break the remote compile service — bench.py:88-89)
            @jax.jit
            def run(p, xx, kk, _cut=cut):
                def f_one(xi):
                    return aggregation_head(
                        logits_with_cut(p, xi, _cut), "max")[0]

                return expected_gradients(f_one, xx, bg, kk, ecfg).values

            phi = run(params, x, jax.random.key(2))
            _sync(phi)
            walls = []
            for i in range(3):
                t0 = time.perf_counter()
                phi = run(params, x, jax.random.key(3 + i))
                _sync(phi)
                walls.append(time.perf_counter() - t0)
            wall = min(walls)
            rec.update(wall_s=round(wall, 4),
                       passes_per_sec=round(32 * t_frames / wall, 1))
        except Exception as e:
            rec["error"] = repr(e)[:300]
        _emit(fh, rec)

    rec = {"probe": "r3_decomp", "variant": "fwd_only_batchT",
           "audio_len": 48000, "dtype": "bfloat16"}
    try:
        fn = jax.jit(fwd_batch)
        xs = jnp.broadcast_to(x, (t_frames, 48000))
        out = fn(params, xs)
        _sync(out)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(params, xs)
            _sync(out)
            walls.append(time.perf_counter() - t0)
        rec.update(wall_s=round(min(walls), 4), t_frames=t_frames)
    except Exception as e:
        rec["error"] = repr(e)[:300]
    _emit(fh, rec)


def probe_conv_ab(fh):
    """Interleaved A/B of the conv formulations (lax / gemm / hybrid,
    models/wav2vec2.py::_conv1d) at the bench config, in ONE process with
    alternating timed reps — the relay's throughput drifts +-15% across
    minutes, so only interleaving decides honestly. Then: does draw_chunk>1
    (batching the per-op-overhead-bound batch-1 forwards) compile and win
    with the hybrid backward?"""
    import jax

    impls = ["lax", "hybrid", "gemm"]
    runs = {}
    for impl in impls:
        try:
            run, params, x, cfg, ecfg = _build(48000, 32, 1, 0, conv_impl=impl)
            compiled = run.lower(params, x, jax.random.key(2)).compile()
            phi = compiled(params, x, jax.random.key(2))
            _sync(phi)
            runs[impl] = (compiled, params, x)
        except Exception as e:
            _emit(fh, {"probe": "r3_conv_ab", "conv_impl": impl,
                       "error": repr(e)[:300]})

    walls = {impl: [] for impl in runs}
    for i in range(4):
        for impl in runs:
            compiled, params, x = runs[impl]
            t0 = time.perf_counter()
            phi = compiled(params, x, jax.random.key(10 + i))
            _sync(phi)
            walls[impl].append(round(time.perf_counter() - t0, 3))
    for impl in runs:
        w = min(walls[impl])
        _emit(fh, {"probe": "r3_conv_ab", "conv_impl": impl,
                   "audio_len": 48000, "nsamples": 32, "dtype": "bfloat16",
                   "walls_interleaved": walls[impl], "wall_s": w,
                   "passes_per_sec": round(32 * 149 / w, 1)})


def probe_hybrid_chunks(fh):
    """draw_chunk grid with the hybrid conv backward (the lax dgrad at
    multi-draw cotangent batches crashes the compile helper; the hybrid's
    GEMM backward compiles). Decides the bench/pipeline draw_chunk default."""
    import jax

    for draw_chunk in [2, 4, 8]:
        rec = {"probe": "r3_hybrid_chunks", "audio_len": 48000,
               "nsamples": 32, "dtype": "bfloat16", "conv_impl": "hybrid",
               "draw_chunk": draw_chunk, "output_chunk": 0}
        try:
            run, params, x, cfg, ecfg = _build(
                48000, 32, draw_chunk, 0, conv_impl="hybrid")
            t0 = time.perf_counter()
            compiled = run.lower(params, x, jax.random.key(2)).compile()
            rec["compile_s"] = round(time.perf_counter() - t0, 1)
            try:
                ma = compiled.memory_analysis()
                if isinstance(ma, list):
                    ma = ma[0]
                rec["peak_gb"] = round(
                    (getattr(ma, "temp_size_in_bytes", 0)
                     + getattr(ma, "argument_size_in_bytes", 0)
                     + getattr(ma, "output_size_in_bytes", 0)) / 2**30, 2)
            except Exception:
                pass
            phi = compiled(params, x, jax.random.key(2))
            _sync(phi)
            walls = []
            for i in range(3):
                t0 = time.perf_counter()
                phi = compiled(params, x, jax.random.key(3 + i))
                _sync(phi)
                walls.append(time.perf_counter() - t0)
            wall = min(walls)
            draws = -(-32 // draw_chunk) * draw_chunk
            rec.update(wall_s=round(wall, 3),
                       passes_per_sec=round(draws * 149 / wall, 1))
        except Exception as e:
            rec["error"] = repr(e)[:300]
        _emit(fh, rec)


def probe_remat_ab(fh):
    """Interleaved A/B of remat variants at the bench config: "full" replay,
    "dots" policy (store matmul outputs, recompute elementwise), and
    remat=False (store everything). The decomposition says the backward
    carries a batch-1 replay-sized cost; if it is matmul replay, "dots"
    should recover most of it."""
    import dataclasses as _dc

    import jax

    from asr_shap.core.config import ExplainerConfig, Wav2Vec2Config
    from asr_shap.explain.baselines import zeros_noise_background
    from asr_shap.explain.expected_gradients import expected_gradients
    from asr_shap.models.heads import make_explained_fn
    from asr_shap.models.wav2vec2 import init_wav2vec2_params

    import jax.numpy as jnp

    base_cfg = Wav2Vec2Config(matmul_precision="default", dtype="bfloat16")
    params = init_wav2vec2_params(jax.random.key(0), base_cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(48000).astype(np.float32))
    bg = zeros_noise_background(jax.random.key(1), 48000, 5, 0.01)

    variants = {
        "remat_full": ("full", True),
        "remat_dots": ("dots", True),
        "no_remat": ("full", False),
    }
    runs = {}
    for name, (policy, remat) in variants.items():
        try:
            cfg = _dc.replace(base_cfg, remat_policy=policy)
            ecfg = ExplainerConfig(nsamples=32, draw_chunk=1, output_chunk=0,
                                   num_background=5, remat=remat)

            @jax.jit
            def run(p, xx, kk, _cfg=cfg, _e=ecfg):
                f = make_explained_fn(p, _cfg, _e)
                return expected_gradients(f, xx, bg, kk, _e).values

            compiled = run.lower(params, x, jax.random.key(2)).compile()
            phi = compiled(params, x, jax.random.key(2))
            _sync(phi)
            runs[name] = compiled
        except Exception as e:
            _emit(fh, {"probe": "r3_remat_ab", "variant": name,
                       "error": repr(e)[:300]})

    walls = {n: [] for n in runs}
    for i in range(4):
        for name in runs:
            t0 = time.perf_counter()
            phi = runs[name](params, x, jax.random.key(10 + i))
            _sync(phi)
            walls[name].append(round(time.perf_counter() - t0, 3))
    for name in runs:
        w = min(walls[name])
        _emit(fh, {"probe": "r3_remat_ab", "variant": name,
                   "audio_len": 48000, "nsamples": 32, "dtype": "bfloat16",
                   "walls_interleaved": walls[name], "wall_s": w,
                   "passes_per_sec": round(32 * 149 / w, 1)})


PROBES = {
    "chunks": probe_memory_and_chunks,
    "longseq": probe_long_seq_kernel,
    "groups": probe_scan_groups,
    "decomp": probe_decomposition,
    "convab": probe_conv_ab,
    "hybridchunks": probe_hybrid_chunks,
    "rematab": probe_remat_ab,
}


def main():
    names = sys.argv[1:] or list(PROBES)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as fh:
        for name in names:
            PROBES[name](fh)


if __name__ == "__main__":
    main()
