"""Round-4 TPU probes.

(a) r4_dc_form — the throughput item (VERDICT r3 next-step 2): can draw
    batching amortize the ~35 ms batch-1 per-draw forward (r3_decomp) once
    the replay is removed? Key insight from r3: with remat=True the primal
    forward is DCE'd (y unused) and the 35 ms cost IS the remat replay; with
    remat=False there is exactly one forward per draw either way, which is
    why the r3 remat A/B moved nothing at dc=1. At dc>1 the two diverge:
      * remat=False shares ONE batched forward across the chunk (zero
        replays; residual memory ~ dc x forward activations);
      * remat=True replays batched once per output chunk (n_chunks x
        batched replays).
    Grid over (draw_chunk, output_chunk, remat, conv_impl), every config
    interleaved with the dc=1 incumbent in the same process (the relay
    drifts +-15-25% day to day; only interleaved A/Bs decide wins).
    Compile failures are recorded as rows, not crashes — they are the
    evidence if the ceiling holds.

(b) r4_group_len — per-length sample_batch measurement justifying the
    length-adaptive auto policy (VERDICT r3 next-step 3): g in {1, 2, 4}
    at 48k and 120k samples, s/sample each.

(c) r4_deep_len — DeepSHAP compile ceiling after the scan-over-background
    refactor (VERDICT r3 next-step 4): largest clip length whose dual
    Jacobian program compiles and runs (50k was the r3 ceiling).

Appends JSON rows (tagged "probe": "r4_*") to artifacts/bench_sweep_tpu.jsonl.
Run ON the TPU host: python scripts/tpu_r4_probe.py [dc_form|group_len|deep_len ...]
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
    print(json.dumps(rec), flush=True)


def _build_explainer(audio_len, nsamples, draw_chunk, output_chunk,
                     remat=True, conv_impl="lax", dtype="bfloat16",
                     precision="default"):
    import jax
    import jax.numpy as jnp

    from asr_shap.core.config import ExplainerConfig, Wav2Vec2Config
    from asr_shap.explain.baselines import zeros_noise_background
    from asr_shap.explain.expected_gradients import expected_gradients
    from asr_shap.models.heads import make_explained_fn
    from asr_shap.models.wav2vec2 import init_wav2vec2_params

    cfg = Wav2Vec2Config(matmul_precision=precision, dtype=dtype,
                         attention_impl="xla", conv_impl=conv_impl)
    params = init_wav2vec2_params(jax.random.key(0), cfg)
    ecfg = ExplainerConfig(nsamples=nsamples, draw_chunk=draw_chunk,
                           output_chunk=output_chunk, num_background=5,
                           remat=remat)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(audio_len).astype(np.float32))
    bg = zeros_noise_background(jax.random.key(1), audio_len, 5, 0.01)

    @jax.jit
    def run(p, xx, kk):
        f = make_explained_fn(p, cfg, ecfg)
        return expected_gradients(f, xx, bg, kk, ecfg).values

    t_frames = cfg.frames_for_samples(audio_len)
    chunk = max(1, draw_chunk)
    total_draws = -(-nsamples // chunk) * chunk
    return run, params, x, total_draws * t_frames


def _time_config(run, params, x, passes, reps=2):
    import jax

    t0 = time.perf_counter()
    phi = run(params, x, jax.random.key(2))
    _sync(phi)
    compile_s = time.perf_counter() - t0
    walls = []
    for i in range(reps):
        t0 = time.perf_counter()
        phi = run(params, x, jax.random.key(3 + i))
        _sync(phi)
        walls.append(time.perf_counter() - t0)
    return compile_s, min(walls), float(np.abs(np.asarray(phi)).sum())


def probe_dc_formulations(fh):
    """Interleaved A/B: each candidate config vs the dc=1 incumbent."""
    base_run, base_p, base_x, base_passes = _build_explainer(
        AUDIO_LEN, NSAMPLES, draw_chunk=1, output_chunk=0)
    base_c, base_w, base_chk = _time_config(base_run, base_p, base_x,
                                            base_passes)
    _emit(fh, {"probe": "r4_dc_form", "config": "dc1_oc0_rematT_lax",
               "audio_len": AUDIO_LEN, "nsamples": NSAMPLES,
               "compile_s": round(base_c, 1),
               "wall_s": round(base_w, 3),
               "passes_per_s": round(base_passes / base_w, 1),
               "phi_checksum": base_chk, "role": "incumbent"})

    grid = [
        # (dc, oc, remat, conv)
        (2, 64, False, "hybrid"),
        (2, 64, True, "hybrid"),
        (2, 32, False, "hybrid"),
        (4, 32, False, "hybrid"),
        (4, 16, False, "hybrid"),
        (8, 16, False, "hybrid"),
        (2, 64, False, "lax"),
        (4, 32, False, "lax"),
    ]
    for dc, oc, remat, conv in grid:
        name = f"dc{dc}_oc{oc}_remat{'T' if remat else 'F'}_{conv}"
        try:
            run, p, x, passes = _build_explainer(
                AUDIO_LEN, NSAMPLES, draw_chunk=dc, output_chunk=oc,
                remat=remat, conv_impl=conv)
            c_s, w_s, chk = _time_config(run, p, x, passes)
        except Exception as e:
            _emit(fh, {"probe": "r4_dc_form", "config": name,
                       "audio_len": AUDIO_LEN, "nsamples": NSAMPLES,
                       "error": f"{type(e).__name__}: {str(e)[:300]}"})
            continue
        # re-time the incumbent right after (interleaving defeats drift)
        _, base_w2, _ = _time_config(base_run, base_p, base_x, base_passes,
                                     reps=1)
        _emit(fh, {"probe": "r4_dc_form", "config": name,
                   "audio_len": AUDIO_LEN, "nsamples": NSAMPLES,
                   "compile_s": round(c_s, 1), "wall_s": round(w_s, 3),
                   "passes_per_s": round(passes / w_s, 1),
                   "incumbent_passes_per_s_interleaved":
                       round(base_passes / base_w2, 1),
                   "speedup_vs_interleaved_incumbent":
                       round((passes / w_s) / (base_passes / base_w2), 3),
                   "phi_checksum": chk,
                   "phi_checksum_vs_incumbent":
                       round(chk / base_chk - 1, 5)})


def probe_group_len(fh):
    """s/sample for sample groups g in {1,2,4} at 48k and 120k samples —
    the measurement behind run_shap._auto_group_size."""
    import jax
    import jax.numpy as jnp

    from asr_shap.core.config import (ExplainerConfig, PipelineConfig,
                                      Wav2Vec2Config)
    from asr_shap.models.wav2vec2 import init_wav2vec2_params
    from asr_shap.pipeline.run_shap import _build_group_step

    for audio_len in (48_000, 120_000):
        oc = 0 if audio_len < 100_000 else 128
        cfg = Wav2Vec2Config(matmul_precision="default", dtype="bfloat16")
        params = init_wav2vec2_params(jax.random.key(0), cfg)
        pcfg = PipelineConfig(
            model=cfg,
            explainer=ExplainerConfig(nsamples=NSAMPLES, draw_chunk=1,
                                      output_chunk=oc),
        )
        rng = np.random.default_rng(0)
        for g in (1, 2, 4):
            try:
                step = _build_group_step(pcfg, None, g)
                xs = jnp.asarray(
                    rng.standard_normal((g, audio_len)).astype(np.float32))
                keys = jax.random.split(jax.random.key(1), g)
                t0 = time.perf_counter()
                outs = step(params, xs, keys)
                _sync(outs[0])
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                outs = step(params, xs, jax.random.split(jax.random.key(2), g))
                _sync(outs[0])
                wall = time.perf_counter() - t0
            except Exception as e:
                _emit(fh, {"probe": "r4_group_len", "audio_len": audio_len,
                           "g": g, "output_chunk": oc,
                           "error": f"{type(e).__name__}: {str(e)[:300]}"})
                continue
            _emit(fh, {"probe": "r4_group_len", "audio_len": audio_len,
                       "g": g, "output_chunk": oc, "nsamples": NSAMPLES,
                       "compile_s": round(compile_s, 1),
                       "wall_s": round(wall, 3),
                       "s_per_sample": round(wall / g, 3)})


def probe_deep_len(fh):
    """DeepSHAP dual-Jacobian compile ceiling after the scan-over-background
    refactor; r3's ceiling was ~50k samples (monolithic vmap program)."""
    import jax
    import jax.numpy as jnp

    from asr_shap.core.config import ExplainerConfig, Wav2Vec2Config
    from asr_shap.explain.baselines import zeros_noise_background
    from asr_shap.explain.deepshap import deep_shap_values, wav2vec2_dual_fn

    from asr_shap.models.wav2vec2 import init_wav2vec2_params

    cfg = Wav2Vec2Config(matmul_precision="default", dtype="bfloat16")
    params = init_wav2vec2_params(jax.random.key(0), cfg)
    for audio_len in (48_000, 80_000, 100_000, 120_000):
        oc = 64 if audio_len >= 100_000 else 128
        ecfg = ExplainerConfig(method="deep", output_chunk=oc)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(audio_len).astype(np.float32))
        bg = zeros_noise_background(jax.random.key(1), audio_len, 5, 0.01)

        @jax.jit
        def run(p, xx):
            f_dual = wav2vec2_dual_fn(p, cfg, ecfg)
            return deep_shap_values(f_dual, xx, bg, ecfg.output_chunk).values

        try:
            t0 = time.perf_counter()
            phi = run(params, x)
            _sync(phi)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            phi = run(params, x)
            _sync(phi)
            wall = time.perf_counter() - t0
        except Exception as e:
            _emit(fh, {"probe": "r4_deep_len", "audio_len": audio_len,
                       "output_chunk": oc,
                       "error": f"{type(e).__name__}: {str(e)[:300]}"})
            continue
        _emit(fh, {"probe": "r4_deep_len", "audio_len": audio_len,
                   "output_chunk": oc, "compile_s": round(compile_s, 1),
                   "wall_s": round(wall, 3),
                   "phi_checksum": float(np.abs(np.asarray(phi)).sum())})


def probe_flash_compile(fh):
    """Isolate the r3 flash-kernel 795 s compile at T~1,500 (VERDICT r3
    weak #4): time compile+run of fwd+bwd attention standalone — pallas at
    block_q in {128, 256, 512} vs XLA — at batch shapes matching (a) one
    draw's primal (rows=1) and (b) the explainer's batched backward
    (rows=64). If standalone compiles are sane, the blowup lives in the
    kernel x remat x vmap interaction inside the full explainer program."""
    import jax
    import jax.numpy as jnp

    from asr_shap.kernels.flash_attention import flash_attention
    from asr_shap.ops.attention import _xla_attention

    t, h, d = 1_499, 12, 64
    rng = np.random.default_rng(0)

    for rows in (1, 64):
        qkv = [
            jnp.asarray(rng.standard_normal((rows, h, t, d)),
                        jnp.bfloat16) for _ in range(3)
        ]

        def loss_of(attn):
            def loss(q, k, v):
                return jnp.sum(attn(q, k, v).astype(jnp.float32))

            return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        configs = [("xla", lambda q, k, v: _xla_attention(q, k, v, None))]
        for bq in (128, 256, 512):
            configs.append(
                (f"pallas_bq{bq}",
                 lambda q, k, v, bq=bq: flash_attention(q, k, v, block_q=bq)))
        for name, attn in configs:
            try:
                fn = loss_of(attn)
                t0 = time.perf_counter()
                g = fn(*qkv)
                _sync(g[0])
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                g = fn(*qkv)
                _sync(g[0])
                wall = time.perf_counter() - t0
            except Exception as e:
                _emit(fh, {"probe": "r4_flash_compile", "impl": name,
                           "rows": rows, "t": t,
                           "error": f"{type(e).__name__}: {str(e)[:300]}"})
                continue
            _emit(fh, {"probe": "r4_flash_compile", "impl": name,
                       "rows": rows, "t": t,
                       "compile_s": round(compile_s, 1),
                       "wall_s": round(wall, 4)})


def probe_fwd_decomp(fh):
    """Where do the ~35 ms of per-draw batch-1 forward go? (r3_decomp's
    enc_only bounded the total; this splits it.) Times scan-32 programs of:
      * conv_fwd     — feature encoder only, batch 1
      * trans_fwd    — projection + pos-conv + transformer + head from
                       precomputed feats, batch 1
      * full_fwd     — the whole forward, batch 1
      * full_unroll4 — full forward scan with unroll=4 (can XLA overlap
                       dispatch-bound iterations?)
      * conv_b32     — ONE batched conv forward over 32 draws (the floor)
    Each scan consumes a per-iteration input derived from a draw index so
    nothing is hoisted out of the loop."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from asr_shap.core.config import Wav2Vec2Config
    from asr_shap.models import wav2vec2 as w2v
    from asr_shap.models.wav2vec2 import init_wav2vec2_params

    cfg = Wav2Vec2Config(matmul_precision="default", dtype="bfloat16")
    params = init_wav2vec2_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(AUDIO_LEN).astype(np.float32))
    n_draws = 32

    def conv_only(p, xi):
        p = w2v.cast_params_for_compute(p, jnp.bfloat16)
        with jax.default_matmul_precision(cfg.matmul_precision):
            return w2v.feature_encoder(p, cfg, xi[None].astype(jnp.bfloat16))

    def trans_only(p, feats):
        p = w2v.cast_params_for_compute(p, jnp.bfloat16)
        with jax.default_matmul_precision(cfg.matmul_precision):
            fp = p["feature_projection"]
            h = w2v._linear(
                fp["projection"],
                w2v._layer_norm(fp["layer_norm"], feats, cfg.layer_norm_eps),
            )
            h = w2v.encoder(p, cfg, h)
            return w2v._linear(p["lm_head"], h).astype(jnp.float32)

    def full(p, xi):
        return w2v.wav2vec2_logits(p, cfg, xi[None])

    feats0 = jax.jit(conv_only)(params, x)
    _sync(feats0)

    def scan_of(body_fn, per_iter_input, unroll=1):
        @jax.jit
        def run(p, base):
            def body(carry, i):
                out = body_fn(p, per_iter_input(base, i))
                return carry + jnp.sum(out.astype(jnp.float32)), None

            acc, _ = lax.scan(body, jnp.asarray(0.0, jnp.float32),
                              jnp.arange(n_draws), unroll=unroll)
            return acc

        return run

    # per-iteration scaling makes each iteration's input unique
    def perturb_x(base, i):
        return base * (1.0 + 1e-4 * i.astype(jnp.float32))

    def perturb_f(base, i):
        return (base * (1.0 + 1e-4 * i.astype(jnp.float32))).astype(base.dtype)

    variants = [
        ("conv_fwd", scan_of(conv_only, perturb_x), x),
        ("trans_fwd", scan_of(trans_only, perturb_f), feats0),
        ("full_fwd", scan_of(full, perturb_x), x),
        ("full_unroll4", scan_of(full, perturb_x, unroll=4), x),
    ]
    for name, run, base in variants:
        try:
            t0 = time.perf_counter()
            acc = run(params, base)
            _sync(acc)
            compile_s = time.perf_counter() - t0
            walls = []
            for _ in range(2):
                t0 = time.perf_counter()
                acc = run(params, base)
                _sync(acc)
                walls.append(time.perf_counter() - t0)
            wall = min(walls)
        except Exception as e:
            _emit(fh, {"probe": "r4_fwd_decomp", "variant": name,
                       "audio_len": AUDIO_LEN,
                       "error": f"{type(e).__name__}: {str(e)[:300]}"})
            continue
        _emit(fh, {"probe": "r4_fwd_decomp", "variant": name,
                   "audio_len": AUDIO_LEN, "n_draws": n_draws,
                   "compile_s": round(compile_s, 1),
                   "wall_s": round(wall, 4),
                   "ms_per_iter": round(wall / n_draws * 1e3, 2)})

    # the batched floor for the conv part alone
    @jax.jit
    def conv_b32(p, xs):
        p = w2v.cast_params_for_compute(p, jnp.bfloat16)
        with jax.default_matmul_precision(cfg.matmul_precision):
            return jnp.sum(
                w2v.feature_encoder(p, cfg, xs.astype(jnp.bfloat16)).astype(
                    jnp.float32
                )
            )

    xs = jnp.tile(x[None], (n_draws, 1)) * (
        1.0 + 1e-4 * jnp.arange(n_draws, dtype=jnp.float32)[:, None]
    )
    try:
        t0 = time.perf_counter()
        acc = conv_b32(params, xs)
        _sync(acc)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        acc = conv_b32(params, xs)
        _sync(acc)
        wall = time.perf_counter() - t0
        _emit(fh, {"probe": "r4_fwd_decomp", "variant": "conv_b32",
                   "audio_len": AUDIO_LEN, "n_draws": n_draws,
                   "compile_s": round(compile_s, 1), "wall_s": round(wall, 4),
                   "ms_per_iter": round(wall / n_draws * 1e3, 2)})
    except Exception as e:
        _emit(fh, {"probe": "r4_fwd_decomp", "variant": "conv_b32",
                   "audio_len": AUDIO_LEN,
                   "error": f"{type(e).__name__}: {str(e)[:300]}"})


def probe_bwd_decomp(fh):
    """Split the T-row batched backward (98% of explainer wall per
    r4_fwd_decomp — which CORRECTED r3_decomp's 35 ms-per-forward claim:
    scan-32 batch-1 forwards actually run at 1.8 ms/draw) into its conv and
    transformer parts. Scan-32 programs, each consuming a per-draw input:
      * jac_full  — full [T_out, N] jacobian via 1 fwd + T-row batched VJP
      * jac_trans — [T_out, T, C] jacobian of projection+encoder+head wrt
                    the conv FEATURES (the transformer share)
      * jac_conv  — batched conv backward: T_out cotangent rows [T, C]
                    pulled back to the waveform (the conv share)
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from asr_shap.core.config import Wav2Vec2Config
    from asr_shap.models import wav2vec2 as w2v
    from asr_shap.models.heads import aggregation_head
    from asr_shap.models.wav2vec2 import init_wav2vec2_params

    cfg = Wav2Vec2Config(matmul_precision="default", dtype="bfloat16")
    params = init_wav2vec2_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(AUDIO_LEN).astype(np.float32))
    n_draws = 32

    def conv_only(p, xi):
        p = w2v.cast_params_for_compute(p, jnp.bfloat16)
        with jax.default_matmul_precision(cfg.matmul_precision):
            return w2v.feature_encoder(p, cfg, xi[None].astype(jnp.bfloat16))

    def trans_head(p, feats):
        p = w2v.cast_params_for_compute(p, jnp.bfloat16)
        with jax.default_matmul_precision(cfg.matmul_precision):
            fp = p["feature_projection"]
            h = w2v._linear(
                fp["projection"],
                w2v._layer_norm(fp["layer_norm"], feats, cfg.layer_norm_eps),
            )
            h = w2v.encoder(p, cfg, h)
            logits = w2v._linear(p["lm_head"], h).astype(jnp.float32)
            return aggregation_head(logits, "max")[0]

    feats0 = jax.jit(conv_only)(params, x)
    _sync(feats0)
    t_out = cfg.frames_for_samples(AUDIO_LEN)
    eye = jnp.eye(t_out, dtype=jnp.float32)

    def jac_full(p, xi):
        # single fwd + batched VJP, as the explainer does
        def g(xx):
            return trans_head(p, conv_only(p, xx))

        y, vjp_fn = jax.vjp(g, xi)
        return jax.vmap(lambda ct: vjp_fn(ct)[0])(eye)

    def jac_trans(p, feats):
        y, vjp_fn = jax.vjp(lambda ft: trans_head(p, ft), feats)
        return jax.vmap(lambda ct: vjp_fn(ct)[0])(eye)

    ct_feats = jnp.asarray(
        rng.standard_normal((t_out,) + tuple(feats0.shape)), feats0.dtype
    )

    def jac_conv(p, xi):
        y, vjp_fn = jax.vjp(lambda xx: conv_only(p, xx), xi)
        return jax.vmap(lambda ct: vjp_fn(ct)[0])(ct_feats)

    def scan_of(body_fn, base, perturb):
        @jax.jit
        def run(p, b):
            def body(carry, i):
                out = body_fn(p, perturb(b, i))
                return carry + jnp.sum(out.astype(jnp.float32)), None

            acc, _ = lax.scan(body, jnp.asarray(0.0, jnp.float32),
                              jnp.arange(n_draws))
            return acc

        return run

    def p_x(b, i):
        return b * (1.0 + 1e-4 * i.astype(jnp.float32))

    def p_f(b, i):
        return (b * (1.0 + 1e-4 * i.astype(jnp.float32))).astype(b.dtype)

    for name, body, base, perturb in (
        ("jac_full", jac_full, x, p_x),
        ("jac_trans", jac_trans, feats0, p_f),
        ("jac_conv", jac_conv, x, p_x),
    ):
        try:
            run = scan_of(body, base, perturb)
            t0 = time.perf_counter()
            acc = run(params, base)
            _sync(acc)
            compile_s = time.perf_counter() - t0
            walls = []
            for _ in range(2):
                t0 = time.perf_counter()
                acc = run(params, base)
                _sync(acc)
                walls.append(time.perf_counter() - t0)
            wall = min(walls)
        except Exception as e:
            _emit(fh, {"probe": "r4_bwd_decomp", "variant": name,
                       "audio_len": AUDIO_LEN,
                       "error": f"{type(e).__name__}: {str(e)[:300]}"})
            continue
        _emit(fh, {"probe": "r4_bwd_decomp", "variant": name,
                   "audio_len": AUDIO_LEN, "n_draws": n_draws,
                   "compile_s": round(compile_s, 1), "wall_s": round(wall, 4),
                   "ms_per_iter": round(wall / n_draws * 1e3, 2)})


def probe_flash_full(fh):
    """Localize the r3 795 s pallas compile at T=1,499: standalone flash
    fwd+bwd compiles in 0.9-7.7 s (r4_flash_compile), so the blowup lives in
    the full explainer program. A/B the full program's compile time with
    remat True vs False (nsamples=2 keeps the run cheap; compile time is
    shape-driven, not draw-driven). If remat=False compiles sanely, the
    blowup is the remat replay re-instantiating the kernel inside every
    output-chunk scan body; if not, it's the vmap/scan x custom-call
    interaction itself."""
    audio_len = 480_000
    grid = ((True, "pallas"), (False, "pallas"), (False, "xla"),
            (True, "xla"))
    only = os.environ.get("PROBE_FLASH_CONFIGS", "")
    for remat, attn in grid:
        name = f"attn_{attn}_remat{'T' if remat else 'F'}"
        if only and name not in only.split(","):
            continue
        try:
            import jax

            from asr_shap.core.config import ExplainerConfig, Wav2Vec2Config
            from asr_shap.explain.baselines import zeros_noise_background
            from asr_shap.explain.expected_gradients import expected_gradients
            from asr_shap.models.heads import make_explained_fn
            from asr_shap.models.wav2vec2 import init_wav2vec2_params
            import jax.numpy as jnp

            cfg = Wav2Vec2Config(matmul_precision="default", dtype="bfloat16",
                                 attention_impl=attn)
            params = init_wav2vec2_params(jax.random.key(0), cfg)
            ecfg = ExplainerConfig(nsamples=2, draw_chunk=1, output_chunk=16,
                                   num_background=5, remat=remat)
            rng = np.random.default_rng(0)
            x = jnp.asarray(rng.standard_normal(audio_len).astype(np.float32))
            bg = zeros_noise_background(jax.random.key(1), audio_len, 5, 0.01)

            @jax.jit
            def run(p, xx, kk):
                f = make_explained_fn(p, cfg, ecfg)
                return expected_gradients(f, xx, bg, kk, ecfg).values

            t0 = time.perf_counter()
            phi = run(params, x, jax.random.key(2))
            _sync(phi)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            phi = run(params, x, jax.random.key(3))
            _sync(phi)
            wall = time.perf_counter() - t0
        except Exception as e:
            _emit(fh, {"probe": "r4_flash_full", "config": name,
                       "audio_len": audio_len,
                       "error": f"{type(e).__name__}: {str(e)[:300]}"})
            continue
        _emit(fh, {"probe": "r4_flash_full", "config": name,
                   "audio_len": audio_len, "nsamples": 2,
                   "compile_s": round(compile_s, 1),
                   "wall_s": round(wall, 3)})


def main():
    which = sys.argv[1:] or ["dc_form", "group_len", "deep_len",
                             "flash_compile"]
    with open(OUT, "a") as fh:
        if "dc_form" in which:
            probe_dc_formulations(fh)
        if "group_len" in which:
            probe_group_len(fh)
        if "deep_len" in which:
            probe_deep_len(fh)
        if "flash_compile" in which:
            probe_flash_compile(fh)
        if "fwd_decomp" in which:
            probe_fwd_decomp(fh)
        if "bwd_decomp" in which:
            probe_bwd_decomp(fh)
        if "flash_full" in which:
            probe_flash_full(fh)


if __name__ == "__main__":
    main()
