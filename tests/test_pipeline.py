"""End-to-end pipeline tests on a tiny model: test-set generation semantics,
attribution run + npy persistence contract, resume, and the eta_raw/WER sweep
(the synthetic-SNR ITM oracle from SURVEY.md section 4)."""

import numpy as np
import jax
import pytest

from asr_shap.core.config import (
    ExplainerConfig,
    MetricConfig,
    PipelineConfig,
    TestSetConfig,
)
from asr_shap.core.store import AttributionStore
from asr_shap.models import init_wav2vec2_params
from asr_shap.pipeline import create_test_set, eta_wer_sweep, run_shap_pipeline
from asr_shap.pipeline.testset import synthetic_speech


@pytest.fixture(scope="module")
def tiny_testset():
    cfg = TestSetConfig(num_samples=1, snrs_db=(2.0,), min_length=1200,
                        max_length=1600, seed=0)
    return cfg, create_test_set(cfg, source=None)


def test_testset_structure(tiny_testset):
    cfg, ts = tiny_testset
    # one clean + one noisy per clip (shap_calculation.py:80-105)
    assert len(ts) == 2
    clean, noisy = ts
    assert clean["type"] == "clean" and np.isinf(clean["snr"])
    assert np.all(clean["noise"] == 0)
    assert noisy["type"] == "noisy" and noisy["snr"] == 2.0
    # noise = noisy - clean holds exactly
    np.testing.assert_allclose(
        noisy["audio"] - noisy["noise"], clean["audio"], atol=1e-6
    )
    # realized SNR near target
    snr = 10 * np.log10(
        np.mean(clean["audio"] ** 2) / np.mean(noisy["noise"] ** 2)
    )
    assert abs(snr - 2.0) < 0.5


def test_testset_deterministic():
    cfg = TestSetConfig(num_samples=1, snrs_db=(5.0,), min_length=800,
                        max_length=800, seed=3)
    a = create_test_set(cfg)
    b = create_test_set(cfg)
    np.testing.assert_array_equal(a[1]["audio"], b[1]["audio"])


def test_synthetic_speech_has_structure():
    sig = synthetic_speech(jax.random.key(0), 16000)
    assert sig.shape == (16000,)
    assert np.abs(sig).max() <= 0.5 + 1e-5
    # pause structure: some 250ms blocks silent, some loud
    blocks = sig[: 16000 // 4000 * 4000].reshape(-1, 4000)
    energies = (blocks**2).mean(axis=1)
    assert energies.min() < 0.01 * energies.max()


def test_run_pipeline_and_sweep(tiny_testset, tiny_config, tmp_path):
    cfg, ts = tiny_testset
    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    pcfg = PipelineConfig(
        model=tiny_config,
        explainer=ExplainerConfig(nsamples=2, draw_chunk=2, num_background=2),
        testset=cfg,
        data_dir=str(tmp_path),
    )
    store = AttributionStore(str(tmp_path))
    results = run_shap_pipeline(params, pcfg, ts, store)
    assert len(results) == 2

    # npy naming contract (shap_calculation.py:199-210)
    names = sorted(p.name for p in tmp_path.glob("*.npy"))
    assert "audio_sample_0_clean_inf.npy" in names
    assert "shap_values_sample_1_noisy_2.npy" in names

    # matrix layout [N_audio, T_frames] (visualization.py:337-344)
    phi = results[0]["shap_values"]
    n = len(ts[0]["audio"])
    assert phi.shape == (n, tiny_config.frames_for_samples(n))
    assert np.isfinite(phi).all()

    # resume: second run computes nothing new
    again = run_shap_pipeline(params, pcfg, ts, store)
    assert again == []

    # sweep over the store
    records = eta_wer_sweep(params, tiny_config, store,
                            MetricConfig(segment_ms=20.0))
    assert len(records) == 2
    for r in records:
        assert 0.0 <= r["eta_raw"] <= 1.0
        assert np.isfinite(r["wer"])


def test_bucketed_run_matches_serial_semantics(tiny_testset, tiny_config, tmp_path):
    """The batched (length-bucketed, vmapped) pipeline must reproduce the
    serial per-sample computation: same fold-key derivation and draws, equal
    up to XLA fusion-order float noise."""
    import jax.numpy as jnp

    from asr_shap.audio.normalize import zero_mean_unit_var
    from asr_shap.core.prng import fold
    from asr_shap.explain.baselines import zeros_noise_background
    from asr_shap.explain.expected_gradients import expected_gradients
    from asr_shap.models.heads import make_explained_fn

    cfg, ts = tiny_testset
    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    ecfg = ExplainerConfig(nsamples=2, draw_chunk=2, num_background=2)
    pcfg = PipelineConfig(model=tiny_config, explainer=ecfg, testset=cfg,
                          data_dir=str(tmp_path))
    results = run_shap_pipeline(params, pcfg, ts, AttributionStore(str(tmp_path)))

    # serial oracle for sample 1 (the noisy one)
    i = 1
    key = jax.random.key(pcfg.seed)
    skey = fold(key, i)
    x = zero_mean_unit_var(jnp.asarray(ts[i]["audio"]))
    f = make_explained_fn(params, tiny_config, ecfg)
    bg = zeros_noise_background(fold(skey, 0), x.shape[0], 2,
                                ecfg.background_sigma)
    expl = expected_gradients(f, x, bg, fold(skey, 1), ecfg)
    # same draws/keys; tolerance covers XLA fusion differences across batch
    # sizes (reduction order shifts at the 1e-6 level)
    np.testing.assert_allclose(
        results[i]["shap_values"], np.asarray(expl.values), rtol=1e-4, atol=1e-5
    )


def test_mesh_runs_match_unmeshed(tiny_testset, tiny_config, tmp_path):
    """Both mesh modes must match the mesh-free run: sample_batch=1 shards
    the DRAW axis (nsamples chosen as a multiple of draw_chunk*ndev so the
    effective draw count matches the unmeshed run); sample_batch=ndev shards
    the SAMPLE axis (bucket padded to the axis size, pads dropped)."""
    from jax.sharding import Mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    cfg, ts = tiny_testset
    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    ndev = len(jax.devices())
    ecfg = ExplainerConfig(nsamples=2 * ndev, draw_chunk=2, num_background=2)
    mesh = Mesh(np.array(jax.devices()), ("data",))

    def run(sub, sample_batch, use_mesh):
        pcfg = PipelineConfig(model=tiny_config, explainer=ecfg, testset=cfg,
                              data_dir=str(tmp_path / sub),
                              sample_batch=sample_batch)
        return run_shap_pipeline(params, pcfg, ts,
                                 AttributionStore(str(tmp_path / sub)),
                                 mesh=mesh if use_mesh else None)

    r_flat = run("f", 1, False)
    r_draw = run("d", 1, True)      # draw-sharded (g=1)
    r_samp = run("s", ndev, True)   # sample-sharded (g=ndev)
    for a, b, c in zip(r_draw, r_samp, r_flat):
        assert a["key"] == b["key"] == c["key"]
        np.testing.assert_allclose(a["shap_values"], c["shap_values"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(b["shap_values"], c["shap_values"],
                                   rtol=1e-4, atol=1e-5)
        assert a["transcription"] == b["transcription"] == c["transcription"]


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


def test_run_pipeline_deepshap_method(tiny_testset, tiny_config, tmp_path):
    """method="deep" routes the pipeline through the DeepSHAP dual forward
    (DeepExplainer-as-pipeline, reference test_shap_asr.py:66-67)."""
    cfg, ts = tiny_testset
    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    pcfg = PipelineConfig(
        model=tiny_config,
        explainer=ExplainerConfig(method="deep", num_background=2,
                                  aggregation="mean", remat=False),
        testset=cfg, data_dir=str(tmp_path),
    )
    results = run_shap_pipeline(params, pcfg, ts[:1], AttributionStore(str(tmp_path)))
    assert len(results) == 1
    phi = results[0]["shap_values"]
    n = len(ts[0]["audio"])
    assert phi.shape == (n, tiny_config.frames_for_samples(n))
    assert np.isfinite(phi).all()
    # deterministic (DeepExplainer has no sampling beyond the background)
    r2 = run_shap_pipeline(params, pcfg, ts[:1],
                           AttributionStore(str(tmp_path)), resume=False)
    np.testing.assert_array_equal(phi, r2[0]["shap_values"])


def test_run_pipeline_kernel_shap_method(tiny_testset, tiny_config, tmp_path):
    """method="kernel" routes the pipeline through segment-level KernelSHAP
    (shap's model-agnostic KernelExplainer family, SURVEY.md D4): same
    [N, T_frames] layout, efficiency per output frame holds by construction
    (segment values sum to f(x) - f(baseline))."""
    cfg, ts = tiny_testset
    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    pcfg = PipelineConfig(
        model=tiny_config,
        explainer=ExplainerConfig(method="kernel", nsamples=64,
                                  kernel_num_segments=8, num_background=2,
                                  aggregation="mean", remat=False),
        testset=cfg, data_dir=str(tmp_path),
    )
    results = run_shap_pipeline(params, pcfg, ts[:1], AttributionStore(str(tmp_path)))
    assert len(results) == 1
    phi = results[0]["shap_values"]
    n = len(ts[0]["audio"])
    assert phi.shape == (n, tiny_config.frames_for_samples(n))
    assert np.isfinite(phi).all()


def test_run_pipeline_lime_method(tiny_testset, tiny_config, tmp_path):
    """method="lime" routes the pipeline through the segment-level LIME
    surrogate (the reference runs LIME only in its one-clip comparison
    script, lime_shap_wav2vec2_comparison.py:75-90; here it is a full
    pipeline citizen like the three shap families): same [N, T_frames]
    layout, finite, and deterministic under the pipeline's per-sample keys."""
    cfg, ts = tiny_testset
    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    pcfg = PipelineConfig(
        model=tiny_config,
        explainer=ExplainerConfig(method="lime", lime_num_samples=64,
                                  lime_num_segments=8, num_background=2,
                                  aggregation="mean", remat=False),
        testset=cfg, data_dir=str(tmp_path),
    )
    results = run_shap_pipeline(params, pcfg, ts[:1],
                                AttributionStore(str(tmp_path)))
    assert len(results) == 1
    phi = results[0]["shap_values"]
    n = len(ts[0]["audio"])
    assert phi.shape == (n, tiny_config.frames_for_samples(n))
    assert np.isfinite(phi).all()
    r2 = run_shap_pipeline(params, pcfg, ts[:1],
                           AttributionStore(str(tmp_path)), resume=False)
    np.testing.assert_array_equal(phi, r2[0]["shap_values"])


def test_group_size_fixed_executables(tiny_testset, tiny_config, tmp_path):
    """sample_batch=2 over a 2-sample set: results identical to serial
    (sample_batch=1) and to the default batch — grouping never changes
    per-sample numerics or key derivation."""
    cfg, ts = tiny_testset
    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    ecfg = ExplainerConfig(nsamples=2, draw_chunk=2, num_background=2)

    outs = []
    for g, sub in ((1, "a"), (2, "b"), (4, "c")):
        pcfg = PipelineConfig(model=tiny_config, explainer=ecfg, testset=cfg,
                              data_dir=str(tmp_path / sub), sample_batch=g)
        outs.append(run_shap_pipeline(params, pcfg, ts,
                                      AttributionStore(str(tmp_path / sub))))
    for r1, r2, r4 in zip(*outs):
        assert r1["key"] == r2["key"] == r4["key"]
        np.testing.assert_allclose(r1["shap_values"], r2["shap_values"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(r1["shap_values"], r4["shap_values"],
                                   rtol=1e-5, atol=1e-6)
        assert r1["transcription"] == r2["transcription"] == r4["transcription"]


def test_sweep_with_custom_logits_fn(tiny_testset, tiny_config, tmp_path):
    """eta_wer_sweep accepts a different decoding model (e.g. a conformer)
    via logits_fn — the sweep machinery is model-agnostic."""
    from asr_shap.models.wav2vec2 import wav2vec2_logits
    from asr_shap.pipeline.sweep import eta_wer_sweep

    cfg, ts = tiny_testset
    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    pcfg = PipelineConfig(
        model=tiny_config,
        explainer=ExplainerConfig(nsamples=2, draw_chunk=2, num_background=2),
        testset=cfg, data_dir=str(tmp_path),
    )
    run_shap_pipeline(params, pcfg, ts[:1], AttributionStore(str(tmp_path)))

    calls = []

    def my_logits(p, c, x):
        calls.append(x.shape)
        return wav2vec2_logits(p, c, x)

    records = eta_wer_sweep(params, tiny_config, AttributionStore(str(tmp_path)),
                            MetricConfig(segment_ms=20.0), logits_fn=my_logits)
    assert len(records) == 1 and len(calls) == 1


def test_partial_bucket_resume(tiny_testset, tiny_config, tmp_path):
    """Killing mid-bucket and resuming: the second run computes exactly the
    missing samples and their results match a from-scratch run."""
    cfg, ts = tiny_testset
    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    ecfg = ExplainerConfig(nsamples=2, draw_chunk=2, num_background=2)
    pcfg = PipelineConfig(model=tiny_config, explainer=ecfg, testset=cfg,
                          data_dir=str(tmp_path / "r"), sample_batch=4)
    store = AttributionStore(str(tmp_path / "r"))

    # simulate an interrupted run: only sample 0 was persisted
    first = run_shap_pipeline(params, pcfg, ts[:1], store)
    assert [r["index"] for r in first] == [0]

    second = run_shap_pipeline(params, pcfg, ts, store)  # resume
    assert [r["index"] for r in second] == [1]

    # oracle: an uninterrupted run elsewhere
    pcfg2 = PipelineConfig(model=tiny_config, explainer=ecfg, testset=cfg,
                           data_dir=str(tmp_path / "f"), sample_batch=4)
    full = run_shap_pipeline(params, pcfg2, ts, AttributionStore(str(tmp_path / "f")))
    np.testing.assert_allclose(second[0]["shap_values"],
                               full[1]["shap_values"], rtol=1e-4, atol=1e-5)


def test_pipeline_conformer_family(tiny_testset, tmp_path):
    """The pipeline dispatches on the config type: a Wav2Vec2ConformerConfig
    runs the rel-pos conformer end-to-end (reference study R12 as a
    pipeline), for both explainer methods."""
    import dataclasses

    from asr_shap.core.config import Wav2Vec2ConformerConfig
    from asr_shap.models.w2v2_conformer import init_w2v2_conformer_params

    cfg, ts = tiny_testset
    ccfg = Wav2Vec2ConformerConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, conv_dim=(32, 32), conv_stride=(5, 2),
        conv_kernel=(10, 3), feat_proj_dim=32, conv_depthwise_kernel_size=7,
    )
    params = init_w2v2_conformer_params(jax.random.key(0), ccfg)
    n = len(ts[0]["audio"])

    for method, sub in (("grad", "g"), ("deep", "d")):
        pcfg = PipelineConfig(
            model=ccfg,
            explainer=ExplainerConfig(nsamples=2, draw_chunk=2,
                                      num_background=2, method=method,
                                      aggregation="mean", remat=False),
            testset=cfg, data_dir=str(tmp_path / sub),
        )
        res = run_shap_pipeline(params, pcfg, ts[:1],
                                AttributionStore(str(tmp_path / sub)))
        phi = res[0]["shap_values"]
        assert phi.shape == (n, ccfg.frames_for_samples(n))
        assert np.isfinite(phi).all()


def test_kmeans_background_plumbed(tiny_testset, tiny_config, tmp_path):
    """ExplainerConfig.kmeans_background summarizes the background before
    explaining (shap.kmeans, w2v2conformer.py:134-137) — for BOTH methods.
    Pinned by behavior: k == num_background is the identity (kmeans returns
    the data when k >= M), while k < num_background changes the background
    set and therefore the deterministic DeepSHAP attribution."""
    cfg, ts = tiny_testset
    params = init_wav2vec2_params(jax.random.key(0), tiny_config)

    def run(sub, **ekw):
        pcfg = PipelineConfig(
            model=tiny_config,
            explainer=ExplainerConfig(method="deep", aggregation="mean",
                                      remat=False, num_background=3, **ekw),
            testset=cfg, data_dir=str(tmp_path / sub),
        )
        return run_shap_pipeline(params, pcfg, ts[:1],
                                 AttributionStore(str(tmp_path / sub)))

    base = run("plain")[0]["shap_values"]
    identity = run("k3", kmeans_background=3)[0]["shap_values"]
    np.testing.assert_array_equal(base, identity)
    summarized = run("k2", kmeans_background=2)[0]["shap_values"]
    assert not np.array_equal(base, summarized)
    assert np.isfinite(summarized).all()


def test_sweep_batched_matches_batch1(tiny_testset, tiny_config, tmp_path):
    """The length-bucketed batched sweep must reproduce the one-sample-per-
    call results (same decode, same eta_raw) for every record field."""
    cfg, ts = tiny_testset
    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    pcfg = PipelineConfig(
        model=tiny_config,
        explainer=ExplainerConfig(nsamples=2, draw_chunk=2, num_background=2),
        testset=cfg, data_dir=str(tmp_path),
    )
    store = AttributionStore(str(tmp_path))
    run_shap_pipeline(params, pcfg, ts, store)

    mcfg = MetricConfig(segment_ms=20.0)
    serial = eta_wer_sweep(params, tiny_config, store, mcfg, batch=1)
    batched = eta_wer_sweep(params, tiny_config, store, mcfg, batch=8)
    assert len(serial) == len(batched) == 2
    for a, b in zip(serial, batched):
        assert a["hypothesis"] == b["hypothesis"]
        assert a["wer"] == b["wer"]
        np.testing.assert_allclose(a["eta_raw"], b["eta_raw"], rtol=1e-5)


def test_correlation_excludes_degenerate_clean_rows():
    """Clean rows force eta_raw == 1.0 by construction (noise == 0 makes the
    ITM all-true); the headline correlation must exclude them
    (VERDICT r2 #9)."""
    from asr_shap.pipeline.sweep import correlation, sweep_summary

    noisy = [
        {"snr": "5", "wer": 0.2, "eta_raw": 0.9},
        {"snr": "2", "wer": 0.5, "eta_raw": 0.6},
        {"snr": "1", "wer": 0.8, "eta_raw": 0.4},
    ]
    clean = [
        {"snr": "inf", "wer": 0.1, "eta_raw": 1.0},
        {"snr": "inf", "wer": 0.9, "eta_raw": 1.0},  # would pollute r
    ]
    r_noisy = correlation(noisy + clean)
    r_all = correlation(noisy + clean, include_clean=True)
    assert r_noisy == correlation(noisy)  # clean rows had no effect
    assert r_all != r_noisy

    s = sweep_summary(noisy + clean)
    assert s["n_clean"] == 2 and s["n_noisy"] == 3
    assert s["pearson_r_noisy"] == r_noisy
    assert s["per_snr"]["inf"]["mean_eta_raw"] == 1.0
    # float snr=inf (pre-store records) also counts as clean
    assert correlation([{"snr": float("inf"), "wer": 0.1, "eta_raw": 1.0}]
                       + noisy) == r_noisy


def test_group_compile_failure_falls_back_to_serial(
    tiny_testset, tiny_config, tmp_path, monkeypatch
):
    """If the grouped executable fails (compile service / HBM limits on the
    bench chip), the pipeline degrades to sample_batch=1 and still completes
    every sample (VERDICT r2 weak #2)."""
    from asr_shap.pipeline import run_shap as rs

    real_builder = rs._build_group_step
    calls = {"failed": 0}

    def flaky_builder(cfg, mesh, g):
        if g > 1:
            def boom(*a):
                calls["failed"] += 1
                raise RuntimeError("remote_compile: HTTP 500 (simulated)")

            return boom
        return real_builder(cfg, mesh, g)

    monkeypatch.setattr(rs, "_build_group_step", flaky_builder)
    cfg, ts = tiny_testset
    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    pcfg = PipelineConfig(
        model=tiny_config,
        explainer=ExplainerConfig(nsamples=2, draw_chunk=2, num_background=2),
        testset=cfg, data_dir=str(tmp_path), sample_batch=4,
    )
    results = rs.run_shap_pipeline(params, pcfg, ts,
                                   AttributionStore(str(tmp_path)))
    assert calls["failed"] == 1          # grouped call failed once
    assert len(results) == len(ts)       # ...and every sample still computed
    for r in results:
        assert np.isfinite(r["shap_values"]).all()


def test_worker_crash_recovery_restages_and_completes(
    tiny_testset, tiny_config, tmp_path, monkeypatch
):
    """Device-runtime loss (TPU worker crash: UNAVAILABLE) mid-run: the
    pipeline waits, re-stages params from its host copy, degrades to
    sample_batch=1, and completes every sample in-process — both round-3
    study runs on the bench chip died exactly this way."""
    from asr_shap.pipeline import run_shap as rs

    real_builder = rs._build_group_step
    state = {"crashed": 0, "restaged_params": []}

    def flaky_builder(cfg, mesh, g):
        real = real_builder(cfg, mesh, g)
        if g > 1 and not state["crashed"]:
            def crash(*a):
                state["crashed"] += 1
                import jax

                # the real device-loss type: a plain RuntimeError must NOT
                # enter the crash-recovery path (see _is_device_unavailable)
                raise jax.errors.JaxRuntimeError(
                    "UNAVAILABLE: TPU worker process crashed or restarted "
                    "(simulated)"
                )

            return crash

        def wrapped(params, xs, ks):
            state["restaged_params"].append(params)
            return real(params, xs, ks)

        return wrapped

    monkeypatch.setattr(rs, "_build_group_step", flaky_builder)
    cfg, ts = tiny_testset
    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    pcfg = PipelineConfig(
        model=tiny_config,
        explainer=ExplainerConfig(nsamples=2, draw_chunk=2, num_background=2),
        testset=cfg, data_dir=str(tmp_path), sample_batch=4,
        crash_retries=2, crash_backoff_s=0.0,
    )
    results = rs.run_shap_pipeline(params, pcfg, ts,
                                   AttributionStore(str(tmp_path)))
    assert state["crashed"] == 1
    assert len(results) == len(ts)
    for r in results:
        assert np.isfinite(r["shap_values"]).all()


def test_worker_crash_disabled_raises(
    tiny_testset, tiny_config, tmp_path, monkeypatch
):
    """crash_retries=0 keeps the old behavior for UNAVAILABLE at g==1:
    the error propagates (and no host param copy is kept)."""
    from asr_shap.pipeline import run_shap as rs

    def builder(cfg, mesh, g):
        def crash(*a):
            raise RuntimeError("UNAVAILABLE: worker crashed (simulated)")

        return crash

    monkeypatch.setattr(rs, "_build_group_step", builder)
    cfg, ts = tiny_testset
    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    pcfg = PipelineConfig(
        model=tiny_config,
        explainer=ExplainerConfig(nsamples=2, num_background=2),
        testset=cfg, data_dir=str(tmp_path), sample_batch=1,
        crash_retries=0,
    )
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        rs.run_shap_pipeline(params, pcfg, ts, AttributionStore(str(tmp_path)))


def test_auto_group_size_policy():
    """sample_batch=0 adapts the group to clip length AND draw budget:
    grouping only amortizes per-sample fixed costs, which vanish at large
    nsamples (r4_group_len: g=1 beats g=2 at nsamples=32), and long-clip
    grouped programs destabilize the worker (r3 study crashes)."""
    from asr_shap.core.config import ExplainerConfig, PipelineConfig
    from asr_shap.pipeline.run_shap import _auto_group_size, _group_size

    assert _auto_group_size(48_000, nsamples=8) == 2
    assert _auto_group_size(99_999, nsamples=16) == 2
    assert _auto_group_size(48_000, nsamples=32) == 1
    assert _auto_group_size(48_000, nsamples=200) == 1
    assert _auto_group_size(100_000, nsamples=8) == 1
    assert _auto_group_size(118_400, nsamples=200) == 1

    cfg = PipelineConfig(explainer=ExplainerConfig(nsamples=8))
    assert _group_size(cfg, None, 48_000) == 2
    assert _group_size(cfg, None, 120_000) == 1
    cfg200 = PipelineConfig(explainer=ExplainerConfig(nsamples=200))
    assert _group_size(cfg200, None, 48_000) == 1
    forced = PipelineConfig(sample_batch=4)
    assert _group_size(forced, None, 120_000) == 4


def test_device_unavailable_classification():
    """Only the backend's device-loss exception type enters the crash-
    recovery path; arbitrary exceptions carrying the word UNAVAILABLE (a
    gRPC hiccup surfacing as ValueError, a plain RuntimeError from user
    code) must be classified False so they surface immediately instead of
    burning minutes of backoff (ADVICE r3)."""
    import jax

    from asr_shap.pipeline.run_shap import _is_device_unavailable

    assert _is_device_unavailable(
        jax.errors.JaxRuntimeError("UNAVAILABLE: TPU worker crashed")
    )
    assert _is_device_unavailable(
        jax.errors.JaxRuntimeError("device crashed or restarted")
    )
    assert not _is_device_unavailable(
        jax.errors.JaxRuntimeError("RESOURCE_EXHAUSTED: out of memory")
    )
    assert not _is_device_unavailable(ValueError("UNAVAILABLE: relay 500"))
    assert not _is_device_unavailable(RuntimeError("UNAVAILABLE: not jax"))


def test_worker_crash_recovery_retries_failed_restaging(
    tiny_testset, tiny_config, tmp_path, monkeypatch
):
    """If the worker is STILL down when recovery re-stages params, the
    device_put's own UNAVAILABLE must consume further recovery attempts
    instead of escaping the run (the r4 conformer study died this way:
    one backoff, then the re-staging raise ended the process)."""
    import jax as jax_mod

    from asr_shap.pipeline import run_shap as rs

    real_builder = rs._build_group_step
    real_device_put = jax_mod.device_put
    state = {"crashed": 0, "put_failures": 0}

    def flaky_builder(cfg, mesh, g):
        real = real_builder(cfg, mesh, g)
        if g > 1 and not state["crashed"]:
            def crash(*a):
                state["crashed"] += 1
                raise jax_mod.errors.JaxRuntimeError(
                    "UNAVAILABLE: TPU worker process crashed (simulated)"
                )

            return crash
        return real

    def flaky_device_put(x, *a, **kw):
        # fail the first re-staging attempt (worker still down), succeed after
        if state["crashed"] and state["put_failures"] < 1:
            state["put_failures"] += 1
            raise jax_mod.errors.JaxRuntimeError(
                "UNAVAILABLE: TPU worker process crashed (still down)"
            )
        return real_device_put(x, *a, **kw)

    monkeypatch.setattr(rs, "_build_group_step", flaky_builder)
    monkeypatch.setattr(jax_mod, "device_put", flaky_device_put)
    cfg, ts = tiny_testset
    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    pcfg = PipelineConfig(
        model=tiny_config,
        explainer=ExplainerConfig(nsamples=2, draw_chunk=2, num_background=2),
        testset=cfg, data_dir=str(tmp_path), sample_batch=4,
        crash_retries=3, crash_backoff_s=0.0,
    )
    results = rs.run_shap_pipeline(params, pcfg, ts,
                                   AttributionStore(str(tmp_path)))
    assert state["crashed"] == 1 and state["put_failures"] == 1
    assert len(results) == len(ts)
    for r in results:
        assert np.isfinite(r["shap_values"]).all()


def test_make_explained_fn_dispatches_conformer(tiny_config):
    """make_explained_fn must select the forward from the config type — a
    ConformerConfig silently running the wav2vec2 forward was a latent API
    bug for direct library users (the pipeline built its own fn)."""
    import jax.numpy as jnp

    from asr_shap.core.config import ExplainerConfig, Wav2Vec2ConformerConfig
    from asr_shap.models.heads import make_explained_fn
    from asr_shap.models.w2v2_conformer import init_w2v2_conformer_params

    ccfg = Wav2Vec2ConformerConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, conv_dim=(32, 32), conv_stride=(5, 2),
        conv_kernel=(10, 3), feat_proj_dim=32, conv_depthwise_kernel_size=7,
    )
    params = init_w2v2_conformer_params(jax.random.key(0), ccfg)
    f = make_explained_fn(params, ccfg, ExplainerConfig(remat=False))
    out = f(jnp.zeros(1600))
    assert out.shape == (ccfg.frames_for_samples(1600),)
    assert np.isfinite(np.asarray(out)).all()


def test_host_draw_chunk_pipeline(tiny_testset, tiny_config, tmp_path):
    """host_draw_chunk splits the draw loop over separate bounded device
    calls (the remedy for execution-deadline worker kills on long single
    executions). The chunked run must be deterministic, finite, produce the
    reference layout, and make ceil(nsamples/chunk) chunk calls."""
    from asr_shap.pipeline import run_shap as rs

    cfg, ts = tiny_testset
    params = init_wav2vec2_params(jax.random.key(0), tiny_config)

    def run(sub, hdc):
        pcfg = PipelineConfig(
            model=tiny_config,
            explainer=ExplainerConfig(nsamples=4, draw_chunk=2,
                                      num_background=2, host_draw_chunk=hdc),
            testset=cfg, data_dir=str(tmp_path / sub),
        )
        return rs.run_shap_pipeline(params, pcfg, ts,
                                    AttributionStore(str(tmp_path / sub)))

    r1 = run("a", 2)
    r2 = run("b", 2)
    n = len(ts[0]["audio"])
    for a, b in zip(r1, r2):
        assert a["shap_values"].shape == (n, tiny_config.frames_for_samples(n))
        assert np.isfinite(a["shap_values"]).all()
        np.testing.assert_array_equal(a["shap_values"], b["shap_values"])
    # same estimator as the monolithic path: mean over draws of the same
    # magnitude — compare against an unchunked run loosely (different draw
    # keys, same distribution)
    r0 = run("c", 0)
    for a, c in zip(r1, r0):
        assert a["transcription"] == c["transcription"]
        sa = np.abs(a["shap_values"]).sum()
        sc = np.abs(c["shap_values"]).sum()
        assert 0.2 < sa / max(sc, 1e-9) < 5.0


def test_host_draw_chunk_call_count(tiny_testset, tiny_config, tmp_path,
                                    monkeypatch):
    """ceil(nsamples / host_draw_chunk) device calls per sample."""
    from asr_shap.pipeline import run_shap as rs

    cfg, ts = tiny_testset
    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    calls = {"n": 0}
    real_eg = rs.expected_gradients

    def counting_eg(*a, **kw):
        calls["n"] += 1
        return real_eg(*a, **kw)

    monkeypatch.setattr(rs, "expected_gradients", counting_eg)
    # run the chunk step eagerly so the per-chunk Python entry is countable
    # (under jit the body traces once and executions bypass Python)
    monkeypatch.setattr(jax, "jit", lambda f, **kw: f)
    pcfg = PipelineConfig(
        model=tiny_config,
        explainer=ExplainerConfig(nsamples=5, draw_chunk=1,
                                  num_background=2, host_draw_chunk=2),
        testset=cfg, data_dir=str(tmp_path),
    )
    rs.run_shap_pipeline(params, pcfg, ts, AttributionStore(str(tmp_path)))
    # ceil(5/2)=3 chunks per sample x 2 samples in the tiny test set
    assert calls["n"] == 6
