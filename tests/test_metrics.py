"""Metric tests: WER golden cases, eta_raw against a numpy oracle of the
reference formulas (calculate_metric.py:74-149 / nraw_vs_wer.py:20-62)."""

import numpy as np
import jax.numpy as jnp
import pytest

from asr_shap.core.config import MetricConfig
from asr_shap.metrics import eta_raw, wer, mean_max_softmax_confidence


# ---------------------------------------------------------------------- WER

def test_wer_identical():
    assert wer("the cat sat", "the cat sat") == 0.0


def test_wer_substitution():
    assert wer("the cat sat", "the dog sat") == pytest.approx(1 / 3)


def test_wer_insert_delete():
    assert wer("a b c d", "a b d") == pytest.approx(1 / 4)      # 1 deletion
    assert wer("a b d", "a b c d") == pytest.approx(1 / 3)      # 1 insertion


def test_wer_whitespace_normalization():
    # jiwer default transform collapses whitespace and strips
    assert wer("  hello   world ", "hello world") == 0.0


def test_wer_all_wrong():
    assert wer("x y", "a b c") >= 1.0


# ------------------------------------------------------------------ eta_raw

def _eta_oracle(clean, noise, shap, sr, segment_ms, percentile, half):
    """Independent numpy restatement of the reference metric."""
    seg = int(sr * segment_ms / 1000.0)
    min_len = min(len(clean), len(noise), shap.shape[0])
    ns = min_len // seg
    tr = ns * seg
    ec = (clean[:tr].reshape(ns, seg) ** 2).sum(1)
    eu = (noise[:tr].reshape(ns, seg) ** 2).sum(1)
    itm = ec > (0.5 * eu if half else eu)
    phi = np.abs(shap[:tr]).sum(1).reshape(ns, seg).mean(1)
    tau = np.percentile(phi, percentile)
    rel = phi >= tau  # tie-aware form; == reference's > for continuous phi
    if rel.sum() == 0:
        return 0.0
    return (rel & itm).sum() / rel.sum()


@pytest.mark.parametrize("variant", ["strict", "half"])
@pytest.mark.parametrize("segment_ms", [0.0625, 20.0])
def test_eta_raw_matches_oracle(rng, variant, segment_ms):
    n, t = 16000, 49
    clean = rng.standard_normal(n).astype(np.float32)
    clean[: n // 2] *= 4.0  # speech-dominant first half
    noise = rng.standard_normal(n).astype(np.float32)
    noise[n // 2 :] *= 3.0  # noise-dominant second half
    shap = rng.standard_normal((n, t)).astype(np.float32)

    cfg = MetricConfig(segment_ms=segment_ms, percentile=99.0, itm_variant=variant)
    ours = float(eta_raw(jnp.asarray(clean), jnp.asarray(noise), jnp.asarray(shap), cfg))
    ref = _eta_oracle(clean, noise, shap, 16000, segment_ms, 99.0, variant == "half")
    assert ours == pytest.approx(ref, abs=1e-6)


def test_eta_raw_perfect_attribution(rng):
    """Attribution mass entirely on speech-dominated segments -> eta_raw = 1.
    This is the synthetic-SNR correctness oracle (SURVEY.md section 4)."""
    n = 16000
    clean = np.zeros(n, np.float32)
    clean[:8000] = rng.standard_normal(8000).astype(np.float32) * 2
    noise = rng.standard_normal(n).astype(np.float32) * 0.5
    shap = np.zeros((n, 10), np.float32)
    shap[:8000] = np.abs(rng.standard_normal((8000, 10))).astype(np.float32)
    cfg = MetricConfig(segment_ms=20.0, percentile=90.0, itm_variant="strict")
    val = float(eta_raw(jnp.asarray(clean), jnp.asarray(noise), jnp.asarray(shap), cfg))
    assert val == 1.0


def test_eta_raw_anti_attribution(rng):
    """Attribution entirely on noise-dominated segments -> eta_raw = 0."""
    n = 16000
    clean = np.zeros(n, np.float32)
    clean[:8000] = rng.standard_normal(8000).astype(np.float32) * 2
    noise = rng.standard_normal(n).astype(np.float32) * 0.5
    shap = np.zeros((n, 10), np.float32)
    shap[8000:] = np.abs(rng.standard_normal((8000, 10))).astype(np.float32)
    cfg = MetricConfig(segment_ms=20.0, percentile=90.0, itm_variant="strict")
    val = float(eta_raw(jnp.asarray(clean), jnp.asarray(noise), jnp.asarray(shap), cfg))
    assert val == 0.0


def test_eta_raw_segment_constant_attribution_not_degenerate(rng):
    """Piecewise-constant attributions (segment-level explainers: KernelSHAP
    and LIME broadcast one value per coalition segment) must still be graded:
    when the top tied block spans more than the top percentile, the strict
    reference comparison would select an empty relevant set and force
    eta_raw to 0; the tie-aware >= grades the whole top block instead."""
    n, s = 16000, 16  # 16 coalition segments of 1000 samples (6.25% each)
    clean = np.zeros(n, np.float32)
    clean[:8000] = rng.standard_normal(8000).astype(np.float32) * 2
    noise = np.zeros(n, np.float32)
    noise[8000:] = rng.standard_normal(8000).astype(np.float32) * 2
    seg_vals = np.zeros(s, np.float32)
    seg_vals[2] = 5.0  # all attribution mass on one speech-side segment
    phi = np.repeat(seg_vals, n // s).astype(np.float32)  # [N], tie blocks
    cfg = MetricConfig(segment_ms=0.0625, percentile=99.0, itm_variant="strict")
    val = float(eta_raw(jnp.asarray(clean), jnp.asarray(noise),
                        jnp.asarray(phi), cfg))
    assert val == 1.0  # top block is pure speech; strict > would give 0.0

    seg_vals_bad = np.zeros(s, np.float32)
    seg_vals_bad[12] = 5.0  # mass on a noise-side segment
    phi_bad = np.repeat(seg_vals_bad, n // s).astype(np.float32)
    val_bad = float(eta_raw(jnp.asarray(clean), jnp.asarray(noise),
                            jnp.asarray(phi_bad), cfg))
    assert val_bad == 0.0


# --------------------------------------------------------------- confidence

def test_confidence_range_and_onehot(rng):
    logits = jnp.asarray(rng.standard_normal((2, 49, 32)).astype(np.float32))
    c = np.asarray(mean_max_softmax_confidence(logits))
    assert c.shape == (2,)
    assert np.all((c > 1 / 32) & (c <= 1.0))
    # near-deterministic logits -> confidence ~ 1
    sharp = jnp.zeros((1, 10, 32)).at[:, :, 3].set(50.0)
    assert float(mean_max_softmax_confidence(sharp)[0]) > 0.999


def test_itm_oracle_end_to_end():
    """The controlled-SNR oracle (SURVEY.md section 4): for a model that
    demonstrably attends to signal energy, expected-gradients attributions
    on a speech+noise mixture must concentrate on speech-dominated segments,
    i.e. eta_raw must be high. This exercises the full chain — test-set
    construction, explainer, attribution layout, ITM metric — with an
    analytically energy-sensitive 'model' (windowed energy head), not a
    random-init network whose saliency carries no guarantee."""
    import jax
    import jax.numpy as jnp

    from asr_shap.core.config import ExplainerConfig, MetricConfig
    from asr_shap.explain.baselines import zeros_noise_background
    from asr_shap.explain.expected_gradients import expected_gradients

    sr = 16_000
    n = 8_000
    t = np.arange(n) / sr
    # speech-like: loud tone bursts separated by silence
    env = (np.sin(2 * np.pi * 2.0 * t) > 0).astype(np.float32)
    clean = (env * np.sin(2 * np.pi * 220 * t)).astype(np.float32) * 0.5
    rng_ = np.random.default_rng(0)
    noise = rng_.standard_normal(n).astype(np.float32) * 0.02  # quiet floor
    mixed = clean + noise

    frames = 25
    win = n // frames

    def f(x):
        # per-frame energy head: d f_j / d x_n = 2 x_n on frame j's support
        return jnp.sum(x[: frames * win].reshape(frames, win) ** 2, axis=1)

    ecfg = ExplainerConfig(nsamples=16, draw_chunk=4, num_background=3,
                           remat=False)
    bg = zeros_noise_background(jax.random.key(1), n, 3, 0.001)
    expl = expected_gradients(f, jnp.asarray(mixed), bg, jax.random.key(2), ecfg)
    phi = np.asarray(expl.values)  # [N, frames]
    assert phi.shape == (n, frames)

    score = eta_raw(jnp.asarray(clean), jnp.asarray(noise), jnp.asarray(phi),
                    MetricConfig(segment_ms=20.0, percentile=80.0,
                                 itm_variant="strict"))
    # energy attributions land where the tone is -> top segments are
    # speech-dominated
    assert float(score) > 0.9

    # sanity: explaining the *noise-only* signal gives no such preference
    expl0 = expected_gradients(f, jnp.asarray(noise), bg, jax.random.key(2), ecfg)
    score0 = eta_raw(jnp.asarray(clean) * 0 + 1e-6, jnp.asarray(noise),
                     jnp.asarray(np.asarray(expl0.values)),
                     MetricConfig(segment_ms=20.0, percentile=80.0,
                                  itm_variant="strict"))
    assert float(score0) < float(score)


def test_batch_wer_matches_scalar():
    from asr_shap.metrics.wer import batch_wer, wer

    refs = ["the cat sat", "hello world", "a b c d", "one two"]
    hyps = ["the cat sat", "hello word", "a x c", "three one two four"]
    batched = batch_wer(refs, hyps)
    for r, h, bw in zip(refs, hyps, batched):
        assert bw == wer(r, h)


def test_batch_wer_empty_reference_is_nan():
    import math

    from asr_shap.metrics.wer import batch_wer

    out = batch_wer(["", "ok"], ["anything", "ok"])
    assert math.isnan(out[0]) and out[1] == 0.0


def test_batch_wer_length_mismatch():
    import pytest as _pytest

    from asr_shap.metrics.wer import batch_wer

    with _pytest.raises(ValueError):
        batch_wer(["a"], ["a", "b"])


def test_committed_study_artifact_is_self_consistent():
    """Guard the committed round-3 study (artifacts/study_r3/) against code
    drift: recomputing the summary from records.jsonl with the CURRENT
    sweep_summary must reproduce summary.json (correlations, per-SNR means,
    clean/noisy split)."""
    import json
    import os

    from asr_shap.pipeline.sweep import sweep_summary

    base = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "study_r3")
    rec_path = os.path.join(base, "records.jsonl")
    sum_path = os.path.join(base, "summary.json")
    if not (os.path.exists(rec_path) and os.path.exists(sum_path)):
        import pytest

        pytest.skip("study artifacts not present")
    records = [json.loads(l) for l in open(rec_path)]
    committed = json.load(open(sum_path))

    assert len(records) == 80
    s = sweep_summary(records)
    assert abs(s["pearson_r_noisy"] - committed["pearson_r_noisy"]) < 1e-9
    assert abs(s["pearson_r_all"] - committed["pearson_r_all"]) < 1e-9
    assert s["n_noisy"] == committed["n_noisy"] == 60
    assert s["n_clean"] == committed["n_clean"] == 20
    for snr, stats in committed["per_snr"].items():
        assert abs(s["per_snr"][snr]["mean_wer"] - stats["mean_wer"]) < 1e-9
        assert abs(s["per_snr"][snr]["mean_eta_raw"]
                   - stats["mean_eta_raw"]) < 1e-9
    # the scientific shape itself: eta_raw falls monotonically with SNR
    eta = [s["per_snr"][k]["mean_eta_raw"] for k in ("inf", "5", "2", "1")]
    assert eta[0] > eta[1] > eta[2] > eta[3]


def test_committed_study_r4_artifact_is_self_consistent():
    """Guard the committed round-4 study (artifacts/study_r4/): recomputing
    the summary from records.jsonl with the CURRENT sweep_summary must
    reproduce summary.json, including the round-4 statistical additions
    (Spearman rho, permutation p, bootstrap CI — all seeded, so exact)."""
    import json
    import os

    from asr_shap.pipeline.sweep import sweep_summary

    base = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "study_r4")
    rec_path = os.path.join(base, "records.jsonl")
    sum_path = os.path.join(base, "summary.json")
    if not (os.path.exists(rec_path) and os.path.exists(sum_path)):
        import pytest

        pytest.skip("study artifacts not present")
    records = [json.loads(l) for l in open(rec_path)]
    committed = json.load(open(sum_path))

    assert len(records) == 140
    s = sweep_summary(records)
    assert abs(s["pearson_r_noisy"] - committed["pearson_r_noisy"]) < 1e-9
    assert abs(s["spearman_rho_noisy"]
               - committed["spearman_rho_noisy"]) < 1e-9
    assert abs(s["pearson_p_noisy"] - committed["pearson_p_noisy"]) < 1e-12
    for got, want in zip(s["pearson_ci95_noisy"],
                         committed["pearson_ci95_noisy"]):
        assert abs(got - want) < 1e-9
    assert s["n_noisy"] == committed["n_noisy"] == 120
    assert s["n_clean"] == committed["n_clean"] == 20
    # the round-4 point: a majority of noisy rows have WER > 0, and the
    # CI excludes 0 (the r3 weakness this study was rerun to close)
    assert s["n_noisy_wer_gt0"] == committed["n_noisy_wer_gt0"] == 67
    assert committed["pearson_ci95_noisy"][1] < 0
    assert committed["spearman_ci95_noisy"][1] < 0
    for snr, stats in committed["per_snr"].items():
        assert abs(s["per_snr"][snr]["mean_wer"] - stats["mean_wer"]) < 1e-9
        assert abs(s["per_snr"][snr]["mean_eta_raw"]
                   - stats["mean_eta_raw"]) < 1e-9
    # scientific shape: both axes monotone across all seven SNR levels
    order = ("inf", "5", "2", "1", "0", "-2", "-5")
    eta = [s["per_snr"][k]["mean_eta_raw"] for k in order]
    wer = [s["per_snr"][k]["mean_wer"] for k in order]
    assert all(a > b for a, b in zip(eta, eta[1:]))
    assert all(a <= b for a, b in zip(wer, wer[1:]))


# ----------------------------------------------------- correlation statistics

def test_avg_ranks_ties():
    from asr_shap.pipeline.sweep import _avg_ranks

    # [0, 0, 0, 1, 2]: the three zeros share rank (1+2+3)/3 = 2
    np.testing.assert_allclose(
        _avg_ranks(np.array([0.0, 0.0, 0.0, 1.0, 2.0])),
        [2.0, 2.0, 2.0, 4.0, 5.0],
    )
    # unsorted input with a two-way tie
    np.testing.assert_allclose(
        _avg_ranks(np.array([3.0, 1.0, 3.0, 2.0])),
        [3.5, 1.0, 3.5, 2.0],
    )


def test_avg_ranks_matches_scipy():
    scipy_stats = pytest.importorskip("scipy.stats")
    from asr_shap.pipeline.sweep import _avg_ranks

    rng = np.random.default_rng(0)
    a = np.round(rng.normal(size=200), 1)  # rounding forces ties
    np.testing.assert_allclose(_avg_ranks(a), scipy_stats.rankdata(a))


def test_correlation_stats_signal_and_null():
    from asr_shap.pipeline.sweep import correlation_stats

    rng = np.random.default_rng(1)
    n = 60
    # correlated pair with zero-inflated w (the sweep's WER shape)
    w = np.maximum(0.0, rng.normal(0.1, 0.15, n))
    e = 1.0 - 0.8 * w + 0.05 * rng.normal(size=n)
    s = correlation_stats(w, e, n_boot=500, n_perm=2000, seed=0)
    assert s["pearson_r"] < -0.5 and s["spearman_rho"] < -0.4
    assert s["pearson_p"] < 0.01 and s["spearman_p"] < 0.01
    lo, hi = s["pearson_ci95"]
    assert lo <= s["pearson_r"] <= hi and hi < 0  # interval excludes 0

    # independent pair: p should be large, CI should straddle 0
    e0 = rng.normal(size=n)
    s0 = correlation_stats(w, e0, n_boot=500, n_perm=2000, seed=0)
    assert s0["pearson_p"] > 0.05
    lo0, hi0 = s0["pearson_ci95"]
    assert lo0 < 0 < hi0


def test_correlation_stats_matches_scipy_spearman():
    scipy_stats = pytest.importorskip("scipy.stats")
    from asr_shap.pipeline.sweep import correlation_stats

    rng = np.random.default_rng(2)
    w = np.maximum(0.0, rng.normal(0.05, 0.1, 80))  # heavy ties at 0
    e = rng.normal(size=80)
    s = correlation_stats(w, e, n_boot=10, n_perm=10, seed=0)
    rho, _ = scipy_stats.spearmanr(w, e)
    assert s["spearman_rho"] == pytest.approx(rho, abs=1e-12)


def test_correlation_stats_determinism_and_degenerate():
    from asr_shap.pipeline.sweep import correlation_stats

    rng = np.random.default_rng(3)
    w = rng.normal(size=30)
    e = rng.normal(size=30)
    a = correlation_stats(w, e, n_boot=200, n_perm=200, seed=7)
    b = correlation_stats(w, e, n_boot=200, n_perm=200, seed=7)
    assert a == b  # fully seeded
    # constant axis -> no statistics, no crash
    d = correlation_stats(np.zeros(30), e)
    assert d["pearson_r"] is None and d["spearman_rho"] is None


def test_sweep_summary_carries_stats():
    from asr_shap.pipeline.sweep import sweep_summary

    rng = np.random.default_rng(4)
    records = []
    for i in range(40):
        wer_val = float(max(0.0, rng.normal(0.1, 0.1)))
        records.append({"snr": 1.0, "wer": wer_val,
                        "eta_raw": 0.8 - 0.5 * wer_val})
    records.append({"snr": "inf", "wer": 0.0, "eta_raw": 1.0})
    s = sweep_summary(records, n_boot=200, n_perm=500, seed=0)
    for k in ("spearman_rho_noisy", "pearson_p_noisy", "spearman_p_noisy",
              "pearson_ci95_noisy", "spearman_ci95_noisy", "n_noisy_wer_gt0"):
        assert k in s, k
    assert s["n_noisy"] == 40 and s["n_clean"] == 1
    assert s["n_noisy_wer_gt0"] == sum(r["wer"] > 0 for r in records[:-1])


def test_committed_noise_family_study_is_self_consistent():
    """Guard the committed round-4 noise-family study
    (artifacts/study_r4_noise/): recomputing each summary from its records
    with the CURRENT sweep_summary must reproduce the committed numbers, and
    the scientific claims in its README (monotone per-SNR eta_raw, CIs
    excluding 0) must hold from the records alone."""
    import json
    import os

    from asr_shap.pipeline.sweep import sweep_summary

    base = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "study_r4_noise")
    for kind in ("pink", "babble"):
        rec_path = os.path.join(base, f"records_{kind}.jsonl")
        sum_path = os.path.join(base, f"summary_{kind}.json")
        if not (os.path.exists(rec_path) and os.path.exists(sum_path)):
            import pytest

            pytest.skip("noise-family study artifacts not present")
        records = [json.loads(l) for l in open(rec_path)]
        committed = json.load(open(sum_path))
        assert len(records) == 40
        s = sweep_summary(records)
        assert abs(s["pearson_r_noisy"] - committed["pearson_r_noisy"]) < 1e-9
        assert abs(s["spearman_rho_noisy"]
                   - committed["spearman_rho_noisy"]) < 1e-9
        for got, want in zip(s["spearman_ci95_noisy"],
                             committed["spearman_ci95_noisy"]):
            assert abs(got - want) < 1e-9
        assert s["n_noisy"] == committed["n_noisy"] == 30
        # both families: eta_raw strictly monotone in SNR, CI excludes 0
        order = ("inf", "5", "1", "-2")
        eta = [s["per_snr"][k]["mean_eta_raw"] for k in order]
        wer = [s["per_snr"][k]["mean_wer"] for k in order]
        assert all(a > b for a, b in zip(eta, eta[1:]))
        assert all(a <= b for a, b in zip(wer, wer[1:]))
        assert committed["pearson_ci95_noisy"][1] < 0
        assert committed["spearman_ci95_noisy"][1] < 0
    # the full-protocol pink replication: 7 SNR levels, every noisy row
    # WER>0, correlation at white-noise-headline strength
    full_rec = os.path.join(base, "records_pink_full.jsonl")
    full_sum = os.path.join(base, "summary_pink_full.json")
    if os.path.exists(full_rec) and os.path.exists(full_sum):
        records = [json.loads(l) for l in open(full_rec)]
        committed = json.load(open(full_sum))
        assert len(records) == 70
        s = sweep_summary(records)
        assert abs(s["spearman_rho_noisy"]
                   - committed["spearman_rho_noisy"]) < 1e-9
        assert s["n_noisy"] == committed["n_noisy"] == 60
        assert s["n_noisy_wer_gt0"] == 60
        assert committed["spearman_ci95_noisy"][1] < 0
        order = ("inf", "5", "2", "1", "0", "-2", "-5")
        eta = [s["per_snr"][k]["mean_eta_raw"] for k in order]
        assert all(a > b for a, b in zip(eta, eta[1:]))
    # the high-SNR babble extension documents the metric's boundary: WER
    # has spread but the speech-dominance correlation legitimately vanishes
    # (CI spans 0) — pin that the records still reproduce the summary
    hi_rec = os.path.join(base, "records_babble_hi.jsonl")
    hi_sum = os.path.join(base, "summary_babble_hi.json")
    if os.path.exists(hi_rec) and os.path.exists(hi_sum):
        records = [json.loads(l) for l in open(hi_rec)]
        committed = json.load(open(hi_sum))
        assert len(records) == 30
        s = sweep_summary(records)
        assert abs(s["spearman_rho_noisy"]
                   - committed["spearman_rho_noisy"]) < 1e-9
        assert committed["spearman_ci95_noisy"][0] < 0
        assert committed["spearman_ci95_noisy"][1] > 0
        wer15 = s["per_snr"]["15"]["mean_wer"]
        wer10 = s["per_snr"]["10"]["mean_wer"]
        assert 0 < wer15 < wer10  # real WER spread, unlike 5/1/-2 babble


def test_committed_deep_study_is_self_consistent():
    """Guard the committed round-4 DeepSHAP study (artifacts/study_r4_deep/):
    the reference-scale (>=100k samples) deep protocol whose summary must be
    reproducible from its records with the CURRENT sweep_summary, with
    monotone per-SNR eta_raw and a CI excluding 0."""
    import json
    import os

    from asr_shap.pipeline.sweep import sweep_summary

    base = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "study_r4_deep")
    rec_path = os.path.join(base, "records.jsonl")
    sum_path = os.path.join(base, "summary.json")
    if not (os.path.exists(rec_path) and os.path.exists(sum_path)):
        import pytest

        pytest.skip("deep study artifacts not present")
    records = [json.loads(l) for l in open(rec_path)]
    committed = json.load(open(sum_path))
    assert len(records) == 70
    s = sweep_summary(records)
    assert abs(s["pearson_r_noisy"] - committed["pearson_r_noisy"]) < 1e-9
    assert abs(s["spearman_rho_noisy"]
               - committed["spearman_rho_noisy"]) < 1e-9
    for got, want in zip(s["spearman_ci95_noisy"],
                         committed["spearman_ci95_noisy"]):
        assert abs(got - want) < 1e-9
    assert s["n_noisy"] == committed["n_noisy"] == 60
    assert committed["spearman_ci95_noisy"][1] < 0
    order = ("inf", "5", "2", "1", "0", "-2", "-5")
    eta = [s["per_snr"][k]["mean_eta_raw"] for k in order]
    wer = [s["per_snr"][k]["mean_wer"] for k in order]
    assert all(a > b for a, b in zip(eta, eta[1:]))
    assert all(a <= b for a, b in zip(wer, wer[1:]))


def test_committed_kernel_study_is_self_consistent():
    """Guard the committed round-5 KernelSHAP study
    (artifacts/study_r5_kernel/): the gradient-free, reference-scale
    replication whose summary must be reproducible from its records with
    the CURRENT sweep_summary, with a CI excluding 0. (Per-SNR eta_raw is
    NOT strictly monotone for this coarse 64-segment explainer — the 1/0 dB
    swap is documented in its README — so only the endpoints are pinned.)"""
    import json
    import os

    from asr_shap.pipeline.sweep import sweep_summary

    base = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "study_r5_kernel")
    rec_path = os.path.join(base, "records.jsonl")
    sum_path = os.path.join(base, "summary.json")
    if not (os.path.exists(rec_path) and os.path.exists(sum_path)):
        import pytest

        pytest.skip("kernel study artifacts not present")
    records = [json.loads(l) for l in open(rec_path)]
    committed = json.load(open(sum_path))
    assert len(records) == 70
    s = sweep_summary(records)
    assert abs(s["pearson_r_noisy"] - committed["pearson_r_noisy"]) < 1e-9
    assert abs(s["spearman_rho_noisy"]
               - committed["spearman_rho_noisy"]) < 1e-9
    for got, want in zip(s["spearman_ci95_noisy"],
                         committed["spearman_ci95_noisy"]):
        assert abs(got - want) < 1e-9
    assert s["n_noisy"] == committed["n_noisy"] == 60
    assert committed["spearman_ci95_noisy"][1] < 0
    per = s["per_snr"]
    assert per["inf"]["mean_eta_raw"] > 0.99
    assert (per["5"]["mean_eta_raw"] > per["2"]["mean_eta_raw"]
            > per["-5"]["mean_eta_raw"])
    wer = [per[k]["mean_wer"] for k in ("inf", "5", "2", "1", "0", "-2", "-5")]
    assert all(a <= b for a, b in zip(wer, wer[1:]))


def test_avg_ranks_rows_matches_scalar_version():
    """The vectorized row-wise rank kernel used by the bootstrap CI must
    agree exactly with the scalar _avg_ranks on every row, including heavy
    ties (the WER axis is mostly zeros)."""
    from asr_shap.pipeline.sweep import _avg_ranks, _avg_ranks_rows

    rng = np.random.default_rng(7)
    x = np.where(rng.random((50, 37)) < 0.5, 0.0,
                 np.round(rng.random((50, 37)) * 5) / 5)
    got = _avg_ranks_rows(x)
    for i in range(x.shape[0]):
        np.testing.assert_array_equal(got[i], _avg_ranks(x[i]))


def test_committed_medium_study_is_self_consistent():
    """Guard the committed round-4 model-scale study
    (artifacts/study_r4_medium/): the 2.1M-param framework-trained model's
    summary must be reproducible from its records, with monotone per-SNR
    eta_raw and a CI excluding 0."""
    import json
    import os

    from asr_shap.pipeline.sweep import sweep_summary

    base = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "study_r4_medium")
    rec_path = os.path.join(base, "records.jsonl")
    sum_path = os.path.join(base, "summary.json")
    if not (os.path.exists(rec_path) and os.path.exists(sum_path)):
        import pytest

        pytest.skip("medium study artifacts not present")
    records = [json.loads(l) for l in open(rec_path)]
    committed = json.load(open(sum_path))
    assert len(records) == 70
    s = sweep_summary(records)
    assert abs(s["pearson_r_noisy"] - committed["pearson_r_noisy"]) < 1e-9
    assert abs(s["spearman_rho_noisy"]
               - committed["spearman_rho_noisy"]) < 1e-9
    for got, want in zip(s["spearman_ci95_noisy"],
                         committed["spearman_ci95_noisy"]):
        assert abs(got - want) < 1e-9
    assert s["n_noisy"] == committed["n_noisy"] == 60
    assert committed["pearson_ci95_noisy"][1] < 0
    assert committed["spearman_ci95_noisy"][1] < 0
    order = ("inf", "5", "2", "1", "0", "-2", "-5")
    eta = [s["per_snr"][k]["mean_eta_raw"] for k in order]
    wer = [s["per_snr"][k]["mean_wer"] for k in order]
    assert all(a > b for a, b in zip(eta, eta[1:]))
    assert all(a <= b for a, b in zip(wer, wer[1:]))


def test_committed_conformer_study_is_self_consistent():
    """Guard the committed round-4 conformer-family study
    (artifacts/study_r4_conformer/): 63 rows (9 clips; the 10th is the
    documented worker-fault bucket), summary reproducible from records,
    monotone per-SNR eta_raw, CI excluding 0. WER is deliberately NOT
    asserted monotone: at -2 dB the conformer inserts (WER>1) while at
    -5 dB it deletes (WER~1)."""
    import json
    import os

    from asr_shap.pipeline.sweep import sweep_summary

    base = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "study_r4_conformer")
    rec_path = os.path.join(base, "records.jsonl")
    sum_path = os.path.join(base, "summary.json")
    if not (os.path.exists(rec_path) and os.path.exists(sum_path)):
        import pytest

        pytest.skip("conformer study artifacts not present")
    records = [json.loads(l) for l in open(rec_path)]
    committed = json.load(open(sum_path))
    assert len(records) == 63
    s = sweep_summary(records)
    assert abs(s["pearson_r_noisy"] - committed["pearson_r_noisy"]) < 1e-9
    assert abs(s["spearman_rho_noisy"]
               - committed["spearman_rho_noisy"]) < 1e-9
    for got, want in zip(s["spearman_ci95_noisy"],
                         committed["spearman_ci95_noisy"]):
        assert abs(got - want) < 1e-9
    assert s["n_noisy"] == committed["n_noisy"] == 54
    assert committed["spearman_ci95_noisy"][1] < 0
    order = ("inf", "5", "2", "1", "0", "-2", "-5")
    eta = [s["per_snr"][k]["mean_eta_raw"] for k in order]
    assert all(a > b for a, b in zip(eta, eta[1:]))
