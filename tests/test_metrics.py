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
    rel = phi > tau
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


# --------------------------------------------------------------- confidence

def test_confidence_range_and_onehot(rng):
    logits = jnp.asarray(rng.standard_normal((2, 49, 32)).astype(np.float32))
    c = np.asarray(mean_max_softmax_confidence(logits))
    assert c.shape == (2,)
    assert np.all((c > 1 / 32) & (c <= 1.0))
    # near-deterministic logits -> confidence ~ 1
    sharp = jnp.zeros((1, 10, 32)).at[:, :, 3].set(50.0)
    assert float(mean_max_softmax_confidence(sharp)[0]) > 0.999
