"""Deletion/insertion faithfulness curves (metrics/faithfulness.py).

The end-to-end oracle is contrived but exact: a 'model' that transcribes
one word per speech chunk that keeps >50% of its original energy. An
attribution that ranks speech samples first must then destroy words
fastest under deletion (and recover them fastest under insertion), while
random rankings mostly hit the silent majority of the clip."""

import json

import numpy as np
import pytest

from asr_shap.metrics.faithfulness import (
    DEFAULT_FRACTIONS,
    curve_auc,
    faithfulness_curve,
    faithfulness_summary,
    importance_per_sample,
    make_transcribe_fn,
    masked_variants,
)


def test_importance_orientation_fixup():
    n, t = 100, 7
    phi = np.random.default_rng(0).standard_normal((n, t))
    imp = importance_per_sample(phi, n)
    assert imp.shape == (n,)
    np.testing.assert_allclose(imp, importance_per_sample(phi.T, n))
    np.testing.assert_allclose(importance_per_sample(imp, n), imp)


def test_masked_variants_counts_and_selection():
    n = 1000
    audio = np.ones(n, np.float32)
    imp = np.arange(n, dtype=np.float32)  # most important = last samples
    variants, meta = masked_variants(audio, imp, (0.1, 0.5), n_random=2,
                                     seed=0)
    assert variants.shape == (1 + 2 * 3, n)
    assert meta[0]["kind"] == "orig"
    np.testing.assert_array_equal(variants[0], audio)
    # deletion of top 10%: exactly the 100 highest-importance samples zeroed
    topk10 = variants[1]
    assert meta[1] == {"kind": "topk", "fraction": 0.1, "rep": 0}
    assert (topk10[-100:] == 0).all() and (topk10[:-100] == 1).all()
    # insertion keeps ONLY the top fraction
    ins, meta_i = masked_variants(audio, imp, (0.1,), mode="insertion",
                                  n_random=1, seed=0)
    keep10 = ins[1]
    assert (keep10[-100:] == 1).all() and (keep10[:-100] == 0).all()


def test_masked_variants_noise_fill_has_rms():
    rng = np.random.default_rng(1)
    audio = rng.standard_normal(4000).astype(np.float32) * 0.3
    imp = np.abs(audio)
    variants, meta = masked_variants(audio, imp, (0.5,), fill="noise",
                                     n_random=0, seed=0)
    masked = variants[1]
    changed = masked != audio
    assert changed.sum() == 2000
    # filled region carries typical energy, not silence
    assert np.sqrt(np.mean(masked[changed] ** 2)) > 0.1


def test_curve_auc_trapezoid():
    assert curve_auc([0.0, 1.0], [0.0, 1.0]) == pytest.approx(0.5)
    assert curve_auc([0.0, 0.5, 1.0], [1.0, 1.0, 1.0]) == pytest.approx(1.0)


def _chunk_oracle(n=16000, n_words=8, chunk=1000, gap=1000):
    """Speech chunks of `chunk` samples separated by silence; transcribe_fn
    emits the i-th word iff chunk i retains >50% of its original energy."""
    words = [f"W{i}" for i in range(n_words)]
    audio = np.zeros(n, np.float32)
    spans = []
    for i in range(n_words):
        s = i * (chunk + gap)
        audio[s:s + chunk] = 1.0
        spans.append((s, s + chunk))

    def transcribe(batch):
        out = []
        for row in np.asarray(batch):
            kept = [w for w, (s, e) in zip(words, spans)
                    if np.sum(row[s:e] ** 2) > 0.5 * (e - s)]
            out.append(" ".join(kept))
        return out

    return audio, " ".join(words), spans, transcribe


def test_deletion_faithful_ranking_beats_random():
    audio, text, spans, transcribe = _chunk_oracle()
    # faithful attribution: importance = the speech indicator
    phi = (audio != 0).astype(np.float32)
    rec = faithfulness_curve(transcribe, audio, phi, text,
                             fractions=(0.1, 0.25, 0.5), seed=0)
    assert rec["base_wer"] == 0.0
    # speech is 50% of the clip: deleting the top 50% by a faithful ranking
    # kills every word; random deletions at small fractions mostly hit gaps
    assert rec["points"][-1]["wer_topk"] == pytest.approx(1.0)
    assert rec["auc_gap"] > 0.2
    # an anti-faithful ranking (silence first) must do WORSE than random
    anti = faithfulness_curve(transcribe, audio, 1.0 - phi, text,
                              fractions=(0.1, 0.25, 0.5), seed=0)
    assert anti["auc_gap"] < 0.0


def test_insertion_mode_sign():
    audio, text, spans, transcribe = _chunk_oracle()
    phi = (audio != 0).astype(np.float32)
    rec = faithfulness_curve(transcribe, audio, phi, text, mode="insertion",
                             fractions=(0.25, 0.5, 0.75), seed=0)
    # keeping the top 50% (= all speech) restores a perfect transcript
    mid = [p for p in rec["points"] if p["fraction"] == 0.5][0]
    assert mid["wer_topk"] == pytest.approx(0.0)
    assert rec["auc_gap"] > 0.0


def test_summary_bootstrap_and_signs():
    audio, text, spans, transcribe = _chunk_oracle()
    phi = (audio != 0).astype(np.float32)
    recs = [faithfulness_curve(transcribe, audio, phi, text,
                               fractions=(0.1, 0.5), seed=s)
            for s in range(3)]
    s = faithfulness_summary(recs)
    assert s["n"] == 3
    assert s["mean_auc_gap"] > 0
    assert s["gap_ci95"][0] <= s["mean_auc_gap"] <= s["gap_ci95"][1]
    assert s["frac_gap_positive"] == 1.0


def test_make_transcribe_fn_batches(tiny_cfg_params=None):
    import jax
    from asr_shap.core.config import Wav2Vec2Config
    from asr_shap.models.wav2vec2 import init_wav2vec2_params

    cfg = Wav2Vec2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, conv_dim=(32, 32), conv_stride=(5, 2),
        conv_kernel=(10, 3), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, feat_proj_dim=32,
    )
    params = init_wav2vec2_params(jax.random.key(0), cfg)
    fn = make_transcribe_fn(params, cfg)
    batch = np.random.default_rng(0).standard_normal((3, 1600)).astype(np.float32)
    texts = fn(batch)
    assert len(texts) == 3 and all(isinstance(t, str) for t in texts)
    # identical rows transcribe identically
    same = fn(np.stack([batch[0], batch[0]]))
    assert same[0] == same[1]


def test_cli_faithfulness_on_tiny_store(tmp_path, capsys):
    from asr_shap.cli import main as cli_main

    d = str(tmp_path / "data")
    cli_main([
        "run-shap", "--tiny", "--random-init", "--data-dir", d,
        "--num-samples", "1", "--snrs", "2", "--min-length", "1600",
        "--max-length", "1600", "--nsamples", "2",
    ])
    capsys.readouterr()
    cli_main([
        "faithfulness", "--tiny", "--random-init", "--data-dir", d,
        "--fractions", "0.1", "0.5", "--n-random", "1",
        "--out", str(tmp_path / "faith.jsonl"),
        "--plot", str(tmp_path / "faith.png"),
    ])
    assert (tmp_path / "faith.png").stat().st_size > 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[-1].startswith("wrote ")
    summary = json.loads(lines[-2])
    assert summary["n"] == 2 and summary["mode"] == "deletion"
    recs = [json.loads(ln) for ln in lines[:-2]]
    for r in recs:
        assert {p["fraction"] for p in r["points"]} == {0.1, 0.5}
        assert r["key"].startswith("sample_")
    saved = (tmp_path / "faith.jsonl").read_text().strip().splitlines()
    assert len(saved) == len(lines) - 1  # the "wrote <plot>" line is stdout-only


def test_plot_faithfulness_curves(tmp_path):
    """The multi-family curves figure renders from plain records (one color
    per family, attribution solid / random dashed) and writes the file."""
    import matplotlib

    matplotlib.use("Agg")
    from asr_shap.viz.static import plot_faithfulness_curves

    def rec(scale):
        pts = [{"fraction": f, "wer_topk": scale * f * 4,
                "wer_random": scale * f} for f in (0.05, 0.1, 0.2)]
        return {"mode": "deletion", "base_wer": 0.0, "points": pts}

    out = tmp_path / "curves.png"
    plot_faithfulness_curves(
        {"grad": [rec(1.0), rec(1.2)], "kernel": [rec(0.6)]},
        out_path=str(out),
    )
    assert out.exists() and out.stat().st_size > 0
