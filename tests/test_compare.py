"""LIME-vs-SHAP comparison harness (reference R8,
lime_shap_wav2vec2_comparison.py:150-202): both explainers on the same clip,
4-panel figure + amplified wav exports, and the CLI path."""

import json
import os

import jax
import numpy as np
import pytest

from asr_shap.cli import main as cli_main
from asr_shap.core.config import ExplainerConfig
from asr_shap.models import init_wav2vec2_params
from asr_shap.pipeline.compare import (
    center_window,
    comparison_record,
    lime_shap_comparison,
)
from asr_shap.pipeline.testset import synthetic_speech


def test_center_window_truncate_and_pad():
    a = np.arange(10, dtype=np.float32)
    # centered truncation (lime_shap_wav2vec2_comparison.py:47-52)
    np.testing.assert_array_equal(center_window(a, 4), [3, 4, 5, 6])
    # zero-pad short clips at the end
    out = center_window(a[:3], 6)
    np.testing.assert_array_equal(out, [0, 1, 2, 0, 0, 0])


def test_lime_shap_comparison_artifacts(tiny_config, tmp_path):
    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    audio = synthetic_speech(jax.random.key(1), 2000)
    ecfg = ExplainerConfig(
        nsamples=4, draw_chunk=2, num_background=2,
        lime_num_samples=32, lime_num_segments=8, remat=False,
    )
    res = lime_shap_comparison(
        params, tiny_config, ecfg, audio, clip_seconds=0.1,
        out_dir=str(tmp_path), prefix="cmp",
    )
    n = 1600
    assert res["shap_per_sample"].shape == (n,)
    assert res["lime_per_sample"].shape == (n,)
    assert res["shap_matrix"].shape == (n, tiny_config.frames_for_samples(n))
    assert np.isfinite(res["shap_per_sample"]).all()
    assert np.isfinite(res["lime_per_sample"]).all()
    # LIME per-sample attribution is piecewise constant over segments
    seg = n // 8
    segs = res["lime_per_sample"][: 8 * seg].reshape(8, seg)
    assert np.all(segs == segs[:, :1])
    # artifacts on disk
    for k in ("figure", "shap_wav", "lime_wav"):
        assert os.path.exists(res[k]), k
    # scalar record is valid JSON with the agreement stats
    rec = json.loads(comparison_record(res))
    assert "pearson_r" in rec and "lime_wall_s" in rec
    assert rec["lime_num_samples"] == 32 and rec["shap_nsamples"] == 4


def test_compare_cli(tmp_path, capsys):
    cli_main([
        "compare", "--tiny", "--random-init",
        "--clip-seconds", "0.1", "--nsamples", "2",
        "--lime-samples", "16", "--lime-segments", "4",
        "--out-dir", str(tmp_path),
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["lime_num_samples"] == 16
    assert os.path.exists(rec["figure"])
    assert os.path.exists(rec["shap_wav"]) and os.path.exists(rec["lime_wav"])
