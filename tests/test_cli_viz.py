"""CLI subcommands (headless) + viz figures + Griffin-Lim inversion +
params npz round-trip."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asr_shap.cli import main as cli_main


def test_cli_run_shap_and_sweep_and_metric(tmp_path, capsys):
    d = str(tmp_path / "data")
    cli_main([
        "run-shap", "--tiny", "--random-init", "--data-dir", d,
        "--num-samples", "1", "--snrs", "2", "--min-length", "1600",
        "--max-length", "1600", "--nsamples", "2", "--draw-chunk", "2",
        "--mesh",
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["computed"] == 2

    cli_main(["sweep", "--tiny", "--random-init", "--data-dir", d,
              "--segment-ms", "20", "--plot", str(tmp_path / "scatter.png")])
    lines = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(lines[-2])
    assert summary["n"] == 2
    assert os.path.exists(tmp_path / "scatter.png")

    # single-sample metric on the stored files
    cli_main([
        "metric",
        "--audio", os.path.join(d, "audio_sample_1_noisy_2.npy"),
        "--noise", os.path.join(d, "noise_sample_1_noisy_2.npy"),
        "--shap", os.path.join(d, "shap_values_sample_1_noisy_2.npy"),
        "--segment-ms", "20",
    ])
    val = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= val["eta_raw"] <= 1.0

    # headless viewer render (may legitimately fail char alignment on a
    # random-init model emitting multi-char special tokens)
    try:
        cli_main(["visualize", "--tiny", "--random-init", "--data-dir", d,
                  "--sample", "0", "--save", str(tmp_path / "viewer.png")])
        assert os.path.exists(tmp_path / "viewer.png")
    except ValueError as e:
        assert "mismatch" in str(e)


def test_griffin_lim_recovers_tone():
    from asr_shap.audio.invert import griffin_lim
    from asr_shap.audio.mel import stft_magnitude

    sr, n = 16000, 8192
    t = jnp.arange(n) / sr
    x = jnp.sin(2 * jnp.pi * 440.0 * t) * 0.5
    mag = jnp.sqrt(stft_magnitude(x, n_fft=512, hop_length=128, power=2.0))
    y = np.asarray(griffin_lim(mag, n_fft=512, hop_length=128, length=n, n_iter=32))
    # a pure tone's magnitude spectrogram should reconstruct with the right
    # dominant frequency
    spec = np.abs(np.fft.rfft(y))
    freq = np.fft.rfftfreq(n, 1 / sr)
    assert abs(freq[spec.argmax()] - 440.0) < 5.0


def test_mel_to_audio_shape():
    from asr_shap.audio.invert import mel_to_audio
    from asr_shap.audio.mel import log_mel_spectrogram

    x = jnp.sin(2 * jnp.pi * 220.0 * jnp.arange(4096) / 16000)
    mel = log_mel_spectrogram(x, n_fft=512, hop_length=128, n_mels=40, log="none")
    y = mel_to_audio(mel, sr=16000, n_fft=512, hop_length=128, length=4096, n_iter=8)
    assert y.shape == (4096,)
    assert np.isfinite(np.asarray(y)).all()


def test_scrubber_headless_export(tmp_path):
    from asr_shap.viz.scrubber import SpectrogramScrubber

    audio = np.sin(2 * np.pi * 330 * np.arange(8192) / 16000).astype(np.float32)
    s = SpectrogramScrubber(audio, n_fft=512, hop_length=256, n_mels=40)
    p = s.export_frame(5, str(tmp_path / "frame5.wav"))
    assert os.path.exists(p) and os.path.getsize(p) > 100


def test_activation_figures(tmp_path):
    from asr_shap.viz.activations import (
        plot_activation_curves,
        plot_glu_graph,
        plot_rescale_multipliers,
    )

    p1 = str(tmp_path / "curves.png")
    p2 = str(tmp_path / "mult.png")
    p3 = str(tmp_path / "graph.png")
    plot_activation_curves(p1)
    plot_rescale_multipliers(p2)
    plot_glu_graph(p3)
    assert all(os.path.getsize(p) > 1000 for p in (p1, p2))
    assert os.path.getsize(p3) > 1000  # networkx is available in this env


def test_params_npz_roundtrip(tiny_config, tmp_path):
    from asr_shap.core.params_io import load_params, save_params
    from asr_shap.models import init_wav2vec2_params

    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    p = str(tmp_path / "params.npz")
    save_params(p, params)
    back = load_params(p)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # structure preserved: list of conv layers stays a list
    assert isinstance(back["feature_encoder"], list)


def test_cli_help_all_subcommands():
    """Arg wiring regression: --help renders for every subcommand."""
    import asr_shap.cli as cli

    parser = cli.build_parser()
    for cmd in ("run-shap", "sweep", "metric", "visualize", "bench",
                "compare", "train", "transcribe"):
        with pytest.raises(SystemExit) as e:
            parser.parse_args([cmd, "--help"])
        assert e.value.code == 0


def test_cli_transcribe_npy_and_wav(tmp_path, capsys):
    """The reference's minimal load->logits->argmax->decode flow
    (test_wav2vec2.py:1-19) as a subcommand: npy at 16 kHz and wav at
    8 kHz (exercising the resample path) both produce a JSON record."""
    from asr_shap.viz.wav_io import write_wav

    rng = np.random.default_rng(0)
    clip = (0.1 * rng.standard_normal(1600)).astype(np.float32)
    npy = str(tmp_path / "clip.npy")
    np.save(npy, clip)
    wav = str(tmp_path / "clip8k.wav")
    write_wav(wav, clip[:800], sr=8000)

    cli_main(["transcribe", "--tiny", "--random-init", npy, wav])
    lines = capsys.readouterr().out.strip().splitlines()
    recs = [json.loads(ln) for ln in lines[-2:]]
    assert recs[0]["path"] == npy and recs[0]["samples"] == 1600
    # 800 samples at 8 kHz resample to 1600 at 16 kHz
    assert recs[1]["path"] == wav and recs[1]["samples"] == 1600
    for r in recs:
        assert isinstance(r["transcript"], str)
        assert 0.0 < r["confidence"] <= 1.0
        assert r["frames"] > 0


def test_params_npz_carries_config(tmp_path):
    """save_params can embed the architecture config; load_config restores
    it so `--params` runs don't have to re-guess preset flags."""
    from asr_shap.core.config import Wav2Vec2Config
    from asr_shap.core.params_io import load_config, load_params, save_params
    from asr_shap.models import init_wav2vec2_params

    cfg = Wav2Vec2Config(hidden_size=32, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=64,
                         conv_dim=(16, 16), conv_stride=(5, 2),
                         conv_kernel=(10, 3), num_conv_pos_embeddings=16,
                         num_conv_pos_embedding_groups=4, feat_proj_dim=16)
    params = init_wav2vec2_params(jax.random.key(0), cfg)
    path = str(tmp_path / "p.npz")
    save_params(path, params, config=cfg)
    assert load_config(path) == cfg
    restored = load_params(path)
    flat_a = jax.tree.leaves(restored)
    flat_b = jax.tree.leaves(params)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # weights-only archives stay loadable and report no config
    save_params(str(tmp_path / "bare.npz"), params)
    assert load_config(str(tmp_path / "bare.npz")) is None


def test_train_rejects_conformer_arch():
    """train drives the wav2vec2 CTC step only; --arch w2v2-conformer must
    fail loudly instead of training a wav2vec2 and embedding the wrong
    config in the archive."""
    import pytest

    from asr_shap.cli import build_parser, main

    args = build_parser().parse_args(
        ["train", "--arch", "w2v2-conformer", "--tiny", "--random-init"]
    )
    with pytest.raises(SystemExit, match="wav2vec2 only"):
        args.fn(args)
