"""Audio front-end tests: normalization parity with HF, seeded SNR noise,
mel/STFT against independent numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asr_shap.audio import (
    add_white_noise_at_snr,
    log_mel_spectrogram,
    mix_at_snr,
    stft_magnitude,
    zero_mean_unit_var,
)


def test_zero_mean_unit_var_matches_hf_feature_extractor(rng):
    # Contract demonstrated by reference test_feature_extractor.py:40-45.
    from transformers import Wav2Vec2FeatureExtractor

    fe = Wav2Vec2FeatureExtractor(
        feature_size=1, sampling_rate=16000, padding_value=0.0,
        do_normalize=True, return_attention_mask=False,
    )
    x = rng.standard_normal(16000).astype(np.float32) * 0.1 + 0.05
    ref = fe(x, sampling_rate=16000, return_tensors="np").input_values[0]
    ours = np.asarray(zero_mean_unit_var(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_zero_mean_unit_var_masked(rng):
    x = rng.standard_normal((2, 100)).astype(np.float32)
    lengths = jnp.asarray([100, 60])
    out = np.asarray(zero_mean_unit_var(jnp.asarray(x), lengths))
    # row 0: full-length stats
    full = np.asarray(zero_mean_unit_var(jnp.asarray(x[0])))
    np.testing.assert_allclose(out[0], full, rtol=1e-5)
    # row 1: stats over first 60, padding zeroed
    seg = np.asarray(zero_mean_unit_var(jnp.asarray(x[1, :60])))
    np.testing.assert_allclose(out[1, :60], seg, rtol=1e-5)
    assert np.all(out[1, 60:] == 0.0)


@pytest.mark.parametrize("snr_db", [5.0, 2.0, 1.0])
def test_white_noise_snr(snr_db):
    # Realized SNR must be close to target (shap_calculation.py:55-60 semantics).
    key = jax.random.key(0)
    t = jnp.linspace(0, 1, 64000)
    audio = jnp.sin(2 * jnp.pi * 220 * t)
    noisy, noise = add_white_noise_at_snr(key, audio, snr_db)
    np.testing.assert_allclose(np.asarray(noisy - noise), np.asarray(audio), atol=1e-6)
    realized = 10 * np.log10(
        np.mean(np.asarray(audio) ** 2) / np.mean(np.asarray(noise) ** 2)
    )
    assert abs(realized - snr_db) < 0.2


def test_mix_at_snr_exact(rng):
    speech = jnp.asarray(rng.standard_normal(8000).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal(3000).astype(np.float32))  # tiled
    mixed = mix_at_snr(speech, noise, 10.0)
    n = np.asarray(mixed) - np.asarray(speech)
    realized = 10 * np.log10(np.mean(np.asarray(speech) ** 2) / np.mean(n**2))
    np.testing.assert_allclose(realized, 10.0, atol=1e-3)


def _np_stft_power(x, n_fft, hop):
    # Independent oracle: centered (reflect pad), periodic hann, rFFT power.
    x = np.pad(x, n_fft // 2, mode="reflect")
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    n_frames = 1 + (len(x) - n_fft) // hop
    out = np.empty((n_frames, n_fft // 2 + 1))
    for i in range(n_frames):
        frame = x[i * hop : i * hop + n_fft] * win
        out[i] = np.abs(np.fft.rfft(frame)) ** 2
    return out


def test_stft_magnitude_matches_numpy_oracle(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    ours = np.asarray(stft_magnitude(jnp.asarray(x), n_fft=512, hop_length=128))
    ref = _np_stft_power(x, 512, 128)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_log_mel_shapes_and_tone_peak():
    # A pure tone's energy must land in the mel bin containing its frequency.
    sr, f = 16000, 1000.0
    t = jnp.arange(sr) / sr
    x = jnp.sin(2 * jnp.pi * f * t)
    mel = log_mel_spectrogram(x, sr=sr, n_fft=1024, hop_length=512, n_mels=80,
                              log="none")
    assert mel.shape == (1 + sr // 512, 80)
    mean = np.asarray(mel).mean(axis=0)
    peak_bin = int(mean.argmax())
    # 1 kHz sits in the lower third of an 80-bin slaney filterbank
    assert 15 <= peak_bin <= 40
    # db variant is bounded at [-80, 0]
    db = np.asarray(log_mel_spectrogram(x, sr=sr, log="db"))
    assert db.max() <= 0.0 + 1e-6 and db.min() >= -80.0 - 1e-6


# ------------------------------------------------------------- noise families

def test_colored_noise_spectrum_slope():
    """Pink noise (alpha=1): log-log PSD slope ~= -1; unit variance; seeded."""
    import jax
    from asr_shap.audio.noise import colored_noise

    n = 1 << 15
    x = np.asarray(colored_noise(jax.random.key(0), n, alpha=1.0))
    assert x.shape == (n,)
    assert abs(float(x.std()) - 1.0) < 1e-3
    psd = np.abs(np.fft.rfft(x)) ** 2
    f = np.fft.rfftfreq(n)
    # fit the slope over the mid band (away from DC kill and Nyquist)
    band = (f > 1e-3) & (f < 0.3)
    slope = np.polyfit(np.log(f[band]), np.log(psd[band]), 1)[0]
    assert -1.5 < slope < -0.5, slope
    # determinism
    y = np.asarray(colored_noise(jax.random.key(0), n, alpha=1.0))
    np.testing.assert_array_equal(x, y)


def test_scale_noise_to_snr_hits_target():
    import jax
    import jax.numpy as jnp
    from asr_shap.audio.noise import colored_noise, scale_noise_to_snr

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal(8000).astype(np.float32)) * 0.3
    for snr in (5.0, 0.0, -2.0):
        noisy, noise = scale_noise_to_snr(
            audio, colored_noise(jax.random.key(1), 8000), snr
        )
        achieved = 10.0 * np.log10(
            float(jnp.mean(audio**2)) / float(jnp.mean(noise**2))
        )
        assert abs(achieved - snr) < 0.05, (snr, achieved)
        np.testing.assert_allclose(np.asarray(noisy),
                                   np.asarray(audio + noise), rtol=1e-6)


def test_babble_noise_is_speech_shaped():
    """Babble = overlapped synthetic speakers: unit variance, deterministic,
    and concentrated at speech fundamentals (well below Nyquist) unlike
    white noise's flat spectrum."""
    import jax
    from asr_shap.pipeline.testset import babble_noise

    n = 32_000
    x = babble_noise(jax.random.key(3), n)
    assert abs(float(x.std()) - 1.0) < 1e-3
    np.testing.assert_array_equal(x, babble_noise(jax.random.key(3), n))
    psd = np.abs(np.fft.rfft(x)) ** 2
    f = np.fft.rfftfreq(n, d=1 / 16_000)
    low = psd[(f > 50) & (f < 2000)].mean()
    high = psd[f > 6000].mean()
    assert low > 10 * high  # energy lives in the speech band


def test_create_test_set_noise_kinds():
    """noise_kind plumbs through: the persisted noise signal reconstructs the
    clean clip (mixed - noise) and sits at the requested SNR for every kind."""
    from asr_shap.core.config import TestSetConfig
    from asr_shap.pipeline.testset import create_test_set

    for kind in ("white", "pink", "babble"):
        cfg = TestSetConfig(num_samples=1, snrs_db=(2.0,), min_length=8000,
                            max_length=8000, noise_kind=kind, seed=0)
        ts = create_test_set(cfg)
        assert [s["type"] for s in ts] == ["clean", "noisy"]
        clean, noisy = ts[0], ts[1]
        rec = noisy["audio"] - noisy["noise"]
        np.testing.assert_allclose(rec, clean["audio"], atol=1e-5)
        achieved = 10.0 * np.log10(
            (clean["audio"] ** 2).mean() / (noisy["noise"] ** 2).mean()
        )
        assert abs(achieved - 2.0) < 0.1, (kind, achieved)
