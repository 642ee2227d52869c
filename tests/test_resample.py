"""Resampler tests — the polyphase conv against an independent per-output
brute-force oracle, scipy.resample_poly on bandlimited signals, tone
preservation, length contract, and differentiability.

Capability reference: torchaudio.transforms.Resample usage at
lime_shap_wav2vec2_comparison.py:42-43 (SURVEY.md D3)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_shap.audio.resample import resample, resampled_length


def _oracle(x, orig, new, width_param=6, rolloff=0.99):
    """Direct O(N*M) evaluation of the same continuous-time windowed-sinc
    interpolation, written against the math (no conv, no phase bank)."""
    g = math.gcd(orig, new)
    down, up = orig // g, new // g
    base = min(down, up) * rolloff
    n = len(x)
    m = -(-n * up // down)
    y = np.zeros(m, dtype=np.float64)
    half = width_param * down / base  # support in input samples
    for i in range(m):
        tau = i / up  # output time in reduced units
        j0 = int(np.floor(tau * down - half - 1))
        j1 = int(np.ceil(tau * down + half + 1))
        for j in range(max(0, j0), min(n, j1 + 1)):
            t = (tau - j / down) * base
            t = np.clip(t, -width_param, width_param)
            w = np.cos(t * np.pi / width_param / 2.0) ** 2
            s = np.sinc(t)  # sin(pi t)/(pi t)
            y[i] += x[j] * s * w * (base / down)
    return y.astype(np.float32)


@pytest.mark.parametrize("orig,new", [(8000, 16000), (22050, 16000), (48000, 16000)])
def test_matches_bruteforce_oracle(rng, orig, new):
    x = rng.standard_normal(600).astype(np.float32)
    ours = np.asarray(resample(jnp.asarray(x), orig, new))
    ref = _oracle(x, orig, new)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_tone_preserved_upsample_downsample():
    # A 440 Hz tone must survive 16k -> 48k -> 16k nearly unchanged.
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    up = resample(jnp.asarray(x), sr, 48000)
    back = np.asarray(resample(up, 48000, sr))
    # ignore filter-length edge transients
    k = 200
    np.testing.assert_allclose(back[k:-k], x[k:-k], atol=5e-3)


def test_close_to_scipy_resample_poly(rng):
    # On a bandlimited signal both anti-aliasing filters pass the content
    # untouched, so the two implementations must agree closely.
    from scipy.signal import resample_poly

    sr, target = 22050, 16000
    t = np.arange(4096, dtype=np.float64) / sr
    x = sum(np.sin(2 * np.pi * f * t + p) for f, p in [(300, 0.1), (1200, 1.3), (3000, 2.2)])
    x = x.astype(np.float32)
    ours = np.asarray(resample(jnp.asarray(x), sr, target))
    ref = resample_poly(x, target // math.gcd(sr, target), sr // math.gcd(sr, target))
    k = 100
    assert ours.shape[0] in (len(ref), len(ref) + 1)
    np.testing.assert_allclose(ours[k : len(ref) - k], ref[k : len(ref) - k], atol=2e-3)


def test_length_contract_and_identity(rng):
    x = jnp.asarray(rng.standard_normal(1001).astype(np.float32))
    assert resample(x, 16000, 16000) is x
    for orig, new in [(8000, 16000), (44100, 16000), (16000, 8000), (24000, 16000)]:
        y = resample(x, orig, new)
        expect = resampled_length(1001, orig, new)
        assert y.shape == (expect,)
        assert expect == int(np.ceil(1001 * new / orig))


def test_batched_and_jit_and_grad(rng):
    x = jnp.asarray(rng.standard_normal((3, 400)).astype(np.float32))
    f = jax.jit(lambda v: resample(v, 8000, 16000))
    y = f(x)
    assert y.shape == (3, 800)
    # rows are independent
    y0 = np.asarray(resample(x[0], 8000, 16000))
    np.testing.assert_allclose(np.asarray(y[0]), y0, rtol=1e-5, atol=1e-6)
    # differentiable (explainers backprop through the front-end)
    g = jax.grad(lambda v: jnp.sum(resample(v, 8000, 16000) ** 2))(x[0])
    assert np.isfinite(np.asarray(g)).all()


def test_testset_resamples_non_16k_source(rng):
    from asr_shap.core.config import TestSetConfig
    from asr_shap.pipeline.testset import create_test_set

    audio = rng.standard_normal(4000).astype(np.float32)
    cfg = TestSetConfig(num_samples=1, min_length=1000, snrs_db=(5.0,))
    ts = create_test_set(cfg, source=[(audio, "HELLO", 8000)])
    assert len(ts) == 2  # clean + one SNR
    assert len(ts[0]["audio"]) == 8000  # 8k -> 16k doubled
    assert ts[0]["text"] == "HELLO"


def test_resample_integer_pcm_input(rng):
    """Integer PCM must resample in float (a kernel cast to int16 would
    silently truncate to zeros)."""
    x16 = (np.sin(2 * np.pi * 440 * np.arange(800) / 8000) * 20000).astype(np.int16)
    y = np.asarray(resample(jnp.asarray(x16), 8000, 16000))
    assert y.dtype == np.float32
    assert np.abs(y).max() > 1000  # signal survived
