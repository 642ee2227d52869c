"""Post-processing tests: char-group alignment, block smoothing,
percentile normalize/scale (incl. both edge cases), per-character masks,
frame interpolation — against independent numpy oracles of the reference
semantics (visualization.py:239-276, :319-333, :349-368)."""

import numpy as np
import jax.numpy as jnp
import pytest

from asr_shap.postprocess import (
    block_mean_smooth,
    char_group_frames,
    character_masks,
    frame_to_sample_interp,
    normalize_and_scale,
    repeat_upsample,
)


# ------------------------------------------------------------- alignment

def test_char_group_frames_basic():
    # ids:  C C _ A | T T  -> groups C@0 A@3 T@5 ("CAT" -> "CAT")
    ids = np.array([19, 19, 0, 7, 4, 6, 6])
    frames = char_group_frames(ids, "CAT")
    assert frames == [0, 3, 5]


def test_char_group_frames_repeat_after_blank():
    # A _ A -> two groups (blank splits repeats)
    ids = np.array([7, 0, 7])
    assert char_group_frames(ids, "AA") == [0, 2]


def test_char_group_frames_space_ignored():
    # A | B: space tokens never start a char group
    ids = np.array([7, 4, 24])
    assert char_group_frames(ids, "A B") == [0, 2]


def test_char_group_frames_mismatch_raises():
    with pytest.raises(ValueError, match="mismatch"):
        char_group_frames(np.array([7, 0, 24]), "ABC")


# ------------------------------------------------------------- smoothing

def _smooth_oracle(x, sr, ms):
    blk = int(ms / 1000 * sr)
    out = x.copy()
    for i in range(0, len(x), blk):
        out[i : i + blk] = out[i : i + blk].mean()
    return out


def test_block_mean_smooth_matches_loop_oracle(rng):
    x = rng.standard_normal(1000).astype(np.float32)  # 1000 = 3*320 + 40
    ours = np.asarray(block_mean_smooth(jnp.asarray(x), 16000, 20.0))
    ref = _smooth_oracle(x, 16000, 20.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_block_mean_smooth_batched(rng):
    x = rng.standard_normal((3, 640)).astype(np.float32)
    ours = np.asarray(block_mean_smooth(jnp.asarray(x), 16000, 20.0))
    for i in range(3):
        np.testing.assert_allclose(ours[i], _smooth_oracle(x[i], 16000, 20.0), rtol=1e-5)


# ------------------------------------------------------- normalize/scale

def _norm_oracle(v, percentile=98.0, default=0.0):
    vmin, vmax = v.min(), v.max()
    if vmax - vmin < 1e-8:
        return np.full_like(v, default)
    normalized = (v - vmin) / (vmax - vmin)
    thr = np.percentile(normalized, percentile)
    if (1.0 - thr) < 1e-8:
        return (normalized >= thr).astype(float)
    return ((normalized - thr).clip(0) / (1.0 - thr)).clip(default, 1)


def test_normalize_and_scale_matches_oracle(rng):
    v = np.abs(rng.standard_normal(4000)).astype(np.float32)
    ours = np.asarray(normalize_and_scale(jnp.asarray(v), 98.0))
    ref = _norm_oracle(v, 98.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_normalize_and_scale_flat_input():
    v = jnp.full((100,), 3.14)
    out = np.asarray(normalize_and_scale(v, 98.0, default=0.25))
    np.testing.assert_allclose(out, 0.25)


def test_normalize_and_scale_threshold_at_max():
    # nearly-all-max input -> percentile lands at 1.0 -> binary mask path
    v = np.ones(100, np.float32)
    v[0] = 0.0
    out = np.asarray(normalize_and_scale(jnp.asarray(v), 50.0))
    ref = _norm_oracle(v, 50.0)
    np.testing.assert_allclose(out, ref)


# -------------------------------------------------------- char masks etc.

def test_character_masks_shapes_and_bounds(rng):
    n, t = 3200, 10
    audio = rng.standard_normal(n).astype(np.float32)
    phi = rng.standard_normal((n, t)).astype(np.float32)
    masks, masked = character_masks(jnp.asarray(audio), jnp.asarray(phi), [2, 5, 7])
    assert masks.shape == (3, n) and masked.shape == (3, n)
    m = np.asarray(masks)
    assert m.min() >= 0.0 and m.max() <= 1.0
    np.testing.assert_allclose(np.asarray(masked), audio[None] * m, rtol=1e-6)


def test_character_masks_empty():
    masks, masked = character_masks(jnp.zeros(100), jnp.zeros((100, 5)), [])
    assert masks.shape == (0, 100)


def test_frame_to_sample_interp():
    fv = jnp.asarray([0.0, 1.0, 0.0])
    out = np.asarray(frame_to_sample_interp(fv, n_samples=2048, hop_length=512, n_fft=1024))
    assert out.shape == (2048,)
    # peak at center of frame 1 = 512 + 512 = 1024
    assert abs(out[1024] - 1.0) < 1e-6
    assert out[512] < 1.0 and out[1536] < 1.0


def test_repeat_upsample():
    out = np.asarray(repeat_upsample(jnp.asarray([1.0, 2.0]), 3))
    np.testing.assert_array_equal(out, [1, 1, 1, 2, 2, 2])


def test_shap_amplify_matches_reference_semantics(rng):
    """audio * (1 + minmax(mean-over-frames) * factor)
    (audio_amplification_wav2vec2_test.py:117-156), flat input -> all-ones."""
    from asr_shap.postprocess.attribution import shap_amplify

    audio = rng.standard_normal(400).astype(np.float32)
    phi = rng.standard_normal((400, 7)).astype(np.float32)
    out = np.asarray(shap_amplify(jnp.asarray(audio), jnp.asarray(phi), 2.0))
    agg = phi.mean(axis=1)
    norm = (agg - agg.min()) / (agg.max() - agg.min())
    np.testing.assert_allclose(out, audio * (1 + norm * 2.0), rtol=1e-5, atol=1e-6)

    flat = np.asarray(shap_amplify(jnp.asarray(audio),
                                   jnp.ones((400, 7), np.float32), 2.0))
    np.testing.assert_allclose(flat, audio * 3.0, rtol=1e-6)


def test_amplify_quiet_sections_matches_loop_oracle(rng):
    """The vectorized quiet-section amplifier must reproduce the reference's
    per-frame in-place loop (audio_amplification_test.ipynb), including
    compounding of overlapping quiet frames and the final clip."""
    from asr_shap.postprocess.attribution import amplify_quiet_sections, rms_frames

    sr = 4000
    t = np.arange(2 * sr) / sr
    amp = np.ones_like(t, dtype=np.float32)
    amp[3000:5000] = 0.004  # quiet middle
    audio = (amp * np.sin(2 * np.pi * 440 * t)).astype(np.float32) * 0.5

    F, H, thr, fac = 512, 128, 0.01, 5.0
    rms = np.asarray(rms_frames(jnp.asarray(audio), F, H))
    # reference loop oracle
    y = audio.copy()
    for i in range(len(rms)):
        if rms[i] < thr:
            s0 = i * H
            y[s0: min(s0 + F, len(y))] *= fac
    y = np.clip(y, -1.0, 1.0)

    ours = np.asarray(amplify_quiet_sections(jnp.asarray(audio), F, H, thr, fac))
    np.testing.assert_allclose(ours, y, rtol=1e-4, atol=1e-5)


def test_rms_frames_matches_librosa_convention(rng):
    """Centered frames, zero pad, 1 + n//hop frames — scipy-free oracle."""
    from asr_shap.postprocess.attribution import rms_frames

    audio = rng.standard_normal(3000).astype(np.float32)
    F, H = 256, 64
    out = np.asarray(rms_frames(jnp.asarray(audio), F, H))
    pad = F // 2
    y = np.pad(audio, (pad, pad))
    expect = np.array([
        np.sqrt(np.mean(y[i * H: i * H + F] ** 2))
        for i in range(1 + 3000 // H)
    ])
    assert out.shape == expect.shape
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)
