"""Attribution post-processing (layer L5 of SURVEY.md):

* CTC character-group alignment — visualization.py:319-333 semantics: the
  first frame of every non-blank, non-space, non-repeat token group; count
  must equal the space-stripped transcription.
* 20 ms block-mean smoothing — visualization.py:356-362 (vectorized here:
  segment means via one reshape instead of a python loop).
* percentile normalize/clip — visualization.py:239-276 incl. both edge cases
  (flat input -> default; threshold at max -> binary mask).
* per-character masks/audios — visualization.py:349-368.
* frame->sample linear interpolation at STFT frame centers —
  test_shap_audio.py:195-205.
* repeat-upsampling to spectrogram frames — w2v2conformer.py:158-162.

All array math is jnp (jit/vmap-friendly); only the char/string pairing is
host python.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from asr_shap.core.config import PAD_ID, WAV2VEC2_VOCAB, WORD_DELIMITER_ID


def char_group_frames(
    ids: np.ndarray,
    transcription: str,
    blank_id: int = PAD_ID,
    space_id: int = WORD_DELIMITER_ID,
) -> List[int]:
    """Frame index of each character group in a greedy CTC id sequence.

    Raises ValueError when the group count disagrees with the space-stripped
    transcription (the reference hard-errors too, visualization.py:329-333).
    """
    ids = np.asarray(ids)
    prev = np.concatenate([[-1], ids[:-1]])
    is_first = (ids != prev) & (ids != blank_id) & (ids != space_id)
    frames = np.nonzero(is_first)[0].tolist()
    clean = transcription.replace(" ", "")
    if len(frames) != len(clean):
        raise ValueError(
            f"char-group/transcription mismatch: {len(frames)} groups vs "
            f"{len(clean)} characters"
        )
    return frames


def block_mean_smooth(x: jnp.ndarray, sr: int = 16_000, block_ms: float = 20.0) -> jnp.ndarray:
    """Replace each ``block_ms`` window with its mean (trailing partial block
    averaged over its true length). x: [..., N]."""
    n = x.shape[-1]
    blk = max(1, int(block_ms / 1000.0 * sr))
    full = (n // blk) * blk
    head = x[..., :full].reshape(*x.shape[:-1], -1, blk)
    head = jnp.broadcast_to(head.mean(axis=-1, keepdims=True), head.shape)
    head = head.reshape(*x.shape[:-1], full)
    if full == n:
        return head
    tail = jnp.broadcast_to(
        x[..., full:].mean(axis=-1, keepdims=True), x[..., full:].shape
    )
    return jnp.concatenate([head, tail], axis=-1)


def normalize_and_scale(
    values: jnp.ndarray, percentile: float = 98.0, default: float = 0.0
) -> jnp.ndarray:
    """Min-max normalize, then keep only mass above the given percentile,
    rescaled to [default..1] (visualization.py:239-276 semantics, jnp)."""
    vmin = jnp.min(values)
    vmax = jnp.max(values)
    span = vmax - vmin
    flat = span < 1e-8
    normalized = (values - vmin) / jnp.where(flat, 1.0, span)
    thr = jnp.percentile(normalized, percentile)
    binary = (normalized >= thr).astype(values.dtype)
    scaled = jnp.clip(
        jnp.clip(normalized - thr, 0.0, None) / jnp.maximum(1.0 - thr, 1e-30),
        default,
        1.0,
    )
    out = jnp.where((1.0 - thr) < 1e-8, binary, scaled)
    return jnp.where(flat, jnp.full_like(values, default), out)


def character_masks(
    audio: jnp.ndarray,
    shap_matrix: jnp.ndarray,
    char_frames: Sequence[int],
    sr: int = 16_000,
    block_ms: float = 20.0,
    percentile: float = 98.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-character SHAP masks and masked audios.

    Returns (masks [C, N], masked_audios [C, N]) — the per-character
    |phi[:, t_char]| -> block smooth -> percentile scale -> audio*mask chain
    (visualization.py:349-368), batched over characters with one gather +
    vmap instead of a python loop per character.
    """
    if len(char_frames) == 0:
        n = audio.shape[-1]
        empty = jnp.zeros((0, n), audio.dtype)
        return empty, empty
    cols = jnp.abs(shap_matrix[:, jnp.asarray(list(char_frames))].T)  # [C, N]
    smoothed = block_mean_smooth(cols, sr, block_ms)
    masks = jax.vmap(lambda s: normalize_and_scale(s, percentile))(smoothed)
    return masks, audio[None, :] * masks


def frame_to_sample_interp(
    frame_values: jnp.ndarray, n_samples: int, hop_length: int, n_fft: int
) -> jnp.ndarray:
    """Linear interpolation of per-STFT-frame values onto audio samples,
    anchored at frame centers (test_shap_audio.py:195-205 capability)."""
    t = frame_values.shape[-1]
    centers = jnp.arange(t) * hop_length + n_fft // 2
    pos = jnp.arange(n_samples)
    return jnp.interp(pos, centers, frame_values)


def repeat_upsample(frame_values: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbour upsampling by integer repeat
    (w2v2conformer.py:158-162 capability)."""
    return jnp.repeat(frame_values, factor, axis=-1)


def shap_amplify(
    audio: jnp.ndarray, shap_matrix: jnp.ndarray, factor: float = 2.0
) -> jnp.ndarray:
    """SHAP-weighted audio amplification
    (audio_amplification_wav2vec2_test.py:117-156): mean attribution over
    output frames, min-max normalized (flat input -> all-ones), then
    ``audio * (1 + norm * factor)``."""
    per_sample = jnp.mean(shap_matrix, axis=-1)  # [N]
    lo, hi = jnp.min(per_sample), jnp.max(per_sample)
    flat = (hi - lo) < 1e-12
    norm = jnp.where(
        flat, jnp.ones_like(per_sample), (per_sample - lo) / jnp.where(flat, 1.0, hi - lo)
    )
    return audio * (1.0 + norm * factor)


def rms_frames(
    audio: jnp.ndarray, frame_length: int = 2048, hop_length: int = 512
) -> jnp.ndarray:
    """Per-frame RMS energy, librosa.feature.rms semantics (centered frames,
    zero padding; 1 + N//hop frames)."""
    n = audio.shape[-1]
    pad = frame_length // 2
    y = jnp.pad(audio, (pad, pad))
    n_frames = 1 + n // hop_length
    starts = jnp.arange(n_frames) * hop_length
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    frames = y[jnp.clip(idx, 0, y.shape[-1] - 1)]
    frames = jnp.where(idx < y.shape[-1], frames, 0.0)
    return jnp.sqrt(jnp.mean(frames**2, axis=-1))


def amplify_quiet_sections(
    audio: jnp.ndarray,
    frame_length: int = 2048,
    hop_length: int = 512,
    energy_threshold: float = 0.01,
    amplification_factor: float = 5.0,
) -> jnp.ndarray:
    """RMS-threshold quiet-section amplification, the pre-SHAP prototype
    (audio_amplification_test.ipynb ``amplify_quiet_sections``): every frame
    whose RMS is below ``energy_threshold`` multiplies its [i*hop,
    i*hop+frame_length) span by the factor — overlapping quiet frames
    compound, exactly like the reference's in-place loop — then the result
    clips to [-1, 1]. Vectorized: the per-sample coverage count is one
    convolution of the quiet-frame impulse train."""
    n = audio.shape[-1]
    rms = rms_frames(audio, frame_length, hop_length)
    quiet = (rms < energy_threshold).astype(audio.dtype)
    n_frames = quiet.shape[0]
    train = jnp.zeros(max(n, (n_frames - 1) * hop_length + 1), audio.dtype)
    train = train.at[jnp.arange(n_frames) * hop_length].set(quiet)
    counts = jnp.convolve(train, jnp.ones(frame_length, audio.dtype))[:n]
    gain = amplification_factor ** jnp.round(counts)
    return jnp.clip(audio * gain, -1.0, 1.0)
