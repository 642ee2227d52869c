"""Sample-rate conversion — a device-side polyphase windowed-sinc resampler.

Capability target (SURVEY.md D3/D6): the reference resamples dataset audio to
16 kHz with ``torchaudio.transforms.Resample``
(lime_shap_wav2vec2_comparison.py:42-43) and ``librosa.resample``
(audio_visualizer.py). Round 1 had no resampler at all — any non-16 kHz input
silently had no path (VERDICT round 1, missing item 2).

TPU-first design: the classic polyphase decomposition maps the whole
resampler onto ONE strided convolution — exactly the op class XLA tiles onto
the MXU — instead of a per-output-sample gather loop:

  * reduce the rate pair by their gcd: ``up = new/g``, ``down = orig/g``;
  * build a bank of ``up`` FIR phases of a Hann-windowed sinc low-pass cut at
    ``rolloff *`` the smaller Nyquist (the standard anti-aliasing kernel;
    same construction as torchaudio's ``sinc_interp_hann`` method, so
    tolerances carry over);
  * run ``lax.conv_general_dilated`` with stride ``down`` and ``up`` output
    channels, then interleave channels into time.

The kernel bank depends only on (orig_freq, new_freq, width, rolloff) — it is
built once per rate pair at trace time, is a compile-time constant under jit,
and the op is differentiable (the explainer can backprop through it).
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import lax


@lru_cache(maxsize=32)
def _kernel_bank(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int,
    rolloff: float,
) -> tuple[np.ndarray, int, int, int]:
    """FIR phase bank for one reduced rate pair.

    Returns (kernel [K, 1, up], pad_width, up, down) with K = 2*width + down.
    Phase ``i`` evaluates the windowed sinc at continuous output time
    ``i/up`` relative to the input grid ``j/down`` (reduced-rate units).
    """
    g = math.gcd(int(orig_freq), int(new_freq))
    down = int(orig_freq) // g
    up = int(new_freq) // g

    # Anti-aliasing cutoff: rolloff * min Nyquist (in reduced-rate units the
    # input grid has rate `down`, the output grid rate `up`).
    base_freq = min(down, up) * rolloff
    width = int(math.ceil(lowpass_filter_width * down / base_freq))

    # Input-sample offsets covered by one output frame: j in [-width, width+down)
    idx = np.arange(-width, width + down, dtype=np.float64) / down  # [K]
    phase = -np.arange(up, dtype=np.float64) / up                  # [up]
    t = (phase[:, None] + idx[None, :]) * base_freq                # [up, K]
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * math.pi / lowpass_filter_width / 2.0) ** 2  # Hann
    tpi = t * math.pi
    sinc = np.where(tpi == 0.0, 1.0, np.sin(tpi) / np.where(tpi == 0.0, 1.0, tpi))
    bank = (sinc * window * (base_freq / down)).astype(np.float32)  # [up, K]

    # lax.conv WIO layout: [K, C_in=1, C_out=up]
    kernel = np.ascontiguousarray(bank.T[:, None, :])
    return kernel, width, up, down


def resample(
    x: jnp.ndarray,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jnp.ndarray:
    """Resample the last axis of ``x`` from ``orig_freq`` to ``new_freq``.

    Output length is ``ceil(n * new_freq / orig_freq)`` (the torchaudio /
    resample_poly length contract). Identity rates return ``x`` unchanged.
    """
    if not jnp.issubdtype(x.dtype, jnp.floating):
        # integer PCM would truncate the FIR kernel to zeros — resample in
        # float32 (the torchaudio/librosa contract is float audio)
        x = x.astype(jnp.float32)
    if int(orig_freq) == int(new_freq):
        return x
    kernel_np, width, up, down = _kernel_bank(
        int(orig_freq), int(new_freq), int(lowpass_filter_width), float(rolloff)
    )
    kernel = jnp.asarray(kernel_np, dtype=x.dtype)

    lead = x.shape[:-1]
    n = x.shape[-1]
    xb = x.reshape(-1, n, 1)  # NWC
    y = lax.conv_general_dilated(
        xb,
        kernel,
        window_strides=(down,),
        padding=[(width, width + down)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype,
    )  # [B, T', up]
    y = y.reshape(y.shape[0], -1)  # interleave phases into time
    target = -(-n * up // down)  # ceil
    return y[:, :target].reshape(*lead, target)


def resampled_length(n: int, orig_freq: int, new_freq: int) -> int:
    """Output length contract of :func:`resample`."""
    g = math.gcd(int(orig_freq), int(new_freq))
    return -(-n * (new_freq // g) // (orig_freq // g))
