"""Pallas-or-justify profile: conv feature encoder + mel front-end on TPU.

SURVEY.md section 7 step 4 listed "fused conv feature encoder, fused mel
front-end" as Pallas candidates; round 1 built only the attention kernel.
This script measures, on the real chip, (a) what fraction of a full
explainer pass each candidate op costs and (b) how close XLA's fusion
already runs to the chip's compute/bandwidth roofline. The committed output
(artifacts/kernel_decision.md) is the measured basis for building — or not
building — a hand-written kernel for each.

Run ON the TPU host: python scripts/tpu_kernel_decision.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIO_LEN = int(os.environ.get("BENCH_AUDIO_LEN", 48000))
OUT = os.path.join(os.path.dirname(__file__), "..", "artifacts", "kernel_decision.md")
V5E_BF16_PEAK = 197e12
V5E_HBM_GBS = 819e9


def _sync(out):
    """Force completion. block_until_ready is a NO-OP through the axon
    remote-execution relay — only a device->host transfer actually waits, so
    pull one element of the first output leaf."""
    import jax

    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def _time(fn, *args, reps: int = 20):
    _sync(fn(*args))  # warmup/compile
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _sync(out)
        walls.append((time.perf_counter() - t0) / reps)
    return min(walls)


def main():
    import jax
    import jax.numpy as jnp

    from asr_shap.audio.mel import log_mel_spectrogram
    from asr_shap.core.config import Wav2Vec2Config
    from asr_shap.models.wav2vec2 import feature_encoder, init_wav2vec2_params, wav2vec2_logits

    cfg = Wav2Vec2Config()
    params = init_wav2vec2_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    batch = 8  # a draw_chunk's worth of perturbations
    x = jnp.asarray(rng.standard_normal((batch, AUDIO_LEN)).astype(np.float32))

    rows = []

    # --- conv feature encoder fwd+bwd (the explainer's per-draw cost shape)
    def conv_fb(p, xx):
        def loss(v):
            return jnp.sum(feature_encoder(p, cfg, v) ** 2)
        return jax.value_and_grad(loss)(xx)

    f = jax.jit(conv_fb)
    wall = _time(f, params, x)
    # conv FLOPs: sum over layers 2*K*Cin*Cout*T_out per sample, x3 for fwd+bwd
    flops = 0
    t = AUDIO_LEN
    cin = 1
    for co, k, s in zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride):
        t = (t - k) // s + 1
        flops += 2 * k * cin * co * t
        cin = co
    flops_total = 3 * flops * batch
    rows.append({
        "op": "conv feature encoder fwd+bwd",
        "batch": batch,
        "wall_ms": round(wall * 1e3, 3),
        "tflops_effective": round(flops_total / wall / 1e12, 2),
        "pct_of_bf16_peak": round(100 * flops_total / wall / V5E_BF16_PEAK, 1),
    })

    # --- full model fwd+bwd for the fraction-of-total measurement
    def full_fb(p, xx):
        def loss(v):
            return jnp.sum(wav2vec2_logits(p, cfg, v) ** 2)
        return jax.value_and_grad(loss)(xx)

    wall_full = _time(jax.jit(full_fb), params, x)
    rows.append({
        "op": "full wav2vec2 fwd+bwd",
        "batch": batch,
        "wall_ms": round(wall_full * 1e3, 3),
        "conv_encoder_pct_of_total": round(100 * wall / wall_full, 1),
    })

    # --- mel front-end (viz/metrics path; n_fft=1024 hop 512, librosa defaults)
    xm = jnp.asarray(rng.standard_normal((AUDIO_LEN,)).astype(np.float32))
    fmel = jax.jit(lambda v: log_mel_spectrogram(v, sr=16000))
    wall_mel = _time(fmel, xm)
    n_frames = 1 + AUDIO_LEN // 512
    mel_bytes = (AUDIO_LEN + n_frames * (513 + 80)) * 4
    rows.append({
        "op": "log-mel front-end (48k samples)",
        "wall_ms": round(wall_mel * 1e3, 3),
        "hbm_gb_per_s_lower_bound": round(mel_bytes / wall_mel / 1e9, 2),
        "pct_of_hbm_peak": round(100 * mel_bytes / wall_mel / V5E_HBM_GBS, 2),
    })

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        fh.write("# Kernel decision: conv feature encoder & mel front-end\n\n")
        fh.write("Measured on the bench TPU (v5e). Decision rule: build a\n"
                 "Pallas kernel only where XLA leaves a large fraction of the\n"
                 "explainer's wall-clock on the table.\n\n```json\n")
        for r in rows:
            fh.write(json.dumps(r) + "\n")
        fh.write("```\n")
    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
