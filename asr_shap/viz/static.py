"""Static host-side plots (matplotlib stays at the edge; all signal math is
the framework's own device-side mel/metrics).

Capabilities covered:
  * SHAP-heat spectrogram overlay (test_shap_asr.py:111-155,
    w2v2conformer.py:144-200)
  * waveform + per-sample attribution panels
    (audio_amplification_wav2vec2_test.py:132-164)
  * the eta_raw-vs-WER scatter (nraw_vs_wer.py:160-182)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from asr_shap.audio.mel import log_mel_spectrogram


def _plt():
    import matplotlib

    if matplotlib.get_backend().lower() not in ("agg",) and not _has_display():
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _has_display() -> bool:
    import os

    return bool(os.environ.get("DISPLAY"))


def plot_shap_spectrogram_overlay(
    audio: np.ndarray,
    shap_per_sample: np.ndarray,
    sr: int = 16_000,
    n_fft: int = 1024,
    hop_length: int = 512,
    n_mels: int = 80,
    title: str = "SHAP-weighted spectrogram",
    out_path: Optional[str] = None,
):
    """Mel spectrogram with a per-sample attribution heat band below it."""
    plt = _plt()
    mel = np.asarray(
        log_mel_spectrogram(audio, sr=sr, n_fft=n_fft, hop_length=hop_length,
                            n_mels=n_mels, log="db")
    ).T  # [mels, frames]

    fig, (ax0, ax1) = plt.subplots(
        2, 1, figsize=(12, 6), sharex=False, height_ratios=[4, 1]
    )
    im = ax0.imshow(mel, aspect="auto", origin="lower", cmap="magma")
    ax0.set_title(title)
    ax0.set_ylabel("mel bin")
    fig.colorbar(im, ax=ax0, format="%+2.0f dB")

    t = np.arange(len(audio)) / sr
    heat = np.abs(np.asarray(shap_per_sample))
    ax1.fill_between(t, heat, color="tab:red", alpha=0.8)
    ax1.set_xlabel("time [s]")
    ax1.set_ylabel("|phi|")
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
    return fig


def plot_waveform_attribution(
    audio: np.ndarray,
    shap_per_sample: np.ndarray,
    amplified: Optional[np.ndarray] = None,
    sr: int = 16_000,
    out_path: Optional[str] = None,
):
    """Waveform, attribution, and optional SHAP-amplified audio panels."""
    plt = _plt()
    t = np.arange(len(audio)) / sr
    rows = 3 if amplified is not None else 2
    fig, axes = plt.subplots(rows, 1, figsize=(12, 2.5 * rows), sharex=True)
    axes[0].plot(t, audio, lw=0.4)
    axes[0].set_ylabel("waveform")
    axes[1].plot(t, np.asarray(shap_per_sample), lw=0.4, color="tab:red")
    axes[1].set_ylabel("phi")
    if amplified is not None:
        axes[2].plot(t, amplified, lw=0.4, color="tab:green")
        axes[2].set_ylabel("amplified")
    axes[-1].set_xlabel("time [s]")
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
    return fig


def plot_eta_wer_scatter(
    records: Sequence[Dict],
    out_path: Optional[str] = "wer_vs_eta_raw_plot.png",
    annotate_corr: bool = True,
):
    """Scatter of eta_raw against WER across the sweep, colored by SNR
    (the output artifact of nraw_vs_wer.py:160-182)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 6))
    snrs = sorted({str(r["snr"]) for r in records})
    cmap = plt.get_cmap("viridis")
    for i, snr in enumerate(snrs):
        pts = [(r["wer"], r["eta_raw"]) for r in records if str(r["snr"]) == snr]
        if not pts:
            continue
        w, e = np.asarray(pts).T
        ax.scatter(w, e, label=f"SNR {snr} dB", color=cmap(i / max(1, len(snrs) - 1)))
    ax.set_xlabel("WER")
    ax.set_ylabel(r"$\eta_{raw}$")
    ax.set_title("Attribution speech-relevance vs transcription quality")
    ax.legend()
    if annotate_corr:
        from asr_shap.pipeline.sweep import correlation

        corr = correlation(list(records))
        if corr is not None:
            ax.annotate(f"Pearson r = {corr:.3f}", xy=(0.02, 0.95),
                        xycoords="axes fraction")
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
    return fig


def plot_faithfulness_curves(
    records_by_label: Dict[str, Sequence[Dict]],
    out_path: Optional[str] = "faithfulness_curves.png",
):
    """Mean WER-vs-occlusion-fraction curves from faithfulness records
    (metrics/faithfulness.py::faithfulness_curve): one color per label
    (e.g. explainer family), attribution ranking solid, the seeded
    random-ranking control dashed. The vertical gap between a family's
    solid and dashed curves IS its deletion/insertion faithfulness."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 6))
    cmap = plt.get_cmap("viridis")
    labels = list(records_by_label)
    mode = None
    for i, label in enumerate(labels):
        recs = list(records_by_label[label])
        if not recs:
            continue
        mode = recs[0].get("mode", mode)
        fracs = [0.0] + [p["fraction"] for p in recs[0]["points"]]
        topk = np.zeros(len(fracs))
        rand = np.zeros(len(fracs))
        for r in recs:
            topk += [r["base_wer"]] + [p["wer_topk"] for p in r["points"]]
            rand += [r["base_wer"]] + [p["wer_random"] for p in r["points"]]
        topk /= len(recs)
        rand /= len(recs)
        color = cmap(i / max(1, len(labels) - 1))
        ax.plot(fracs, topk, "-o", color=color,
                label=f"{label} (attribution)")
        ax.plot(fracs, rand, "--", color=color,
                label=f"{label} (random)")
    ax.set_xlabel("occluded fraction of samples")
    ax.set_ylabel("mean WER")
    ax.set_title(f"{mode or 'occlusion'} faithfulness: "
                 "attribution ranking vs random control")
    ax.legend()
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
    return fig
