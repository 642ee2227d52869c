from asr_shap.viz.wav_io import write_wav
from asr_shap.viz.static import (
    plot_eta_wer_scatter,
    plot_shap_spectrogram_overlay,
    plot_waveform_attribution,
)
from asr_shap.viz.interactive import AttributionViewer, load_attribution_view

__all__ = [
    "write_wav",
    "plot_eta_wer_scatter",
    "plot_shap_spectrogram_overlay",
    "plot_waveform_attribution",
    "AttributionViewer",
    "load_attribution_view",
]
