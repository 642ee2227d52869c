from asr_shap.metrics.eta_raw import eta_raw
from asr_shap.metrics.wer import wer, word_edit_counts
from asr_shap.metrics.confidence import mean_max_softmax_confidence
from asr_shap.metrics.faithfulness import (
    faithfulness_curve,
    faithfulness_summary,
    make_transcribe_fn,
)

__all__ = [
    "eta_raw",
    "wer",
    "word_edit_counts",
    "mean_max_softmax_confidence",
    "faithfulness_curve",
    "faithfulness_summary",
    "make_transcribe_fn",
]
