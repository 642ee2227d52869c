from asr_shap.models.wav2vec2 import (
    init_wav2vec2_params,
    wav2vec2_logits,
    feature_lengths,
)
from asr_shap.models.heads import aggregation_head, make_explained_fn

__all__ = [
    "init_wav2vec2_params",
    "wav2vec2_logits",
    "feature_lengths",
    "aggregation_head",
    "make_explained_fn",
]
