from asr_shap.models.wav2vec2 import (
    init_wav2vec2_params,
    wav2vec2_logits,
    feature_lengths,
)
from asr_shap.models.heads import aggregation_head, make_explained_fn
from asr_shap.models.w2v2_conformer import (
    init_w2v2_conformer_params,
    w2v2_conformer_logits,
)
from asr_shap.models.nemo_ctc import (
    init_nemo_ctc_params,
    nemo_conformer_config,
    nemo_ctc_decode,
    nemo_ctc_logits,
)

__all__ = [
    "init_wav2vec2_params",
    "wav2vec2_logits",
    "feature_lengths",
    "aggregation_head",
    "make_explained_fn",
    "init_w2v2_conformer_params",
    "w2v2_conformer_logits",
    "init_nemo_ctc_params",
    "nemo_conformer_config",
    "nemo_ctc_decode",
    "nemo_ctc_logits",
]
