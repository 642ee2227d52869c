from asr_shap.ops.attention import multi_head_attention
from asr_shap.ops.ctc import ctc_greedy_decode, ctc_ids_to_text, ctc_loss

__all__ = ["multi_head_attention", "ctc_greedy_decode", "ctc_ids_to_text", "ctc_loss"]
