from asr_shap.utils.debug import check_finite, trace_to

__all__ = ["check_finite", "trace_to"]
