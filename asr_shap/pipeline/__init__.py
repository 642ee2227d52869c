from asr_shap.pipeline.testset import create_test_set, synthetic_speech
from asr_shap.pipeline.run_shap import run_shap_pipeline
from asr_shap.pipeline.sweep import eta_wer_sweep

__all__ = [
    "create_test_set",
    "synthetic_speech",
    "run_shap_pipeline",
    "eta_wer_sweep",
]
