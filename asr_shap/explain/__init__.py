from asr_shap.explain.baselines import zeros_noise_background, kmeans_background
from asr_shap.explain.deepshap import (
    DeepExplanation,
    deep_explain_wav2vec2,
    deep_shap_values,
    dual,
    wav2vec2_dual_fn,
    gelu_rescale,
    glu_rescale,
    relu_rescale,
    sigmoid_rescale,
    silu_rescale,
    tanh_rescale,
)
from asr_shap.explain.expected_gradients import (
    Explanation,
    GradientExplainer,
    expected_gradients,
    expected_gradients_sharded,
)
from asr_shap.explain.kernel_shap import (
    KernelShapExplanation,
    kernel_shap_attributions,
)
from asr_shap.explain.lime import LimeExplanation, lime_attributions

__all__ = [
    "Explanation",
    "GradientExplainer",
    "expected_gradients",
    "expected_gradients_sharded",
    "zeros_noise_background",
    "kmeans_background",
    "DeepExplanation",
    "deep_shap_values",
    "deep_explain_wav2vec2",
    "wav2vec2_dual_fn",
    "dual",
    "silu_rescale",
    "gelu_rescale",
    "sigmoid_rescale",
    "tanh_rescale",
    "relu_rescale",
    "glu_rescale",
    "LimeExplanation",
    "lime_attributions",
    "KernelShapExplanation",
    "kernel_shap_attributions",
]
