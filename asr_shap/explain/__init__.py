from asr_shap.explain.baselines import zeros_noise_background, kmeans_background
from asr_shap.explain.expected_gradients import (
    Explanation,
    GradientExplainer,
    expected_gradients,
    expected_gradients_sharded,
)

__all__ = [
    "Explanation",
    "GradientExplainer",
    "expected_gradients",
    "expected_gradients_sharded",
    "zeros_noise_background",
    "kmeans_background",
]
