from asr_shap.core.config import (
    Wav2Vec2Config,
    ConformerConfig,
    ExplainerConfig,
    TestSetConfig,
    MetricConfig,
    TrainConfig,
    MeshConfig,
)
from asr_shap.core.store import AttributionStore

__all__ = [
    "Wav2Vec2Config",
    "ConformerConfig",
    "ExplainerConfig",
    "TestSetConfig",
    "MetricConfig",
    "TrainConfig",
    "MeshConfig",
    "AttributionStore",
]
