from asr_shap.parallel.mesh import make_mesh, data_sharding, replicated
from asr_shap.parallel.tp import shard_params_tp, tp_shardings

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_params_tp",
    "tp_shardings",
]
