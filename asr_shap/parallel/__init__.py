from asr_shap.parallel.mesh import make_mesh, data_sharding, replicated

__all__ = ["make_mesh", "data_sharding", "replicated"]
