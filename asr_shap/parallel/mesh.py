"""Device mesh construction and sharding helpers.

The reference is single-process/single-device (SURVEY.md section 2.3: no
DP/TP/PP/SP/EP, no distributed backend). Here scale comes from a
``jax.sharding.Mesh``: the expected-gradients draw axis and the test-set
sample axis shard over the "data" axis (ICI collectives via psum), and a
"model" axis is reserved for tensor-parallel params of larger variants.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from asr_shap.core.config import MeshConfig


def make_mesh(config: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    mp = max(1, config.model_parallel)
    dp = config.data_parallel if config.data_parallel > 0 else n // mp
    if dp * mp > n:
        raise ValueError(f"mesh {dp}x{mp} needs {dp*mp} devices, have {n}")
    arr = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, axis_names=(config.data_axis, config.model_axis))


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard dimension ``axis`` of an ndim-array over the mesh data axis."""
    spec = [None] * ndim
    spec[axis] = mesh.axis_names[0]
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
