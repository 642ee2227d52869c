"""Tensor-parallelism tests: Megatron-split param shardings on the virtual
(data, model) mesh must leave every model's logits unchanged (GSPMD inserts
the per-layer all-reduces) and keep waveform gradients flowing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_shap.core.config import MeshConfig, Wav2Vec2Config, Wav2Vec2ConformerConfig
from asr_shap.models.wav2vec2 import init_wav2vec2_params, wav2vec2_logits
from asr_shap.parallel import make_mesh, shard_params_tp, tp_shardings


@pytest.fixture(scope="module")
def tp_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (CPU run provides virtual)")
    return make_mesh(MeshConfig(data_parallel=4, model_parallel=2))


def test_tp_wav2vec2_logits_match(tp_mesh, tiny_config, rng):
    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    x = jnp.asarray(rng.standard_normal((2, 1600)).astype(np.float32))
    ref = np.asarray(wav2vec2_logits(params, tiny_config, x))

    tp_params = shard_params_tp(params, tp_mesh)
    # q/k/v kernels shard output features; out kernel shards input features
    layers = tp_params["encoder"]["layers"]
    assert layers["attention"]["q"]["kernel"].sharding.spec[-1] == "model"
    assert layers["attention"]["out"]["kernel"].sharding.spec[-2] == "model"
    assert layers["ffn"]["intermediate"]["bias"].sharding.spec[-1] == "model"

    with tp_mesh:
        out = np.asarray(
            jax.jit(lambda p, v: wav2vec2_logits(p, tiny_config, v))(tp_params, x)
        )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_tp_conformer_logits_match(tp_mesh, rng):
    from asr_shap.models.w2v2_conformer import (
        init_w2v2_conformer_params,
        w2v2_conformer_logits,
    )

    cfg = Wav2Vec2ConformerConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, conv_dim=(32, 32), conv_stride=(5, 2),
        conv_kernel=(10, 3), feat_proj_dim=32, conv_depthwise_kernel_size=7,
    )
    params = init_w2v2_conformer_params(jax.random.key(1), cfg)
    x = jnp.asarray(rng.standard_normal((1, 1600)).astype(np.float32))
    ref = np.asarray(w2v2_conformer_logits(params, cfg, x))
    tp_params = shard_params_tp(params, tp_mesh)
    with tp_mesh:
        out = np.asarray(
            jax.jit(lambda p, v: w2v2_conformer_logits(p, cfg, v))(tp_params, x)
        )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_tp_gradient_to_waveform(tp_mesh, tiny_config, rng):
    params = shard_params_tp(
        init_wav2vec2_params(jax.random.key(0), tiny_config), tp_mesh
    )
    x = jnp.asarray(rng.standard_normal((1, 1600)).astype(np.float32))
    with tp_mesh:
        g = jax.jit(
            jax.grad(lambda v: jnp.sum(wav2vec2_logits(params, tiny_config, v) ** 2))
        )(x)
    assert np.isfinite(np.asarray(g)).all()
