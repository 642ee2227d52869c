"""Test environment: CPU backend with 8 virtual devices so multi-chip
sharding (mesh/pjit/shard_map paths) is exercised without TPU hardware
(SURVEY.md section 4, multi-device-on-CPU tests)."""

import os

# Force CPU with 8 virtual devices. env vars are NOT enough here: the
# environment's sitecustomize imports jax at interpreter startup (capturing
# JAX_PLATFORMS=axon), so only jax.config.update takes effect.
# Set ASR_SHAP_TEST_TPU=1 to deliberately run the suite on real hardware.
if not os.environ.get("ASR_SHAP_TEST_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_config():
    """A small Wav2Vec2 config shared by model tests (fast CPU compiles)."""
    from asr_shap.core.config import Wav2Vec2Config

    return Wav2Vec2Config(
        vocab_size=32,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=128,
        conv_dim=(32, 32),
        conv_stride=(5, 2),
        conv_kernel=(10, 3),
        conv_bias=False,
        feat_extract_norm="group",
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        feat_proj_dim=32,
    )
