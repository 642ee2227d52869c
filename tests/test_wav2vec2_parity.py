"""Numerical parity of the pure-JAX Wav2Vec2 against torch transformers.

Since the environment has no network access, parity is established on
randomly-initialized HF models: instantiate torch Wav2Vec2ForCTC from config,
convert its state_dict with models/convert_hf.py, and require logits to match
within float32 tolerance. This validates every architectural detail (conv
arithmetic, GroupNorm, exact-GELU, weight-normed positional conv, post-LN
ordering, CTC head) — SURVEY.md section 7 "bit-level preprocessing parity".
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from asr_shap.core.config import Wav2Vec2Config
from asr_shap.models.convert_hf import convert_wav2vec2_state_dict
from asr_shap.models.wav2vec2 import feature_lengths, wav2vec2_logits


def _hf_model(cfg: Wav2Vec2Config, seed: int = 0):
    hf_cfg = transformers.Wav2Vec2Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        conv_dim=list(cfg.conv_dim),
        conv_stride=list(cfg.conv_stride),
        conv_kernel=list(cfg.conv_kernel),
        conv_bias=cfg.conv_bias,
        feat_extract_norm=cfg.feat_extract_norm,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        do_stable_layer_norm=cfg.do_stable_layer_norm,
        layer_norm_eps=cfg.layer_norm_eps,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(seed)
    model = transformers.Wav2Vec2ForCTC(hf_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def tiny_pair():
    cfg = Wav2Vec2Config(
        vocab_size=32, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128,
        conv_dim=(32, 32), conv_stride=(5, 2), conv_kernel=(10, 3),
        conv_bias=False, feat_extract_norm="group",
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        feat_proj_dim=32,
    )
    model = _hf_model(cfg)
    params = convert_wav2vec2_state_dict(model.state_dict(), cfg)
    return cfg, model, params


def test_logits_match_torch(tiny_pair, rng):
    cfg, model, params = tiny_pair
    x = rng.standard_normal((2, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).logits.numpy()
    ours = np.asarray(wav2vec2_logits(params, cfg, jnp.asarray(x)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-5)


def test_logits_match_torch_with_remat(tiny_pair, rng):
    cfg, model, params = tiny_pair
    x = rng.standard_normal((1, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).logits.numpy()
    ours = np.asarray(wav2vec2_logits(params, cfg, jnp.asarray(x), remat=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-5)


def test_stable_layer_norm_variant_matches_torch(rng):
    cfg = Wav2Vec2Config(
        vocab_size=32, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128,
        conv_dim=(32, 32), conv_stride=(5, 2), conv_kernel=(10, 3),
        conv_bias=True, feat_extract_norm="layer",
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True, feat_proj_dim=32,
    )
    model = _hf_model(cfg, seed=1)
    params = convert_wav2vec2_state_dict(model.state_dict(), cfg)
    x = rng.standard_normal((1, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).logits.numpy()
    ours = np.asarray(wav2vec2_logits(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-5)


def test_feature_lengths_match_conv_output(tiny_pair, rng):
    cfg, _, params = tiny_pair
    for n in (1600, 1601, 2000, 4321):
        x = jnp.zeros((1, n))
        t = wav2vec2_logits(params, cfg, x).shape[1]
        assert int(feature_lengths(cfg, jnp.asarray([n]))[0]) == t
        assert cfg.frames_for_samples(n) == t


def test_padded_batch_matches_unpadded(rng):
    """A short clip padded inside a batch must produce the same logits (over
    its valid frames) as the same clip alone — attention-mask correctness.

    Uses the feat_extract_norm="layer" variant: with "group" norm, statistics
    couple across (padded) time, so padded batching is unsupported there —
    the same restriction HF documents for wav2vec2-base.
    """
    cfg = Wav2Vec2Config(
        vocab_size=32, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128,
        conv_dim=(32, 32), conv_stride=(5, 2), conv_kernel=(10, 3),
        conv_bias=True, feat_extract_norm="layer",
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True, feat_proj_dim=32,
    )
    model = _hf_model(cfg, seed=2)
    params = convert_wav2vec2_state_dict(model.state_dict(), cfg)
    a = rng.standard_normal(1600).astype(np.float32)
    b = rng.standard_normal(1000).astype(np.float32)
    alone = np.asarray(wav2vec2_logits(params, cfg, jnp.asarray(b)[None]))
    batch = np.zeros((2, 1600), np.float32)
    batch[0] = a
    batch[1, :1000] = b
    lengths = jnp.asarray([1600, 1000])
    both = np.asarray(wav2vec2_logits(params, cfg, jnp.asarray(batch), lengths))
    t_b = cfg.frames_for_samples(1000)
    np.testing.assert_allclose(both[1, :t_b], alone[0], rtol=1e-3, atol=1e-4)


def test_converter_golden_fixture(rng):
    """Regression pin for the full-size converter+forward combo
    (models/convert_hf.py:121-148): a fixed-seed torch base-960h-architecture
    model, converted, must reproduce the committed logits fixture
    (tests/fixtures/hf_convert_golden.npz). Catches silent numeric drift in
    either the converter mapping or the forward."""
    import os

    import jax.numpy as jnp

    fix = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                               "hf_convert_golden.npz"))
    cfg = Wav2Vec2Config()
    hf_cfg = transformers.Wav2Vec2Config(
        apply_spec_augment=False, layerdrop=0.0, hidden_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0, final_dropout=0.0,
    )
    torch.manual_seed(0)
    model = transformers.Wav2Vec2ForCTC(hf_cfg)
    model.eval()
    params = convert_wav2vec2_state_dict(model.state_dict(), cfg)

    audio = np.asarray(
        np.sin(2 * np.pi * 220 * np.arange(16000) / 16000)
        + 0.1 * np.random.default_rng(7).standard_normal(16000),
        np.float32,
    )
    np.testing.assert_allclose(audio[:64], fix["audio_head"], atol=0)

    ours = np.asarray(wav2vec2_logits(params, cfg, jnp.asarray(audio)[None]))
    assert ours.shape[1] == int(fix["t_frames"])
    np.testing.assert_allclose(ours[0, :4, :], fix["logits_frames"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours.mean(), fix["logits_mean"], atol=1e-5)
    np.testing.assert_allclose(ours.std(), fix["logits_std"], rtol=1e-4)


def test_bf16_mixed_precision_path(rng):
    """config.dtype="bfloat16" runs params+activations in bf16 with f32 norm
    statistics and f32 logits out; values stay within bf16 tolerance of the
    f32 path and gradients (the explainer's food) stay finite."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from asr_shap.models.wav2vec2 import init_wav2vec2_params

    cfg32 = Wav2Vec2Config(
        vocab_size=32, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128,
        conv_dim=(32, 32), conv_stride=(5, 2), conv_kernel=(10, 3),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        feat_proj_dim=32,
    )
    cfg16 = dataclasses.replace(cfg32, dtype="bfloat16", matmul_precision="default")
    params = init_wav2vec2_params(jax.random.key(0), cfg32)  # f32 master copy
    x = jnp.asarray(rng.standard_normal((1, 1600)).astype(np.float32))

    lg32 = wav2vec2_logits(params, cfg32, x)
    lg16 = wav2vec2_logits(params, cfg16, x)
    assert lg16.dtype == jnp.float32  # cast back at the boundary
    scale = np.abs(np.asarray(lg32)).mean()
    assert np.abs(np.asarray(lg16) - np.asarray(lg32)).mean() < 0.05 * scale

    g = jax.grad(lambda v: jnp.sum(wav2vec2_logits(params, cfg16, v) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_conv1d_gemm_matches_lax(rng):
    """The stride-blocked GEMM conv (the TPU-native hot path — see
    _conv1d_gemm) must match lax.conv in value AND in input-VJP across the
    feature-encoder shapes (k10/s5, k3/s2, k2/s2) plus a non-dividing
    (k5/s3) case and odd lengths."""
    import jax
    import jax.numpy as jnp

    from asr_shap.models.wav2vec2 import _conv1d

    for k, s, cin, cout, t in [
        (10, 5, 1, 16, 997),
        (3, 2, 16, 12, 498),
        (2, 2, 12, 8, 61),
        (5, 3, 4, 8, 100),
    ]:
        x = jnp.asarray(rng.standard_normal((2, t, cin)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, cin, cout)), jnp.float32)

        y_lax = _conv1d(x, w, stride=s, impl="lax")
        ct = jnp.asarray(rng.standard_normal(y_lax.shape), jnp.float32)
        dx_lax = jax.vjp(lambda a: _conv1d(a, w, stride=s, impl="lax"), x)[1](ct)[0]
        dw_lax = jax.vjp(lambda b: _conv1d(x, b, stride=s, impl="lax"), w)[1](ct)[0]
        for impl in ("gemm", "hybrid"):
            y = _conv1d(x, w, stride=s, impl=impl)
            assert y.shape == y_lax.shape == (2, (t - k) // s + 1, cout)
            np.testing.assert_allclose(y, y_lax, atol=2e-5, rtol=1e-5)
            dx = jax.vjp(lambda a: _conv1d(a, w, stride=s, impl=impl), x)[1](ct)[0]
            np.testing.assert_allclose(dx, dx_lax, atol=2e-4, rtol=1e-4)
            dw = jax.vjp(lambda b: _conv1d(x, b, stride=s, impl=impl), w)[1](ct)[0]
            np.testing.assert_allclose(dw, dw_lax, atol=2e-3, rtol=1e-4)


def test_remat_dots_policy_grads_match_full(rng):
    """remat_policy="dots" (store matmul outputs, recompute elementwise)
    must produce identical input gradients to the full-replay policy.
    (Measured on the bench chip: throughput within noise of "full" —
    r3_remat_ab rows — so "full" stays default; the knob is kept because
    the tradeoff is memory-profile-dependent.)"""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from asr_shap.core.config import Wav2Vec2Config
    from asr_shap.models.wav2vec2 import init_wav2vec2_params, wav2vec2_logits

    cfg = Wav2Vec2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, conv_dim=(32, 32), conv_stride=(5, 2),
        conv_kernel=(10, 3), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, feat_proj_dim=32,
    )
    p = init_wav2vec2_params(jax.random.key(0), cfg)
    x = jnp.asarray(rng.standard_normal((1, 4000)), jnp.float32)

    def grad_for(c):
        return jax.grad(lambda xx: wav2vec2_logits(p, c, xx, remat=True).sum())(x)

    g_full = grad_for(cfg)
    g_dots = grad_for(dataclasses.replace(cfg, remat_policy="dots"))
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_dots),
                               atol=1e-5)


def test_conv1d_pallas_dgrad_matches_lax(rng):
    """The fused polyphase Pallas dgrad (kernels/conv_dgrad.py, interpret
    mode on CPU) must match lax.conv's input-VJP across the lane-aligned
    feature-encoder tap/stride shapes, including multi-tile grids (halo
    rows across the 256-row tile boundary), ragged final tiles, and the
    explainer's vmapped-cotangent-batch pattern
    (explain/expected_gradients.py::_jacobian)."""
    import jax
    import jax.numpy as jnp

    from asr_shap.kernels.conv_dgrad import conv1d_dgrad
    from asr_shap.models.wav2vec2 import _conv1d

    for k, s, t in [
        (3, 2, 1201),  # multi-tile: T_out=600 > TV, exercises halo
        (3, 2, 498),
        (2, 2, 61),
        (5, 3, 802),   # non-dividing K/s, phase r=2 has no second tap
    ]:
        cin = cout = 128
        x = jnp.asarray(rng.standard_normal((2, t, cin)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.1, jnp.float32)

        y_lax = _conv1d(x, w, stride=s, impl="lax")
        y = _conv1d(x, w, stride=s, impl="pallas")
        np.testing.assert_allclose(y, y_lax, atol=2e-4, rtol=1e-5)

        ct = jnp.asarray(rng.standard_normal(y_lax.shape), jnp.float32)
        dx_lax = jax.vjp(lambda a: _conv1d(a, w, stride=s, impl="lax"),
                         x)[1](ct)[0]
        dx = conv1d_dgrad(ct, w, s, t)
        np.testing.assert_allclose(dx, dx_lax, atol=2e-3, rtol=1e-4)

        dx2 = jax.vjp(lambda a: _conv1d(a, w, stride=s, impl="pallas"),
                      x)[1](ct)[0]
        np.testing.assert_allclose(dx2, dx_lax, atol=2e-3, rtol=1e-4)

        dw = jax.vjp(lambda b: _conv1d(x, b, stride=s, impl="pallas"),
                     w)[1](ct)[0]
        dw_lax = jax.vjp(lambda b: _conv1d(x, b, stride=s, impl="lax"),
                         w)[1](ct)[0]
        np.testing.assert_allclose(dw, dw_lax, atol=5e-3, rtol=1e-4)

    # The explainer's pattern: vmap a one-hot cotangent basis through the
    # VJP closure — the pallas_call inside the custom VJP must batch.
    k, s, t, cin, cout = 3, 2, 340, 128, 128
    x1 = jnp.asarray(rng.standard_normal((1, t, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.1, jnp.float32)

    def scalar_rows(impl):
        f = lambda a: _conv1d(a, w, stride=s, impl=impl).sum(-1)[0]  # [T_out]
        y, vjp_fn = jax.vjp(f, x1)
        eye = jnp.eye(y.shape[0], dtype=y.dtype)
        return jax.vmap(lambda e: vjp_fn(e)[0])(eye)

    np.testing.assert_allclose(scalar_rows("pallas"), scalar_rows("lax"),
                               atol=2e-3, rtol=1e-4)

    # Lane-degenerate first layer (C_in=1) must fall back to lax, not crash.
    x0 = jnp.asarray(rng.standard_normal((1, 997, 1)), jnp.float32)
    w0 = jnp.asarray(rng.standard_normal((10, 1, 128)) * 0.1, jnp.float32)
    np.testing.assert_allclose(
        _conv1d(x0, w0, stride=5, impl="pallas"),
        _conv1d(x0, w0, stride=5, impl="lax"), atol=2e-4, rtol=1e-5)
