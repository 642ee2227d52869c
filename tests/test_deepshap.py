"""DeepSHAP rescale-rule tests: exact completeness on feedforward chains
(the property DeepLIFT guarantees for linear+elementwise nets), the GLU
split-gate rule against an analytic 2-player Shapley oracle (the
visualize_glu_shap.py:23-49 validation pattern), and dual-mode Conformer
forwards."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asr_shap.core.config import ConformerConfig
from asr_shap.explain.deepshap import (
    deep_shap_values,
    dual,
    glu_rescale,
    silu_rescale,
)
from asr_shap.models.conformer import (
    PLAIN_RULES,
    conformer_logits,
    deepshap_rules,
    init_conformer_params,
)


def test_rescale_completeness_single_op(rng):
    """phi for a lone SiLU equals f(x)-f(r) elementwise (rescale is exact)."""
    n = 16
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    r = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    f_dual = lambda d: silu_rescale(d)[0]
    res = deep_shap_values(f_dual, x, r[None, :])
    # output j depends only on input j: phi is diagonal with f(x_j)-f(r_j)
    phi = np.asarray(res.values)
    diag = np.diag(phi)
    np.testing.assert_allclose(
        diag, np.asarray(jax.nn.silu(x) - jax.nn.silu(r)), rtol=1e-5, atol=1e-6
    )
    off = phi - np.diag(diag)
    assert np.abs(off).max() < 1e-6


def test_rescale_completeness_mlp_chain(rng):
    """Exact completeness through Linear -> SiLU -> Linear (DeepLIFT's
    guarantee for feedforward linear+elementwise nets)."""
    n, h, t = 10, 24, 3
    w1 = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32) * 0.5)
    w2 = jnp.asarray(rng.standard_normal((h, t)).astype(np.float32) * 0.5)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    r = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.2)

    def f_dual(d):
        h_ = jnp.einsum("bi,ih->bh", d, w1, precision="highest")
        h_ = silu_rescale(h_)
        return jnp.einsum("bh,ht->bt", h_, w2, precision="highest")[0]

    res = deep_shap_values(f_dual, x, r[None, :])
    total = np.asarray(res.values).sum(axis=0)
    target = np.asarray(res.model_output - res.base_values)
    np.testing.assert_allclose(total, target, rtol=1e-4, atol=1e-5)


def test_glu_split_gate_analytic_oracle(rng):
    """The GLU rule must produce the exact 2-player Shapley decomposition:
    phi_a = da*(sig(b)+sig(br))/2, phi_b = (a+ar)/2*dsig."""
    m = 8
    x = jnp.asarray(rng.standard_normal(2 * m).astype(np.float32))
    r = jnp.asarray(rng.standard_normal(2 * m).astype(np.float32) * 0.3)

    f_dual = lambda d: glu_rescale(d, -1)[0]
    res = deep_shap_values(f_dual, x, r[None, :])
    phi = np.asarray(res.values)  # [2m, m]

    a, b = np.asarray(x[:m]), np.asarray(x[m:])
    ar, br = np.asarray(r[:m]), np.asarray(r[m:])
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    phi_a = (a - ar) * (sig(b) + sig(br)) / 2.0
    phi_b = (a + ar) / 2.0 * (sig(b) - sig(br))

    np.testing.assert_allclose(np.diag(phi[:m]), phi_a, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.diag(phi[m:]), phi_b, rtol=1e-4, atol=1e-6)
    # exact completeness of the split
    np.testing.assert_allclose(
        phi_a + phi_b, a * sig(b) - ar * sig(br), rtol=1e-4, atol=1e-6
    )


def test_glu_in_linear_sandwich_completeness(rng):
    n, m, t = 12, 8, 2
    w1 = jnp.asarray(rng.standard_normal((n, 2 * m)).astype(np.float32) * 0.5)
    w2 = jnp.asarray(rng.standard_normal((m, t)).astype(np.float32) * 0.5)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    r = jnp.zeros(n)

    def f_dual(d):
        h = jnp.einsum("bi,ih->bh", d, w1, precision="highest")
        h = glu_rescale(h, -1)
        return jnp.einsum("bh,ht->bt", h, w2, precision="highest")[0]

    res = deep_shap_values(f_dual, x, r[None, :])
    total = np.asarray(res.values).sum(axis=0)
    target = np.asarray(res.model_output - res.base_values)
    np.testing.assert_allclose(total, target, rtol=1e-4, atol=1e-5)


def test_multi_background_average(rng):
    """DeepExplainer averages attributions over the background rows."""
    n = 6
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    bg = jnp.asarray(rng.standard_normal((4, n)).astype(np.float32))
    f_dual = lambda d: silu_rescale(d)[0]

    res_all = deep_shap_values(f_dual, x, bg)
    singles = [np.asarray(deep_shap_values(f_dual, x, bg[i : i + 1]).values)
               for i in range(4)]
    np.testing.assert_allclose(
        np.asarray(res_all.values), np.mean(singles, axis=0), rtol=1e-5, atol=1e-7
    )


# ------------------------------------------------------------- conformer

@pytest.fixture(scope="module")
def tiny_conformer():
    cfg = ConformerConfig(
        vocab_size=32, input_dim=16, hidden_size=32, num_layers=2,
        num_attention_heads=2, ffn_expansion=2, conv_kernel_size=7,
        conv_norm="group", num_conv_groups=1,
    )
    params = init_conformer_params(jax.random.key(0), cfg)
    return cfg, params


def test_conformer_shapes_and_finite(tiny_conformer, rng):
    cfg, params = tiny_conformer
    feats = jnp.asarray(rng.standard_normal((2, 20, 16)).astype(np.float32))
    logits = conformer_logits(params, cfg, feats)
    assert logits.shape == (2, 20, 32)
    assert np.isfinite(np.asarray(logits)).all()


def test_conformer_batchnorm_variant(rng):
    cfg = ConformerConfig(input_dim=16, hidden_size=32, num_layers=1,
                          num_attention_heads=2, conv_kernel_size=7,
                          conv_norm="batch")
    params = init_conformer_params(jax.random.key(1), cfg)
    feats = jnp.asarray(rng.standard_normal((1, 12, 16)).astype(np.float32))
    out = conformer_logits(params, cfg, feats)
    assert np.isfinite(np.asarray(out)).all()


def test_conformer_dual_forward_matches_plain(tiny_conformer, rng):
    """A dual forward's two halves must equal two independent plain
    forwards — the rescale rules only alter the backward."""
    cfg, params = tiny_conformer
    xa = jnp.asarray(rng.standard_normal((20, 16)).astype(np.float32))
    xr = jnp.asarray(rng.standard_normal((20, 16)).astype(np.float32) * 0.1)
    d = jnp.stack([xa, xr])
    out_dual = conformer_logits(params, cfg, d, rules=deepshap_rules())
    out_plain = conformer_logits(params, cfg, d, rules=PLAIN_RULES)
    np.testing.assert_allclose(
        np.asarray(out_dual), np.asarray(out_plain), rtol=1e-5, atol=1e-6
    )


def test_conformer_deepshap_end_to_end(tiny_conformer, rng):
    """DeepSHAP on the Conformer (the w2v2conformer.py:139-142 study,
    single-token head): finite, deterministic, correct layout."""
    cfg, params = tiny_conformer
    t, fdim = 12, 16
    x = jnp.asarray(rng.standard_normal(t * fdim).astype(np.float32))
    bg = jnp.asarray(rng.standard_normal((3, t * fdim)).astype(np.float32) * 0.01)

    def f_dual(d):
        feats = d.reshape(2, t, fdim)
        logits = conformer_logits(params, cfg, feats, rules=deepshap_rules())
        return jnp.max(logits[0], axis=-1)  # [T]

    res = deep_shap_values(f_dual, x, bg)
    assert res.values.shape == (t * fdim, t)
    assert np.isfinite(np.asarray(res.values)).all()
    res2 = deep_shap_values(f_dual, x, bg)
    np.testing.assert_array_equal(np.asarray(res.values), np.asarray(res2.values))


# ------------------------------------------------------------- wav2vec2

def test_wav2vec2_dual_forward_matches_plain(tiny_config, rng):
    """The rescale rule only alters the backward: a dual forward's halves
    equal a plain batched forward exactly."""
    from asr_shap.explain.deepshap import gelu_rescale
    from asr_shap.models.wav2vec2 import init_wav2vec2_params, wav2vec2_logits

    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    x = jnp.asarray(rng.standard_normal(800).astype(np.float32))
    r = jnp.asarray(rng.standard_normal(800).astype(np.float32) * 0.01)
    d = jnp.stack([x, r])
    out_dual = wav2vec2_logits(params, tiny_config, d, gelu=gelu_rescale)
    out_plain = wav2vec2_logits(params, tiny_config, d)
    np.testing.assert_array_equal(np.asarray(out_dual), np.asarray(out_plain))


def test_wav2vec2_deepshap_zero_at_own_background(tiny_config, rng):
    """With background == x the attributions are exactly zero (phi carries
    the (x - ref) factor and all multipliers stay finite at delta = 0)."""
    from asr_shap.core.config import ExplainerConfig
    from asr_shap.explain.deepshap import deep_explain_wav2vec2
    from asr_shap.models.wav2vec2 import init_wav2vec2_params

    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    x = jnp.asarray(rng.standard_normal(800).astype(np.float32))
    ec = ExplainerConfig(aggregation="mean", remat=False)
    res = deep_explain_wav2vec2(params, tiny_config, x, x[None, :], ec)
    phi = np.asarray(res.values)
    assert np.isfinite(phi).all()
    np.testing.assert_array_equal(phi, np.zeros_like(phi))


def test_feature_encoder_rescale_completeness(rng):
    """Exact DeepLIFT completeness through the conv+GELU feature encoder
    (norm-free variant): conv is linear, GELU uses the rescale rule, so
    sum_n phi[n] == f(x) - f(r) to float tolerance. On the full transformer
    completeness is approximate only — norm layers take the plain-gradient
    linear_1d treatment, the same assignment as the reference's handlers
    (custom_shap_handlers.py:35-42, 53-60)."""
    from asr_shap.core.config import Wav2Vec2Config
    from asr_shap.explain.deepshap import deep_shap_values, gelu_rescale
    from asr_shap.models.wav2vec2 import feature_encoder, init_wav2vec2_params

    cfg = Wav2Vec2Config(
        conv_dim=(8, 8), conv_stride=(5, 2), conv_kernel=(10, 3),
        conv_bias=True, feat_extract_norm="none",
    )
    params = init_wav2vec2_params(jax.random.key(0), cfg)
    n = 300
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    bg = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32) * 0.1)

    def f_dual(d):
        feats = feature_encoder(params, cfg, d, gelu=gelu_rescale)  # [2, T, C]
        return jnp.sum(feats[0], axis=-1)  # [T] linear readout

    res = deep_shap_values(f_dual, x, bg)
    total = np.asarray(res.values).sum(axis=0)
    target = np.asarray(res.model_output - res.base_values)
    np.testing.assert_allclose(total, target, rtol=1e-3, atol=1e-4)


def test_wav2vec2_deepshap_end_to_end(tiny_config, rng):
    """DeepExplainer-on-Wav2Vec2 (reference test_shap_asr.py:66-67): correct
    layout, finite, deterministic, and sensitive to the input."""
    from asr_shap.core.config import ExplainerConfig
    from asr_shap.explain.deepshap import deep_explain_wav2vec2
    from asr_shap.models.wav2vec2 import init_wav2vec2_params

    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    n = 800
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    bg = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32) * 0.01)
    ec = ExplainerConfig(aggregation="mean", remat=False)

    res = deep_explain_wav2vec2(params, tiny_config, x, bg, ec)
    t = tiny_config.frames_for_samples(n)
    assert res.values.shape == (n, t)
    phi = np.asarray(res.values)
    assert np.isfinite(phi).all()
    assert np.abs(phi).max() > 0.0

    res2 = deep_explain_wav2vec2(params, tiny_config, x, bg, ec)
    np.testing.assert_array_equal(phi, np.asarray(res2.values))
