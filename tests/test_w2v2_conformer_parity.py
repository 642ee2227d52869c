"""Numerical parity of the pure-JAX Wav2Vec2-Conformer against torch
transformers (randomly-initialized, converted with models/convert_hf.py) —
the same offline-parity strategy as tests/test_wav2vec2_parity.py.

Covers both position-embedding schemes the reference studies use:
"relative" (w2v2conformer.py:57-59 rel-pos large) and "rotary"
(conformer_test.ipynb rope large), plus remat and the DeepSHAP dual mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from asr_shap.core.config import Wav2Vec2ConformerConfig
from asr_shap.models.convert_hf import convert_wav2vec2_conformer_state_dict
from asr_shap.models.w2v2_conformer import w2v2_conformer_logits

TINY = dict(
    vocab_size=32, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=2, intermediate_size=128,
    conv_dim=(32, 32), conv_stride=(5, 2), conv_kernel=(10, 3),
    conv_bias=True, feat_extract_norm="layer", feat_proj_dim=32,
    conv_depthwise_kernel_size=7, hidden_act="swish",
)


def _hf_model(cfg: Wav2Vec2ConformerConfig, seed: int = 0):
    hf_cfg = transformers.Wav2Vec2ConformerConfig(
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
        layer_norm_eps=cfg.layer_norm_eps,
        position_embeddings_type=cfg.position_embeddings_type,
        rotary_embedding_base=cfg.rotary_embedding_base,
        conv_depthwise_kernel_size=cfg.conv_depthwise_kernel_size,
        hidden_act=cfg.hidden_act,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        final_dropout=0.0,
        conformer_conv_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(seed)
    model = transformers.Wav2Vec2ConformerForCTC(hf_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def relpos_pair():
    cfg = Wav2Vec2ConformerConfig(**TINY, position_embeddings_type="relative")
    model = _hf_model(cfg)
    params = convert_wav2vec2_conformer_state_dict(model.state_dict(), cfg)
    return cfg, model, params


def test_relpos_logits_match_torch(relpos_pair, rng):
    cfg, model, params = relpos_pair
    x = rng.standard_normal((2, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).logits.numpy()
    ours = np.asarray(w2v2_conformer_logits(params, cfg, jnp.asarray(x)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-5)


def test_relpos_remat_matches(relpos_pair, rng):
    cfg, model, params = relpos_pair
    x = rng.standard_normal((1, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).logits.numpy()
    ours = np.asarray(w2v2_conformer_logits(params, cfg, jnp.asarray(x), remat=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-5)


def test_rotary_logits_match_torch(rng):
    cfg = Wav2Vec2ConformerConfig(**TINY, position_embeddings_type="rotary")
    model = _hf_model(cfg, seed=1)
    params = convert_wav2vec2_conformer_state_dict(model.state_dict(), cfg)
    x = rng.standard_normal((1, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).logits.numpy()
    ours = np.asarray(w2v2_conformer_logits(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-5)


def test_random_init_runs_and_differentiates(rng):
    from asr_shap.models.w2v2_conformer import init_w2v2_conformer_params

    cfg = Wav2Vec2ConformerConfig(**TINY, position_embeddings_type="relative")
    params = init_w2v2_conformer_params(jax.random.key(0), cfg)
    x = jnp.asarray(rng.standard_normal((1, 1600)).astype(np.float32))
    out = w2v2_conformer_logits(params, cfg, x)
    assert out.shape == (1, cfg.frames_for_samples(1600), 32)

    # the explainer backprops to the waveform
    g = jax.grad(lambda v: jnp.sum(w2v2_conformer_logits(params, cfg, v) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_single_token_logit_study(relpos_pair, rng):
    """The reference's Conformer study explains ONE chosen (timestep, token)
    logit (w2v2conformer.py:26-43): expected-gradients on the converted
    architecture with the token head must produce a [N, 1] attribution."""
    from asr_shap.core.config import ExplainerConfig
    from asr_shap.explain.baselines import zeros_noise_background
    from asr_shap.explain.expected_gradients import expected_gradients
    from asr_shap.models.heads import aggregation_head

    cfg, _, params = relpos_pair
    n = 1600
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    ec = ExplainerConfig(
        nsamples=4, draw_chunk=2, num_background=2,
        aggregation="token", token_timestep=3, token_id=5, remat=False,
    )

    def f(xx):
        logits = w2v2_conformer_logits(params, cfg, xx[None, :])
        return aggregation_head(logits, ec.aggregation, ec.token_timestep, ec.token_id)[0]

    bg = zeros_noise_background(jax.random.key(1), n, 2, 0.01)
    expl = expected_gradients(f, x, bg, jax.random.key(2), ec)
    assert expl.values.shape == (n, 1)
    assert np.isfinite(np.asarray(expl.values)).all()


def test_dual_mode_deepshap(relpos_pair, rng):
    """DeepSHAP dual forward on the conformer: halves match the plain
    forward, and deep_shap_values is finite with the token head (the
    reference's DeepExplainer nsamples=500 study, w2v2conformer.py:139-142)."""
    from asr_shap.explain.deepshap import deep_shap_values, gelu_rescale
    from asr_shap.models.conformer import deepshap_rules

    cfg, _, params = relpos_pair
    n = 800
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    r = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.01)

    d = jnp.stack([x, r])
    dual_out = w2v2_conformer_logits(
        params, cfg, d, rules=deepshap_rules(), gelu=gelu_rescale
    )
    plain_out = w2v2_conformer_logits(params, cfg, d)
    np.testing.assert_allclose(
        np.asarray(dual_out), np.asarray(plain_out), rtol=1e-5, atol=1e-6
    )

    def f_dual(dd):
        logits = w2v2_conformer_logits(
            params, cfg, dd, rules=deepshap_rules(), gelu=gelu_rescale
        )
        return logits[0, 3, 5][None]  # single (timestep, token) logit

    res = deep_shap_values(f_dual, x, r[None, :])
    assert res.values.shape == (n, 1)
    assert np.isfinite(np.asarray(res.values)).all()


def test_relpos_padded_batch_matches_torch_mask(relpos_pair, rng):
    """Padded batching: our lengths-based masking must match HF's
    attention_mask semantics over the valid frames (layer-norm feature
    extractor, so padding cannot leak through norm statistics)."""
    cfg, model, params = relpos_pair
    a = rng.standard_normal(1600).astype(np.float32)
    b = rng.standard_normal(1000).astype(np.float32)
    batch = np.zeros((2, 1600), np.float32)
    batch[0], batch[1, :1000] = a, b
    mask = np.zeros((2, 1600), np.int64)
    mask[0], mask[1, :1000] = 1, 1

    with torch.no_grad():
        ref = model(torch.from_numpy(batch),
                    attention_mask=torch.from_numpy(mask)).logits.numpy()
    ours = np.asarray(
        w2v2_conformer_logits(params, cfg, jnp.asarray(batch),
                              lengths=jnp.asarray([1600, 1000]))
    )
    t_b = cfg.frames_for_samples(1000)
    np.testing.assert_allclose(ours[0], ref[0], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ours[1, :t_b], ref[1, :t_b], rtol=1e-3, atol=1e-4)


def test_pallas_impl_handles_relpos_bias(relpos_pair, rng):
    """attention_impl="pallas" runs the rel-pos [B,H,T,T] score bias through
    the flash kernel itself (full-bias support; round 2 silently fell back
    to XLA here) and must match the xla impl — forward AND input-gradient,
    since the explainer differentiates through the rel-pos projections."""
    import dataclasses

    cfg, _, params = relpos_pair
    x = jnp.asarray(rng.standard_normal((1, 1600)).astype(np.float32))
    ref = np.asarray(w2v2_conformer_logits(params, cfg, x))
    cfg_p = dataclasses.replace(cfg, attention_impl="pallas")
    out = np.asarray(w2v2_conformer_logits(params, cfg_p, x))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def head(c):
        return lambda xx: jnp.sum(
            jnp.max(w2v2_conformer_logits(params, c, xx[None]), axis=-1)
        )

    g_ref = np.asarray(jax.grad(head(cfg))(x[0]))
    g_pal = np.asarray(jax.grad(head(cfg_p))(x[0]))
    np.testing.assert_allclose(g_pal, g_ref, rtol=5e-3, atol=1e-5)
