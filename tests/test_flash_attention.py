"""Pallas flash-attention kernel vs the XLA reference path: forward and
backward (custom VJP), with and without padding masks, at non-aligned
sequence lengths. Runs in interpreter mode on CPU — the same kernel code that
compiles on TPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asr_shap.kernels.flash_attention import flash_attention
from asr_shap.ops.attention import _xla_attention


def _rand_qkv(rng, b, h, t, d):
    def r():
        return jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))

    return r(), r(), r()


@pytest.mark.parametrize("t", [49, 128, 300])
def test_forward_matches_xla(rng, t):
    q, k, v = _rand_qkv(rng, 2, 3, t, 64)
    ref = _xla_attention(q, k, v, None)
    out = flash_attention(q, k, v, None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_forward_with_mask_matches_xla(rng):
    b, h, t, d = 2, 2, 90, 64
    q, k, v = _rand_qkv(rng, b, h, t, d)
    valid = jnp.asarray([[90], [60]])
    mask = (jnp.arange(t)[None, :] < valid).astype(jnp.float32)  # [B, T]
    bias = jnp.where(mask, 0.0, -1e9)[:, None, None, :]
    ref = _xla_attention(q, k, v, bias)
    out = flash_attention(q, k, v, bias, interpret=True)
    # compare only valid query rows of sample 1
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out[1, :, :60]), np.asarray(ref[1, :, :60]), rtol=2e-4, atol=2e-5
    )


def test_backward_matches_xla(rng):
    b, h, t, d = 1, 2, 70, 32
    q, k, v = _rand_qkv(rng, b, h, t, d)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, None, interpret=True)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, None)))

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5)


def test_backward_with_mask_matches_xla(rng):
    b, h, t, d = 2, 1, 50, 32
    q, k, v = _rand_qkv(rng, b, h, t, d)
    valid = jnp.asarray([[50], [30]])
    maskrow = (jnp.arange(t)[None, :] < valid).astype(jnp.float32)
    bias = jnp.where(maskrow, 0.0, -1e9)[:, None, None, :]
    # zero out padded query rows in the loss so only valid positions matter
    wmask = maskrow[:, None, :, None]

    def loss(attn_fn, q, k, v):
        o = attn_fn(q, k, v, bias)
        return jnp.sum((o * wmask) ** 2)

    g1 = jax.grad(lambda *a: loss(
        lambda q, k, v, b_: flash_attention(q, k, v, b_, interpret=True), *a),
        argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: loss(_xla_attention, *a), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5)


def test_vmapped_backward(rng):
    """The explainer vmaps cotangents through the backward — the kernel must
    compose with vmap of grad."""
    b, h, t, d = 1, 1, 40, 32
    q, k, v = _rand_qkv(rng, b, h, t, d)

    def f(x):
        return flash_attention(q + x, k, v, None, interpret=True).sum(axis=(0, 1, 3))

    # J: [T, T] via vmapped VJP (same pattern as explain/_jacobian)
    y, vjp_fn = jax.vjp(f, jnp.zeros_like(q))
    j = jax.vmap(lambda ct: vjp_fn(ct)[0])(jnp.eye(t))
    assert np.isfinite(np.asarray(j)).all()

    def f_ref(x):
        return _xla_attention(q + x, k, v, None).sum(axis=(0, 1, 3))

    y2, vjp2 = jax.vjp(f_ref, jnp.zeros_like(q))
    j2 = jax.vmap(lambda ct: vjp2(ct)[0])(jnp.eye(t))
    np.testing.assert_allclose(np.asarray(j), np.asarray(j2), rtol=5e-4, atol=5e-5)


def test_model_forward_with_pallas_attention(rng, tiny_config):
    """Whole-model parity: XLA attention vs Pallas kernel inside Wav2Vec2."""
    import dataclasses

    from asr_shap.models import init_wav2vec2_params, wav2vec2_logits

    params = init_wav2vec2_params(jax.random.key(0), tiny_config)
    x = jnp.asarray(rng.standard_normal((1, 1600)).astype(np.float32))
    ref = wav2vec2_logits(params, tiny_config, x)
    cfg_p = dataclasses.replace(tiny_config, attention_impl="pallas")
    out = wav2vec2_logits(params, cfg_p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-4)


def test_forward_full_bias_matches_xla(rng):
    """[B, H, T, T] score biases (rel-pos) run inside the kernel."""
    b, h, t, d = 2, 2, 70, 32
    q, k, v = _rand_qkv(rng, b, h, t, d)
    bias = jnp.asarray(rng.standard_normal((b, h, t, t)).astype(np.float32))
    ref = _xla_attention(q, k, v, bias)
    out = flash_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_backward_full_bias_matches_xla(rng):
    """Full-bias gradients — including d(bias), which the rel-pos layers
    backprop into the position projections — match XLA."""
    b, h, t, d = 1, 2, 50, 32
    q, k, v = _rand_qkv(rng, b, h, t, d)
    bias = jnp.asarray(rng.standard_normal((b, h, t, t)).astype(np.float32))

    def loss(attn, q, k, v, bias):
        return jnp.sum(jnp.sin(attn(q, k, v, bias)))

    g1 = jax.grad(lambda *a: loss(
        lambda q, k, v, b_: flash_attention(q, k, v, b_, interpret=True), *a),
        argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(lambda *a: loss(_xla_attention, *a),
                  argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-5)


def test_full_bias_broadcast_cotangent_shape(rng):
    """A broadcastable bias (leading 1s) must receive a cotangent of ITS
    shape (summed over broadcast dims), like any jnp broadcast."""
    b, h, t, d = 2, 2, 40, 32
    q, k, v = _rand_qkv(rng, b, h, t, d)
    bias = jnp.asarray(rng.standard_normal((1, h, t, t)).astype(np.float32))

    g1 = jax.grad(
        lambda b_: jnp.sum(flash_attention(q, k, v, b_, interpret=True) ** 2)
    )(bias)
    g2 = jax.grad(lambda b_: jnp.sum(_xla_attention(q, k, v, b_) ** 2))(bias)
    assert g1.shape == bias.shape
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=5e-4, atol=5e-5)


def test_auto_dispatch_resolves_to_xla(rng):
    """impl="auto" resolves to the XLA path at every length since round 4
    retired the length-based pallas dispatch (r4_flash_full: the r3 long-form
    pallas win did not reproduce; artifacts/kernel_decision.md)."""
    from asr_shap.ops.attention import AUTO_PALLAS_MIN_T, multi_head_attention

    q, k, v = _rand_qkv(rng, 1, 1, 48, 32)
    out = multi_head_attention(q, k, v, None, impl="auto")
    ref = multi_head_attention(q, k, v, None, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
    assert AUTO_PALLAS_MIN_T is None  # dispatch threshold retired


def test_non_4d_bias_routes_to_xla_with_correct_grads(rng):
    """Broadcastable non-4D biases must take the XLA path under
    impl="pallas": the flash kernel's bias-cotangent unbroadcast assumes
    rank 4, and the misaligned axes would return wrong-shaped gradients."""
    import jax
    import jax.numpy as jnp

    from asr_shap.ops.attention import multi_head_attention

    q = jnp.asarray(rng.standard_normal((2, 2, 8, 4)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 2, 8, 4)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 2, 8, 4)), jnp.float32)
    bias2d = jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)

    def loss(impl):
        return lambda b: multi_head_attention(q, k, v, bias=b, impl=impl).sum()

    out_p = multi_head_attention(q, k, v, bias=bias2d, impl="pallas")
    out_x = multi_head_attention(q, k, v, bias=bias2d, impl="xla")
    np.testing.assert_allclose(out_p, out_x, atol=1e-5)

    g_p = jax.grad(loss("pallas"))(bias2d)
    g_x = jax.grad(loss("xla"))(bias2d)
    assert g_p.shape == bias2d.shape
    np.testing.assert_allclose(g_p, g_x, atol=1e-5)
