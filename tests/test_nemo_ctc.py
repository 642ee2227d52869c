"""NeMo-style BPE-CTC conformer tests (SURVEY.md D10, reference
conformer_visualization.py): striding subsampler against a torch conv
oracle, the .nemo-key converter on a synthetically-keyed state_dict, the
tar round-trip of load_nemo_checkpoint, and BPE CTC decode."""

import io
import tarfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_shap.core.config import ConformerConfig
from asr_shap.models.conformer import conv_subsampling, init_conformer_params
from asr_shap.models.nemo_ctc import (
    bpe_ids_to_text,
    convert_nemo_state_dict,
    init_nemo_ctc_params,
    nemo_conformer_config,
    nemo_ctc_decode,
    nemo_ctc_logits,
)

TINY = dict(vocab_size=16, hidden_size=32, num_layers=2,
            num_attention_heads=2, input_dim=16, conv_kernel_size=7)


def _tiny_cfg():
    return nemo_conformer_config(**TINY)


def test_subsampler_matches_torch_oracle(rng):
    """The striding subsampler must reproduce NeMo's conv arithmetic:
    Conv2d(k=3, s=2, p=1) stages + channel-major flatten + linear."""
    torch = pytest.importorskip("torch")

    cfg = _tiny_cfg()
    params = init_conformer_params(jax.random.key(0), cfg)
    sub = params["subsampling"]
    t, f = 23, cfg.input_dim
    x = rng.standard_normal((2, t, f)).astype(np.float32)

    # torch oracle with the converted-back weights
    h = torch.from_numpy(x)[:, None]  # [B, 1, T, F]
    for conv in sub["convs"]:
        w = torch.from_numpy(np.asarray(conv["kernel"]).transpose(3, 2, 0, 1))
        b = torch.from_numpy(np.asarray(conv["bias"]))
        h = torch.relu(torch.nn.functional.conv2d(h, w, b, stride=2, padding=1))
    bsz, c, t2, f2 = h.shape
    h = h.transpose(1, 2).reshape(bsz, t2, c * f2)  # NeMo channel-major flatten
    wout = torch.from_numpy(np.asarray(sub["out"]["kernel"]))
    bout = torch.from_numpy(np.asarray(sub["out"]["bias"]))
    ref = (h @ wout + bout).numpy()

    ours = np.asarray(conv_subsampling(sub, cfg, jnp.asarray(x)))
    assert ours.shape == ref.shape == (2, cfg.subsampled_length(t), cfg.hidden_size)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_end_to_end_logits_and_decode(rng):
    cfg = _tiny_cfg()
    params = init_nemo_ctc_params(jax.random.key(0), cfg)
    t = 40
    feats = jnp.asarray(rng.standard_normal((1, t, cfg.input_dim)).astype(np.float32))
    logits = nemo_ctc_logits(params, cfg, feats)
    assert logits.shape == (1, cfg.subsampled_length(t), cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()

    vocab = [f"tok{i}" for i in range(cfg.vocab_size - 1)]
    texts = nemo_ctc_decode(logits, vocab)
    assert len(texts) == 1

    # differentiable back to the features (GradientExplainer requirement)
    g = jax.grad(lambda v: jnp.sum(nemo_ctc_logits(params, cfg, v) ** 2))(feats)
    assert np.isfinite(np.asarray(g)).all()


def test_bpe_text_assembly():
    vocab = ["▁the", "▁cat", "s", "▁sat", "<blk>"]
    ids = np.array([0, 1, 2, 3])
    keep = np.array([True, True, True, True])
    assert bpe_ids_to_text(ids, keep, vocab) == "the cats sat"


def _synthetic_nemo_state_dict(cfg: ConformerConfig, rng):
    """Build a state_dict with NeMo's key names (ConformerEncoder +
    ConvASRDecoder), random values."""
    import torch

    d = cfg.hidden_size
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    ffn = d * cfg.ffn_expansion
    ch = cfg.subsampling_conv_channels or d
    sd = {}

    def t(*shape):
        return torch.from_numpy(rng.standard_normal(shape).astype(np.float32) * 0.05)

    # pre_encode: Sequential(Conv2d, ReLU, Conv2d, ReLU) -> indices 0, 2
    c_in = 1
    for i in (0, 2):
        sd[f"encoder.pre_encode.conv.{i}.weight"] = t(ch, c_in, 3, 3)
        sd[f"encoder.pre_encode.conv.{i}.bias"] = t(ch)
        c_in = ch
    f_out = cfg.input_dim
    for _ in range(cfg.subsampling_layers):
        f_out = (f_out + 2 - 3) // 2 + 1
    sd["encoder.pre_encode.out.weight"] = t(d, ch * f_out)
    sd["encoder.pre_encode.out.bias"] = t(d)

    for li in range(cfg.num_layers):
        p = f"encoder.layers.{li}"
        for nrm in ("norm_feed_forward1", "norm_self_att", "norm_conv",
                    "norm_feed_forward2", "norm_out"):
            sd[f"{p}.{nrm}.weight"] = t(d)
            sd[f"{p}.{nrm}.bias"] = t(d)
        for ff in ("feed_forward1", "feed_forward2"):
            sd[f"{p}.{ff}.linear1.weight"] = t(ffn, d)
            sd[f"{p}.{ff}.linear1.bias"] = t(ffn)
            sd[f"{p}.{ff}.linear2.weight"] = t(d, ffn)
            sd[f"{p}.{ff}.linear2.bias"] = t(d)
        for proj in ("linear_q", "linear_k", "linear_v", "linear_out"):
            sd[f"{p}.self_attn.{proj}.weight"] = t(d, d)
            sd[f"{p}.self_attn.{proj}.bias"] = t(d)
        sd[f"{p}.self_attn.linear_pos.weight"] = t(d, d)
        sd[f"{p}.self_attn.pos_bias_u"] = t(nh, hd)
        sd[f"{p}.self_attn.pos_bias_v"] = t(nh, hd)
        sd[f"{p}.conv.pointwise_conv1.weight"] = t(2 * d, d, 1)
        sd[f"{p}.conv.pointwise_conv1.bias"] = t(2 * d)
        sd[f"{p}.conv.pointwise_conv2.weight"] = t(d, d, 1)
        sd[f"{p}.conv.pointwise_conv2.bias"] = t(d)
        sd[f"{p}.conv.depthwise_conv.weight"] = t(d, 1, cfg.conv_kernel_size)
        sd[f"{p}.conv.depthwise_conv.bias"] = t(d)
        sd[f"{p}.conv.batch_norm.weight"] = t(d)
        sd[f"{p}.conv.batch_norm.bias"] = t(d)
        sd[f"{p}.conv.batch_norm.running_mean"] = t(d)
        sd[f"{p}.conv.batch_norm.running_var"] = torch.abs(t(d)) + 1.0
        sd[f"{p}.conv.batch_norm.num_batches_tracked"] = torch.tensor(0)

    sd["decoder.decoder_layers.0.weight"] = t(cfg.vocab_size, d, 1)
    sd["decoder.decoder_layers.0.bias"] = t(cfg.vocab_size)
    return sd


def test_converter_on_nemo_keyed_state_dict(rng):
    pytest.importorskip("torch")
    cfg = _tiny_cfg()
    sd = _synthetic_nemo_state_dict(cfg, rng)
    params = convert_nemo_state_dict(sd, cfg)

    t = 31
    feats = jnp.asarray(rng.standard_normal((1, t, cfg.input_dim)).astype(np.float32))
    logits = nemo_ctc_logits(params, cfg, feats)
    assert logits.shape == (1, cfg.subsampled_length(t), cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_load_nemo_tar_roundtrip(tmp_path, rng):
    """A .nemo archive (tar of model_config.yaml + model_weights.ckpt +
    vocab.txt) loads into (params, config, vocab) without nemo_toolkit."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("yaml")
    import yaml

    cfg = _tiny_cfg()
    sd = _synthetic_nemo_state_dict(cfg, rng)
    model_cfg = {
        "encoder": {
            "d_model": cfg.hidden_size,
            "n_layers": cfg.num_layers,
            "n_heads": cfg.num_attention_heads,
            "feat_in": cfg.input_dim,
            "conv_kernel_size": cfg.conv_kernel_size,
        },
        "decoder": {"num_classes": cfg.vocab_size - 1},
    }
    vocab = [f"▁w{i}" for i in range(cfg.vocab_size - 1)]

    path = tmp_path / "tiny.nemo"
    with tarfile.open(path, "w") as tar:
        def add(name, data: bytes):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))

        add("model_config.yaml", yaml.safe_dump(model_cfg).encode())
        buf = io.BytesIO()
        torch.save(sd, buf)
        add("model_weights.ckpt", buf.getvalue())
        add("vocab.txt", "\n".join(vocab).encode())

    from asr_shap.models.nemo_ctc import load_nemo_checkpoint

    params, loaded_cfg, loaded_vocab = load_nemo_checkpoint(str(path))
    assert loaded_cfg == cfg
    assert loaded_vocab == vocab
    feats = jnp.asarray(rng.standard_normal((1, 24, cfg.input_dim)).astype(np.float32))
    logits = nemo_ctc_logits(params, loaded_cfg, feats)
    assert np.isfinite(np.asarray(logits)).all()
