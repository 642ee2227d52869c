"""NeMo-style BPE-CTC Conformer — the ``EncDecCTCModelBPE`` capability.

Reference usage (SURVEY.md D10/R13, conformer_visualization.py:4,20-22):
load ``stt_en_conformer_ctc_large``, run its mel preprocessor, explain the
processed signal with GradientExplainer, and decode the BPE CTC hypothesis.

This module assembles that model from the framework's own parts:

  mel features [B, T, F]
    -> striding conv subsampler      (models/conformer.py conv_subsampling)
    -> sqrt(d) input scaling         (NeMo RelPositionalEncoding xscale)
    -> rel-pos conformer layers      (models/conformer.py, pos_encoding=
                                      "relative", Transformer-XL attention)
    -> linear CTC head over BPE vocab, blank LAST (NeMo convention —
       unlike wav2vec2's blank-first pad token)

plus a converter for real ``.nemo`` checkpoints. A .nemo file is a tar
archive holding ``model_config.yaml`` and a torch ``model_weights.ckpt`` —
no nemo_toolkit needed to read it, only tarfile+torch(+yaml). The key map
below follows NeMo's ConformerEncoder/ConvASRDecoder module tree; with zero
egress the mapping is exercised against a synthetically-keyed state_dict in
tests (tests/test_nemo_ctc.py) and the subsampler against a torch conv
oracle.
"""

from __future__ import annotations

import io
import math
import tarfile
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from asr_shap.core.config import ConformerConfig
from asr_shap.models.conformer import (
    PLAIN_RULES,
    Rules,
    init_conformer_params,
)

Params = Dict[str, Any]


def nemo_conformer_config(
    vocab_size: int = 128,
    hidden_size: int = 512,
    num_layers: int = 17,
    num_attention_heads: int = 8,
    input_dim: int = 80,
    conv_kernel_size: int = 31,
) -> ConformerConfig:
    """ConformerConfig preset matching NeMo conformer-CTC architecture
    knobs (defaults sized like stt_en_conformer_ctc_large; real dims load
    from the .nemo config at convert time)."""
    return ConformerConfig(
        vocab_size=vocab_size + 1,  # + trailing blank (NeMo convention)
        input_dim=input_dim,
        hidden_size=hidden_size,
        num_layers=num_layers,
        num_attention_heads=num_attention_heads,
        ffn_expansion=4,
        conv_kernel_size=conv_kernel_size,
        conv_norm="batch",
        pos_encoding="relative",
        subsampling="striding",
        subsampling_factor=4,
        input_scale=True,  # NeMo RelPositionalEncoding xscale = sqrt(d_model)
    )


def init_nemo_ctc_params(key: jax.Array, cfg: ConformerConfig) -> Params:
    return init_conformer_params(key, cfg)


def nemo_ctc_logits(
    params: Params,
    cfg: ConformerConfig,
    features: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    rules: Rules = PLAIN_RULES,
    remat: bool = False,
) -> jnp.ndarray:
    """Log-mel features [..., T, F] -> BPE CTC logits
    [..., subsampled_length(T), vocab+1] (blank last). Delegates to
    conformer_logits, which owns the mixed-precision head handling."""
    from asr_shap.models.conformer import conformer_logits

    return conformer_logits(params, cfg, features, lengths, rules, remat)


# ----------------------------------------------------------------- BPE vocab

def bpe_ids_to_text(
    ids: np.ndarray, keep: np.ndarray, vocab: Sequence[str]
) -> str:
    """Collapsed BPE piece ids -> text (sentencepiece "▁" word-boundary
    convention, the NeMo tokenizer's decode)."""
    pieces = [vocab[i] for i, k in zip(np.asarray(ids), np.asarray(keep)) if k]
    return "".join(pieces).replace("▁", " ").strip()


def nemo_ctc_decode(
    logits: jnp.ndarray, vocab: Sequence[str], lengths=None
) -> List[str]:
    """Greedy BPE-CTC decode of a logits batch; blank = last index."""
    from asr_shap.ops.ctc import ctc_greedy_decode

    blank = logits.shape[-1] - 1
    ids, keep = jax.jit(ctc_greedy_decode, static_argnums=1)(logits, blank)
    ids, keep = np.asarray(ids), np.asarray(keep)
    if lengths is not None:
        t = ids.shape[1]
        keep = keep & (np.arange(t)[None, :] < np.asarray(lengths)[:, None])
    return [bpe_ids_to_text(i, k, vocab) for i, k in zip(ids, keep)]


# ---------------------------------------------------------------- converter

def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def convert_nemo_state_dict(sd: Mapping[str, Any], cfg: ConformerConfig) -> Params:
    """NeMo EncDecCTCModelBPE state_dict -> asr_shap conformer params.

    Key layout per NeMo's ConformerEncoder (pre_encode striding subsampler,
    layers.N.{norm_feed_forward1,feed_forward1,norm_self_att,self_attn,
    norm_conv,conv,norm_feed_forward2,feed_forward2,norm_out}) and
    ConvASRDecoder (decoder_layers.0, a 1x1 Conv1d, blank last).
    """
    j = jnp.asarray

    def lin(prefix):
        w = _np(sd[f"{prefix}.weight"])
        bias = (
            _np(sd[f"{prefix}.bias"])
            if f"{prefix}.bias" in sd
            else np.zeros((w.shape[0],), np.float32)
        )
        return {"kernel": j(w.T), "bias": j(bias)}

    def norm(prefix):
        return {"scale": j(_np(sd[f"{prefix}.weight"])), "bias": j(_np(sd[f"{prefix}.bias"]))}

    def pointwise(prefix):
        # Conv1d k=1 [out, in, 1] -> linear kernel [in, out]
        w = _np(sd[f"{prefix}.weight"])
        bias = (
            _np(sd[f"{prefix}.bias"])
            if f"{prefix}.bias" in sd
            else np.zeros((w.shape[0],), np.float32)
        )
        return {"kernel": j(w[:, :, 0].T), "bias": j(bias)}

    # --- subsampler: Conv2d weights [C_out, C_in, 3, 3] -> HWIO
    convs = []
    i = 0
    while f"encoder.pre_encode.conv.{i}.weight" in sd:
        w = _np(sd[f"encoder.pre_encode.conv.{i}.weight"])
        convs.append(
            {
                "kernel": j(w.transpose(2, 3, 1, 0)),
                "bias": j(_np(sd[f"encoder.pre_encode.conv.{i}.bias"])),
            }
        )
        i += 2  # NeMo interleaves activations in the Sequential
    subsampling = {"convs": convs, "out": lin("encoder.pre_encode.out")}

    nh, hd = cfg.num_attention_heads, cfg.head_dim
    layers = []
    for li in range(cfg.num_layers):
        pre = f"encoder.layers.{li}"
        layers.append(
            {
                "ffn1": {
                    "norm": norm(f"{pre}.norm_feed_forward1"),
                    "in": lin(f"{pre}.feed_forward1.linear1"),
                    "out": lin(f"{pre}.feed_forward1.linear2"),
                },
                "attn": {
                    "norm": norm(f"{pre}.norm_self_att"),
                    "q": lin(f"{pre}.self_attn.linear_q"),
                    "k": lin(f"{pre}.self_attn.linear_k"),
                    "v": lin(f"{pre}.self_attn.linear_v"),
                    "out": lin(f"{pre}.self_attn.linear_out"),
                    "pos": {"kernel": j(_np(sd[f"{pre}.self_attn.linear_pos.weight"]).T)},
                    "bias_u": j(_np(sd[f"{pre}.self_attn.pos_bias_u"])).reshape(nh, hd),
                    "bias_v": j(_np(sd[f"{pre}.self_attn.pos_bias_v"])).reshape(nh, hd),
                },
                "conv": {
                    "norm": norm(f"{pre}.norm_conv"),
                    "pointwise1": pointwise(f"{pre}.conv.pointwise_conv1"),
                    "depthwise": {
                        "kernel": j(
                            _np(sd[f"{pre}.conv.depthwise_conv.weight"]).transpose(2, 1, 0)
                        ),
                        "bias": j(_np(sd[f"{pre}.conv.depthwise_conv.bias"]))
                        if f"{pre}.conv.depthwise_conv.bias" in sd
                        else jnp.zeros((cfg.hidden_size,), jnp.float32),
                    },
                    "bn": {
                        "scale": j(_np(sd[f"{pre}.conv.batch_norm.weight"])),
                        "bias": j(_np(sd[f"{pre}.conv.batch_norm.bias"])),
                        "mean": j(_np(sd[f"{pre}.conv.batch_norm.running_mean"])),
                        "var": j(_np(sd[f"{pre}.conv.batch_norm.running_var"])),
                    },
                    "pointwise2": pointwise(f"{pre}.conv.pointwise_conv2"),
                },
                "ffn2": {
                    "norm": norm(f"{pre}.norm_feed_forward2"),
                    "in": lin(f"{pre}.feed_forward2.linear1"),
                    "out": lin(f"{pre}.feed_forward2.linear2"),
                },
                "final_norm": norm(f"{pre}.norm_out"),
            }
        )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    # ConvASRDecoder: 1x1 Conv1d [vocab+1, d, 1]
    head = {
        "kernel": j(_np(sd["decoder.decoder_layers.0.weight"])[:, :, 0].T),
        "bias": j(_np(sd["decoder.decoder_layers.0.bias"])),
    }
    return {"subsampling": subsampling, "layers": stacked, "head": head}


def load_nemo_checkpoint(path: str) -> Tuple[Params, ConformerConfig, List[str]]:
    """Read a ``.nemo`` tar archive -> (params, config, bpe_vocab).

    Requires torch (to deserialize model_weights.ckpt) and pyyaml.
    """
    import yaml
    import torch

    with tarfile.open(path) as tar:
        names = tar.getnames()

        def member(suffix):
            match = [n for n in names if n.endswith(suffix)]
            if not match:
                raise FileNotFoundError(f"{suffix} not found in {path}")
            return tar.extractfile(match[0]).read()

        model_cfg = yaml.safe_load(io.BytesIO(member("model_config.yaml")))
        ckpt = torch.load(
            io.BytesIO(member("model_weights.ckpt")), map_location="cpu",
            weights_only=True,
        )
        vocab: List[str] = []
        vocab_names = [n for n in names if n.endswith("vocab.txt")]
        if vocab_names:
            vocab = (
                tar.extractfile(vocab_names[0]).read().decode("utf-8").splitlines()
            )

    enc = model_cfg["encoder"]
    cfg = nemo_conformer_config(
        vocab_size=int(model_cfg["decoder"]["num_classes"]),
        hidden_size=int(enc["d_model"]),
        num_layers=int(enc["n_layers"]),
        num_attention_heads=int(enc["n_heads"]),
        input_dim=int(enc["feat_in"]),
        conv_kernel_size=int(enc.get("conv_kernel_size", 31)),
    )
    return convert_nemo_state_dict(ckpt, cfg), cfg, vocab
