"""Typed configuration for the whole framework.

The reference hard-codes every knob as module constants or interactive prompts
(reference: shap_calculation.py:20, :94, :126-133; calculate_metric.py:189-196;
runtime_analysis.py:19, :111). Here every knob lives in one frozen dataclass
tree so runs are reproducible and jit-cache friendly (configs are hashable and
can be closed over by jitted functions).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


# The 32-symbol CTC vocabulary of facebook/wav2vec2-base-960h.
# Contract: reference shap_calculation.py:221-254 (inlined dict, same order).
WAV2VEC2_VOCAB: Tuple[str, ...] = (
    "<pad>", "<s>", "</s>", "<unk>", "|",
    "E", "T", "A", "O", "N", "I", "H", "S", "R", "D", "L", "U",
    "M", "W", "C", "F", "G", "Y", "P", "B", "V", "K", "'", "X",
    "J", "Q", "Z",
)
PAD_ID = 0
WORD_DELIMITER_ID = 4  # "|"


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    """Architecture of a Wav2Vec2-style CTC model.

    Defaults reproduce ``facebook/wav2vec2-base-960h``
    (reference model: shap_calculation.py:20, :217-220).
    """

    vocab_size: int = 32
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    # Conv feature encoder: 7 layers, x320 total downsample
    # (16_000 samples -> 49 frames; reference
    # audio_amplification_wav2vec2_test.py:116-118).
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"  # "group" (base) | "layer" (large/conformer)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    do_stable_layer_norm: bool = False  # base: post-LN encoder layers
    layer_norm_eps: float = 1e-5
    feat_proj_dim: int = 512

    # Numerics. Activations may run in bfloat16 on TPU; params and the
    # attribution accumulators stay float32 (explainers are gradient-hungry,
    # SURVEY.md section 7 "hard parts").
    dtype: str = "float32"
    # MXU pass precision for f32 matmuls/convs: "highest" gives true-f32
    # accumulation (required for logits parity with the reference model —
    # JAX's default uses bf16 passes); "default" trades ~1e-2 logit error for
    # speed, which greedy argmax decoding tolerates.
    matmul_precision: str = "highest"

    # Kernel selection: "xla" (portable, CPU-testable, and the measured
    # winner at every probed length — see artifacts/kernel_decision.md),
    # "pallas" (fused flash attention, incl. full rel-pos biases; explicit
    # opt-in for the memory-bound regime), or "auto" (resolves to "xla"
    # since round 4 retired the length-based pallas dispatch).
    attention_impl: str = "xla"
    # Rematerialization policy when the caller requests remat: "full"
    # (replay everything) or "dots" (jax.checkpoint_policies.dots_with_no_
    # batch_dims_saveable — store matmul outputs, recompute elementwise).
    remat_policy: str = "full"
    # Feature-encoder conv formulation: "lax" (fastest measured, r3_conv_ab),
    # "gemm" (stride-blocked GEMMs), "hybrid" (lax forward + GEMM backward —
    # required when the explainer batches >1 draw per executable, whose
    # multi-row lax dgrad crashes some compile services), "pallas" (lax
    # forward + fused polyphase Pallas dgrad, kernels/conv_dgrad.py). See
    # models/wav2vec2.py::_conv1d.
    conv_impl: str = "lax"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    def frames_for_samples(self, n: int) -> int:
        """Output frame count of the conv feature encoder for n input samples."""
        for k, s in zip(self.conv_kernel, self.conv_stride):
            n = (n - k) // s + 1
        return n


@dataclasses.dataclass(frozen=True)
class Wav2Vec2ConformerConfig(Wav2Vec2Config):
    """Wav2Vec2-Conformer CTC model (conformer blocks over the wav2vec2
    conv feature encoder).

    Defaults reproduce ``facebook/wav2vec2-conformer-rel-pos-large-960h-ft``,
    the model of the reference's Conformer SHAP study (w2v2conformer.py:57-59);
    ``position_embeddings_type="rotary"`` gives the rope-large variant
    (conformer_test.ipynb cell 0).
    """

    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    conv_bias: bool = True
    feat_extract_norm: str = "layer"
    do_stable_layer_norm: bool = True
    feat_proj_dim: int = 512
    # conformer-block specifics
    position_embeddings_type: str = "relative"  # "relative" | "rotary" | "none"
    rotary_embedding_base: int = 10_000
    conv_depthwise_kernel_size: int = 31
    hidden_act: str = "swish"  # conformer FFN/conv activation (silu)


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    """Conformer CTC encoder on log-mel features.

    Capability parity with the reference's Conformer studies:
    torchaudio.models.Conformer (test_shap_audio.py:39-48, GLU conv module),
    Wav2Vec2-Conformer (w2v2conformer.py:57-59), NeMo conformer
    (conformer_visualization.py:20-22).
    """

    vocab_size: int = 32
    input_dim: int = 80  # mel bins (test_shap_audio.py:92 uses 80)
    hidden_size: int = 256
    num_layers: int = 4  # test_shap_audio.py:44
    num_attention_heads: int = 4
    ffn_expansion: int = 4
    conv_kernel_size: int = 31
    conv_norm: str = "batch"  # "batch" | "group" (test_shap_audio.py uses GroupNorm)
    num_conv_groups: int = 1
    dropout: float = 0.0
    layer_norm_eps: float = 1e-5
    dtype: str = "float32"
    attention_impl: str = "xla"
    # Positional scheme: "none" (torchaudio Conformer style) or "relative"
    # (NeMo-style Transformer-XL rel-pos attention with per-layer u/v biases).
    pos_encoding: str = "none"
    # Conv subsampling front-end (NeMo "striding": stacked 2D convs, stride 2
    # each, then a linear onto hidden_size). "none" feeds mel frames directly.
    subsampling: str = "none"  # "none" | "striding"
    subsampling_factor: int = 4
    subsampling_conv_channels: int = 0  # 0 = hidden_size
    # Multiply encoder input by sqrt(hidden_size) (NeMo's xscale).
    input_scale: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def subsampling_layers(self) -> int:
        n, f = 0, 1
        while f < self.subsampling_factor:
            f *= 2
            n += 1
        return n

    def subsampled_length(self, t: int) -> int:
        """Output frame count of the striding subsampler for t input frames
        (kernel 3, stride 2, pad 1 per stage)."""
        for _ in range(self.subsampling_layers):
            t = (t + 2 - 3) // 2 + 1
        return t


@dataclasses.dataclass(frozen=True)
class ExplainerConfig:
    """Expected-gradients / DeepSHAP / LIME settings.

    Reference cost-determining settings (BASELINE.md): 5 near-zero background
    rows (shap_calculation.py:126-127), GradientExplainer nsamples=200
    (shap library default), batch_size=1 — serial. Here the draw axis is a
    batch axis, optionally sharded over a device mesh.
    """

    nsamples: int = 200
    num_background: int = 5
    background_sigma: float = 0.01  # zeros + sigma*N(0,1) (shap_calculation.py:127)
    # Attribution method: "grad" = expected gradients (GradientExplainer,
    # the main pipeline, shap_calculation.py:133); "deep" = DeepSHAP rescale
    # rules through the dual-mode forward (DeepExplainer, test_shap_asr.py:67);
    # "kernel" = segment-level KernelSHAP (the Shapley-kernel weighted
    # regression — shap's model-agnostic KernelExplainer family, SURVEY.md
    # D4; nsamples = coalition budget, paired importance sampling).
    method: str = "grad"
    # Aggregation head defining the explained function (SURVEY.md section 3.5):
    #   "max"        -> max over vocab per frame    [T]   (shap_calculation.py:50)
    #   "mean"       -> mean over vocab per frame   [T]   (test_shap_asr.py:36)
    #   "token"      -> one (timestep, token) logit [1]   (w2v2conformer.py:40-43)
    #   "mean_time"  -> mean over vocab and time    [1]   (lime comparison :71)
    aggregation: str = "max"
    token_timestep: int = 0   # for aggregation == "token"
    token_id: int = 0         # for aggregation == "token"
    # Batching of the (draws x output-frames) Jacobian work:
    draw_chunk: int = 8       # interpolation draws evaluated per scan step
    output_chunk: int = 0     # 0 = all output frames in one batched VJP
    remat: bool = True        # jax.checkpoint through the encoder for backward
    # >0: split the draw loop over ceil(nsamples / host_draw_chunk) SEPARATE
    # device calls of host_draw_chunk draws each, phi averaged across calls.
    # The remedy for execution-environment limits on one device call (the
    # r4 conformer study: a single 200-draw scan at 145.6k samples ran long
    # enough that the TPU worker was killed mid-execution, while 80-draw
    # calls of the identical program completed — r4_conf_fault probes).
    # Draw keys derive per chunk (fold(sample_draw_key, chunk)), so results
    # are deterministic given (seed, sample, host_draw_chunk) but differ
    # from the single-call draw sequence; nsamples rounds UP to a multiple
    # of the chunk. Single-device only (ignored under a mesh, which has its
    # own draw sharding).
    host_draw_chunk: int = 0
    # LIME (lime_shap_wav2vec2_comparison.py:75-90) — consumed by the
    # LIME-vs-SHAP comparison harness (pipeline/compare.py) and the
    # ``compare`` CLI subcommand.
    lime_num_samples: int = 500
    # Probability a coalition segment is KEPT (not masked) in a LIME
    # perturbation — passed straight to lime_attributions(keep_prob=...).
    # 0.9 means 90% of segments survive each draw, i.e. 10% masking.
    lime_keep_prob: float = 0.5
    lime_ridge_alpha: float = 1.0
    lime_num_segments: int = 64  # coalition features over the waveform
    # DeepSHAP background summarization (w2v2conformer.py:134-137:
    # shap.kmeans(background, 10)): >0 summarizes the num_background noise
    # rows to k centroids before explaining (any method; the reference uses
    # it with DeepExplainer). This framework's DeepSHAP is deterministic over
    # the background set, so the reference's separate nsamples=500 argument
    # is subsumed by num_background/kmeans_background.
    kmeans_background: int = 0
    # KernelSHAP coalition features over the waveform (method="kernel";
    # explain/kernel_shap.py) — the segment count of the coalition game.
    kernel_num_segments: int = 32


@dataclasses.dataclass(frozen=True)
class TestSetConfig:
    """Controlled clean+noisy test-set generation (shap_calculation.py:63-108)."""

    num_samples: int = 20            # shap_calculation.py:263
    snrs_db: Tuple[float, ...] = (5.0, 2.0, 1.0)  # shap_calculation.py:94
    min_length: int = 100_000        # shap_calculation.py:75-78
    max_length: int = 0              # 0 = no truncation
    sample_rate: int = 16_000
    seed: int = 0
    # Noise family mixed at each SNR: "white" (the reference's mechanism,
    # shap_calculation.py:55-60), "pink" (1/f colored), "babble"
    # (overlapped synthetic speakers — speech-shaped, the adversarial case
    # for eta_raw's speech-dominance logic; train_asr.py:19-104 contemplates
    # CHiME/babble-type sources). Non-white kinds keep the same
    # (noisy, noise) ground-truth contract via scale_noise_to_snr.
    noise_kind: str = "white"


TestSetConfig.__test__ = False  # keep pytest from collecting the dataclass


@dataclasses.dataclass(frozen=True)
class MetricConfig:
    """eta_raw / WER settings.

    Two ITM variants exist in the reference and both are kept:
      "half"   : E_c > 0.5 * E_u   (calculate_metric.py:118)
      "strict" : E_c > E_u         (nraw_vs_wer.py:46) — the variant used for
                 the published-style WER correlation sweep, hence the default.
    """

    segment_ms: float = 0.0625   # 1 sample/segment @16kHz (nraw_vs_wer.py:25)
    percentile: float = 99.0
    itm_variant: str = "strict"
    sample_rate: int = 16_000


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Noise-robust CTC fine-tuning (capability of train_asr.py, actually wired)."""

    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    num_epochs: int = 10
    batch_size: int = 8
    max_audio_len: int = 160_000
    max_label_len: int = 256
    snrs_db: Tuple[float, ...] = (-5.0, 0.0, 5.0, 10.0, 15.0)  # train_asr.py:112
    early_stopping_patience: int = 3     # train_asr.py:181-221
    early_stopping_min_delta: float = 0.0
    checkpoint_dir: str = "checkpoints"
    keep_checkpoints: int = 3
    grad_clip_norm: float = 1.0
    seed: int = 0
    freeze_feature_encoder: bool = True


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh for sharded explanation / training.

    The reference is single-device (SURVEY.md section 2.3); here the
    expected-gradients draw axis ("data") is the primary sharded axis and
    "model" is available for tensor-parallel params on larger variants.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = 0   # 0 = all available devices
    model_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Top-level bundle for end-to-end runs."""

    model: Wav2Vec2Config = Wav2Vec2Config()
    explainer: ExplainerConfig = ExplainerConfig()
    testset: TestSetConfig = TestSetConfig()
    metric: MetricConfig = MetricConfig()
    mesh: MeshConfig = MeshConfig()
    data_dir: str = "data"
    seed: int = 0
    # Samples explained per jitted call (fixed-size groups within an
    # exact-length bucket; one executable per audio length). 0 = auto
    # (run_shap._auto_group_size): 2 only for short clips (<100k samples)
    # under small draw budgets (nsamples<32), where per-sample fixed costs
    # are visible next to the draw loop; else 1 — the measured optimum
    # (r4_group_len: at nsamples=32, g=1 beats g=2 by 9% at 48k and ties
    # within 3% at 120k; r3: g=4 crashed the bench TPU worker on
    # >=118k-sample clips). 1 = serial; explicit N forces N everywhere.
    sample_batch: int = 0
    # Elastic recovery from device-runtime loss (TPU worker crash/restart):
    # the pipeline keeps a host copy of the params, waits crash_backoff_s *
    # attempt, re-stages, and continues the run in-process. 0 disables (and
    # skips the host copy).
    crash_retries: int = 3
    crash_backoff_s: float = 60.0
