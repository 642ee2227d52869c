"""Benchmark: SHAP perturbation throughput on the flagship model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Protocol (BASELINE.md): the reference computes expected-gradients SHAP with
a fully serial loop — one model forward+backward per (draw, output-frame)
pair at batch_size=1 (shap_calculation.py:133; runtime_analysis.py length
sweep). The work unit is therefore one "perturbation pass" = one
forward+backward of Wav2Vec2-base at the given audio length, and the metric
is perturbation passes/sec/chip.

  value       = effective passes/sec on this chip
                (draws x T_frames per explanation / wall-clock)
  vs_baseline = value / (serial torch-CPU passes/sec measured in-process,
                the reference's `cuda if available else cpu` path on this
                host — reference hardware is unspecified, BASELINE.md)

The JSON carries the honest complementary numbers alongside the protocol
metric: wall-clock per full explanation, analytic FLOP throughput, and an
MFU estimate against v5e bf16 peak.

Tuned defaults (measured on the bench v5e, artifacts/bench_sweep_tpu.jsonl):
  * matmul precision "default" (bf16 MXU passes, f32 phi accumulation):
    3.4x faster than "highest" with |phi| checksum moving only 0.06% —
    attribution parity well inside the smoothed/normalized tolerance the
    downstream consumes. Parity tests keep "highest".
  * dtype "bfloat16" (params+activations in bf16, f32 norm statistics and
    f32 phi accumulation): a further 1.16x (1796 vs 1544 passes/s), |phi|
    checksum moving 0.5% — below the explainer's own 32-draw sampling
    noise.
  * attention_impl "xla": at ASR frame counts (~150) XLA's fused attention
    beats the Pallas flash kernel (1542 vs 969 passes/s); the kernel's
    VMEM win appears at T >= ~1,000 (long-form audio; measured 20.2 vs
    19.4 passes/s at T=1,499 — attention_impl="auto" dispatches there).
  * draw_chunk 1 (round-3 exhaustive sweep, r3_* rows in
    artifacts/bench_sweep_tpu.jsonl): dc=2 compiles with the hybrid/GEMM
    conv backward but measures SLOWER (1246-1277 vs 1457 same-day); dc>=4
    crashes the host's compile helper under every conv formulation;
    output_chunk splits add remat replays and lose too (995-1099).
  * conv_impl "lax" (interleaved A/B, r3_conv_ab): the stride-blocked GEMM
    formulation is 25% slower end-to-end (1167 vs 1457); XLA's native conv
    + dgrad is well-tiled at this batch. "hybrid" exists because the lax
    dgrad at multi-draw cotangent batches crashes the compile helper.

Where the remaining wall-clock lives (r4_fwd_decomp / r4_bwd_decomp rows,
which CORRECT the r3_decomp diagnosis): the per-draw batch-1 forward costs
1.79 ms (~2% of wall), NOT the 35 ms r3 reported — and the [T_frames, N]
Jacobian backward is ~98% of wall at 82 ms/draw (transformer 50 ms at 74
TF/s, conv dgrad 36 ms at 62 TF/s; both flops-bound on MXU-hostile shapes:
Cin=1/stride-10 first conv layer, stride-2 dilated dgrads, T=149
attention). Draw batching cannot help a row-batched flops-bound backward —
the full r4_dc_form grid measures every draw-chunked formulation at
0.64-0.96x the incumbent, and the r5_conv_bwd probe closes the last
formulation cell: the polyphase GEMM backward (hybrid at draw_chunk=1,
never previously measured) loses to XLA's dilated dgrad 1.7x on the
conv-only Jacobian and 1.23x end-to-end — XLA's conv emitter is already
efficient on these shapes. Round 5 closed the question from the last
remaining direction by building the fused Pallas polyphase dgrad anyway
(kernels/conv_dgrad.py): bit-exact, but XLA's dgrad runs the dominant
layer at 154.6 TF/s — 78% of bf16 peak counting only useful FLOPs — so
the "dilated dgrad wastes its MACs" premise is simply false on v5e, and
the conv backward's lower aggregate rate lives in bandwidth-bound
norm/GELU backward and small-t tail layers that no MXU kernel can fix
(r5_conv_pallas_raw rows; artifacts/kernel_decision.md round-5 section).
Day-to-day relay drift on identical programs is
+-15-25% (1795 measured 2026-08-16, 1430-1457 on 2026-08-17, ~1210 on
2026-08-18).

Remat policy (r3_remat_ab, interleaved): "full" replay, the "dots" policy
(store matmul outputs, recompute elementwise), and remat=False are all
within noise (1272 / 1281 / 1246 passes/s) — consistent with the dispatch-
overhead diagnosis: the replay's cost is op dispatch, not matmul FLOPs, so
trading recompute for storage moves nothing. remat_policy stays "full".

Env overrides: BENCH_AUDIO_LEN (default 48000), BENCH_NSAMPLES (default 32),
BENCH_PRECISION, BENCH_DRAW_CHUNK, BENCH_ATTN, BENCH_TORCH_PASSES (default
2), BENCH_SKIP_TORCH=1 to reuse the cached baseline in .bench_baseline.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

AUDIO_LEN = int(os.environ.get("BENCH_AUDIO_LEN", 48000))
NSAMPLES = int(os.environ.get("BENCH_NSAMPLES", 32))
TORCH_PASSES = int(os.environ.get("BENCH_TORCH_PASSES", 2))
BASELINE_CACHE = os.path.join(os.path.dirname(__file__), ".bench_baseline.json")


def measure_ours() -> tuple[float, int]:
    import jax
    import jax.numpy as jnp

    from asr_shap.utils.jax_cache import enable_compile_cache

    # warmup-only effect: the timed reps never include compiles, but the
    # persistent cache turns the 30-300 s first-compile into a disk hit
    enable_compile_cache()

    from asr_shap.core.config import ExplainerConfig, Wav2Vec2Config
    from asr_shap.explain.baselines import zeros_noise_background
    from asr_shap.explain.expected_gradients import expected_gradients
    from asr_shap.models.heads import make_explained_fn
    from asr_shap.models.wav2vec2 import init_wav2vec2_params

    cfg = Wav2Vec2Config(
        matmul_precision=os.environ.get("BENCH_PRECISION", "default"),
        attention_impl=os.environ.get("BENCH_ATTN", "xla"),
        dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
    )
    t_frames = cfg.frames_for_samples(AUDIO_LEN)
    params = init_wav2vec2_params(jax.random.key(0), cfg)

    ecfg = ExplainerConfig(
        nsamples=NSAMPLES,
        draw_chunk=int(os.environ.get("BENCH_DRAW_CHUNK", 1)),
        output_chunk=int(os.environ.get("BENCH_OUTPUT_CHUNK", 0)),
        num_background=5,
        remat=True,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(AUDIO_LEN).astype(np.float32))
    bg = zeros_noise_background(jax.random.key(1), AUDIO_LEN, 5, 0.01)

    # params are a jit ARGUMENT: closing over 94M weights bakes them into the
    # HLO as constants (breaks remote-compile request limits, bloats caches)
    @jax.jit
    def run(p, xx, kk):
        f = make_explained_fn(p, cfg, ecfg)
        return expected_gradients(f, xx, bg, kk, ecfg).values

    def sync(a):
        # block_until_ready is a no-op through remote-execution relays;
        # a device->host transfer is the only reliable completion barrier
        np.asarray(a.ravel()[:1])

    phi = run(params, x, jax.random.key(2))
    sync(phi)

    # min of 3 timed reps: the remote-execution relay drifts +-15-25%
    # run-to-run (r3 measurements), and min-of-N is the standard estimator
    # for the machine's capability under external noise
    walls = []
    for i in range(3):
        t0 = time.perf_counter()
        phi = run(params, x, jax.random.key(3 + i))
        sync(phi)
        walls.append(time.perf_counter() - t0)
    wall = min(walls)

    chunk = max(1, ecfg.draw_chunk)
    total_draws = -(-NSAMPLES // chunk) * chunk
    passes = total_draws * t_frames
    flops = _analytic_flops(cfg, AUDIO_LEN, total_draws, t_frames,
                            remat=ecfg.remat)
    extras = {
        "wall_per_explanation_s": round(wall, 3),
        "draws": total_draws,
        "t_frames": t_frames,
        "tflops_effective": round(flops / wall / 1e12, 1),
        "mfu_vs_v5e_bf16_peak": round(flops / wall / 197e12, 3),
        "precision": cfg.matmul_precision,
        "attention_impl": cfg.attention_impl,
        "dtype": cfg.dtype,
    }
    return passes / wall, t_frames, extras


def _analytic_flops(cfg, audio_len: int, draws: int, t_frames: int,
                    remat: bool) -> float:
    """Deterministic FLOP count of one explanation (all draws).

    Per draw: one forward + t_frames input-cotangent backward rows through
    the batched VJP; a backward row costs ~= a forward; remat replays the
    forward once per backward batch. XLA's cost_analysis under-counts scan
    bodies, so the estimate is analytic.
    """
    # conv feature encoder forward FLOPs
    conv = 0
    t = audio_len
    cin = 1
    for co, k, s_ in zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride):
        t = (t - k) // s_ + 1
        conv += 2 * k * cin * co * t
        cin = co
    d, ffn, lyr = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    # per-layer: qkv+out projections, 2 attention matmuls, 2 ffn matmuls
    enc = lyr * (2 * 4 * d * d * t_frames
                 + 2 * 2 * d * t_frames * t_frames
                 + 2 * 2 * d * ffn * t_frames)
    head = 2 * d * cfg.vocab_size * t_frames
    fwd = conv + enc + head
    per_draw = fwd + t_frames * fwd + (fwd if remat else 0.0)
    return float(draws) * per_draw


def measure_torch_baseline(t_frames: int) -> float:
    """Serial reference-style loop: one fwd+bwd w.r.t. the input per pass,
    batch 1, torch CPU (the reference's device fallback)."""
    import torch
    from transformers import Wav2Vec2Config as HFConfig, Wav2Vec2ForCTC

    torch.manual_seed(0)
    model = Wav2Vec2ForCTC(HFConfig(apply_spec_augment=False, layerdrop=0.0))
    model.eval()
    x = torch.randn(1, AUDIO_LEN, requires_grad=True)

    def one_pass():
        out = model(x).logits.max(dim=-1).values  # aggregation head
        g = torch.autograd.grad(out.sum(), x)[0]
        return g

    one_pass()  # warmup
    t0 = time.perf_counter()
    for _ in range(TORCH_PASSES):
        one_pass()
    wall = time.perf_counter() - t0
    return TORCH_PASSES / wall


def main():
    ours, t_frames, extras = measure_ours()

    baseline = None
    if os.environ.get("BENCH_SKIP_TORCH"):
        if os.path.exists(BASELINE_CACHE):
            with open(BASELINE_CACHE) as fh:
                cached = json.load(fh)
            if cached.get("audio_len") == AUDIO_LEN:  # length-specific
                baseline = cached.get("passes_per_sec")
        if baseline is None:
            # skip was requested: report vs_baseline=null rather than
            # surprising the caller with a multi-minute torch run
            baseline = float("nan")
    if baseline is None:
        try:
            baseline = measure_torch_baseline(t_frames)
            with open(BASELINE_CACHE, "w") as fh:
                json.dump(
                    {"passes_per_sec": baseline, "audio_len": AUDIO_LEN}, fh
                )
        except Exception as e:  # torch unavailable on some targets
            print(f"baseline measurement failed: {e}", file=sys.stderr)
            baseline = float("nan")

    result = {
        "metric": f"SHAP perturbation fwd+bwd passes/sec/chip (wav2vec2-base, {AUDIO_LEN} samples)",
        "value": round(ours, 2),
        "unit": "passes/sec",
        "vs_baseline": round(ours / baseline, 2) if baseline == baseline else None,
        **extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
