"""asr_shap — a TPU-native framework for explaining Transformer ASR models with Shapley values.

A ground-up JAX/XLA/Pallas/pjit re-design with the capabilities of
HagenMarin/SHAP-Transformer-ASR (see SURVEY.md for the component map).

Subpackages
-----------
core      : typed configs, PRNG handling, the ``data/`` npy persistence contract
audio     : waveform normalization, SNR noise injection, mel front-end, resampling
models    : pure-JAX Wav2Vec2 / Conformer CTC models + HF checkpoint converters
ops       : CTC (greedy decode kernel + loss), numerically-stable primitives
kernels   : Pallas TPU kernels for the hot ops (flash attention, ...)
explain   : expected-gradients (SHAP GradientExplainer equivalent), DeepSHAP
            rescale rules as custom VJPs, LIME, baseline generators
metrics   : eta_raw (both ITM variants), WER, model confidence
parallel  : device mesh construction and sharding helpers
pipeline  : controlled test-set generation, attribution runs, eval sweeps
viz       : host-side visualization (matplotlib at the edge only)
"""

__version__ = "0.1.0"
