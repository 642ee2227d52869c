from asr_shap.audio.normalize import zero_mean_unit_var
from asr_shap.audio.noise import add_white_noise_at_snr, mix_at_snr
from asr_shap.audio.mel import log_mel_spectrogram, mel_filterbank, stft_magnitude
from asr_shap.audio.resample import resample, resampled_length

__all__ = [
    "zero_mean_unit_var",
    "add_white_noise_at_snr",
    "mix_at_snr",
    "log_mel_spectrogram",
    "mel_filterbank",
    "stft_magnitude",
    "resample",
    "resampled_length",
]
