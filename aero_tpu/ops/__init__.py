from aero_tpu.ops.spec import spectro, ispectro, stft, istft, hann_window
from aero_tpu.ops.resample import resample, resample_np
from aero_tpu.ops.mel import mel_spectrogram, mel_filterbank
