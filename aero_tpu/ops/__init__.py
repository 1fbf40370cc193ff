from aero_tpu.ops.spec import spectro, ispectro, stft, istft, hann_window
