// Polyphase windowed-sinc resampler — same kernel math as
// aero_tpu/ops/resample.py (torchaudio-default parameters:
// lowpass_filter_width=6, rolloff=0.99, Hann window).
#pragma once

#include <vector>

namespace aero {

// Resamples one channel. Output length = ceil(n * new_freq / orig_freq).
std::vector<float> Resample(const std::vector<float>& x, int orig_freq,
                            int new_freq, int lowpass_filter_width = 6,
                            double rolloff = 0.99);

}  // namespace aero
