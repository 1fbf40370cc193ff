#include "resample.h"

#include <algorithm>
#include <cmath>
#include <numeric>

namespace aero {

static int Gcd(int a, int b) { return b == 0 ? a : Gcd(b, a % b); }

std::vector<float> Resample(const std::vector<float>& x, int orig_freq,
                            int new_freq, int lowpass_filter_width,
                            double rolloff) {
  if (orig_freq == new_freq) return x;
  int g = Gcd(orig_freq, new_freq);
  int of = orig_freq / g, nf = new_freq / g;

  double base_freq = std::min(of, nf) * rolloff;
  int width = (int)std::ceil(lowpass_filter_width * of / base_freq);
  int klen = 2 * width + of;

  // kernel[p][k], p = output phase
  std::vector<std::vector<double>> kernel(nf, std::vector<double>(klen));
  for (int p = 0; p < nf; ++p) {
    for (int k = 0; k < klen; ++k) {
      double idx = (double)(k - width) / of;
      double t = -(double)p / nf + idx;
      t *= base_freq;
      t = std::max(-(double)lowpass_filter_width,
                   std::min((double)lowpass_filter_width, t));
      double window = std::cos(t * M_PI / lowpass_filter_width / 2.0);
      window *= window;
      double tp = t * M_PI;
      double sinc = tp == 0.0 ? 1.0 : std::sin(tp) / tp;
      kernel[p][k] = sinc * window * base_freq / of;
    }
  }

  int64_t n = (int64_t)x.size();
  int64_t tgt = (int64_t)std::ceil((double)nf * n / of);
  std::vector<float> out((size_t)tgt);
  // padded input: [width zeros] x [width + of zeros]
  auto sample = [&](int64_t i) -> double {
    return (i < 0 || i >= n) ? 0.0 : (double)x[(size_t)i];
  };
  int64_t n_frames = (n + 2 * width + of - klen) / of + 1;
  for (int64_t frame = 0; frame < n_frames; ++frame) {
    int64_t in_start = frame * of - width;
    for (int p = 0; p < nf; ++p) {
      int64_t out_idx = frame * nf + p;
      if (out_idx >= tgt) break;
      double acc = 0.0;
      const auto& kp = kernel[p];
      for (int k = 0; k < klen; ++k) acc += kp[k] * sample(in_start + k);
      out[(size_t)out_idx] = (float)acc;
    }
  }
  return out;
}

}  // namespace aero
