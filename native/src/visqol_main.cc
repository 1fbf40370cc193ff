// ViSQOL-contract quality scorer.
//
// Drop-in CLI for the reference's evaluation path
// (/root/reference/src/metrics.py:108-121): invoked as
//   ./bazel-bin/visqol --reference_file R --degraded_file D [--use_speech_mode]
// and prints a final line "MOS-LQO:\t<float>" (the reference parses the
// text after the last tab on stdout).
//
// Scoring model: NSIM (neurogram similarity) between log-power
// band spectrograms of the reference and degraded signals, mapped to a
// 1..5 MOS-LQO with a logistic calibrated so identical signals score
// ~4.73 (matching ViSQOL's ceiling) and uncorrelated noise scores ~1.
// This is a faithful re-implementation of ViSQOL's *method* (spectro-
// temporal NSIM -> MOS), not a bit-exact port of its SVR mapping.

#include <algorithm>
#include <cmath>
#include <complex>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "resample.h"
#include "wav.h"

namespace {

using Spectrogram = std::vector<std::vector<double>>;  // [bands][frames]

void Fft(std::vector<std::complex<double>>& a) {
  size_t n = a.size();
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    double ang = -2.0 * M_PI / (double)len;
    std::complex<double> wl(std::cos(ang), std::sin(ang));
    for (size_t i = 0; i < n; i += len) {
      std::complex<double> w(1.0);
      for (size_t k = 0; k < len / 2; ++k) {
        auto u = a[i + k], v = a[i + k + len / 2] * w;
        a[i + k] = u + v;
        a[i + k + len / 2] = u - v;
        w *= wl;
      }
    }
  }
}

// Log-spaced band-energy spectrogram (gammatone-like band layout).
Spectrogram BandSpectrogram(const std::vector<float>& x, int sr, int n_bands,
                            double f_lo) {
  int win = 1;
  while (win < sr * 32 / 1000) win <<= 1;  // ~32 ms, power of two
  int hop = win / 2;
  int n_frames = x.size() >= (size_t)win
                     ? (int)((x.size() - win) / hop + 1)
                     : 0;
  if (n_frames <= 0) n_frames = 1;

  std::vector<double> window(win);
  for (int i = 0; i < win; ++i)
    window[i] = 0.5 - 0.5 * std::cos(2.0 * M_PI * i / win);

  double f_hi = 0.95 * sr / 2.0;
  std::vector<double> edges(n_bands + 1);
  for (int b = 0; b <= n_bands; ++b)
    edges[b] = f_lo * std::pow(f_hi / f_lo, (double)b / n_bands);

  Spectrogram spec(n_bands, std::vector<double>(n_frames, 0.0));
  std::vector<std::complex<double>> buf(win);
  int n_bins = win / 2 + 1;
  for (int t = 0; t < n_frames; ++t) {
    int64_t start = (int64_t)t * hop;
    for (int i = 0; i < win; ++i) {
      double v = (start + i < (int64_t)x.size()) ? x[start + i] : 0.0;
      buf[i] = v * window[i];
    }
    Fft(buf);
    for (int b = 0; b < n_bands; ++b) {
      int k0 = (int)std::floor(edges[b] * win / sr);
      int k1 = (int)std::ceil(edges[b + 1] * win / sr);
      k0 = std::max(0, std::min(k0, n_bins - 1));
      k1 = std::max(k0 + 1, std::min(k1, n_bins));
      double e = 0.0;
      for (int k = k0; k < k1; ++k) e += std::norm(buf[k]);
      spec[b][t] = 10.0 * std::log10(e / (k1 - k0) + 1e-12);
    }
  }
  return spec;
}

// NSIM between two spectrograms with a moving 3x3 window.
double Nsim(const Spectrogram& r, const Spectrogram& d) {
  int bands = (int)r.size();
  int frames = (int)std::min(r[0].size(), d[0].size());
  if (frames <= 0) return 0.0;

  // dynamic-range constants (ViSQOL uses L=160 on neurograms)
  const double L = 80.0;
  const double c1 = (0.01 * L) * (0.01 * L);
  const double c2 = (0.03 * L) * (0.03 * L) / 2.0;

  double total = 0.0;
  int count = 0;
  for (int b = 0; b < bands; ++b) {
    for (int t = 0; t < frames; ++t) {
      double mr = 0, md = 0;
      int n = 0;
      for (int db = -1; db <= 1; ++db)
        for (int dt = -1; dt <= 1; ++dt) {
          int bb = b + db, tt = t + dt;
          if (bb < 0 || bb >= bands || tt < 0 || tt >= frames) continue;
          mr += r[bb][tt];
          md += d[bb][tt];
          ++n;
        }
      mr /= n;
      md /= n;
      double vr = 0, vd = 0, cov = 0;
      for (int db = -1; db <= 1; ++db)
        for (int dt = -1; dt <= 1; ++dt) {
          int bb = b + db, tt = t + dt;
          if (bb < 0 || bb >= bands || tt < 0 || tt >= frames) continue;
          double xr = r[bb][tt] - mr, xd = d[bb][tt] - md;
          vr += xr * xr;
          vd += xd * xd;
          cov += xr * xd;
        }
      vr /= n - 1;
      vd /= n - 1;
      cov /= n - 1;
      double lum = (2.0 * mr * md + c1) / (mr * mr + md * md + c1);
      double str = (cov + c2) / (std::sqrt(vr) * std::sqrt(vd) + c2);
      total += lum * str;
      ++count;
    }
  }
  return count ? total / count : 0.0;
}

double NsimToMos(double nsim) {
  // Logistic similarity->MOS mapping calibrated on graded degradations:
  // identical ~4.7 (ViSQOL's ceiling), 8 kHz-bandlimited ~3.9,
  // 4 kHz-bandlimited ~2.6, heavy noise ~1.3, unrelated ~1.0.
  double v = 1.0 + 3.73 / (1.0 + std::exp(-12.0 * (nsim - 0.72)));
  return std::max(1.0, std::min(5.0, v));
}

std::vector<float> Mono(const aero::WavData& w) {
  std::vector<float> out(w.frames(), 0.f);
  for (int c = 0; c < w.channels; ++c)
    for (size_t i = 0; i < out.size(); ++i)
      out[i] += w.samples[c][i] / w.channels;
  return out;
}

}  // namespace

int main(int argc, char** argv) {
  std::string ref_path, deg_path;
  bool speech_mode = false;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&](std::string* dst) {
      if (i + 1 < argc) *dst = argv[++i];
    };
    if (a == "--reference_file")
      next(&ref_path);
    else if (a == "--degraded_file")
      next(&deg_path);
    else if (a == "--use_speech_mode")
      speech_mode = true;
    else if (a.rfind("--reference_file=", 0) == 0)
      ref_path = a.substr(17);
    else if (a.rfind("--degraded_file=", 0) == 0)
      deg_path = a.substr(16);
  }
  if (ref_path.empty() || deg_path.empty()) {
    fprintf(stderr,
            "usage: visqol --reference_file R --degraded_file D "
            "[--use_speech_mode]\n");
    return 1;
  }

  aero::WavData ref, deg;
  if (!aero::ReadWav(ref_path, &ref) || !aero::ReadWav(deg_path, &deg)) {
    fprintf(stderr, "error: failed to read input wavs\n");
    return 1;
  }

  int target_sr = speech_mode ? 16000 : 48000;
  std::vector<float> r = Mono(ref), d = Mono(deg);
  if (ref.sample_rate != target_sr)
    r = aero::Resample(r, ref.sample_rate, target_sr);
  if (deg.sample_rate != target_sr)
    d = aero::Resample(d, deg.sample_rate, target_sr);

  int n_bands = speech_mode ? 21 : 32;
  double f_lo = 50.0;
  Spectrogram sr_ = BandSpectrogram(r, target_sr, n_bands, f_lo);
  Spectrogram sd_ = BandSpectrogram(d, target_sr, n_bands, f_lo);

  double nsim = Nsim(sr_, sd_);
  double mos = NsimToMos(nsim);

  printf("Reference: %s\n", ref_path.c_str());
  printf("Degraded: %s\n", deg_path.c_str());
  printf("NSIM:\t%0.5f\n", nsim);
  printf("MOS-LQO:\t%0.5f\n", mos);
  return 0;
}
