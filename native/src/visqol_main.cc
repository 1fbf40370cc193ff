// ViSQOL-contract quality scorer — full-pipeline port.
//
// Drop-in CLI for the reference's evaluation path
// (/root/reference/src/metrics.py:108-121): invoked as
//   ./bazel-bin/visqol --reference_file R --degraded_file D [--use_speech_mode]
// and prints a final line "MOS-LQO:\t<float>" (the reference parses the
// text after the last tab on stdout).
//
// This implements the published ViSQOL v3 pipeline (Hines et al.;
// Chinen et al., arXiv:2004.09584) end to end:
//   1. mid channel + resample (speech: 16 kHz, audio: 48 kHz)
//   2. global alignment of degraded to reference (cross-correlation)
//   3. gammatone spectrogram: 4th-order ERB-spaced filterbank
//      (21 bands from 50 Hz speech / 32 bands audio), 80 ms Hamming
//      frames, 20 ms hop (75% overlap), dB power
//   4. joint floor normalization of the two spectrograms
//   5. reference patch creation (30 frames/patch) with silent-patch
//      exclusion (speech-mode VAD equivalent)
//   6. optimal order-preserving patch alignment against the degraded
//      spectrogram (DP over candidate offsets, maximizing NSIM)
//   7. per-patch NSIM with 3x3 Gaussian (sigma 0.5) windowed moments
//      (luminance * structure; C1=(0.01 L)^2, C3=(0.03 L)^2 / 2)
//   8. per-band mean NSIM (fvnsim) -> mean NSIM -> MOS-LQO mapping.
//
// The NSIM->MOS mapping: this environment has no network access, so the
// exact fitted coefficients of ViSQOL's speech polynomial / audio SVR
// (model files in google/visqol) cannot be retrieved. The mappings here
// are monotone fits calibrated to ViSQOL's documented anchor behavior:
// speech mode is *scaled* (default in v3) so identical signals score
// 5.0 exactly; audio mode saturates at 4.732 (the SVR ceiling). Graded
// degradations are locked down by tests/test_native.py.

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

// Scorer version stamp. MOS values are only comparable within one stamp:
// any change to the pipeline or the NSIM->MOS coefficients MUST bump this.
// History: aero-native v1 = round-1 NSIM-only scorer (retired; its MOS
// values are NOT comparable with v2); aero-native v2 = full ViSQOL-v3
// pipeline port (alignment/gammatone/patch-DP/NSIM) with the anchor-v2
// calibrated mapping below. Emitted as a "VISQOL-COMPAT:" stdout line
// (before MOS-LQO so the reference's trailing-float parse is unaffected,
// /root/reference/src/metrics.py:108-121) and via --version.
constexpr const char* kScorerVersion = "aero-native v2, mapping=anchor-v2";

using Matrix = std::vector<std::vector<double>>;  // [bands][frames]

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

size_t NextPow2(size_t n) {
  size_t p = 1;
  while (p < n) p <<= 1;
  return p;
}

// ---------------------------------------------------------------------
// Global alignment (ViSQOL aligns the degraded signal to the reference
// before spectrogram computation). FFT cross-correlation over +-max_lag.
// Returns the lag (samples) by which `deg` must be shifted left (positive
// lag: deg starts later than ref).
int64_t BestLag(const std::vector<float>& ref, const std::vector<float>& deg,
                int64_t max_lag) {
  size_t n = std::max(ref.size(), deg.size());
  // The true cross-correlation is zero past n-1; clamping also keeps
  // every probed index inside the FFT buffer (lags beyond n-1 with
  // short inputs read out of bounds / alias negative lags onto
  // forward-lag bins: m = NextPow2(2n) only separates +-(n-1)).
  max_lag = std::min<int64_t>(max_lag, (int64_t)n - 1);
  if (max_lag < 0) return 0;
  size_t m = NextPow2(2 * n);
  std::vector<std::complex<double>> fr(m), fd(m);
  for (size_t i = 0; i < ref.size(); ++i) fr[i] = ref[i];
  for (size_t i = 0; i < deg.size(); ++i) fd[i] = deg[i];
  Fft(fr);
  Fft(fd);
  for (size_t i = 0; i < m; ++i) fr[i] *= std::conj(fd[i]);
  // inverse FFT via conjugation trick
  for (size_t i = 0; i < m; ++i) fr[i] = std::conj(fr[i]);
  Fft(fr);
  double best = -1e300;
  int64_t best_lag = 0;
  for (int64_t lag = -max_lag; lag <= max_lag; ++lag) {
    size_t idx = lag >= 0 ? (size_t)lag : m + lag;
    double v = fr[idx].real();
    if (v > best) {
      best = v;
      best_lag = lag;
    }
  }
  // corr[k] = sum ref[i+k] * deg[i] -> positive k: deg delayed vs ref.
  return best_lag;
}

// Shift/truncate so both signals cover the same time span.
void AlignAndTruncate(std::vector<float>* ref, std::vector<float>* deg,
                      int sr) {
  int64_t lag = BestLag(*ref, *deg, sr);  // search +-1 s
  if (lag > 0) {
    // degraded lags: drop the head of the reference
    ref->erase(ref->begin(),
               ref->begin() + std::min<int64_t>(lag, ref->size()));
  } else if (lag < 0) {
    deg->erase(deg->begin(),
               deg->begin() + std::min<int64_t>(-lag, deg->size()));
  }
  size_t n = std::min(ref->size(), deg->size());
  ref->resize(n);
  deg->resize(n);
}

// ---------------------------------------------------------------------
// Gammatone spectrogram.

double ErbOf(double f) { return 24.7 * (4.37 * f / 1000.0 + 1.0); }

// ERB-rate scale (Glasberg & Moore): number of ERBs below frequency f.
double HzToErbRate(double f) { return 21.4 * std::log10(1.0 + 0.00437 * f); }
double ErbRateToHz(double e) {
  return (std::pow(10.0, e / 21.4) - 1.0) / 0.00437;
}

// Center frequencies ERB-spaced between f_lo and f_hi inclusive.
std::vector<double> CenterFreqs(int n_bands, double f_lo, double f_hi) {
  double e0 = HzToErbRate(f_lo), e1 = HzToErbRate(f_hi);
  std::vector<double> fc(n_bands);
  for (int b = 0; b < n_bands; ++b)
    fc[b] = ErbRateToHz(e0 + (e1 - e0) * b / (n_bands - 1));
  return fc;
}

// Gammatone spectrogram: 80 ms Hamming frames, 20 ms hop; band power is
// the frame's FFT power weighted by the squared magnitude response of a
// 4th-order gammatone filter (peak-normalized), i.e. the frequency-
// domain realization of the Patterson-Holdsworth filterbank.
Matrix GammatoneSpectrogram(const std::vector<float>& x, int sr, int n_bands,
                            double f_lo) {
  int win = (int)std::lround(sr * 0.080);
  int hop = (int)std::lround(sr * 0.020);
  int n_frames =
      x.size() >= (size_t)win ? (int)((x.size() - win) / hop + 1) : 1;
  size_t nfft = NextPow2(win);
  int n_bins = (int)nfft / 2 + 1;

  std::vector<double> window(win);
  for (int i = 0; i < win; ++i)
    window[i] = 0.54 - 0.46 * std::cos(2.0 * M_PI * i / (win - 1));

  // band weights [n_bands][n_bins]
  std::vector<double> fc = CenterFreqs(n_bands, f_lo, 0.5 * sr * 0.88);
  std::vector<std::vector<double>> w(n_bands,
                                     std::vector<double>(n_bins, 0.0));
  for (int b = 0; b < n_bands; ++b) {
    double bw = 1.019 * ErbOf(fc[b]);
    for (int k = 0; k < n_bins; ++k) {
      double f = (double)k * sr / (double)nfft;
      double u = (f - fc[b]) / bw;
      // |G(f)|^2 for order-4 gammatone ~ (1 + u^2)^-4, unit peak
      w[b][k] = 1.0 / std::pow(1.0 + u * u, 4.0);
    }
  }

  Matrix spec(n_bands, std::vector<double>(n_frames, 0.0));
  std::vector<std::complex<double>> buf(nfft);
  for (int t = 0; t < n_frames; ++t) {
    int64_t start = (int64_t)t * hop;
    for (size_t i = 0; i < nfft; ++i) {
      double v = (i < (size_t)win && start + (int64_t)i < (int64_t)x.size())
                     ? x[start + i] * window[i]
                     : 0.0;
      buf[i] = v;
    }
    Fft(buf);
    for (int b = 0; b < n_bands; ++b) {
      double e = 0.0;
      for (int k = 0; k < n_bins; ++k) e += std::norm(buf[k]) * w[b][k];
      spec[b][t] = 10.0 * std::log10(e / win + 1e-20);
    }
  }
  return spec;
}

// Joint floor normalization (MiscAudio::PrepareSpectrogramsForComparison
// equivalent): clamp both spectrograms to a 60 dB dynamic range below the
// joint peak (digital silence would otherwise set a -200 dB floor and
// blow up the NSIM intensity range), then shift so the floor is 0.
void PrepareForComparison(Matrix* r, Matrix* d) {
  constexpr double kDynamicRangeDb = 60.0;
  double hi = -1e300;
  for (auto const& row : *r)
    for (double v : row) hi = std::max(hi, v);
  for (auto const& row : *d)
    for (double v : row) hi = std::max(hi, v);
  double floor_db = hi - kDynamicRangeDb;
  for (auto& row : *r)
    for (double& v : row) v = std::max(v, floor_db) - floor_db;
  for (auto& row : *d)
    for (double& v : row) v = std::max(v, floor_db) - floor_db;
}

// ---------------------------------------------------------------------
// NSIM on a patch pair: 3x3 Gaussian (sigma 0.5) windowed local moments,
// luminance * structure, averaged over the patch; per-band means are
// accumulated into fvnsim.
struct NsimResult {
  double mean = 0.0;
  std::vector<double> per_band;
};

NsimResult PatchNsim(const Matrix& r, const Matrix& d, int r0, int d0,
                     int patch, double L) {
  const int bands = (int)r.size();
  const double c1 = (0.01 * L) * (0.01 * L);
  const double c3 = (0.03 * L) * (0.03 * L) / 2.0;
  // window: fspecial('gaussian', [3 3], 0.5) — computed inline as
  // exp(-(db^2+dt^2)/(2*0.5^2)) and renormalized per pixel (borders).
  NsimResult res;
  res.per_band.assign(bands, 0.0);
  std::vector<int> band_counts(bands, 0);
  double total = 0.0;
  int count = 0;
  for (int b = 0; b < bands; ++b) {
    for (int t = 0; t < patch; ++t) {
      double wsum = 0, mr = 0, md = 0;
      for (int db = -1; db <= 1; ++db) {
        int bb = b + db;
        if (bb < 0 || bb >= bands) continue;
        for (int dt = -1; dt <= 1; ++dt) {
          int tt = t + dt;
          if (tt < 0 || tt >= patch) continue;
          double wgt = std::exp(-(db * db + dt * dt) / 0.5);
          wsum += wgt;
          mr += wgt * r[bb][r0 + tt];
          md += wgt * d[bb][d0 + tt];
        }
      }
      mr /= wsum;
      md /= wsum;
      double vr = 0, vd = 0, cov = 0;
      for (int db = -1; db <= 1; ++db) {
        int bb = b + db;
        if (bb < 0 || bb >= bands) continue;
        for (int dt = -1; dt <= 1; ++dt) {
          int tt = t + dt;
          if (tt < 0 || tt >= patch) continue;
          double wgt = std::exp(-(db * db + dt * dt) / 0.5);
          double xr = r[bb][r0 + tt] - mr, xd = d[bb][d0 + tt] - md;
          vr += wgt * xr * xr;
          vd += wgt * xd * xd;
          cov += wgt * xr * xd;
        }
      }
      vr /= wsum;
      vd /= wsum;
      cov /= wsum;
      double lum = (2.0 * mr * md + c1) / (mr * mr + md * md + c1);
      double str = (cov + c3) / (std::sqrt(vr * vd) + c3);
      double v = lum * str;
      res.per_band[b] += v;
      band_counts[b] += 1;
      total += v;
      ++count;
    }
  }
  for (int b = 0; b < bands; ++b)
    if (band_counts[b]) res.per_band[b] /= band_counts[b];
  res.mean = count ? total / count : 0.0;
  return res;
}

// ---------------------------------------------------------------------
// Patch creation + optimal order-preserving alignment
// (ImagePatchCreator + ComparisonPatchesSelector equivalents).

constexpr int kPatchSize = 30;       // frames/patch (0.6 s at 20 ms hop)
constexpr int kSearchRadius = 30;    // +-0.6 s around the nominal position
constexpr double kSilenceDb = 20.0;  // patch max below floor+20 dB => silent

struct Aligned {
  int ref_start;
  int deg_start;
};

std::vector<int> CreateRefPatches(const Matrix& r) {
  int frames = (int)r[0].size();
  std::vector<int> starts;
  for (int s = 0; s + kPatchSize <= frames; s += kPatchSize) {
    double peak = -1e300;
    for (auto const& row : r)
      for (int t = s; t < s + kPatchSize; ++t) peak = std::max(peak, row[t]);
    if (peak >= kSilenceDb) starts.push_back(s);  // VAD-equivalent gate
  }
  if (starts.empty() && frames >= kPatchSize) starts.push_back(0);
  return starts;
}

// DP: for each reference patch pick a degraded start offset within the
// search window, in order and non-overlapping, maximizing total NSIM.
std::vector<Aligned> AlignPatches(const Matrix& r, const Matrix& d,
                                  const std::vector<int>& ref_starts,
                                  double L) {
  int deg_frames = (int)d[0].size();
  int n = (int)ref_starts.size();
  std::vector<std::vector<int>> cand(n);
  std::vector<std::vector<double>> score(n);
  for (int i = 0; i < n; ++i) {
    int lo = std::max(0, ref_starts[i] - kSearchRadius);
    int hi = std::min(deg_frames - kPatchSize, ref_starts[i] + kSearchRadius);
    for (int s = lo; s <= hi; ++s) {
      cand[i].push_back(s);
      score[i].push_back(
          PatchNsim(r, d, ref_starts[i], s, kPatchSize, L).mean);
    }
    if (cand[i].empty()) {  // degraded too short: clamp to last valid
      int s = std::max(0, deg_frames - kPatchSize);
      cand[i].push_back(s);
      score[i].push_back(
          PatchNsim(r, d, ref_starts[i], s, kPatchSize, L).mean);
    }
  }
  // dp[i][j]: best total for patches i.. choosing candidate j for i,
  // with starts strictly increasing by >= kPatchSize between patches.
  std::vector<std::vector<double>> dp(n);
  std::vector<std::vector<int>> nxt(n);
  for (int i = n - 1; i >= 0; --i) {
    dp[i].assign(cand[i].size(), 0.0);
    nxt[i].assign(cand[i].size(), -1);
    for (size_t j = 0; j < cand[i].size(); ++j) {
      dp[i][j] = score[i][j];
      if (i + 1 < n) {
        double best = -1e300;
        int arg = -1;
        for (size_t k = 0; k < cand[i + 1].size(); ++k) {
          if (cand[i + 1][k] >= cand[i][j] + kPatchSize &&
              dp[i + 1][k] > best) {
            best = dp[i + 1][k];
            arg = (int)k;
          }
        }
        if (arg < 0) {  // no in-order continuation: take the best anyway
          for (size_t k = 0; k < cand[i + 1].size(); ++k)
            if (dp[i + 1][k] > best) {
              best = dp[i + 1][k];
              arg = (int)k;
            }
        }
        dp[i][j] += best;
        nxt[i][j] = arg;
      }
    }
  }
  std::vector<Aligned> out;
  if (n == 0) return out;
  int j = 0;
  for (size_t k = 1; k < dp[0].size(); ++k)
    if (dp[0][k] > dp[0][j]) j = (int)k;
  for (int i = 0; i < n; ++i) {
    out.push_back({ref_starts[i], cand[i][j]});
    j = nxt[i][j];
    if (j < 0 && i + 1 < n) j = 0;
  }
  return out;
}

// ---------------------------------------------------------------------
// NSIM -> MOS-LQO.
//
// Monotone logistic fits calibrated to ViSQOL's documented anchors
// (identical: 5.0 speech-scaled / 4.732 audio SVR ceiling; floor 1.0)
// and graded-degradation ordering; see file header for why the exact
// fitted SVR/polynomial coefficients are not reproducible here.
double Sigmoid(double x) { return 1.0 / (1.0 + std::exp(-x)); }

// Logistic NSIM->MOS, normalized so nsim=1 hits `mos_max` exactly.
// Calibrated on a graded-degradation ladder (speech-like signals):
// bandlimit-to-8k ~3.6, bandlimit-to-4k ~2.2, heavy noise / unrelated
// -> ~1; see tests/test_native.py.
double NsimToMos(double nsim, double mos_max) {
  constexpr double k = 11.0, x0 = 0.83;
  double v = 1.0 + (mos_max - 1.0) * Sigmoid(k * (nsim - x0)) /
                       Sigmoid(k * (1.0 - x0));
  return std::max(1.0, std::min(mos_max, v));
}

// scaled speech mapping (v3 default): perfect similarity -> 5.0
double SpeechNsimToMos(double nsim) { return NsimToMos(nsim, 5.0); }
// audio mode saturates at the SVR ceiling 4.732
double AudioNsimToMos(double nsim) { return NsimToMos(nsim, 4.732); }

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
  bool verbose = false;
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
    else if (a == "--verbose")
      verbose = true;
    else if (a.rfind("--reference_file=", 0) == 0)
      ref_path = a.substr(17);
    else if (a.rfind("--degraded_file=", 0) == 0)
      deg_path = a.substr(16);
    else if (a == "--version") {
      printf("VISQOL-COMPAT: %s\n", kScorerVersion);
      return 0;
    }
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

  AlignAndTruncate(&r, &d, target_sr);
  if (r.size() < (size_t)(target_sr / 5)) {
    fprintf(stderr, "error: signals too short after alignment\n");
    return 1;
  }

  int n_bands = speech_mode ? 21 : 32;
  double f_lo = 50.0;
  Matrix sr_ = GammatoneSpectrogram(r, target_sr, n_bands, f_lo);
  Matrix sd_ = GammatoneSpectrogram(d, target_sr, n_bands, f_lo);
  PrepareForComparison(&sr_, &sd_);

  double L = 0.0;  // intensity range (floor is 0 after preparation)
  for (auto const& row : sr_)
    for (double v : row) L = std::max(L, v);
  for (auto const& row : sd_)
    for (double v : row) L = std::max(L, v);
  L = std::max(L, 1.0);

  std::vector<int> ref_starts = CreateRefPatches(sr_);
  std::vector<Aligned> pairs = AlignPatches(sr_, sd_, ref_starts, L);

  std::vector<double> fvnsim(n_bands, 0.0);
  double nsim = 0.0;
  if (pairs.empty()) {
    // official ViSQOL errors when no patches can be created (< 0.6 s of
    // frames); exit nonzero so metrics.get_visqol returns 0 and the
    // file is EXCLUDED from averages (reference evaluate.py:121-122)
    // instead of contributing a floor MOS.
    fprintf(stderr, "error: no patches could be created (input too "
            "short: %d frames < %d)\n", (int)sr_[0].size(), kPatchSize);
    return 1;
  } else {
    for (auto const& p : pairs) {
      NsimResult res =
          PatchNsim(sr_, sd_, p.ref_start, p.deg_start, kPatchSize, L);
      nsim += res.mean;
      for (int b = 0; b < n_bands; ++b) fvnsim[b] += res.per_band[b];
    }
    nsim /= pairs.size();
    for (int b = 0; b < n_bands; ++b) fvnsim[b] /= pairs.size();
  }

  double mos = speech_mode ? SpeechNsimToMos(nsim) : AudioNsimToMos(nsim);

  printf("Reference: %s\n", ref_path.c_str());
  printf("Degraded: %s\n", deg_path.c_str());
  printf("VISQOL-COMPAT: %s\n", kScorerVersion);
  if (verbose) {
    printf("FVNSIM:");
    for (int b = 0; b < n_bands; ++b) printf("\t%0.5f", fvnsim[b]);
    printf("\n");
    printf("Patches:\t%d\n", (int)pairs.size());
  }
  printf("NSIM:\t%0.5f\n", nsim);
  printf("MOS-LQO:\t%0.5f\n", mos);
  return 0;
}
