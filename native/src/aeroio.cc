// libaeroio — C ABI for the Python data loader (ctypes binding in
// aero_tpu/data/native_io.py). Native equivalent of the torchaudio/
// libsox file I/O the reference depends on (SURVEY.md §2.4).

#include <cstring>

#include "resample.h"
#include "wav.h"

extern "C" {

// Returns 0 on success.
int aeroio_info(const char* path, int* sample_rate, int* channels,
                long long* num_frames) {
  int64_t frames = 0;
  if (!aero::WavInfo(path, sample_rate, channels, &frames)) return 1;
  *num_frames = (long long)frames;
  return 0;
}

// Reads [frame_offset, frame_offset+num_frames) into out (channel-major
// [channels][num_frames], caller-allocated with capacity ch*num_frames).
// Short reads zero-fill. num_frames < 0 unsupported here (query info
// first). Returns 0 on success; *got_frames = frames actually decoded.
int aeroio_read(const char* path, long long frame_offset,
                long long num_frames, float* out, long long* got_frames) {
  aero::WavData data;
  if (!aero::ReadWav(path, &data, frame_offset, num_frames)) return 1;
  long long got = (long long)data.frames();
  for (int c = 0; c < data.channels; ++c) {
    float* dst = out + (long long)c * num_frames;
    memcpy(dst, data.samples[c].data(), sizeof(float) * (size_t)got);
    if (got < num_frames)
      memset(dst + got, 0, sizeof(float) * (size_t)(num_frames - got));
  }
  *got_frames = got;
  return 0;
}

// In-place-ish resample: writes up to out_capacity samples, returns the
// actual output length, or -1 on error.
long long aeroio_resample(const float* x, long long n, int orig_freq,
                          int new_freq, float* out, long long out_capacity) {
  std::vector<float> in(x, x + n);
  std::vector<float> y = aero::Resample(in, orig_freq, new_freq);
  if ((long long)y.size() > out_capacity) return -1;
  memcpy(out, y.data(), sizeof(float) * y.size());
  return (long long)y.size();
}

}  // extern "C"
