// Minimal WAV codec: PCM 16/24/32 and float32, mono/multi-channel,
// random-access reads. First-party replacement for the libsox/torchaudio
// I/O the reference shells out to (SURVEY.md §2.4).
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace aero {

struct WavData {
  int sample_rate = 0;
  int channels = 0;
  // interleaved -> deinterleaved [channels][frames] float in [-1, 1]
  std::vector<std::vector<float>> samples;
  int64_t frames() const {
    return samples.empty() ? 0 : (int64_t)samples[0].size();
  }
};

// Reads the whole file (or [frame_offset, frame_offset+num_frames)).
// Returns false on parse error. num_frames < 0 => to end.
bool ReadWav(const std::string& path, WavData* out, int64_t frame_offset = 0,
             int64_t num_frames = -1);

// Probe without decoding samples.
bool WavInfo(const std::string& path, int* sample_rate, int* channels,
             int64_t* num_frames);

// Writes 16-bit PCM (bits=16) or float32 (bits=32).
bool WriteWav(const std::string& path, const WavData& data, int bits = 16);

}  // namespace aero
