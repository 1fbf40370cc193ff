#include "wav.h"

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>

namespace aero {
namespace {

struct ChunkHeader {
  char id[4];
  uint32_t size;
};

uint32_t ReadU32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint16_t ReadU16(const uint8_t* p) {
  return (uint16_t)(p[0] | (p[1] << 8));
}

}  // namespace

bool ParseHeader(FILE* f, int* sample_rate, int* channels, int* bits,
                 int* audio_format, long* data_offset, int64_t* data_size) {
  uint8_t riff[12];
  if (fread(riff, 1, 12, f) != 12) return false;
  if (memcmp(riff, "RIFF", 4) != 0 || memcmp(riff + 8, "WAVE", 4) != 0)
    return false;
  bool have_fmt = false, have_data = false;
  while (!have_fmt || !have_data) {
    uint8_t hdr[8];
    if (fread(hdr, 1, 8, f) != 8) break;
    uint32_t size = ReadU32(hdr + 4);
    if (memcmp(hdr, "fmt ", 4) == 0) {
      // PCM fmt needs >= 16 bytes (we read offsets 0..15); a corrupt
      // declared size must neither under-fill the reads below nor
      // trigger a multi-GB allocation whose bad_alloc would escape the
      // extern "C" ABI into the ctypes caller.
      if (size < 16 || size > (1u << 16)) return false;
      std::vector<uint8_t> body(size);
      if (fread(body.data(), 1, size, f) != size) return false;
      *audio_format = ReadU16(body.data());
      *channels = ReadU16(body.data() + 2);
      *sample_rate = (int)ReadU32(body.data() + 4);
      *bits = ReadU16(body.data() + 14);
      if (*audio_format == 0xFFFE && size >= 40)  // extensible
        *audio_format = ReadU16(body.data() + 24);
      have_fmt = true;
      if (size & 1) fseek(f, 1, SEEK_CUR);
    } else if (memcmp(hdr, "data", 4) == 0) {
      *data_offset = ftell(f);
      *data_size = size;
      have_data = true;
      fseek(f, (long)(size + (size & 1)), SEEK_CUR);
    } else {
      fseek(f, (long)(size + (size & 1)), SEEK_CUR);
    }
  }
  if (!have_fmt || !have_data) return false;
  if (*data_size == 0 || *data_size == 0xFFFFFFFFll) {
    fseek(f, 0, SEEK_END);
    *data_size = ftell(f) - *data_offset;
  }
  return true;
}

bool WavInfo(const std::string& path, int* sample_rate, int* channels,
             int64_t* num_frames) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  int bits = 0, fmt = 0;
  long off = 0;
  int64_t size = 0;
  bool ok = ParseHeader(f, sample_rate, channels, &bits, &fmt, &off, &size);
  fclose(f);
  if (!ok || *channels <= 0 || bits <= 0) return false;
  *num_frames = size / ((int64_t)*channels * bits / 8);
  return true;
}

bool ReadWav(const std::string& path, WavData* out, int64_t frame_offset,
             int64_t num_frames) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  int bits = 0, fmt = 0, sr = 0, ch = 0;
  long off = 0;
  int64_t size = 0;
  if (!ParseHeader(f, &sr, &ch, &bits, &fmt, &off, &size) || ch <= 0 ||
      bits <= 0) {
    fclose(f);
    return false;
  }
  int64_t bpf = (int64_t)ch * bits / 8;
  int64_t total = size / bpf;
  int64_t start = frame_offset < total ? frame_offset : total;
  int64_t count = (num_frames < 0) ? total - start
                                   : std::min(num_frames, total - start);
  if (count < 0) count = 0;

  std::vector<uint8_t> raw((size_t)(count * bpf));
  fseek(f, off + (long)(start * bpf), SEEK_SET);
  size_t got = fread(raw.data(), 1, raw.size(), f);
  fclose(f);
  count = (int64_t)(got / bpf);

  out->sample_rate = sr;
  out->channels = ch;
  out->samples.assign(ch, std::vector<float>((size_t)count));
  const uint8_t* p = raw.data();
  for (int64_t i = 0; i < count; ++i) {
    for (int c = 0; c < ch; ++c) {
      float v = 0.f;
      if (fmt == 3 && bits == 32) {
        float fv;
        memcpy(&fv, p, 4);
        v = fv;
        p += 4;
      } else if (bits == 16) {
        int16_t s = (int16_t)ReadU16(p);
        v = (float)s / 32768.f;
        p += 2;
      } else if (bits == 24) {
        int32_t s = (int32_t)(p[0] | (p[1] << 8) | (p[2] << 16));
        if (s >= (1 << 23)) s -= (1 << 24);
        v = (float)s / (float)(1 << 23);
        p += 3;
      } else if (bits == 32) {
        int32_t s;
        memcpy(&s, p, 4);
        v = (float)s / 2147483648.f;
        p += 4;
      } else {
        return false;
      }
      out->samples[c][(size_t)i] = v;
    }
  }
  return true;
}

bool WriteWav(const std::string& path, const WavData& data, int bits) {
  FILE* f = fopen(path.c_str(), "wb");
  if (!f) return false;
  int ch = data.channels;
  int64_t frames = data.frames();
  int fmt = bits == 32 ? 3 : 1;
  uint32_t data_size = (uint32_t)(frames * ch * bits / 8);
  uint32_t byte_rate = (uint32_t)data.sample_rate * ch * bits / 8;
  uint16_t block_align = (uint16_t)(ch * bits / 8);

  auto w16 = [&](uint16_t v) { fwrite(&v, 2, 1, f); };
  auto w32 = [&](uint32_t v) { fwrite(&v, 4, 1, f); };
  fwrite("RIFF", 1, 4, f);
  w32(36 + data_size);
  fwrite("WAVE", 1, 4, f);
  fwrite("fmt ", 1, 4, f);
  w32(16);
  w16((uint16_t)fmt);
  w16((uint16_t)ch);
  w32((uint32_t)data.sample_rate);
  w32(byte_rate);
  w16(block_align);
  w16((uint16_t)bits);
  fwrite("data", 1, 4, f);
  w32(data_size);

  for (int64_t i = 0; i < frames; ++i) {
    for (int c = 0; c < ch; ++c) {
      float v = data.samples[c][(size_t)i];
      if (bits == 16) {
        if (v > 1.f - 1.f / 32768.f) v = 1.f - 1.f / 32768.f;
        if (v < -1.f) v = -1.f;
        int16_t s = (int16_t)lrintf(v * 32768.f);
        fwrite(&s, 2, 1, f);
      } else {
        fwrite(&v, 4, 1, f);
      }
    }
  }
  fclose(f);
  return true;
}

}  // namespace aero
