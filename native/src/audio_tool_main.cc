// aero_audio_tool — first-party replacement for the sox CLI usage in the
// reference's data prep (/root/reference/data_prep/resample_data.py:10-23)
// and 16-bit conversion (/root/reference/src/metrics.py:86-93).
//
//   aero_audio_tool resample <in.wav> <out.wav> <rate> [bits]
//   aero_audio_tool convert  <in.wav> <out.wav> [bits]
//   aero_audio_tool info     <in.wav>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>

#include "resample.h"
#include "wav.h"

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr,
            "usage: aero_audio_tool resample <in> <out> <rate> [bits]\n"
            "       aero_audio_tool convert <in> <out> [bits]\n"
            "       aero_audio_tool info <in>\n");
    return 1;
  }
  std::string cmd = argv[1];

  if (cmd == "info") {
    int sr, ch;
    int64_t frames;
    if (!aero::WavInfo(argv[2], &sr, &ch, &frames)) {
      fprintf(stderr, "error: cannot read %s\n", argv[2]);
      return 1;
    }
    printf("sample_rate=%d channels=%d frames=%lld duration=%.3f\n", sr, ch,
           (long long)frames, (double)frames / sr);
    return 0;
  }

  aero::WavData in;
  if (!aero::ReadWav(argv[2], &in)) {
    fprintf(stderr, "error: cannot read %s\n", argv[2]);
    return 1;
  }

  if (cmd == "resample") {
    if (argc < 5) {
      fprintf(stderr, "resample needs <in> <out> <rate>\n");
      return 1;
    }
    int rate = atoi(argv[4]);
    int bits = argc > 5 ? atoi(argv[5]) : 16;
    aero::WavData out;
    out.sample_rate = rate;
    out.channels = in.channels;
    for (auto& chan : in.samples)
      out.samples.push_back(aero::Resample(chan, in.sample_rate, rate));
    if (!aero::WriteWav(argv[3], out, bits)) {
      fprintf(stderr, "error: cannot write %s\n", argv[3]);
      return 1;
    }
    return 0;
  }

  if (cmd == "convert") {
    int bits = argc > 4 ? atoi(argv[4]) : 16;
    if (!aero::WriteWav(argv[3], in, bits)) {
      fprintf(stderr, "error: cannot write %s\n", argv[3]);
      return 1;
    }
    return 0;
  }

  fprintf(stderr, "unknown command: %s\n", cmd.c_str());
  return 1;
}
