// audioio — native host-side audio decode + resample for qwen3_asr_rs_tpu.
//
// TPU-native analog of the reference's native audio path (hound WAV decode
// + rubato windowed-sinc resampling behind Rust FFI): a self-contained C++
// RIFF/WAVE parser plus a polyphase windowed-sinc resampler, exposed
// through a minimal C ABI consumed via ctypes (qwen3_asr_rs_tpu/audio/
// native.py). The algorithm matches the numpy fallback implementation in
// qwen3_asr_rs_tpu/audio/resample.py (same kernel design: Blackman-Harris
// window, 0.95x-Nyquist cutoff, gain `up`), so the two are cross-checked
// in tests.
//
// Build: `make -C native` -> libaudioio.so

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <string>
#include <vector>

namespace {

struct WavData {
  std::vector<double> samples;  // interleaved
  uint32_t sample_rate = 0;
  uint16_t channels = 0;
};

thread_local std::string g_error;

bool parse_wav(const uint8_t* data, size_t len, WavData* out) {
  if (len < 12 || std::memcmp(data, "RIFF", 4) != 0 ||
      std::memcmp(data + 8, "WAVE", 4) != 0) {
    g_error = "not a RIFF/WAVE file";
    return false;
  }
  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t* payload = nullptr;
  size_t payload_len = 0;

  size_t off = 12;
  while (off + 8 <= len) {
    uint32_t size;
    std::memcpy(&size, data + off + 4, 4);
    const uint8_t* body = data + off + 8;
    if (off + 8 + size > len) size = static_cast<uint32_t>(len - off - 8);
    if (std::memcmp(data + off, "fmt ", 4) == 0 && size >= 16) {
      std::memcpy(&format, body, 2);
      std::memcpy(&channels, body + 2, 2);
      std::memcpy(&rate, body + 4, 4);
      std::memcpy(&bits, body + 14, 2);
      if (format == 0xFFFE && size >= 26) {
        // WAVE_FORMAT_EXTENSIBLE: real tag is the subformat GUID's first
        // two bytes (fmt-chunk offset 24); 1 = PCM, 3 = IEEE float.
        std::memcpy(&format, body + 24, 2);
      }
    } else if (std::memcmp(data + off, "data", 4) == 0) {
      payload = body;
      payload_len = size;
    }
    off += 8 + size + (size & 1);
  }
  if (!payload || channels == 0 || rate == 0) {
    g_error = "missing fmt/data chunk";
    return false;
  }
  // Extensible with no GUID (malformed): guess, same rule as load.py.
  if (format == 0xFFFE) format = (bits == 32 || bits == 64) ? 3 : 1;

  // validate BEFORE bits/8: sub-byte depths (ADPCM's 4, GSM's 0)
  // would otherwise divide by zero and SIGFPE the whole process
  // instead of reaching the graceful unsupported-format error below
  if (bits != 8 && bits != 16 && bits != 24 && bits != 32 && bits != 64) {
    g_error = "unsupported bit depth " + std::to_string(bits);
    return false;
  }
  out->sample_rate = rate;
  out->channels = channels;
  size_t bytes_per = bits / 8;
  size_t n = payload_len / bytes_per;
  out->samples.resize(n);

  if (format == 1) {  // PCM
    switch (bits) {
      case 8:
        for (size_t i = 0; i < n; ++i)
          out->samples[i] = (payload[i] - 128.0) / 128.0;
        break;
      case 16:
        for (size_t i = 0; i < n; ++i) {
          int16_t v;
          std::memcpy(&v, payload + 2 * i, 2);
          out->samples[i] = v / 32768.0;
        }
        break;
      case 24:
        for (size_t i = 0; i < n; ++i) {
          int32_t v = payload[3 * i] | (payload[3 * i + 1] << 8) |
                      (payload[3 * i + 2] << 16);
          if (v >= (1 << 23)) v -= (1 << 24);
          out->samples[i] = v / 8388608.0;
        }
        break;
      case 32:
        for (size_t i = 0; i < n; ++i) {
          int32_t v;
          std::memcpy(&v, payload + 4 * i, 4);
          out->samples[i] = v / 2147483648.0;
        }
        break;
      default:
        g_error = "unsupported PCM bit depth " + std::to_string(bits);
        return false;
    }
  } else if (format == 3) {  // IEEE float
    if (bits == 32) {
      for (size_t i = 0; i < n; ++i) {
        float v;
        std::memcpy(&v, payload + 4 * i, 4);
        out->samples[i] = v;
      }
    } else if (bits == 64) {
      for (size_t i = 0; i < n; ++i) {
        double v;
        std::memcpy(&v, payload + 8 * i, 8);
        out->samples[i] = v;
      }
    } else {
      g_error = "unsupported float bit depth " + std::to_string(bits);
      return false;
    }
  } else {
    g_error = "unsupported WAV format tag " + std::to_string(format);
    return false;
  }
  return true;
}

std::vector<double> blackman_harris(size_t n) {
  std::vector<double> w(n);
  for (size_t k = 0; k < n; ++k) {
    double x = 2.0 * M_PI * k / (n - 1);
    w[k] = 0.35875 - 0.48829 * std::cos(x) + 0.14128 * std::cos(2 * x) -
           0.01168 * std::cos(3 * x);
  }
  return w;
}

// Polyphase windowed-sinc resample; mirrors resample.py::resample_sinc.
std::vector<float> resample_poly(const std::vector<double>& x_in, int from_rate,
                                 int to_rate, int taps_per_phase = 128) {
  if (from_rate == to_rate || x_in.empty()) {
    return std::vector<float>(x_in.begin(), x_in.end());
  }
  int g = std::gcd(from_rate, to_rate);
  int up = to_rate / g, down = from_rate / g;

  size_t n_taps = static_cast<size_t>(taps_per_phase) * up;
  if (n_taps % 2 == 0) n_taps += 1;
  size_t center = n_taps / 2;
  double fc = 0.95 * 0.5 / std::max(up, down);

  std::vector<double> h(n_taps);
  auto win = blackman_harris(n_taps);
  double sum = 0.0;
  for (size_t k = 0; k < n_taps; ++k) {
    double t = static_cast<double>(k) - static_cast<double>(center);
    double arg = 2.0 * fc * t;
    double sinc = (arg == 0.0) ? 1.0 : std::sin(M_PI * arg) / (M_PI * arg);
    h[k] = 2.0 * fc * sinc * win[k];
    sum += h[k];
  }
  for (auto& v : h) v *= up / sum;

  size_t pad = taps_per_phase + 2;
  std::vector<double> x(x_in.size() + 2 * pad, 0.0);
  std::copy(x_in.begin(), x_in.end(), x.begin() + pad);

  size_t n_j = (n_taps - 1) / up + 1;
  // bank[p][j] = h[p + j*up]
  std::vector<double> bank(static_cast<size_t>(up) * n_j, 0.0);
  for (int p = 0; p < up; ++p)
    for (size_t j = 0; p + j * up < n_taps; ++j)
      bank[p * n_j + j] = h[p + j * up];

  size_t n_out = x_in.size() * up / down;
  std::vector<float> y(n_out);
  for (size_t m = 0; m < n_out; ++m) {
    size_t t = m * static_cast<size_t>(down) + center;
    size_t base = t / up + pad;
    size_t phase = t % up;
    const double* b = &bank[phase * n_j];
    double acc = 0.0;
    for (size_t j = 0; j < n_j; ++j) acc += x[base - j] * b[j];
    y[m] = static_cast<float>(acc);
  }
  return y;
}

thread_local std::vector<float> g_result;

}  // namespace

extern "C" {

// Decode a WAV file, mix to mono, resample to target_rate.
// Returns the number of output samples, 0 on failure (see audioio_error()).
// The sample buffer stays valid until the next call on this thread;
// copy it out with audioio_copy().
int64_t audioio_load_wav(const char* path, int target_rate) try {
  g_error.clear();
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    g_error = "cannot open file";
    return 0;
  }
  // unseekable paths (FIFOs, /dev/stdin) make ftell return -1, which
  // as a vector size is SIZE_MAX — check instead of aborting
  if (std::fseek(f, 0, SEEK_END) != 0) {
    std::fclose(f);
    g_error = "unseekable input";
    return 0;
  }
  long size = std::ftell(f);
  if (size < 0 || std::fseek(f, 0, SEEK_SET) != 0) {
    std::fclose(f);
    g_error = "unseekable input";
    return 0;
  }
  std::vector<uint8_t> buf(static_cast<size_t>(size));
  size_t got = std::fread(buf.data(), 1, size, f);
  std::fclose(f);
  if (got != static_cast<size_t>(size)) {
    g_error = "short read";
    return 0;
  }

  WavData wav;
  if (!parse_wav(buf.data(), buf.size(), &wav)) return 0;

  size_t frames = wav.samples.size() / wav.channels;
  std::vector<double> mono(frames);
  for (size_t i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < wav.channels; ++c)
      acc += wav.samples[i * wav.channels + c];
    mono[i] = acc / wav.channels;
  }

  g_result = resample_poly(mono, static_cast<int>(wav.sample_rate), target_rate);
  if (g_result.empty()) {
    g_error = "no samples decoded";
    return 0;
  }
  return static_cast<int64_t>(g_result.size());
} catch (const std::exception& e) {
  // never let a C++ exception (bad_alloc on a huge file, length_error)
  // unwind through the ctypes boundary — that aborts the process
  g_error = std::string("native decode failed: ") + e.what();
  return 0;
} catch (...) {
  g_error = "native decode failed";
  return 0;
}

void audioio_copy(float* dst, int64_t n) {
  if (n > static_cast<int64_t>(g_result.size()))
    n = static_cast<int64_t>(g_result.size());
  std::memcpy(dst, g_result.data(), n * sizeof(float));
}

const char* audioio_error() { return g_error.c_str(); }

// Standalone resample entry (used by tests to cross-check vs numpy).
int64_t audioio_resample(const double* x, int64_t n, int from_rate,
                         int to_rate) try {
  g_error.clear();
  std::vector<double> in(x, x + n);
  g_result = resample_poly(in, from_rate, to_rate);
  return static_cast<int64_t>(g_result.size());
} catch (const std::exception& e) {
  g_error = std::string("native resample failed: ") + e.what();
  return 0;
} catch (...) {
  g_error = "native resample failed";
  return 0;
}

}  // extern "C"
