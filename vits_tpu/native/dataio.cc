// Native data-loading core for the vits_tpu pipeline.
//
// The reference feeds training through torch DataLoader worker *processes*
// doing soundfile/numpy IO (data_utils.py:15-102); its only other native code
// is the Cython MAS kernel (replaced by a Pallas kernel here). This library
// is the native half of our loader: RIFF/WAV decode (PCM16/24/32/float32,
// mono mix, peak normalization — utils.load_wav_to_torch semantics,
// utils.py:136-139), raw float32 feature reads, and a framed power-spectrum
// helper used for spectrogram caching. Exposed via a C ABI consumed with
// ctypes (vits_tpu/native/__init__.py); every entry point has a pure-Python
// fallback so the framework runs without the compiled artifact.
//
// Build: make -C vits_tpu/native   (produces libvitsdataio.so)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Returns number of floats in a raw float32 file, or -1.
long vits_bin_size(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long bytes = std::ftell(f);
  std::fclose(f);
  return bytes / 4;
}

// Reads up to max_floats float32 values; returns count read or -1.
long vits_read_bin(const char* path, float* out, long max_floats) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  long n = (long)std::fread(out, 4, (size_t)max_floats, f);
  std::fclose(f);
  return n;
}

namespace {

struct WavInfo {
  uint16_t format = 0;
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  long data_offset = -1;
  long data_bytes = 0;
};

bool parse_header(FILE* f, WavInfo* info) {
  unsigned char hdr[12];
  if (std::fread(hdr, 1, 12, f) != 12) return false;
  if (std::memcmp(hdr, "RIFF", 4) != 0 || std::memcmp(hdr + 8, "WAVE", 4) != 0)
    return false;
  unsigned char chunk[8];
  while (std::fread(chunk, 1, 8, f) == 8) {
    uint32_t size;
    std::memcpy(&size, chunk + 4, 4);
    long body = std::ftell(f);
    if (std::memcmp(chunk, "fmt ", 4) == 0) {
      unsigned char fmt[16];
      if (size < 16 || std::fread(fmt, 1, 16, f) != 16) return false;
      std::memcpy(&info->format, fmt + 0, 2);
      std::memcpy(&info->channels, fmt + 2, 2);
      std::memcpy(&info->sample_rate, fmt + 4, 4);
      std::memcpy(&info->bits, fmt + 14, 2);
    } else if (std::memcmp(chunk, "data", 4) == 0) {
      info->data_offset = body;
      info->data_bytes = (long)size;
    }
    std::fseek(f, body + (long)size + ((long)size & 1), SEEK_SET);
  }
  return info->data_offset >= 0 && info->channels > 0;
}

}  // namespace

// Returns the mono sample count of a wav file (after channel averaging), or -1.
long vits_wav_samples(const char* path, int* sample_rate) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  bool ok = parse_header(f, &info);
  std::fclose(f);
  if (!ok) return -1;
  if (sample_rate) *sample_rate = (int)info.sample_rate;
  long frame_bytes = (long)info.channels * info.bits / 8;
  if (frame_bytes <= 0) return -1;
  return info.data_bytes / frame_bytes;
}

// Decode wav to mono float32 in [-1, 1]; peak-normalize when normalize != 0.
// Returns samples written, or -1 on failure.
long vits_read_wav(const char* path, float* out, long max_samples,
                   int* sample_rate, int normalize) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_header(f, &info)) {
    std::fclose(f);
    return -1;
  }
  if (sample_rate) *sample_rate = (int)info.sample_rate;
  long frame_bytes = (long)info.channels * info.bits / 8;
  long frames = info.data_bytes / frame_bytes;
  if (frames > max_samples) frames = max_samples;
  std::vector<unsigned char> raw((size_t)(frames * frame_bytes));
  std::fseek(f, info.data_offset, SEEK_SET);
  long got = (long)std::fread(raw.data(), 1, raw.size(), f);
  std::fclose(f);
  frames = got / frame_bytes;

  const int ch = info.channels;
  const float inv_ch = 1.0f / (float)ch;
  bool is_float = (info.format == 3) || (info.format == 0xFFFE && info.bits == 32);
  for (long i = 0; i < frames; ++i) {
    float acc = 0.0f;
    for (int c = 0; c < ch; ++c) {
      const unsigned char* p = raw.data() + (size_t)(i * frame_bytes) + (size_t)c * info.bits / 8;
      float v = 0.0f;
      if (is_float) {
        float fv;
        std::memcpy(&fv, p, 4);
        v = fv;
      } else if (info.bits == 16) {
        int16_t s;
        std::memcpy(&s, p, 2);
        v = (float)s / 32768.0f;
      } else if (info.bits == 32) {
        int32_t s;
        std::memcpy(&s, p, 4);
        v = (float)s / 2147483648.0f;
      } else if (info.bits == 24) {
        int32_t s = (int32_t)p[0] | ((int32_t)p[1] << 8) | ((int32_t)p[2] << 16);
        if (s >= (1 << 23)) s -= (1 << 24);
        v = (float)s / 8388608.0f;
      } else {
        return -1;
      }
      acc += v;
    }
    out[i] = acc * inv_ch;
  }
  if (normalize) {
    float peak = 0.0f;
    for (long i = 0; i < frames; ++i) {
      float a = std::fabs(out[i]);
      if (a > peak) peak = a;
    }
    if (peak > 0.0f) {
      float inv = 1.0f / peak;
      for (long i = 0; i < frames; ++i) out[i] *= inv;
    }
  }
  return frames;
}

// Framed windowed extraction for host-side spectrogram caching: reflect-pads
// by (n_fft - hop)/2 (mel_processing.py:70 contract), multiplies the window
// (centered zero-padded to n_fft by the caller), and writes (n_frames, n_fft)
// into out. Returns n_frames or -1.
long vits_frame_signal(const float* x, long n, const float* window, int n_fft,
                       int hop, float* out, long max_frames) {
  const long pad = (n_fft - hop) / 2;
  const long total = n + 2 * pad;
  if (total < n_fft || n < pad + 1) return -1;
  long n_frames = (total - n_fft) / hop + 1;
  if (n_frames > max_frames) n_frames = max_frames;
  auto sample = [&](long idx) -> float {
    long t = idx - pad;  // reflect at both edges
    if (t < 0) t = -t;
    if (t >= n) t = 2 * (n - 1) - t;
    return x[t];
  };
  for (long fidx = 0; fidx < n_frames; ++fidx) {
    const long start = fidx * hop;
    float* row = out + (size_t)fidx * n_fft;
    for (int j = 0; j < n_fft; ++j) row[j] = sample(start + j) * window[j];
  }
  return n_frames;
}

}  // extern "C"
