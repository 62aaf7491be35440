// Native audio DSP for the host frontend: Whisper log-mel spectrogram.
//
// TPU-native counterpart of the reference's native host pieces (the reference
// ships CUDA kernels for its hot device ops and leans on librosa/ffmpeg for
// audio): here the per-clip mel extraction — the hottest host-side loop in
// the serving path (30 s of 16 kHz audio => 3000 frames x 400-pt windows) —
// is a small C++ library bound via ctypes, with the numpy implementation in
// frontend/audio.py as the fallback. Build: `make -C runtime`.
//
// Pipeline (matches frontend/audio.py bit-for-bit up to fp rounding):
//   reflect-pad -> hann window -> rDFT power spectrum -> mel filterbank
//   (slaney) -> log10 -> dynamic-range compression.
//
// The DFT is computed as two real matmuls against precomputed cos/sin tables
// (n_fft=400 is not a power of two; at this size a blocked matmul with -O3
// auto-vectorization beats a generic FFT and keeps the code dependency-free).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kNFFT = 400;
constexpr int kHop = 160;
constexpr int kBins = kNFFT / 2 + 1;  // 201
constexpr int kMels = 80;

struct Tables {
  std::vector<float> window;          // (400)
  std::vector<float> cos_t, sin_t;    // (bins, 400)
  std::vector<float> mel;             // (80, bins)
  Tables() {
    window.resize(kNFFT);
    for (int i = 0; i < kNFFT; ++i) {
      // numpy.hanning(N+1)[:-1]
      window[i] = 0.5f - 0.5f * std::cos(2.0 * M_PI * i / kNFFT);
    }
    cos_t.resize((size_t)kBins * kNFFT);
    sin_t.resize((size_t)kBins * kNFFT);
    for (int k = 0; k < kBins; ++k) {
      for (int n = 0; n < kNFFT; ++n) {
        double ang = -2.0 * M_PI * k * n / kNFFT;
        cos_t[(size_t)k * kNFFT + n] = (float)std::cos(ang);
        sin_t[(size_t)k * kNFFT + n] = (float)std::sin(ang);
      }
    }
    mel.assign((size_t)kMels * kBins, 0.f);
    // slaney mel filterbank, 0..8000 Hz
    auto hz_to_mel = [](double f) {
      if (f < 1000.0) return 3.0 * f / 200.0;
      return 15.0 + std::log(f / 1000.0) / (std::log(6.4) / 27.0);
    };
    auto mel_to_hz = [](double m) {
      if (m < 15.0) return 200.0 * m / 3.0;
      return 1000.0 * std::exp((std::log(6.4) / 27.0) * (m - 15.0));
    };
    double sr = 16000.0, fmax = sr / 2;
    std::vector<double> freqs(kMels + 2);
    double m0 = hz_to_mel(0.0), m1 = hz_to_mel(fmax);
    for (int i = 0; i < kMels + 2; ++i)
      freqs[i] = mel_to_hz(m0 + (m1 - m0) * i / (kMels + 1));
    for (int i = 0; i < kMels; ++i) {
      double enorm = 2.0 / (freqs[i + 2] - freqs[i]);
      for (int b = 0; b < kBins; ++b) {
        double f = fmax * b / (kBins - 1);
        double lower = (f - freqs[i]) / (freqs[i + 1] - freqs[i]);
        double upper = (freqs[i + 2] - f) / (freqs[i + 2] - freqs[i + 1]);
        double v = std::max(0.0, std::min(lower, upper));
        mel[(size_t)i * kBins + b] = (float)(v * enorm);
      }
    }
  }
};

const Tables& tables() {
  static Tables t;
  return t;
}

}  // namespace

extern "C" {

// audio: n samples (expected pre-padded to a 30 s chunk by the caller).
// out: (80, n_frames) row-major where n_frames = n / kHop (the final
// (1 + n/hop)'th frame is dropped, matching whisper).
// Returns n_frames.
int32_t whisper_log_mel(const float* audio, int64_t n, float* out) {
  const Tables& T = tables();
  const int64_t frames_total = 1 + n / kHop;
  const int64_t frames = frames_total - 1;
  const int64_t pad = kNFFT / 2;

  std::vector<float> power((size_t)frames * kBins);
  std::vector<float> frame(kNFFT);
  for (int64_t f = 0; f < frames; ++f) {
    const int64_t start = f * kHop - pad;
    for (int i = 0; i < kNFFT; ++i) {
      int64_t idx = start + i;
      if (idx < 0) idx = -idx;                  // reflect
      if (idx >= n) idx = 2 * (n - 1) - idx;
      frame[i] = audio[idx] * T.window[i];
    }
    float* prow = power.data() + (size_t)f * kBins;
    for (int k = 0; k < kBins; ++k) {
      const float* c = T.cos_t.data() + (size_t)k * kNFFT;
      const float* s = T.sin_t.data() + (size_t)k * kNFFT;
      float re = 0.f, im = 0.f;
      for (int i = 0; i < kNFFT; ++i) {
        re += frame[i] * c[i];
        im += frame[i] * s[i];
      }
      prow[k] = re * re + im * im;
    }
  }

  // mel projection + log compression
  float maxval = -1e30f;
  for (int64_t f = 0; f < frames; ++f) {
    const float* prow = power.data() + (size_t)f * kBins;
    for (int m = 0; m < kMels; ++m) {
      const float* w = T.mel.data() + (size_t)m * kBins;
      float acc = 0.f;
      for (int b = 0; b < kBins; ++b) acc += prow[b] * w[b];
      float v = std::log10(std::max(acc, 1e-10f));
      out[(size_t)m * frames + f] = v;
      if (v > maxval) maxval = v;
    }
  }
  const float floor = maxval - 8.0f;
  for (int64_t i = 0; i < (int64_t)kMels * frames; ++i) {
    float v = out[i] < floor ? floor : out[i];
    out[i] = (v + 4.0f) / 4.0f;
  }
  return (int32_t)frames;
}

}  // extern "C"
