// Host-side audio frontend: PCM decode, mono mixdown, polyphase resampling.
//
// The reference leans on librosa/torchaudio wheels for host audio work
// (reference: inference.py:166, requirements.txt). This is the framework's
// native equivalent: a small, dependency-free C++ library driven from
// Python via ctypes (llm_speech_summarization_tpu/data/native.py), used by
// the input pipeline so the TPU never waits on Python-loop audio prep.
//
// Build: make -C native/audio   (emits libaudio_frontend.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// int16 PCM -> float32 in [-1, 1); interleaved multichannel is mixed to mono.
void pcm16_to_f32_mono(const int16_t* in, int64_t frames, int channels,
                       float* out) {
  const float scale = 1.0f / 32768.0f;
  if (channels == 1) {
    for (int64_t i = 0; i < frames; ++i) out[i] = in[i] * scale;
    return;
  }
  const float cscale = scale / channels;
  for (int64_t i = 0; i < frames; ++i) {
    int32_t acc = 0;
    for (int c = 0; c < channels; ++c) acc += in[i * channels + c];
    out[i] = acc * cscale;
  }
}

// Windowed-sinc polyphase resampler (Hann window, zero_crossings taps per
// side), matching scipy.signal.resample_poly quality class. Ratio =
// sr_out/sr_in reduced by gcd on the Python side to (up, down).
void resample_sinc(const float* in, int64_t n_in, int up, int down,
                   int zero_crossings, float* out, int64_t n_out) {
  // output sample t maps to input position t * down / up
  const double ratio = static_cast<double>(down) / up;
  const double cutoff = (up >= down) ? 1.0 : static_cast<double>(up) / down;
  const int taps = zero_crossings;
  for (int64_t t = 0; t < n_out; ++t) {
    const double center = t * ratio;
    const int64_t left = static_cast<int64_t>(std::floor(center)) - taps + 1;
    const int64_t right = static_cast<int64_t>(std::floor(center)) + taps;
    double acc = 0.0, wsum = 0.0;
    for (int64_t i = left; i <= right; ++i) {
      const double x = (center - i) * cutoff;
      // sinc * hann
      double s = (std::fabs(x) < 1e-12) ? 1.0 : std::sin(M_PI * x) / (M_PI * x);
      const double h = 0.5 + 0.5 * std::cos(M_PI * (center - i) / taps);
      const double w = s * h * cutoff;
      wsum += w;
      if (i >= 0 && i < n_in) acc += w * in[i];
    }
    out[t] = static_cast<float>(wsum > 1e-12 ? acc / wsum * 1.0 : 0.0);
  }
}

// Right-pad a batch of variable-length float32 clips into one (B, N) buffer
// and record lengths — the collator hot loop (reference: trainer.py:141-148)
// without Python-level copies.
void pad_batch_f32(const float* const* clips, const int64_t* lens, int batch,
                   int64_t n_out, float* out, int32_t* out_lens) {
  for (int b = 0; b < batch; ++b) {
    const int64_t n = lens[b] < n_out ? lens[b] : n_out;
    std::memcpy(out + b * n_out, clips[b], n * sizeof(float));
    std::memset(out + b * n_out + n, 0, (n_out - n) * sizeof(float));
    out_lens[b] = static_cast<int32_t>(n);
  }
}

}  // extern "C"
