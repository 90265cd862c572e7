// Native IO acceleration for the offline dataset cleaning pass.
//
// The reference's hottest host path is the first-epoch cleaning sweep —
// decode + resample + silence-scan every track (reference call stack:
// SURVEY.md §3.1 "HOT I/O"; src/data/dataset.py:73-123). This library
// provides that path in C++ behind a C ABI consumed via ctypes
// (msla_tpu/data/native.py), with a pure-numpy fallback when unbuilt:
//
//   * msla_decode_wav      — PCM 8/16/24/32 + IEEE float32/64 WAV → float32
//   * msla_resample_poly   — Kaiser-windowed-sinc polyphase resampler
//   * msla_frame_index     — silence/incomplete frame scan (int(sum)==0
//                            semantics preserved from the reference)
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- WAV decode
// Returns 0 on success. Caller passes a buffer sized via msla_wav_info.
typedef struct {
  int32_t channels;
  int32_t sample_rate;
  int64_t frames;  // samples per channel
} MslaWavInfo;

static int read_header(const uint8_t* data, int64_t size, MslaWavInfo* info,
                       int* fmt_tag, int* bits, const uint8_t** payload,
                       int64_t* payload_size) {
  if (size < 12 || memcmp(data, "RIFF", 4) || memcmp(data + 8, "WAVE", 4))
    return 1;
  int64_t pos = 12;
  int have_fmt = 0;
  *payload = nullptr;
  while (pos + 8 <= size) {
    const uint8_t* id = data + pos;
    uint32_t chunk = *(const uint32_t*)(data + pos + 4);
    const uint8_t* body = data + pos + 8;
    if (!memcmp(id, "fmt ", 4) && chunk >= 16) {
      uint16_t tag = *(const uint16_t*)(body);
      info->channels = *(const uint16_t*)(body + 2);
      info->sample_rate = *(const int32_t*)(body + 4);
      *bits = *(const uint16_t*)(body + 14);
      if (tag == 0xFFFE && chunk >= 26) tag = *(const uint16_t*)(body + 24);
      *fmt_tag = tag;
      have_fmt = 1;
    } else if (!memcmp(id, "data", 4)) {
      *payload = body;
      *payload_size = chunk;
      if (*payload + *payload_size > data + size)
        *payload_size = data + size - *payload;
    }
    pos += 8 + chunk + (chunk & 1);
  }
  return (have_fmt && *payload) ? 0 : 2;
}

int msla_wav_info(const char* path, MslaWavInfo* info) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  int64_t size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(size);
  if ((int64_t)fread(buf.data(), 1, size, f) != size) { fclose(f); return -2; }
  fclose(f);
  int fmt_tag = 0, bits = 0;
  const uint8_t* payload; int64_t payload_size;
  int rc = read_header(buf.data(), size, info, &fmt_tag, &bits, &payload,
                       &payload_size);
  if (rc) return rc;
  info->frames = payload_size / (info->channels * (bits / 8));
  return 0;
}

// out: (channels * frames) float32, interleaved by channel-major
// (out[c * frames + t]) matching the python layout (channels, samples).
int msla_decode_wav(const char* path, float* out, int64_t out_frames,
                    MslaWavInfo* info) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  int64_t size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(size);
  if ((int64_t)fread(buf.data(), 1, size, f) != size) { fclose(f); return -2; }
  fclose(f);

  int fmt_tag = 0, bits = 0;
  const uint8_t* p; int64_t psize;
  int rc = read_header(buf.data(), size, info, &fmt_tag, &bits, &p, &psize);
  if (rc) return rc;
  const int ch = info->channels;
  const int bytes = bits / 8;
  int64_t frames = psize / (ch * bytes);
  if (frames > out_frames) frames = out_frames;
  info->frames = frames;

  for (int64_t t = 0; t < frames; t++) {
    for (int c = 0; c < ch; c++) {
      const uint8_t* s = p + (t * ch + c) * bytes;
      float v = 0.f;
      if (fmt_tag == 1) {  // PCM
        switch (bits) {
          case 8:  v = ((int)(*s) - 128) / 128.0f; break;
          case 16: v = *(const int16_t*)s / 32768.0f; break;
          case 24: {
            int32_t raw = s[0] | (s[1] << 8) | (s[2] << 16);
            if (raw >= (1 << 23)) raw -= (1 << 24);
            v = raw / 8388608.0f;
            break;
          }
          case 32: v = (float)(*(const int32_t*)s / 2147483648.0); break;
          default: return 3;
        }
      } else if (fmt_tag == 3) {  // IEEE float
        v = (bits == 32) ? *(const float*)s : (float)(*(const double*)s);
      } else {
        return 3;
      }
      out[(int64_t)c * frames + t] = v;
    }
  }
  return 0;
}

// ----------------------------------------------------------------- resampler
static double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 64; k++) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-18 * sum) break;
  }
  return sum;
}

// Polyphase resampling matching scipy.signal.resample_poly's default
// Kaiser(5.0) windowed-sinc with half_len = 10 * max(up, down).
int msla_resample_poly(const float* in, int64_t n, int64_t up, int64_t down,
                       float* out, int64_t out_capacity, int64_t* out_n) {
  if (up == down) {
    if (n > out_capacity) return 1;
    memcpy(out, in, n * sizeof(float));
    *out_n = n;
    return 0;
  }
  const int64_t max_rate = up > down ? up : down;
  const double f_c = 1.0 / (double)max_rate;  // cutoff in normalized units
  const int64_t half_len = 10 * max_rate;
  const int64_t taps = 2 * half_len + 1;
  const double beta = 5.0;
  const double i0b = bessel_i0(beta);

  std::vector<double> h(taps);
  double hsum = 0.0;
  for (int64_t i = 0; i < taps; i++) {
    const double m = (double)(i - half_len);
    const double sinc = (m == 0.0) ? f_c : sin(M_PI * f_c * m) / (M_PI * m);
    const double w = bessel_i0(beta * sqrt(1.0 - (m / (double)half_len) *
                                                (m / (double)half_len))) / i0b;
    h[i] = sinc * w;
    hsum += h[i];
  }
  // firwin-style normalization (unit DC gain) then the polyphase gain `up`
  const double gain = (double)up / hsum;
  for (int64_t i = 0; i < taps; i++) h[i] *= gain;

  // output length like scipy: ceil(n * up / down)
  const int64_t n_out = (n * up + down - 1) / down;
  if (n_out > out_capacity) return 1;

  // y[j] = sum_k x[k] * h[j*down - k*up + half_len]
  for (int64_t j = 0; j < n_out; j++) {
    const int64_t t = j * down;  // position in upsampled grid
    // x[k] contributes when |t - k*up| <= half_len
    int64_t k_min = (t - half_len + up - 1) / up;  // ceil
    if (k_min < 0) k_min = 0;
    int64_t k_max = (t + half_len) / up;
    if (k_max >= n) k_max = n - 1;
    double acc = 0.0;
    for (int64_t k = k_min; k <= k_max; k++) {
      acc += (double)in[k] * h[t - k * up + half_len];
    }
    out[j] = (float)acc;
  }
  *out_n = n_out;
  return 0;
}

// -------------------------------------------------------------- frame index
// Scans max_duration 1-second-hop windows of `frame_len` samples over a
// (channels, samples) track; writes frame starts that are non-silent and
// complete. Preserves the reference's int(sum)==0 silence test
// (dataset.py:111). Returns the number of frames written.
int64_t msla_frame_index(const float* stems, int64_t channels, int64_t samples,
                         int64_t sample_rate, int64_t frame_len,
                         int64_t max_duration, int64_t* frame_starts) {
  int64_t count = 0;
  for (int64_t sub = 0; sub < max_duration; sub++) {
    const int64_t start = sub * sample_rate;
    const int64_t end = start + frame_len;
    if (end > samples) continue;  // drop last incomplete
    double total = 0.0;
    for (int64_t c = 0; c < channels; c++) {
      const float* row = stems + c * samples + start;
      for (int64_t t = 0; t < frame_len; t++) total += row[t];
    }
    if ((int64_t)total == 0) continue;  // reference silence semantics
    frame_starts[count++] = start;
  }
  return count;
}

}  // extern "C"
