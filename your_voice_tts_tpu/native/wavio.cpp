// Native data-loader ops: WAV codec + polyphase resampler.
//
// TPU-native counterpart of the reference's host-side audio-IO dependencies
// (librosa.load / scipy.io.wavfile / libsndfile).  The reference leans on
// those C libraries for decode + resample; this framework keeps device work
// in XLA/Pallas and puts the host-side loader hot path in C++ where the
// Python `wave` module falls short:
//   - 24-bit PCM (VCTK ships 24-bit FLAC/WAV) and IEEE float WAVs decode here;
//     the stdlib `wave` module cannot represent either.
//   - batch decode fans out over std::thread, bypassing the GIL, so corpus
//     cache builds are not serialized on Python bytecode.
//   - the resampler replicates scipy.signal.resample_poly's exact design
//     (Kaiser-5.0 windowed sinc, half_len = 10*max_rate, upfirdn + centre
//     trim) so the Python fallback and the native path agree to float
//     round-off and tests can assert parity.
//
// Pure C ABI (extern "C"), loaded via ctypes — no pybind11 dependency.
// Error codes: negative int64_t returns; see YV_ERR_* below.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>
#include <thread>
#include <atomic>

namespace {

constexpr int64_t YV_ERR_OPEN = -1;      // cannot open file
constexpr int64_t YV_ERR_RIFF = -2;      // not a RIFF/WAVE file
constexpr int64_t YV_ERR_FMT = -3;       // no fmt chunk / unsupported codec
constexpr int64_t YV_ERR_DATA = -4;      // no data chunk
constexpr int64_t YV_ERR_TRUNC = -5;     // data chunk truncated
constexpr int64_t YV_ERR_SPACE = -6;     // caller buffer too small
constexpr int64_t YV_ERR_ARG = -7;       // bad argument

struct WavInfo {
  int sample_rate = 0;
  int channels = 0;
  int bits = 0;
  int fmt = 0;          // 1 = PCM, 3 = IEEE float
  int64_t n_frames = 0; // per-channel sample count
  long data_offset = 0; // byte offset of sample data
  int64_t data_bytes = 0;
};

uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8));
}

// Walk the RIFF chunk list.  Returns 0 or a YV_ERR_* code.  Tolerates the
// extension chunks real corpora carry (LIST/fact/bext) and WAVE_FORMAT_
// EXTENSIBLE (0xFFFE) by reading the sub-format tag.
int64_t parse_header(FILE* f, WavInfo* info) {
  uint8_t hdr[12];
  if (fread(hdr, 1, 12, f) != 12) return YV_ERR_RIFF;
  if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0)
    return YV_ERR_RIFF;
  bool have_fmt = false;
  for (;;) {
    uint8_t ch[8];
    if (fread(ch, 1, 8, f) != 8) break;
    uint32_t sz = rd_u32(ch + 4);
    if (memcmp(ch, "fmt ", 4) == 0) {
      std::vector<uint8_t> body(sz);
      if (fread(body.data(), 1, sz, f) != sz) return YV_ERR_FMT;
      if (sz & 1) fseek(f, 1, SEEK_CUR);  // RIFF pads odd chunks by one byte
      if (sz < 16) return YV_ERR_FMT;
      info->fmt = rd_u16(&body[0]);
      info->channels = rd_u16(&body[2]);
      info->sample_rate = (int)rd_u32(&body[4]);
      info->bits = rd_u16(&body[14]);
      if (info->fmt == 0xFFFE && sz >= 40)  // EXTENSIBLE: sub-format GUID
        info->fmt = rd_u16(&body[24]);
      have_fmt = true;
    } else if (memcmp(ch, "data", 4) == 0) {
      info->data_offset = ftell(f);
      info->data_bytes = sz;
      if (fseek(f, (long)((sz + 1) & ~1u), SEEK_CUR) != 0) {
        // size field may overrun a truncated file; caller re-checks on read
      }
    } else {
      if (fseek(f, (long)((sz + 1) & ~1u), SEEK_CUR) != 0) break;
    }
    if (sz == 0 && memcmp(ch, "data", 4) != 0) break;  // malformed guard
  }
  if (!have_fmt) return YV_ERR_FMT;
  if (info->data_offset == 0) return YV_ERR_DATA;
  if (info->channels <= 0 || info->sample_rate <= 0) return YV_ERR_FMT;
  if (info->fmt != 1 && info->fmt != 3) return YV_ERR_FMT;
  if (info->fmt == 1 && info->bits != 16 && info->bits != 24 &&
      info->bits != 32 && info->bits != 8)
    return YV_ERR_FMT;
  if (info->fmt == 3 && info->bits != 32 && info->bits != 64)
    return YV_ERR_FMT;
  int bytes_per_frame = info->channels * (info->bits / 8);
  info->n_frames = info->data_bytes / bytes_per_frame;
  return 0;
}

// Decode the data chunk to mono float32 in [-1, 1] (channel mean downmix —
// matches AudioProcessor.load_wav; reference librosa.load(mono=True) does
// the same).  Returns frames written or YV_ERR_*.
int64_t decode_data(FILE* f, const WavInfo& info, float* out,
                    int64_t max_samples) {
  if (info.n_frames > max_samples) return YV_ERR_SPACE;
  int bps = info.bits / 8;
  int64_t frame_bytes = (int64_t)info.channels * bps;
  if (fseek(f, info.data_offset, SEEK_SET) != 0) return YV_ERR_TRUNC;
  constexpr int64_t CHUNK = 1 << 16;  // frames per read
  std::vector<uint8_t> buf((size_t)(CHUNK * frame_bytes));
  int64_t done = 0;
  const float inv_ch = 1.0f / (float)info.channels;
  while (done < info.n_frames) {
    int64_t want = std::min(CHUNK, info.n_frames - done);
    size_t got = fread(buf.data(), (size_t)frame_bytes, (size_t)want, f);
    if (got == 0) return YV_ERR_TRUNC;
    const uint8_t* p = buf.data();
    for (size_t i = 0; i < got; ++i) {
      float acc = 0.0f;
      for (int c = 0; c < info.channels; ++c) {
        const uint8_t* s = p + (size_t)i * frame_bytes + (size_t)c * bps;
        float v;
        if (info.fmt == 3 && info.bits == 32) {
          float fv;
          memcpy(&fv, s, 4);
          v = fv;
        } else if (info.fmt == 3) {  // float64
          double dv;
          memcpy(&dv, s, 8);
          v = (float)dv;
        } else if (info.bits == 16) {
          int16_t iv = (int16_t)rd_u16(s);
          v = (float)iv / 32768.0f;
        } else if (info.bits == 24) {
          int32_t iv = (int32_t)(((uint32_t)s[0] << 8) |
                                 ((uint32_t)s[1] << 16) |
                                 ((uint32_t)s[2] << 24)) >> 8;
          v = (float)iv / 8388608.0f;
        } else if (info.bits == 32) {
          int32_t iv;
          memcpy(&iv, s, 4);
          v = (float)((double)iv / 2147483648.0);
        } else {  // 8-bit PCM is unsigned
          v = ((float)s[0] - 128.0f) / 128.0f;
        }
        acc += v;
      }
      out[done + (int64_t)i] = acc * inv_ch;
    }
    done += (int64_t)got;
  }
  return done;
}

// ---------------------------------------------------------------------------
// Resampler: scipy.signal.resample_poly(x, up, down) replica.
//   max_rate = max(up, down); f_c = 1/max_rate; half_len = 10*max_rate
//   h = firwin(2*half_len + 1, f_c, window=("kaiser", 5.0)) * up
//   y = upfirdn(h, x, up, down)[half_len/... centre trim][:ceil(n*up/down)]
// ---------------------------------------------------------------------------

double bessel_i0(double x) {
  // series expansion; converges fast for the |x| <= beta range used here
  double sum = 1.0, term = 1.0;
  double hx = 0.5 * x;
  for (int k = 1; k < 64; ++k) {
    term *= (hx / k) * (hx / k);
    sum += term;
    if (term < 1e-18 * sum) break;
  }
  return sum;
}

void design_kaiser_lowpass(int up, int down, std::vector<double>* h_out,
                           int* half_len_out) {
  int max_rate = std::max(up, down);
  double f_c = 1.0 / max_rate;          // firwin cutoff, Nyquist-normalized
  int half_len = 10 * max_rate;
  int numtaps = 2 * half_len + 1;
  std::vector<double> h((size_t)numtaps);
  const double beta = 5.0;
  const double i0b = bessel_i0(beta);
  const double m = (double)(numtaps - 1);
  double gain = 0.0;
  for (int k = 0; k < numtaps; ++k) {
    double t = (double)k - m / 2.0;
    // sinc lowpass at cutoff f_c (cycles per sample of the *upsampled* grid)
    double x = f_c * t;
    double s = (x == 0.0) ? 1.0 : std::sin(M_PI * x) / (M_PI * x);
    double r = 2.0 * (double)k / m - 1.0;   // [-1, 1]
    double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / i0b;
    h[(size_t)k] = f_c * s * w;
    gain += h[(size_t)k];
  }
  // firwin scales for unit DC gain, resample_poly then multiplies by `up`
  const double scale = (double)up / gain;
  for (auto& v : h) v *= scale;
  *h_out = std::move(h);
  *half_len_out = half_len;
}

int64_t resample_poly_into(const float* x, int64_t n, int up, int down,
                           float* out, int64_t max_out) {
  if (n <= 0 || up <= 0 || down <= 0) return YV_ERR_ARG;
  if (up == down) {
    if (n > max_out) return YV_ERR_SPACE;
    memcpy(out, x, (size_t)n * sizeof(float));
    return n;
  }
  std::vector<double> h;
  int half_len;
  design_kaiser_lowpass(up, down, &h, &half_len);
  const int64_t n_out = (n * (int64_t)up + down - 1) / down;  // ceil
  if (n_out > max_out) return YV_ERR_SPACE;
  const int64_t numtaps = (int64_t)h.size();
  // Polyphase decomposition: y[m] = sum_k h[k] * x_up[centre - k] with
  // centre = m*down + half_len and x_up zero-stuffed by `up`.  The non-zero
  // terms are k ≡ centre (mod up); gathering those taps per phase into a
  // contiguous array turns the inner loop into a plain FIR dot product
  // (cache-linear, auto-vectorizable) instead of a stride-`up` walk.
  const int64_t max_ph = (numtaps + up - 1) / up;
  std::vector<float> hp((size_t)(up * max_ph), 0.0f);
  std::vector<int64_t> n_ph((size_t)up, 0);
  for (int64_t k = 0; k < numtaps; ++k) {
    const int64_t phase = k % up, j = k / up;
    hp[(size_t)(phase * max_ph + j)] = (float)h[(size_t)k];
    if (j + 1 > n_ph[(size_t)phase]) n_ph[(size_t)phase] = j + 1;
  }
  for (int64_t m = 0; m < n_out; ++m) {
    const int64_t centre = m * down + half_len;
    const int64_t phase = centre % up, q = centre / up;
    const float* taps = &hp[(size_t)(phase * max_ph)];
    // valid j range: q - j in [0, n-1]  =>  j in [q-(n-1), min(q, n_ph-1)]
    int64_t j_lo = q - (n - 1);
    if (j_lo < 0) j_lo = 0;
    const int64_t j_hi = std::min(q, n_ph[(size_t)phase] - 1);
    const float* xq = x + q;
    double acc = 0.0;
    for (int64_t j = j_lo; j <= j_hi; ++j) acc += (double)taps[j] * xq[-j];
    out[m] = (float)acc;
  }
  return n_out;
}

}  // namespace

extern "C" {

// Probe a WAV header without decoding.  Returns 0 or YV_ERR_*.
int64_t yv_wav_info(const char* path, int32_t* sample_rate, int32_t* channels,
                    int32_t* bits, int32_t* fmt, int64_t* n_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return YV_ERR_OPEN;
  WavInfo info;
  int64_t rc = parse_header(f, &info);
  fclose(f);
  if (rc != 0) return rc;
  *sample_rate = info.sample_rate;
  *channels = info.channels;
  *bits = info.bits;
  *fmt = info.fmt;
  *n_frames = info.n_frames;
  return 0;
}

// Decode to mono float32.  Returns frames written or YV_ERR_*.
// `sample_rate_out` receives the file's native rate (resample separately).
int64_t yv_wav_decode(const char* path, float* out, int64_t max_samples,
                      int32_t* sample_rate_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return YV_ERR_OPEN;
  WavInfo info;
  int64_t rc = parse_header(f, &info);
  if (rc != 0) {
    fclose(f);
    return rc;
  }
  *sample_rate_out = info.sample_rate;
  rc = decode_data(f, info, out, max_samples);
  fclose(f);
  return rc;
}

// scipy.signal.resample_poly(x, up, down) replica (Kaiser 5.0 window).
// Returns output length or YV_ERR_*.
int64_t yv_resample_poly(const float* x, int64_t n, int32_t up, int32_t down,
                         float* out, int64_t max_out) {
  return resample_poly_into(x, n, up, down, out, max_out);
}

// Write mono PCM16 (no normalization — caller scales).  Returns 0 or YV_ERR_*.
int64_t yv_wav_encode16(const char* path, const float* x, int64_t n,
                        int32_t sample_rate) {
  FILE* f = fopen(path, "wb");
  if (!f) return YV_ERR_OPEN;
  uint32_t data_bytes = (uint32_t)(n * 2);
  uint8_t hdr[44];
  memcpy(hdr, "RIFF", 4);
  uint32_t riff_sz = 36 + data_bytes;
  memcpy(hdr + 4, &riff_sz, 4);
  memcpy(hdr + 8, "WAVEfmt ", 8);
  uint32_t fmt_sz = 16;
  memcpy(hdr + 16, &fmt_sz, 4);
  uint16_t tag = 1, ch = 1, bits = 16, block = 2;
  uint32_t sr = (uint32_t)sample_rate, byte_rate = sr * 2;
  memcpy(hdr + 20, &tag, 2);
  memcpy(hdr + 22, &ch, 2);
  memcpy(hdr + 24, &sr, 4);
  memcpy(hdr + 28, &byte_rate, 4);
  memcpy(hdr + 32, &block, 2);
  memcpy(hdr + 34, &bits, 2);
  memcpy(hdr + 36, "data", 4);
  memcpy(hdr + 40, &data_bytes, 4);
  if (fwrite(hdr, 1, 44, f) != 44) {
    fclose(f);
    return YV_ERR_TRUNC;
  }
  std::vector<int16_t> pcm((size_t)n);
  for (int64_t i = 0; i < n; ++i) {
    float v = x[i];
    v = std::max(-1.0f, std::min(1.0f, v));
    pcm[(size_t)i] = (int16_t)lrintf(v * 32767.0f);
  }
  size_t wrote = fwrite(pcm.data(), 2, (size_t)n, f);
  fclose(f);
  return wrote == (size_t)n ? 0 : YV_ERR_TRUNC;
}

// Threaded batch decode (+ optional resample to target_sr) into a dense
// [n_paths, max_samples] row-major buffer; lens[i] receives each row's true
// length, rates[i] the file's native rate.  A failed row gets lens[i] =
// YV_ERR_* and zeros; the call itself returns the number of failures.
// C++ threads hold no GIL, so an 8-thread cache build decodes 8 files at
// once regardless of the Python interpreter.
int64_t yv_wav_decode_batch(const char** paths, int32_t n_paths,
                            int32_t target_sr, float* out,
                            int64_t max_samples, int64_t* lens,
                            int32_t* rates, int32_t n_threads) {
  if (n_paths <= 0) return 0;
  if (n_threads <= 0) n_threads = 1;
  n_threads = std::min<int32_t>(n_threads, n_paths);
  std::atomic<int32_t> next(0);
  std::atomic<int64_t> failures(0);
  auto worker = [&]() {
    std::vector<float> tmp;
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n_paths) return;
      float* row = out + (int64_t)i * max_samples;
      int32_t sr = 0;
      int64_t rc;
      if (target_sr > 0) {
        // decode into scratch sized by the file's native length (which can
        // exceed max_samples when downsampling), resample into the row
        int32_t ich, ibits, ifmt;
        int64_t in_frames = 0;
        rc = yv_wav_info(paths[i], &sr, &ich, &ibits, &ifmt, &in_frames);
        if (rc == 0) {
          tmp.resize((size_t)std::max<int64_t>(in_frames, 1));
          rc = yv_wav_decode(paths[i], tmp.data(), (int64_t)tmp.size(), &sr);
        }
        if (rc >= 0 && sr != target_sr) {
          int64_t a = sr, b = target_sr;
          while (b) { int64_t t = a % b; a = b; b = t; }
          const int64_t g = a;
          rc = resample_poly_into(tmp.data(), rc, (int)(target_sr / g),
                                  (int)(sr / g), row, max_samples);
        } else if (rc >= 0) {
          // guard: a file grown between the Python-side probe (which sized
          // max_samples) and this decode must not overflow the dense row
          if (rc > max_samples) rc = YV_ERR_SPACE;
          else memcpy(row, tmp.data(), (size_t)rc * sizeof(float));
        }
      } else {
        rc = yv_wav_decode(paths[i], row, max_samples, &sr);
      }
      rates[i] = sr;
      lens[i] = rc;
      if (rc < 0) {
        failures.fetch_add(1);
        memset(row, 0, (size_t)max_samples * sizeof(float));
      }
    }
  };
  std::vector<std::thread> pool;
  for (int32_t t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
