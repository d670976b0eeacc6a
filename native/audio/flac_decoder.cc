// From-scratch FLAC decoder (host audio frontend, no libFLAC dependency).
//
// The reference ingests LibriSpeech via librosa.load, which handles FLAC —
// LibriSpeech's native format (reference: inference.py:166). This image has
// no FLAC tooling at all (no libFLAC/ffmpeg/soundfile), so the framework
// decodes the format itself: STREAMINFO parse, frame headers with UTF-8
// coded numbers, constant / verbatim / fixed / LPC subframes, 4- and 5-bit
// Rice-coded residual partitions, wasted bits, stereo decorrelation
// (left-side / right-side / mid-side), and CRC-16 frame verification.
//
// Driven from Python via ctypes (llm_speech_summarization_tpu/data/native.py);
// a pure-Python mirror (data/flac.py) is the no-toolchain fallback and the
// decoder-vs-decoder parity oracle in tests/test_flac.py.

#include <cstdint>
#include <cstring>

namespace {

struct BitReader {
  const uint8_t* data;
  int64_t n;
  int64_t byte = 0;
  int bit = 0;  // 0..7, MSB-first
  bool error = false;

  bool eof() const { return byte >= n; }

  uint32_t read_bits(int k) {
    uint32_t v = 0;
    for (int i = 0; i < k; ++i) {
      if (byte >= n) {
        error = true;
        return 0;
      }
      v = (v << 1) | ((data[byte] >> (7 - bit)) & 1);
      if (++bit == 8) {
        bit = 0;
        ++byte;
      }
    }
    return v;
  }

  uint64_t read_bits64(int k) {
    uint64_t v = 0;
    if (k > 32) {
      v = read_bits(k - 32);
      k = 32;
    }
    return (v << k) | read_bits(k);
  }

  int64_t read_signed(int k) {
    // 64-bit throughout: eff bits reach 33 (32 bps + 1 for side channels),
    // and `1u << 32` is UB — the old 32-bit version corrupted 32/33-bit
    // samples while the Python mirror (arbitrary-precision) decoded them
    // correctly.
    if (k == 0) return 0;
    uint64_t v = read_bits64(k);
    if ((v >> (k - 1)) & 1) v |= ~((1ull << k) - 1);
    return static_cast<int64_t>(v);
  }

  uint32_t read_unary() {
    uint32_t q = 0;
    while (true) {
      if (byte >= n) {
        error = true;
        return q;
      }
      uint32_t b = (data[byte] >> (7 - bit)) & 1;
      if (++bit == 8) {
        bit = 0;
        ++byte;
      }
      if (b) return q;
      ++q;
    }
  }

  void align() {
    if (bit) {
      bit = 0;
      ++byte;
    }
  }
};

uint8_t crc8(const uint8_t* d, int64_t len) {
  uint8_t crc = 0;
  for (int64_t i = 0; i < len; ++i) {
    crc ^= d[i];
    for (int k = 0; k < 8; ++k) crc = (crc & 0x80) ? (crc << 1) ^ 0x07 : crc << 1;
  }
  return crc;
}

uint16_t crc16(const uint8_t* d, int64_t len) {
  uint16_t crc = 0;
  for (int64_t i = 0; i < len; ++i) {
    crc ^= static_cast<uint16_t>(d[i]) << 8;
    for (int k = 0; k < 8; ++k)
      crc = (crc & 0x8000) ? (crc << 1) ^ 0x8005 : crc << 1;
  }
  return crc;
}

// UTF-8-style coded frame/sample number (up to 36 bits, 7 bytes).
int64_t read_coded_number(BitReader& br) {
  uint32_t b0 = br.read_bits(8);
  int extra;
  uint64_t v;
  if ((b0 & 0x80) == 0) {
    return b0;
  } else if ((b0 & 0xE0) == 0xC0) {
    extra = 1; v = b0 & 0x1F;
  } else if ((b0 & 0xF0) == 0xE0) {
    extra = 2; v = b0 & 0x0F;
  } else if ((b0 & 0xF8) == 0xF0) {
    extra = 3; v = b0 & 0x07;
  } else if ((b0 & 0xFC) == 0xF8) {
    extra = 4; v = b0 & 0x03;
  } else if ((b0 & 0xFE) == 0xFC) {
    extra = 5; v = b0 & 0x01;
  } else if (b0 == 0xFE) {
    extra = 6; v = 0;
  } else {
    br.error = true;
    return -1;
  }
  for (int i = 0; i < extra; ++i) {
    uint32_t b = br.read_bits(8);
    if ((b & 0xC0) != 0x80) {
      br.error = true;
      return -1;
    }
    v = (v << 6) | (b & 0x3F);
  }
  return static_cast<int64_t>(v);
}

constexpr int kMaxChannels = 8;
constexpr int kMaxBlock = 65535;

struct StreamInfo {
  int sample_rate = 0;
  int channels = 0;
  int bps = 0;
  int64_t total_samples = 0;
  int64_t frames_start = 0;  // byte offset of the first audio frame
};

// Parse "fLaC" + metadata blocks. Returns false on malformed stream.
bool parse_streaminfo(const uint8_t* d, int64_t n, StreamInfo* si) {
  if (n < 8 + 34 || std::memcmp(d, "fLaC", 4) != 0) return false;
  int64_t pos = 4;
  bool last = false;
  bool have_si = false;
  while (!last) {
    if (pos + 4 > n) return false;
    last = d[pos] & 0x80;
    int type = d[pos] & 0x7F;
    int64_t len = (static_cast<int64_t>(d[pos + 1]) << 16) |
                  (static_cast<int64_t>(d[pos + 2]) << 8) | d[pos + 3];
    pos += 4;
    if (pos + len > n) return false;
    if (type == 0) {  // STREAMINFO
      if (len < 34) return false;
      const uint8_t* s = d + pos;
      si->sample_rate = (s[10] << 12) | (s[11] << 4) | (s[12] >> 4);
      si->channels = ((s[12] >> 1) & 0x7) + 1;
      si->bps = (((s[12] & 1) << 4) | (s[13] >> 4)) + 1;
      si->total_samples = (static_cast<int64_t>(s[13] & 0x0F) << 32) |
                          (static_cast<int64_t>(s[14]) << 24) |
                          (static_cast<int64_t>(s[15]) << 16) |
                          (static_cast<int64_t>(s[16]) << 8) | s[17];
      have_si = true;
    }
    pos += len;
  }
  si->frames_start = pos;
  return have_si && si->channels >= 1 && si->channels <= kMaxChannels &&
         si->bps >= 4 && si->bps <= 32;
}

// Rice/escape residual into res[order..blocksize-1]. Returns false on error.
bool read_residual(BitReader& br, int order, int blocksize, int64_t* res) {
  uint32_t method = br.read_bits(2);
  if (method > 1) return false;
  int pbits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint32_t porder = br.read_bits(4);
  int partitions = 1 << porder;
  if (blocksize % partitions != 0) return false;
  int psize = blocksize >> porder;
  if (psize <= order && porder == 0) return false;
  int idx = order;
  for (int p = 0; p < partitions; ++p) {
    int count = psize - (p == 0 ? order : 0);
    if (count < 0) return false;
    uint32_t param = br.read_bits(pbits);
    if (param == escape) {
      uint32_t raw = br.read_bits(5);
      for (int i = 0; i < count; ++i)
        res[idx++] = raw ? br.read_signed(raw) : 0;
    } else {
      for (int i = 0; i < count; ++i) {
        uint32_t q = br.read_unary();
        uint32_t r = param ? br.read_bits(param) : 0;
        uint64_t u = (static_cast<uint64_t>(q) << param) | r;
        res[idx++] = (u & 1) ? -static_cast<int64_t>(u >> 1) - 1
                             : static_cast<int64_t>(u >> 1);
      }
    }
    if (br.error) return false;
  }
  return idx == blocksize;
}

bool decode_subframe(BitReader& br, int blocksize, int bps, int64_t* out) {
  if (br.read_bits(1) != 0) return false;  // padding bit
  uint32_t type = br.read_bits(6);
  int wasted = 0;
  if (br.read_bits(1)) wasted = br.read_unary() + 1;
  if (br.error) return false;
  int eff = bps - wasted;
  if (eff <= 0 || eff > 33) return false;

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(eff);
    for (int i = 0; i < blocksize; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < blocksize; ++i) out[i] = br.read_signed(eff);
  } else if (type >= 8 && type <= 12) {  // FIXED, order 0..4
    int order = type - 8;
    if (order > blocksize) return false;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(eff);
    if (!read_residual(br, order, blocksize, out)) return false;
    for (int i = order; i < blocksize; ++i) {
      switch (order) {
        case 0: break;
        case 1: out[i] += out[i - 1]; break;
        case 2: out[i] += 2 * out[i - 1] - out[i - 2]; break;
        case 3: out[i] += 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
        case 4:
          out[i] += 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] -
                    out[i - 4];
          break;
      }
    }
  } else if (type >= 32) {  // LPC, order 1..32
    int order = (type & 31) + 1;
    if (order > blocksize) return false;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(eff);
    uint32_t prec = br.read_bits(4);
    if (prec == 15) return false;
    int precision = prec + 1;
    int shift = br.read_signed(5);
    if (shift < 0) return false;
    int64_t coef[32];
    for (int i = 0; i < order; ++i) coef[i] = br.read_signed(precision);
    if (!read_residual(br, order, blocksize, out)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += coef[j] * out[i - 1 - j];
      out[i] += acc >> shift;
    }
  } else {
    return false;  // reserved type
  }
  if (br.error) return false;
  if (wasted)
    for (int i = 0; i < blocksize; ++i) out[i] <<= wasted;
  return true;
}

const int kBlockSizeFromCode[16] = {
    -1, 192, 576, 1152, 2304, 4608, -8 /*8-bit*/, -16 /*16-bit*/,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768};

const int kSampleRateFromCode[16] = {
    0 /*streaminfo*/, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
    32000, 44100, 48000, 96000, -8, -16, -160, -1};

const int kBpsFromCode[8] = {0 /*streaminfo*/, 8, 12, -1, 16, 20, 24, 32};

}  // namespace

extern "C" {

// Parse STREAMINFO. Returns 0 on success.
int flac_info(const uint8_t* data, int64_t n, int64_t* total_samples,
              int* sample_rate, int* channels, int* bps) {
  StreamInfo si;
  if (!parse_streaminfo(data, n, &si)) return -1;
  *total_samples = si.total_samples;
  *sample_rate = si.sample_rate;
  *channels = si.channels;
  *bps = si.bps;
  return 0;
}

// Decode the whole stream to float32 mono (channel mean, [-1, 1)).
// With out == nullptr, counts samples only (sizing pass for streams whose
// STREAMINFO reports 0 total samples). Returns the number of mono samples,
// or -1 on malformed data / CRC mismatch / capacity overflow.
int64_t flac_decode_f32_mono(const uint8_t* data, int64_t n, float* out,
                             int64_t out_cap) {
  StreamInfo si;
  if (!parse_streaminfo(data, n, &si)) return -1;

  static thread_local int64_t chan[kMaxChannels][kMaxBlock];
  BitReader br{data, n};
  br.byte = si.frames_start;
  int64_t written = 0;
  const float scale = 1.0f / (1u << (si.bps - 1));

  while (br.byte < n) {
    int64_t frame_start = br.byte;
    uint32_t sync = br.read_bits(14);
    if (br.error) break;  // trailing padding
    if (sync != 0x3FFE) return -1;
    if (br.read_bits(1) != 0) return -1;
    br.read_bits(1);  // blocking strategy (coded number read either way)
    uint32_t bs_code = br.read_bits(4);
    uint32_t sr_code = br.read_bits(4);
    uint32_t ch_code = br.read_bits(4);
    uint32_t ss_code = br.read_bits(3);
    if (br.read_bits(1) != 0) return -1;
    if (read_coded_number(br) < 0) return -1;

    int blocksize;
    int c = kBlockSizeFromCode[bs_code];
    if (c == -1) return -1;
    else if (c == -8) blocksize = br.read_bits(8) + 1;
    else if (c == -16) blocksize = br.read_bits(16) + 1;
    else blocksize = c;
    if (blocksize > kMaxBlock) return -1;

    c = kSampleRateFromCode[sr_code];
    if (c == -1) return -1;
    else if (c == -8) br.read_bits(8);
    else if (c == -16 || c == -160) br.read_bits(16);

    int bps = kBpsFromCode[ss_code];
    if (bps < 0) return -1;
    if (bps == 0) bps = si.bps;

    // CRC-8 covers the header bytes up to (not including) the CRC byte
    br.align();
    if (crc8(data + frame_start, br.byte - frame_start) != br.read_bits(8))
      return -1;

    int channels;
    if (ch_code < 8) channels = ch_code + 1;
    else if (ch_code <= 10) channels = 2;
    else return -1;
    if (channels > kMaxChannels) return -1;

    for (int ch = 0; ch < channels; ++ch) {
      int sub_bps = bps;
      if ((ch_code == 8 && ch == 1) || (ch_code == 9 && ch == 0) ||
          (ch_code == 10 && ch == 1))
        ++sub_bps;  // the side channel carries one extra bit
      if (!decode_subframe(br, blocksize, sub_bps, chan[ch])) return -1;
    }

    // stereo decorrelation
    if (ch_code == 8) {  // left/side → right = left - side
      for (int i = 0; i < blocksize; ++i) chan[1][i] = chan[0][i] - chan[1][i];
    } else if (ch_code == 9) {  // side/right → left = side + right
      for (int i = 0; i < blocksize; ++i) chan[0][i] += chan[1][i];
    } else if (ch_code == 10) {  // mid/side
      for (int i = 0; i < blocksize; ++i) {
        int64_t side = chan[1][i];
        int64_t mid = (chan[0][i] << 1) | (side & 1);
        chan[0][i] = (mid + side) >> 1;
        chan[1][i] = (mid - side) >> 1;
      }
    }

    br.align();
    uint16_t want = crc16(data + frame_start, br.byte - frame_start);
    if (want != br.read_bits(16) || br.error) return -1;

    if (out) {
      if (written + blocksize > out_cap) return -1;
      for (int i = 0; i < blocksize; ++i) {
        int64_t acc = 0;
        for (int ch = 0; ch < channels; ++ch) acc += chan[ch][i];
        out[written + i] = scale * acc / channels;
      }
    }
    written += blocksize;
  }
  return written;
}

}  // extern "C"
