// Native FLAC decoder (subset sufficient for speech corpora like VCTK).
//
// The reference reads VCTK ground-truth recordings (48 kHz 16-bit FLAC)
// through torchaudio/soundfile (scripts/convert_eval.py:129, eval_sv.py);
// neither is available here, so this implements the decoder natively:
//   * STREAMINFO parsing, all other metadata blocks skipped
//   * frame decoding: CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32)
//     subframes, 4- and 5-bit Rice residual partitions incl. escape
//     codes, wasted bits, all stereo decorrelation modes
//   * 8/12/16/20/24-bit PCM, 1-8 channels
// CRCs are read but not verified (decode is validated by round-trip
// tests against a first-party encoder).
//
// Exposed via ctypes (dissc_tpu/data/flac_native.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte_pos = 0;
  int bit_pos = 0;  // bits consumed of current byte (0..7), MSB first
  bool error = false;

  bool at_end() const { return byte_pos >= size; }

  uint32_t read_bit() {
    if (byte_pos >= size) { error = true; return 0; }
    uint32_t b = (data[byte_pos] >> (7 - bit_pos)) & 1u;
    if (++bit_pos == 8) { bit_pos = 0; ++byte_pos; }
    return b;
  }

  uint64_t read_bits(int n) {  // n <= 57
    uint64_t v = 0;
    // fast path: byte-aligned whole bytes
    while (n >= 8 && bit_pos == 0) {
      if (byte_pos >= size) { error = true; return 0; }
      v = (v << 8) | data[byte_pos++];
      n -= 8;
    }
    while (n > 0) { v = (v << 1) | read_bit(); --n; }
    return v;
  }

  int64_t read_signed(int n) {
    uint64_t v = read_bits(n);
    if (n == 0) return 0;
    uint64_t sign = 1ull << (n - 1);
    return (v & sign) ? (int64_t)(v | ~((sign << 1) - 1)) : (int64_t)v;
  }

  uint32_t read_unary() {  // count of 0 bits before the terminating 1
    uint32_t q = 0;
    while (!error && read_bit() == 0) {
      ++q;
      if (q > 1u << 24) { error = true; break; }  // corrupt stream guard
    }
    return q;
  }

  void align_byte() {
    if (bit_pos != 0) { bit_pos = 0; ++byte_pos; }
  }
};

struct StreamInfo {
  int sample_rate = 0;
  int channels = 0;
  int bits = 0;
  long total_samples = 0;
};

bool read_stream_header(BitReader& br, StreamInfo* si) {
  if (br.read_bits(32) != 0x664C6143u) return false;  // "fLaC"
  bool last = false;
  bool have_si = false;
  while (!last && !br.error) {
    last = br.read_bit();
    int type = (int)br.read_bits(7);
    uint32_t len = (uint32_t)br.read_bits(24);
    if (type == 0) {  // STREAMINFO
      br.read_bits(16);  // min block size
      br.read_bits(16);  // max block size
      br.read_bits(24);  // min frame size
      br.read_bits(24);  // max frame size
      si->sample_rate = (int)br.read_bits(20);
      si->channels = (int)br.read_bits(3) + 1;
      si->bits = (int)br.read_bits(5) + 1;
      si->total_samples = (long)br.read_bits(36);
      for (int i = 0; i < 16; ++i) br.read_bits(8);  // MD5
      have_si = true;
    } else {
      for (uint32_t i = 0; i < len; ++i) br.read_bits(8);
    }
  }
  return have_si && !br.error;
}

// UTF-8-style coded number in frame headers (up to 56 bits)
uint64_t read_utf8_number(BitReader& br) {
  uint64_t b0 = br.read_bits(8);
  if (b0 < 0x80) return b0;
  int n = 0;
  for (uint64_t mask = 0x40; b0 & mask; mask >>= 1) ++n;
  uint64_t v = b0 & (0x3Full >> n);
  for (int i = 0; i < n; ++i) v = (v << 6) | (br.read_bits(8) & 0x3F);
  return v;
}

bool decode_residual(BitReader& br, int block_size, int order,
                     int64_t* out /* block_size entries, first `order` are warmup */) {
  int method = (int)br.read_bits(2);
  if (method > 1) return false;
  int param_bits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  int po = (int)br.read_bits(4);
  int partitions = 1 << po;
  int samples_per = block_size >> po;
  if (samples_per == 0 || (samples_per << po) != block_size) return false;
  int idx = order;
  for (int p = 0; p < partitions; ++p) {
    int count = samples_per - (p == 0 ? order : 0);
    if (count < 0) return false;
    uint32_t param = (uint32_t)br.read_bits(param_bits);
    if (param == escape) {
      int raw_bits = (int)br.read_bits(5);
      for (int i = 0; i < count; ++i) out[idx++] = br.read_signed(raw_bits);
    } else {
      for (int i = 0; i < count; ++i) {
        uint64_t q = br.read_unary();
        uint64_t low = br.read_bits(param);
        uint64_t v = (q << param) | low;
        out[idx++] = (int64_t)(v >> 1) ^ -(int64_t)(v & 1);  // zigzag
      }
    }
    if (br.error) return false;
  }
  return true;
}

bool decode_subframe(BitReader& br, int block_size, int bps, int64_t* out) {
  if (br.read_bit() != 0) return false;  // padding bit
  int type = (int)br.read_bits(6);
  int wasted = 0;
  if (br.read_bit()) wasted = (int)br.read_unary() + 1;
  bps -= wasted;
  if (bps <= 0 || bps > 33) return false;

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(bps);
    for (int i = 0; i < block_size; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < block_size; ++i) out[i] = br.read_signed(bps);
  } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {  // FIXED
    int order = type & 0x07;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    if (!decode_residual(br, block_size, order, out)) return false;
    for (int i = order; i < block_size; ++i) {
      switch (order) {
        case 0: break;
        case 1: out[i] += out[i - 1]; break;
        case 2: out[i] += 2 * out[i - 1] - out[i - 2]; break;
        case 3: out[i] += 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
        case 4: out[i] += 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3]
                          - out[i - 4]; break;
      }
    }
  } else if (type & 0x20) {  // LPC
    int order = (type & 0x1F) + 1;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    int precision = (int)br.read_bits(4) + 1;
    if (precision == 16) return false;  // 1111 is invalid
    int shift = (int)br.read_signed(5);
    if (shift < 0) return false;
    int64_t coef[32];
    for (int i = 0; i < order; ++i) coef[i] = br.read_signed(precision);
    if (!decode_residual(br, block_size, order, out)) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += coef[j] * out[i - 1 - j];
      out[i] += pred >> shift;
    }
  } else {
    return false;
  }
  if (br.error) return false;
  if (wasted) {
    for (int i = 0; i < block_size; ++i) out[i] <<= wasted;
  }
  return true;
}

}  // namespace

extern "C" {

// Parse STREAMINFO only.  Returns 0 on success.
int flac_info(const uint8_t* data, long size, int* sample_rate, int* channels,
              int* bits, long* n_samples) {
  BitReader br{data, (size_t)size};
  StreamInfo si;
  if (!read_stream_header(br, &si)) return -1;
  *sample_rate = si.sample_rate;
  *channels = si.channels;
  *bits = si.bits;
  *n_samples = si.total_samples;
  return 0;
}

// Decode the whole stream into `out` (int32, interleaved channels).
// Returns samples-per-channel decoded, or -1 on error.
long flac_decode(const uint8_t* data, long size, int32_t* out,
                 long max_samples) {
  BitReader br{data, (size_t)size};
  StreamInfo si;
  if (!read_stream_header(br, &si)) return -1;
  long done = 0;
  std::vector<std::vector<int64_t>> ch(si.channels);

  while (!br.at_end() && done < max_samples) {
    br.align_byte();
    if (br.byte_pos + 2 > br.size) break;
    // frame sync 11111111 111110xx
    uint32_t sync = (uint32_t)br.read_bits(14);
    if (br.error) break;
    if (sync != 0x3FFE) return -1;
    br.read_bit();                         // reserved
    br.read_bit();                         // blocking strategy
    int bs_code = (int)br.read_bits(4);
    int sr_code = (int)br.read_bits(4);
    int ch_code = (int)br.read_bits(4);
    int ss_code = (int)br.read_bits(3);
    br.read_bit();                         // reserved
    read_utf8_number(br);                  // frame/sample number

    int block_size;
    if (bs_code == 1) block_size = 192;
    else if (bs_code >= 2 && bs_code <= 5) block_size = 576 << (bs_code - 2);
    else if (bs_code == 6) block_size = (int)br.read_bits(8) + 1;
    else if (bs_code == 7) block_size = (int)br.read_bits(16) + 1;
    else if (bs_code >= 8) block_size = 256 << (bs_code - 8);
    else return -1;

    if (sr_code == 12) br.read_bits(8);
    else if (sr_code == 13 || sr_code == 14) br.read_bits(16);

    int bps = si.bits;
    switch (ss_code) {
      case 0: break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return -1;
    }
    br.read_bits(8);  // header CRC-8 (unchecked)

    int n_ch = si.channels;
    int assign = ch_code;
    if (assign <= 7) {
      if (assign + 1 != n_ch) return -1;
    } else if (assign <= 10) {
      if (n_ch != 2) return -1;
    } else {
      return -1;
    }

    for (int c = 0; c < n_ch; ++c) ch[c].assign(block_size, 0);
    for (int c = 0; c < n_ch; ++c) {
      int sub_bps = bps;
      if ((assign == 8 && c == 1) || (assign == 9 && c == 0) ||
          (assign == 10 && c == 1))
        sub_bps += 1;  // side channel carries one extra bit
      if (!decode_subframe(br, block_size, sub_bps, ch[c].data())) return -1;
    }
    br.align_byte();
    br.read_bits(16);  // frame CRC-16 (unchecked)
    if (br.error) break;

    // undo stereo decorrelation
    if (assign == 8) {  // left/side
      for (int i = 0; i < block_size; ++i) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (assign == 9) {  // right/side: ch0=side, ch1=right
      for (int i = 0; i < block_size; ++i) ch[0][i] = ch[0][i] + ch[1][i];
    } else if (assign == 10) {  // mid/side
      for (int i = 0; i < block_size; ++i) {
        int64_t side = ch[1][i];
        int64_t mid = (ch[0][i] << 1) | (side & 1);
        ch[0][i] = (mid + side) >> 1;
        ch[1][i] = (mid - side) >> 1;
      }
    }

    long take = block_size;
    if (done + take > max_samples) take = max_samples - done;
    for (long i = 0; i < take; ++i)
      for (int c = 0; c < n_ch; ++c)
        out[(done + i) * n_ch + c] = (int32_t)ch[c][i];
    done += take;
  }
  return done;
}

}  // extern "C"
