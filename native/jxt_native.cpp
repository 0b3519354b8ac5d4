// jxt_native: host-side native core for the jxl_tpu framework.
//
// Plays the role the reference delegates to native code (its Rust harness's
// stream plumbing plus libjxl's C++ entropy coder): a reference
// implementation of the exact same K-lane interleaved rANS scheme the JAX
// codec runs on TPU (32-bit state, 16-bit renorm words, 12-bit
// frequencies), plus fast ragged stream (de)serialization and raw-bit
// packing. Used via ctypes for:
//   - conformance: C++ encode == device encode, C++ decode(device stream)
//     == tokens (bit-exactness across implementations),
//   - fast host-side fallback when no accelerator is present.
//
// ABI: plain C functions; all buffers caller-allocated numpy arrays.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kPrec = 12;
constexpr uint32_t kM = 1u << kPrec;
constexpr uint32_t kL = 1u << 16;

}  // namespace

extern "C" {

// Interleaved rANS encode.
// tokens/ctx: [n]; freq/cum: [n_ctx * alphabet] (row-major).
// out_words: [cap_words_per_lane * lanes] (column k = lane k, row-major by
//   word index, matching the JAX [T, K] layout), out_lens: [lanes],
//   out_states: [lanes]. Returns 0 on success, -1 if a lane overflows cap.
int rans_encode(const int32_t* tokens, const int32_t* ctx, int64_t n,
                const uint32_t* freq, const uint32_t* cum, int32_t alphabet,
                int32_t lanes, int64_t cap_words_per_lane, uint16_t* out_words,
                int32_t* out_lens, uint32_t* out_states) {
  std::vector<uint32_t> states(lanes, kL);
  std::vector<std::vector<uint16_t>> streams(lanes);
  // Process symbols in reverse; symbol i belongs to lane i % lanes.
  for (int64_t i = n - 1; i >= 0; --i) {
    int lane = static_cast<int>(i % lanes);
    uint32_t x = states[lane];
    int32_t s = tokens[i];
    int64_t row = static_cast<int64_t>(ctx[i]) * alphabet;
    uint32_t f = freq[row + s];
    uint32_t c = cum[row + s];
    if (x >= (f << 20)) {
      streams[lane].push_back(static_cast<uint16_t>(x & 0xFFFF));
      x >>= 16;
    }
    states[lane] = ((x / f) << kPrec) + (x % f) + c;
  }
  for (int k = 0; k < lanes; ++k) {
    // Emission order was descending symbol index; decoder consumes words in
    // ascending symbol order, so reverse each lane stream.
    auto& st = streams[k];
    int64_t len = static_cast<int64_t>(st.size());
    if (len > cap_words_per_lane) return -1;
    out_lens[k] = static_cast<int32_t>(len);
    out_states[k] = states[k];
    for (int64_t w = 0; w < len; ++w) {
      out_words[(len - 1 - w) * lanes + k] = st[w];
    }
  }
  return 0;
}

// Interleaved rANS decode; words laid out [T, lanes] like the JAX decoder.
int rans_decode(const uint16_t* words, const int32_t* lens,
                const uint32_t* states_in, int64_t n, const int32_t* ctx,
                const uint32_t* freq, const uint32_t* cum, int32_t alphabet,
                int32_t lanes, int64_t words_rows, int32_t* out_tokens) {
  std::vector<uint32_t> states(states_in, states_in + lanes);
  std::vector<int64_t> ptr(lanes, 0);
  for (int64_t i = 0; i < n; ++i) {
    int lane = static_cast<int>(i % lanes);
    uint32_t x = states[lane];
    uint32_t slot = x & (kM - 1);
    int64_t row = static_cast<int64_t>(ctx[i]) * alphabet;
    // symbol = last s with cum[s] <= slot
    int32_t s = alphabet - 1;
    while (s > 0 && cum[row + s] > slot) --s;
    uint32_t f = freq[row + s];
    x = f * (x >> kPrec) + slot - cum[row + s];
    if (x < kL) {
      if (ptr[lane] >= words_rows) return -1;
      x = (x << 16) | words[ptr[lane] * lanes + lane];
      ++ptr[lane];
    }
    states[lane] = x;
    out_tokens[i] = s;
  }
  // All lanes must have consumed exactly their stream.
  for (int k = 0; k < lanes; ++k) {
    if (ptr[k] != lens[k]) return -2;
  }
  return 0;
}

// Ragged serialization: [T, lanes] words + lens -> flat stream (lane-major).
int64_t serialize_streams(const uint16_t* words, const int32_t* lens,
                          int32_t lanes, int64_t rows, uint16_t* out) {
  int64_t off = 0;
  for (int k = 0; k < lanes; ++k) {
    for (int64_t w = 0; w < lens[k]; ++w) {
      out[off++] = words[w * lanes + k];
    }
  }
  return off;
}

int64_t deserialize_streams(const uint16_t* flat, const int32_t* lens,
                            int32_t lanes, int64_t rows, uint16_t* out_words) {
  std::memset(out_words, 0, sizeof(uint16_t) * rows * lanes);
  int64_t off = 0;
  for (int k = 0; k < lanes; ++k) {
    for (int64_t w = 0; w < lens[k]; ++w) {
      out_words[w * lanes + k] = flat[off++];
    }
  }
  return off;
}

// Raw-bit packing, MSB-first, identical to entropy/tokens.py pack_bits.
void pack_bits(const int32_t* nbits, const uint32_t* mantissa, int64_t n,
               uint32_t* out_words, int64_t n_words) {
  std::memset(out_words, 0, sizeof(uint32_t) * n_words);
  int64_t pos = 0;
  for (int64_t i = 0; i < n; ++i) {
    for (int32_t b = 0; b < nbits[i]; ++b) {
      uint32_t bit = (mantissa[i] >> (nbits[i] - 1 - b)) & 1u;
      int64_t word = (pos + b) >> 5;
      int32_t in_word = static_cast<int32_t>((pos + b) & 31);
      out_words[word] |= bit << (31 - in_word);
    }
    pos += nbits[i];
  }
}

void unpack_bits(const int32_t* nbits, const uint32_t* words, int64_t n,
                 uint32_t* out_mantissa) {
  int64_t pos = 0;
  for (int64_t i = 0; i < n; ++i) {
    uint32_t v = 0;
    for (int32_t b = 0; b < nbits[i]; ++b) {
      int64_t word = (pos + b) >> 5;
      int32_t in_word = static_cast<int32_t>((pos + b) & 31);
      v |= ((words[word] >> (31 - in_word)) & 1u) << (nbits[i] - 1 - b);
    }
    out_mantissa[i] = v;
    pos += nbits[i];
  }
}

}  // extern "C"
