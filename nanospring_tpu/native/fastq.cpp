// FASTQ sequence-line extraction + 2-bit packing, C++ host stage.
// Role of the reference's ReadData::loadFromFile + DnaBitset packing
// (reference: src/ReadData.cpp:95-142, src/dnaToBits.cpp:46-79), built for
// flat-array output: packed codes (4 bases/byte, base i in bits 2*(i%4),
// byte-aligned per read), per-read lengths, and non-ACGT exceptions
// (position + original byte) so arbitrary FASTQ round-trips byte-identically
// (the reference's baseToInt silently aliases 'N' — src/dnaToBits.cpp:6-9).

#include <cstdint>
#include <cstring>

namespace {

struct Luts {
  uint8_t code[256];
  uint8_t acgt[256];
  Luts() {
    std::memset(code, 0, sizeof(code));
    std::memset(acgt, 0, sizeof(acgt));
    code['A'] = 0; code['C'] = 1; code['G'] = 2; code['T'] = 3;
    code['a'] = 0; code['c'] = 1; code['g'] = 2; code['t'] = 3;
    acgt['A'] = acgt['C'] = acgt['G'] = acgt['T'] = 1;
  }
};
const Luts L;

}  // namespace

extern "C" {

// Pass 1: count records / sequence bytes / exceptions in a FASTQ text block
// (block must contain a whole number of 4-line records; final newline
// optional). Returns 0, or -1 if the line count is not a multiple of 4.
int32_t ns_fastq_scan(const uint8_t* t, int64_t n, int64_t* nreads,
                      int64_t* nbases, int64_t* nexc) {
  int64_t r = 0, bases = 0, exc = 0, line = 0, i = 0;
  while (i < n) {
    const uint8_t* nl = (const uint8_t*)memchr(t + i, '\n', size_t(n - i));
    int64_t end = nl ? (nl - t) : n;
    if ((line & 3) == 1) {
      bases += end - i;
      for (int64_t j = i; j < end; ++j) exc += 1 - L.acgt[t[j]];
      ++r;
    }
    i = end + 1;
    ++line;
  }
  *nreads = r;
  *nbases = bases;
  *nexc = exc;
  return (line & 3) == 0 ? 0 : -1;
}

// Pass 2: pack sequence lines. Caller sizes outputs from ns_fastq_scan:
//   packed: sum over reads of ceil(len/4) bytes (zero-initialized)
//   lengths: nreads
//   exc_read/exc_pos/exc_byte: nexc   (read-local positions)
void ns_fastq_pack(const uint8_t* t, int64_t n, uint8_t* packed,
                   int64_t* lengths, int64_t* exc_read, int64_t* exc_pos,
                   uint8_t* exc_byte) {
  int64_t line = 0, i = 0, r = 0, pb = 0, e = 0;
  while (i < n) {
    const uint8_t* nl = (const uint8_t*)memchr(t + i, '\n', size_t(n - i));
    int64_t end = nl ? (nl - t) : n;
    if ((line & 3) == 1) {
      int64_t len = end - i;
      lengths[r] = len;
      uint8_t* dst = packed + pb;
      for (int64_t j = 0; j < len; ++j) {
        uint8_t c = t[i + j];
        dst[j >> 2] |= uint8_t(L.code[c] << (2 * (j & 3)));
        if (!L.acgt[c]) {
          exc_read[e] = r;
          exc_pos[e] = j;
          exc_byte[e] = c;
          ++e;
        }
      }
      pb += (len + 3) >> 2;
      ++r;
    }
    i = end + 1;
    ++line;
  }
}

}  // extern "C"
