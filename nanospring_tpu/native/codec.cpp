// Block-sorting entropy codec: SA-IS BWT + MTF + RLE0 + adaptive binary
// range coder. From-scratch C++ host-CPU stage filling the role libbsc
// (BWT via libsais + QLFC coder) plays in the reference
// (reference: src/bsc.cpp:1045-1057 — 48 MB blocks, coder e2;
//  libbsc/bwt/libsais, libbsc/coder/qlfc). Entropy coding is byte-serial
// and branchy — the wrong shape for a TPU — so it stays native on host.
//
// Block format: [u32 n][u32 primary][rc payload]  (raw-escape: primary =
// 0xFFFFFFFF, payload = the input verbatim, for incompressible blocks).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// SA-IS suffix array (Nong–Zhang–Chan induced sorting), int32 indices.
// s[n-1] must be a unique smallest sentinel (0).
// ---------------------------------------------------------------------------

void sais_int(const int32_t* s, int32_t* SA, int32_t n, int32_t K) {
  std::vector<uint8_t> t(n);  // 1 = S-type
  t[n - 1] = 1;
  for (int32_t i = n - 2; i >= 0; --i)
    t[i] = (s[i] < s[i + 1] || (s[i] == s[i + 1] && t[i + 1])) ? 1 : 0;
  auto isLMS = [&](int32_t i) { return i > 0 && t[i] && !t[i - 1]; };

  std::vector<int32_t> bkt(K);
  auto getBuckets = [&](bool end) {
    std::fill(bkt.begin(), bkt.end(), 0);
    for (int32_t i = 0; i < n; ++i) bkt[s[i]]++;
    int32_t sum = 0;
    for (int32_t i = 0; i < K; ++i) {
      sum += bkt[i];
      bkt[i] = end ? sum : sum - bkt[i];
    }
  };

  auto induceSAl = [&]() {
    getBuckets(false);
    for (int32_t i = 0; i < n; ++i) {
      int32_t j = SA[i] - 1;
      if (SA[i] > 0 && !t[j]) SA[bkt[s[j]]++] = j;
    }
  };
  auto induceSAs = [&]() {
    getBuckets(true);
    for (int32_t i = n - 1; i >= 0; --i) {
      int32_t j = SA[i] - 1;
      if (SA[i] > 0 && t[j]) SA[--bkt[s[j]]] = j;
    }
  };

  // stage 1: sort LMS substrings
  getBuckets(true);
  for (int32_t i = 0; i < n; ++i) SA[i] = -1;
  for (int32_t i = 1; i < n; ++i)
    if (isLMS(i)) SA[--bkt[s[i]]] = i;
  induceSAl();
  induceSAs();

  // compact sorted LMS positions into SA[0..n1)
  int32_t n1 = 0;
  for (int32_t i = 0; i < n; ++i)
    if (isLMS(SA[i])) SA[n1++] = SA[i];
  for (int32_t i = n1; i < n; ++i) SA[i] = -1;

  // name LMS substrings
  int32_t name = 0, prev = -1;
  for (int32_t i = 0; i < n1; ++i) {
    int32_t pos = SA[i];
    bool diff = false;
    if (prev < 0) {
      diff = true;
    } else {
      for (int32_t d = 0;; ++d) {
        if (pos + d == n || prev + d == n) { diff = (pos + d == n) != (prev + d == n); break; }
        if (s[pos + d] != s[prev + d] || t[pos + d] != t[prev + d]) { diff = true; break; }
        if (d > 0 && (isLMS(pos + d) || isLMS(prev + d))) {
          diff = !(isLMS(pos + d) && isLMS(prev + d));
          break;
        }
      }
    }
    if (diff) { ++name; prev = pos; }
    SA[n1 + pos / 2] = name - 1;
  }
  for (int32_t i = n - 1, j = n - 1; i >= n1; --i)
    if (SA[i] >= 0) SA[j--] = SA[i];

  // stage 2: recurse if names are not unique
  int32_t* SA1 = SA;
  int32_t* s1 = SA + n - n1;
  if (name < n1) {
    sais_int(s1, SA1, n1, name);
  } else {
    for (int32_t i = 0; i < n1; ++i) SA1[s1[i]] = i;
  }

  // stage 3: induce the full SA from sorted LMS suffixes
  std::vector<int32_t> lms(n1);
  for (int32_t i = 1, j = 0; i < n; ++i)
    if (isLMS(i)) lms[j++] = i;
  for (int32_t i = 0; i < n1; ++i) SA1[i] = lms[SA1[i]];
  for (int32_t i = n1; i < n; ++i) SA[i] = -1;
  getBuckets(true);
  for (int32_t i = n1 - 1; i >= 0; --i) {
    int32_t j = SA[i];
    SA[i] = -1;
    SA[--bkt[s[j]]] = j;
  }
  induceSAl();
  induceSAs();
}

// BWT of data[0..n) via the suffix array of data + sentinel.
// Returns primary index (row of the sentinel-started suffix's predecessor).
uint32_t bwt_forward(const uint8_t* data, int64_t n, uint8_t* out) {
  std::vector<int32_t> s(n + 1);
  for (int64_t i = 0; i < n; ++i) s[i] = int32_t(data[i]) + 1;
  s[n] = 0;
  std::vector<int32_t> SA(n + 1);
  sais_int(s.data(), SA.data(), int32_t(n + 1), 258);
  uint32_t primary = 0;
  int64_t k = 0;
  for (int64_t i = 0; i <= n; ++i) {
    if (SA[i] == 0) {
      primary = uint32_t(i);
      continue;
    }
    out[k++] = data[SA[i] - 1];
  }
  return primary;
}

// Inverse BWT: bwt[0..n) + primary -> original data.
void bwt_inverse(const uint8_t* bwt, int64_t n, uint32_t primary, uint8_t* out) {
  // Conceptual (n+1)-row matrix: row `primary` ends with the sentinel.
  // LF over the n real symbols; positions >= primary are shifted by one.
  std::vector<int64_t> cnt(257, 0);
  for (int64_t i = 0; i < n; ++i) cnt[bwt[i] + 1]++;
  int64_t sum = 1;  // sentinel occupies rank 0
  std::vector<int64_t> C(256);
  for (int32_t c = 0; c < 256; ++c) {
    C[c] = sum;
    sum += cnt[c + 1];
  }
  std::vector<int64_t> LF(n);
  std::vector<int64_t> occ(256, 0);
  for (int64_t i = 0; i < n; ++i) {
    uint8_t c = bwt[i];
    LF[i] = C[c] + occ[c]++;
  }
  // Walk LF backward from matrix row 0 (the sentinel suffix's row, whose
  // BWT char is data[n-1]); bwt index for matrix row r skips the primary
  // (sentinel-char) row. The walk never lands on `primary` within n steps.
  int64_t row = 0;
  for (int64_t i = n - 1; i >= 0; --i) {
    int64_t bi = row - (row > int64_t(primary) ? 1 : 0);
    out[i] = bwt[bi];
    row = LF[bi];
  }
}

// ---------------------------------------------------------------------------
// LZMA-style binary range coder with adaptive 12-bit probabilities.
// ---------------------------------------------------------------------------

struct RangeEncoder {
  std::vector<uint8_t>& out;
  uint64_t low = 0;
  uint32_t range = 0xFFFFFFFFu;
  uint8_t cache = 0;
  int64_t cacheSize = 1;

  explicit RangeEncoder(std::vector<uint8_t>& o) : out(o) {}

  void shiftLow() {
    if (uint32_t(low) < 0xFF000000u || (low >> 32) != 0) {
      uint8_t carry = uint8_t(low >> 32);
      while (cacheSize) {
        out.push_back(uint8_t(cache + carry));
        cache = 0xFF;
        --cacheSize;
      }
      cache = uint8_t(low >> 24);
    }
    ++cacheSize;
    low = (low << 8) & 0xFFFFFFFFu;
  }

  void encode(uint16_t& p, int bit) {
    uint32_t bound = (range >> 12) * p;
    if (!bit) {
      range = bound;
      p += (4096 - p) >> 5;
    } else {
      low += bound;
      range -= bound;
      p -= p >> 5;
    }
    while (range < (1u << 24)) {
      shiftLow();
      range <<= 8;
    }
  }

  void flush() {
    for (int i = 0; i < 5; ++i) shiftLow();
  }
};

struct RangeDecoder {
  const uint8_t* in;
  int64_t pos = 0, size;
  uint32_t range = 0xFFFFFFFFu;
  uint32_t code = 0;

  RangeDecoder(const uint8_t* i, int64_t n) : in(i), size(n) {
    ++pos;  // first byte is always 0
    for (int k = 0; k < 4; ++k) code = (code << 8) | next();
  }
  uint8_t next() { return pos < size ? in[pos++] : 0; }

  int decode(uint16_t& p) {
    uint32_t bound = (range >> 12) * p;
    int bit;
    if (code < bound) {
      range = bound;
      p += (4096 - p) >> 5;
      bit = 0;
    } else {
      code -= bound;
      range -= bound;
      p -= p >> 5;
      bit = 1;
    }
    while (range < (1u << 24)) {
      code = (code << 8) | next();
      range <<= 8;
    }
    return bit;
  }
};

// ---------------------------------------------------------------------------
// MTF + RLE0 + context-modeled coding of BWT output (QLFC-class).
// ---------------------------------------------------------------------------

struct Model {
  // zero-run lengths: Elias-gamma with adaptive bits
  uint16_t runLen[32];        // unary length-of-length bits
  uint16_t runBits[32];       // value bits by position
  // nonzero ranks: 8-bit bit-tree per context (prev-rank class)
  uint16_t rank[3][256];
  Model() {
    for (auto& p : runLen) p = 2048;
    for (auto& p : runBits) p = 2048;
    for (auto& c : rank)
      for (auto& p : c) p = 2048;
  }
};

void encode_run(RangeEncoder& rc, Model& m, uint64_t v) {
  // encode v (>= 0) as gamma of v+1
  uint64_t x = v + 1;
  int nb = 63 - __builtin_clzll(x);  // number of value bits after the top 1
  for (int i = 0; i < nb; ++i) rc.encode(m.runLen[i < 31 ? i : 31], 1);
  rc.encode(m.runLen[nb < 31 ? nb : 31], 0);
  for (int i = nb - 1; i >= 0; --i)
    rc.encode(m.runBits[i < 31 ? i : 31], int((x >> i) & 1));
}

uint64_t decode_run(RangeDecoder& rc, Model& m) {
  int nb = 0;
  while (rc.decode(m.runLen[nb < 31 ? nb : 31])) ++nb;
  uint64_t x = 1;
  for (int i = nb - 1; i >= 0; --i)
    x = (x << 1) | uint64_t(rc.decode(m.runBits[i < 31 ? i : 31]));
  return x - 1;
}

void encode_rank(RangeEncoder& rc, Model& m, int ctx, uint8_t r) {
  // bit-tree over the 8 bits of r (r >= 1)
  uint32_t node = 1;
  for (int b = 7; b >= 0; --b) {
    int bit = (r >> b) & 1;
    rc.encode(m.rank[ctx][node], bit);
    node = (node << 1) | uint32_t(bit);
  }
}

uint8_t decode_rank(RangeDecoder& rc, Model& m, int ctx) {
  uint32_t node = 1;
  for (int b = 7; b >= 0; --b) node = (node << 1) | uint32_t(rc.decode(m.rank[ctx][node]));
  return uint8_t(node & 0xFF);
}

int64_t coder_encode(const uint8_t* bwt, int64_t n, std::vector<uint8_t>& out) {
  uint8_t mtf[256];
  for (int i = 0; i < 256; ++i) mtf[i] = uint8_t(i);
  RangeEncoder rc(out);
  Model m;
  uint64_t zrun = 0;
  int ctx = 0;
  for (int64_t i = 0; i < n; ++i) {
    uint8_t c = bwt[i];
    // find rank
    int r = 0;
    while (mtf[r] != c) ++r;
    if (r == 0) {
      ++zrun;
      continue;
    }
    encode_run(rc, m, zrun);
    zrun = 0;
    encode_rank(rc, m, ctx, uint8_t(r));
    ctx = r == 1 ? 1 : 2;
    // move to front
    for (int k = r; k > 0; --k) mtf[k] = mtf[k - 1];
    mtf[0] = c;
  }
  encode_run(rc, m, zrun);
  rc.flush();
  return int64_t(out.size());
}

void coder_decode(const uint8_t* in, int64_t in_n, uint8_t* out, int64_t n) {
  uint8_t mtf[256];
  for (int i = 0; i < 256; ++i) mtf[i] = uint8_t(i);
  RangeDecoder rc(in, in_n);
  Model m;
  int ctx = 0;
  int64_t i = 0;
  while (i < n) {
    uint64_t zrun = decode_run(rc, m);
    while (zrun-- && i < n) out[i++] = mtf[0];
    if (i >= n) break;
    uint8_t r = decode_rank(rc, m, ctx);
    ctx = r == 1 ? 1 : 2;
    uint8_t c = mtf[r];
    for (int k = r; k > 0; --k) mtf[k] = mtf[k - 1];
    mtf[0] = c;
    out[i++] = c;
  }
}

}  // namespace

extern "C" {

// out must have capacity n + 1024. Returns compressed size.
int64_t ns_bsc_compress(const uint8_t* in, int64_t n, uint8_t* out) {
  uint32_t nn = uint32_t(n);
  std::memcpy(out, &nn, 4);
  if (n == 0) {
    uint32_t esc = 0xFFFFFFFFu;
    std::memcpy(out + 4, &esc, 4);
    return 8;
  }
  std::vector<uint8_t> bwt(n);
  uint32_t primary = bwt_forward(in, n, bwt.data());
  std::vector<uint8_t> payload;
  payload.reserve(size_t(n / 2 + 64));
  coder_encode(bwt.data(), n, payload);
  if (int64_t(payload.size()) >= n) {  // incompressible: store raw
    uint32_t esc = 0xFFFFFFFFu;
    std::memcpy(out + 4, &esc, 4);
    std::memcpy(out + 8, in, size_t(n));
    return 8 + n;
  }
  std::memcpy(out + 4, &primary, 4);
  std::memcpy(out + 8, payload.data(), payload.size());
  return 8 + int64_t(payload.size());
}

// Returns decompressed size (== stored n). out must have capacity >= n.
int64_t ns_bsc_decompress(const uint8_t* in, int64_t in_n, uint8_t* out) {
  uint32_t nn, primary;
  std::memcpy(&nn, in, 4);
  std::memcpy(&primary, in + 4, 4);
  int64_t n = nn;
  if (n == 0) return 0;
  if (primary == 0xFFFFFFFFu) {
    std::memcpy(out, in + 8, size_t(n));
    return n;
  }
  std::vector<uint8_t> bwt(n);
  coder_decode(in + 8, in_n - 8, bwt.data(), n);
  bwt_inverse(bwt.data(), n, primary, out);
  return n;
}

}  // extern "C"
