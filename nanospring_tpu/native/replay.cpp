// Edit-script replay: archive streams -> member sequences (ASCII).
// The C++ core of decompression, role of the reference's generateRead loop
// (reference: src/Decompressor.cpp:252-314), parallel over members.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

const uint8_t* comp_lut() {
  static uint8_t lut[256];
  static bool init = false;
  if (!init) {
    for (int i = 0; i < 256; ++i) lut[i] = uint8_t(i);
    lut['A'] = 'T'; lut['T'] = 'A'; lut['C'] = 'G'; lut['G'] = 'C';
    init = true;
  }
  return lut;
}

}  // namespace

extern "C" {

// All offsets precomputed by the caller. For member m:
//   runs[run_off[m] .. run_off[m] + n_edits[m]]    (n_edits+1 entries)
//   types[type_off[m] .. type_off[m] + n_edits[m])
//   lits[lit_off[m] ..)  layout: head | script literals | tail
//   output at out[out_off[m] .. out_off[m] + out_len[m])
void ns_replay_members(
    const uint8_t* genome, const int64_t* genome_off,
    const int64_t* contig_of, const int64_t* start,
    const int64_t* head, const int64_t* tail, const int64_t* n_edits,
    const int64_t* run_off, const int64_t* runs,
    const int64_t* type_off, const uint8_t* types,
    const int64_t* lit_off, const uint8_t* lits,
    const uint8_t* strand, int64_t M,
    const int64_t* out_off, const int64_t* out_len, uint8_t* out) {
  const uint8_t* comp = comp_lut();
  #pragma omp parallel for schedule(dynamic, 64)
  for (int64_t m = 0; m < M; ++m) {
    const int64_t E = n_edits[m];
    const int64_t* r = runs + run_off[m];
    const uint8_t* t = types + type_off[m];
    const uint8_t* lit = lits + lit_off[m];
    const uint8_t* g = genome + genome_off[contig_of[m]] + start[m];
    uint8_t* o = out + out_off[m];
    // head insertions
    std::memcpy(o, lit, size_t(head[m]));
    o += head[m];
    lit += head[m];
    for (int64_t e = 0; e < E; ++e) {
      int64_t run = r[e];
      std::memcpy(o, g, size_t(run));
      o += run;
      g += run;
      switch (t[e]) {
        case 's': *o++ = *lit++; ++g; break;
        case 'i': *o++ = *lit++; break;
        default:  ++g; break;          // 'd'
      }
    }
    int64_t fin = r[E];
    std::memcpy(o, g, size_t(fin));
    o += fin;
    // tail insertions
    std::memcpy(o, lit, size_t(tail[m]));
    o += tail[m];
    // reverse-complement in place for 'c' strand members
    if (strand[m]) {
      uint8_t* lo = out + out_off[m];
      uint8_t* hi = out + out_off[m] + out_len[m] - 1;
      while (lo < hi) {
        uint8_t a = comp[*lo], b = comp[*hi];
        *lo++ = b;
        *hi-- = a;
      }
      if (lo == hi) *lo = comp[*lo];
    }
  }
}

// Ordered output assembly: for read id i (original order), copy its
// sequence from member_seq or lone_seq and append '\n'
// (role of the reference's ordered multi-pass write, src/Decompressor.cpp:186-235).
void ns_gather_reads(
    const uint8_t* member_seq, const uint8_t* lone_seq,
    const int64_t* src_off, const uint8_t* src_is_lone,
    const int64_t* lens, int64_t n_reads, uint8_t* out) {
  // output offsets first so the copy loop parallelizes (the serial
  // memcpy loop was ~47% of Gbase-scale decompress wall)
  std::vector<int64_t> oo((size_t)n_reads + 1);
  oo[0] = 0;
  for (int64_t i = 0; i < n_reads; ++i) oo[(size_t)i + 1] = oo[(size_t)i] + lens[i] + 1;
  #pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_reads; ++i) {
    const uint8_t* src =
        (src_is_lone[i] ? lone_seq : member_seq) + src_off[i];
    uint8_t* dst = out + oo[(size_t)i];
    std::memcpy(dst, src, size_t(lens[i]));
    dst[lens[i]] = '\n';
  }
}

}  // extern "C"
