// Banded glocal alignment with traceback — the edit-script engine.
//
// From-scratch replacement for the reference's minimap2 usage
// (reference: src/ConsensusGraph.cpp:161-398 calls mm_idx_str + mm_map per
// candidate and converts CIGAR to SAME/sub runs; internals at
// minimap2/align.c ksw_extz2_sse). Design differences:
//   - no per-call index build: the caller supplies an expected diagonal d0
//     from the seed/anchor stage, and we run one banded unit-cost DP
//     ("glocal": query consumed fully, target start/end free inside the
//     window), O(m * (2W+1)) time, traceback to explicit edit ops.
//   - ops come back as bytes: '=' copy, 's' substitution, 'i' insertion
//     (query-only base), 'd' deletion (target-only base) — directly
//     convertible to the archive's pos/type/base streams.
//
// Band coordinates: slot k = j - i - d0 + W for query row i, target col j,
// k in [0, 2W]. Moves: diag (i-1,j-1) same k; up/ins (i-1,j) k+1; left/del
// (i,j-1) k-1.
//
// C ABI only (consumed via ctypes).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int32_t INF = 0x3FFFFFFF;

struct Scratch {
    std::vector<int32_t> row0, row1;
    std::vector<uint8_t> dirs;  // (m+1) x (2W+1), 0=diag,1=up,2=left,3=start
    std::vector<uint8_t> tpad;  // diagonal-shifted target slice + sentinels
    std::vector<int32_t> va, vb;  // prefix-min ping-pong buffers
};

thread_local Scratch g_scratch;

}  // namespace

extern "C" {

// Returns cost >= 0 on success, -1 if max_cost exceeded (early abort),
// -2 if output capacity too small.
// ops_out must have capacity >= 2*m + 2*W + 2.
int32_t ns_banded_align(
    const uint8_t* target, int64_t n,
    const uint8_t* query, int64_t m,
    int64_t d0, int32_t W, int32_t max_cost,
    uint8_t* ops_out, int64_t ops_cap, int64_t* ops_len,
    int64_t* tstart_out, int64_t* tend_out)
{
    const int64_t width = 2 * (int64_t)W + 1;
    Scratch& s = g_scratch;
    s.row0.assign(width + 1, INF);   // +1: INF sentinel for up at k=width-1
    s.row1.assign(width + 1, INF);
    // no fill: every dirs row in [1, m] is fully written by the DP loop
    // and the traceback never reads row 0 (a per-pair memset here was
    // ~0.5 MB/pair of pure overhead)
    if (s.dirs.size() < (size_t)(m + 1) * width)
        s.dirs.resize((size_t)(m + 1) * width);
    // tpad[x] = target[x + d0 - W - 1], 0xFF sentinel outside: row i's
    // diag chars are the contiguous slice tpad[i .. i+width) (no per-cell
    // bounds checks; boundary validity is handled by the klo/khi clip).
    s.tpad.assign((size_t)(m + width + 1), 0xFF);
    s.va.resize(width);
    s.vb.resize(width);
    {
        int64_t lo = d0 - W - 1;
        int64_t b = lo < 0 ? -lo : 0;
        int64_t e = (int64_t)s.tpad.size();
        if (lo + e > n) e = n - lo;
        if (e > b) std::memcpy(s.tpad.data() + b, target + lo + b, (size_t)(e - b));
    }

    // row 0: start anywhere in target within the band (j = d0 - W + k)
    for (int64_t k = 0; k < width; ++k) {
        int64_t j = d0 - W + k;
        if (j >= 0 && j <= n) s.row0[k] = 0;
    }
    // left (del) moves in row 0 are never useful (all starts are free).

    int32_t* prev = s.row0.data();
    int32_t* cur = s.row1.data();

    for (int64_t i = 1; i <= m; ++i) {
        const int32_t qc = query[i - 1];
        uint8_t* dir_row = s.dirs.data() + (size_t)i * width;
        const uint8_t* trow = s.tpad.data() + i;   // diag char per slot
        const int64_t jbase = d0 + i - W;          // j for k=0 in this row
        // valid slots: j in [0, n] -> k in [klo, khi]
        int64_t klo = jbase < 0 ? -jbase : 0;
        int64_t khi = n - jbase;
        if (khi > width - 1) khi = width - 1;
        for (int64_t k = 0; k < klo; ++k) { cur[k] = INF; dir_row[k] = 3; }
        for (int64_t k = khi + 1; k < width; ++k) { cur[k] = INF; dir_row[k] = 3; }
        // vector pass (branch-free, auto-vectorizes): diag vs up.
        // diag at j==0 (k==klo when jbase<0) is invalid; tpad sentinel 0xFF
        // mismatches, but prev[k] there is INF-ish from the prior row clip,
        // handled below by the explicit k==klo fix when j==0.
        {
            const int32_t* __restrict pv = prev;
            int32_t* __restrict cv = cur;
            uint8_t* __restrict dv = dir_row;
            const uint8_t* __restrict tv = trow;
            #pragma GCC ivdep
            for (int64_t k = klo; k <= khi; ++k) {
                int32_t diag = pv[k] + (int32_t)(tv[k] != qc);
                int32_t up = pv[k + 1] + 1;
                cv[k] = diag < up ? diag : up;        // tie keeps up
                dv[k] = (uint8_t)(up <= diag);
            }
        }
        if (jbase + klo == 0) {
            // j == 0: no diag (no target char); only up is legal
            int32_t up = prev[klo + 1] + 1;
            cur[klo] = up;
            dir_row[klo] = 1;
        }
        // left-move chains as a prefix-min (no serial dependency):
        // result[k] = k + min_{k'<=k}(cur[k'] - k'), via log2(width)
        // shifted-min passes, each fully vectorizable.
        {
            const int64_t span = khi - klo + 1;
            int32_t* __restrict a = s.va.data();
            int32_t* __restrict b = s.vb.data();
            for (int64_t k = 0; k < span; ++k)
                a[k] = cur[klo + k] - (int32_t)k;
            for (int64_t sh = 1; sh < span; sh <<= 1) {
                for (int64_t k = span - 1; k >= sh; --k)
                    b[k] = a[k] < a[k - sh] ? a[k] : a[k - sh];
                for (int64_t k = 0; k < sh && k < span; ++k) b[k] = a[k];
                std::swap(a, b);
            }
            int32_t row_min = INF;
            for (int64_t k = 0; k < span; ++k) {
                int32_t chained = a[k] + (int32_t)k;
                int32_t c = cur[klo + k];
                if (chained < c) { cur[klo + k] = chained; dir_row[klo + k] = 2; }
                else chained = c;
                if (chained < row_min) row_min = chained;
            }
            if (row_min > max_cost) return -1;
        }
        std::swap(prev, cur);
    }

    // answer: min over final row (free target end), j must be in [0, n]
    int64_t best_k = -1;
    int32_t best_cost = INF;
    int64_t jbase_m = d0 + m - W;
    for (int64_t k = 0; k < width; ++k) {
        int64_t j = jbase_m + k;
        if (j < 0 || j > n) continue;
        if (prev[k] < best_cost) { best_cost = prev[k]; best_k = k; }
    }
    if (best_k < 0 || best_cost > max_cost) return -1;

    // traceback (ops emitted reversed, then flipped)
    int64_t i = m, k = best_k;
    int64_t len = 0;
    while (i > 0) {
        uint8_t d = s.dirs[(size_t)i * width + k];
        if (len >= ops_cap) return -2;
        if (d == 0) {           // diag
            int64_t j = d0 + i - W + k;
            ops_out[len++] = (target[j - 1] == query[i - 1]) ? '=' : 's';
            i -= 1;             // k unchanged
        } else if (d == 1) {    // up: insertion
            ops_out[len++] = 'i';
            i -= 1; k += 1;
        } else if (d == 2) {    // left: deletion
            ops_out[len++] = 'd';
            k -= 1;
        } else {
            return -3;          // broken traceback
        }
    }
    int64_t tstart = d0 + 0 - W + k;  // j at i == 0
    // flip ops
    for (int64_t a = 0, b = len - 1; a < b; ++a, --b) {
        uint8_t t = ops_out[a]; ops_out[a] = ops_out[b]; ops_out[b] = t;
    }
    *ops_len = len;
    *tstart_out = tstart;
    *tend_out = d0 + m - W + best_k;
    return best_cost;
}

// Batch interface: pairs share flat code buffers. Returns number of pairs
// processed. Per-pair outputs: cost (or -1), ops in ops_flat at
// ops_off[p] with length ops_len[p], tstart/tend.
void ns_banded_align_batch(
    const uint8_t* targets_flat, const int64_t* t_off, const int64_t* t_len,
    const uint8_t* queries_flat, const int64_t* q_off, const int64_t* q_len,
    const int64_t* d0s, int32_t W, int32_t max_cost_per_kb,
    int64_t npairs,
    uint8_t* ops_flat, const int64_t* ops_off, int64_t ops_cap_each,
    int64_t* ops_len, int64_t* tstart, int64_t* tend, int32_t* cost)
{
    // Scratch is thread_local, so pairs parallelize cleanly. Dynamic
    // schedule: pair cost varies with query length and early aborts.
    #pragma omp parallel for schedule(dynamic, 4)
    for (int64_t p = 0; p < npairs; ++p) {
        int64_t m = q_len[p];
        int32_t max_cost = (int32_t)((m * (int64_t)max_cost_per_kb) / 1000 + 8);
        cost[p] = ns_banded_align(
            targets_flat + t_off[p], t_len[p],
            queries_flat + q_off[p], m,
            d0s[p], W, max_cost,
            ops_flat + ops_off[p], ops_cap_each, &ops_len[p],
            &tstart[p], &tend[p]);
        if (cost[p] < 0) { ops_len[p] = 0; tstart[p] = 0; tend[p] = 0; }
    }
}

}  // extern "C"
