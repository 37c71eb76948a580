// Overlap-candidate join over MinHash sketches, owner-computes per read.
//
// Native equivalent of pipeline/candidates.py::SketchIndex (itself the
// replacement for the reference's 60 BooPHF tables + bucket query,
// reference: src/BBHashMap.cpp:10-120, src/ReadFilter.cpp:65-97):
//   - per hash slot, sort (value, read-id) pairs;
//   - per read, binary-search its value in each slot, gather bucket
//     members (buckets larger than max_bucket are skipped as repetitive),
//     and keep candidates appearing in >= threshold slots.
// Self-pairs (q == r) are dropped here (the Python caller dropped them
// one step later). Output is sorted by (q, r) — the same order the numpy
// index produces — so downstream growth order is identical.
//
// C ABI, handle pattern (results are ragged): ns_join_run -> total,
// ns_join_fetch -> copy out, ns_join_free.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct JoinResult {
    // per-read candidate lists, concatenated in read order
    std::vector<int64_t> q, r, cnt;
    // recall observability (round-3 verdict ask #6 — the reference keeps
    // every match, src/ReadFilter.cpp:65-83; our cap must not be silent):
    int64_t dropped_buckets = 0;   // buckets skipped as > max_bucket
    int64_t dropped_entries = 0;   // candidate entries those buckets held
    int64_t capped_reads = 0;      // query reads with >= 1 dropped bucket
};

}  // namespace

extern "C" {

// sketches: (N, n) uint32 row-major. EMPTY_SLOT (0xFFFFFFFF) never matches.
// Returns handle; *out_total = number of (q, r) pairs.
void* ns_join_run(
    const uint32_t* sketches, int64_t N, int32_t n,
    int32_t threshold, int32_t max_bucket,
    int64_t* out_total)
{
    const uint32_t EMPTY = 0xFFFFFFFFu;
    // per-slot sorted ids, plus each read's own bucket extent. A query
    // read's sketch value is by definition IN the sorted slot array, so
    // its bucket is the value-run around its own sorted position —
    // scattering (run start, run end) per (read, slot) during the sort
    // turns the query phase's 2 binary searches per (read, slot) (~20M
    // cache-missing probes on the 60 Mb bench, ~0.5 s) into two array
    // reads, at 12 B/entry of index (ids + blo + bhi).
    std::vector<std::vector<uint32_t>> ids((size_t)n);
    std::vector<int32_t> blo((size_t)(N * n)), bhi((size_t)(N * n));
    #pragma omp parallel for schedule(dynamic, 1)
    for (int32_t j = 0; j < n; ++j) {
        std::vector<uint64_t> keyed((size_t)N);   // value<<32 | id: stable
        for (int64_t i = 0; i < N; ++i)
            keyed[(size_t)i] =
                ((uint64_t)sketches[(size_t)i * n + j] << 32) | (uint64_t)i;
        std::sort(keyed.begin(), keyed.end());
        ids[j].resize((size_t)N);
        for (int64_t i = 0; i < N; ++i)
            ids[j][(size_t)i] = (uint32_t)keyed[(size_t)i];
        int64_t s = 0;
        while (s < N) {
            const uint64_t v = keyed[(size_t)s] >> 32;
            int64_t e = s + 1;
            while (e < N && (keyed[(size_t)e] >> 32) == v) ++e;
            for (int64_t i = s; i < e; ++i) {
                const uint32_t id = (uint32_t)keyed[(size_t)i];
                blo[(size_t)id * n + j] = (int32_t)s;
                bhi[(size_t)id * n + j] = (int32_t)e;
            }
            s = e;
        }
    }

    JoinResult* res = new JoinResult();
    int nthreads = 1;
#ifdef _OPENMP
    nthreads = omp_get_max_threads();
#endif
    std::vector<JoinResult> parts((size_t)nthreads);
    std::vector<std::vector<int64_t>> part_off((size_t)nthreads);
    // static partition of reads keeps output order reconstructible
    const int64_t chunk = (N + nthreads - 1) / nthreads;
    #pragma omp parallel num_threads(nthreads)
    {
        int tid = 0;
#ifdef _OPENMP
        tid = omp_get_thread_num();
#endif
        JoinResult& out = parts[(size_t)tid];
        std::vector<uint32_t> local;
        // count-array aggregation: gathered ids repeat up to n times, and
        // sorting the whole ~n*bucket gather per read was the query
        // phase's top cost; counting + sorting only the distinct ids
        // (~bucket-sized) keeps the output order identical
        std::vector<uint16_t> cnt16((size_t)N, 0);
        std::vector<uint32_t> touched;
        const int64_t qlo = (int64_t)tid * chunk;
        const int64_t qhi = std::min(N, qlo + chunk);
        for (int64_t qi = qlo; qi < qhi; ++qi) {
            local.clear();
            bool capped = false;
            for (int32_t j = 0; j < n; ++j) {
                const uint32_t v = sketches[(size_t)qi * n + j];
                if (v == EMPTY) continue;
                const int32_t lo = blo[(size_t)qi * n + j];
                const int32_t hi = bhi[(size_t)qi * n + j];
                const int64_t b = hi - lo;
                if (b > max_bucket) {
                    out.dropped_buckets += 1;
                    out.dropped_entries += b;
                    capped = true;
                    continue;
                }
                const uint32_t* I = ids[j].data() + lo;
                local.insert(local.end(), I, I + b);
            }
            if (capped) out.capped_reads += 1;
            if ((int64_t)local.size() < threshold) continue;
            touched.clear();
            for (uint32_t id : local) {
                if (cnt16[id]++ == 0) touched.push_back(id);
            }
            std::sort(touched.begin(), touched.end());
            for (uint32_t id : touched) {
                const int64_t c = cnt16[id];
                cnt16[id] = 0;
                if (c >= threshold && (int64_t)id != qi) {
                    out.q.push_back(qi);
                    out.r.push_back((int64_t)id);
                    out.cnt.push_back(c);
                }
            }
        }
    }
    JoinResult* all = res;
    for (JoinResult& p : parts) {
        all->q.insert(all->q.end(), p.q.begin(), p.q.end());
        all->r.insert(all->r.end(), p.r.begin(), p.r.end());
        all->cnt.insert(all->cnt.end(), p.cnt.begin(), p.cnt.end());
        all->dropped_buckets += p.dropped_buckets;
        all->dropped_entries += p.dropped_entries;
        all->capped_reads += p.capped_reads;
    }
    *out_total = (int64_t)all->q.size();
    return res;
}

void ns_join_fetch(void* handle, int64_t* q_out, int64_t* r_out,
                   int64_t* cnt_out)
{
    JoinResult* res = (JoinResult*)handle;
    std::memcpy(q_out, res->q.data(), res->q.size() * sizeof(int64_t));
    std::memcpy(r_out, res->r.data(), res->r.size() * sizeof(int64_t));
    std::memcpy(cnt_out, res->cnt.data(), res->cnt.size() * sizeof(int64_t));
}

void ns_join_free(void* handle) { delete (JoinResult*)handle; }

// Bucket-cap recall observability: [0] dropped buckets, [1] candidate
// entries inside them, [2] query reads touched by a drop.
void ns_join_stats(void* handle, int64_t* out3)
{
    JoinResult* res = (JoinResult*)handle;
    out3[0] = res->dropped_buckets;
    out3[1] = res->dropped_entries;
    out3[2] = res->capped_reads;
}

// Connected components of the candidate pair graph by union-find —
// replaces scipy.sparse.csgraph.connected_components in the hot path
// (~0.6 s of CSR build + BFS on the 60 Mb bench vs ~10 ms here). Labels
// are assigned in first-seen node order, same convention as scipy's, so
// downstream bincount/argsort bookkeeping is unchanged. Returns the
// component count.
int64_t ns_components(const int64_t* src, const int64_t* dst, int64_t E,
                      int64_t N, int64_t* comp_of)
{
    std::vector<int64_t> parent((size_t)N);
    for (int64_t i = 0; i < N; ++i) parent[(size_t)i] = i;
    auto find = [&](int64_t x) {
        int64_t r = x;
        while (parent[(size_t)r] != r) r = parent[(size_t)r];
        while (parent[(size_t)x] != r) {
            int64_t nx = parent[(size_t)x];
            parent[(size_t)x] = r;
            x = nx;
        }
        return r;
    };
    for (int64_t e = 0; e < E; ++e) {
        int64_t a = find(src[e]);
        int64_t b = find(dst[e]);
        if (a != b) parent[(size_t)(a < b ? b : a)] = a < b ? a : b;
    }
    int64_t n_comp = 0;
    for (int64_t i = 0; i < N; ++i) {
        const int64_t r = find(i);
        comp_of[i] = (r == i) ? n_comp++ : comp_of[r];
    }
    return n_comp;
}

}  // extern "C"
