// Consensus polish: column-vote substitution + indel rewrite, batched over
// contigs (OpenMP across contigs; each contig sequential).
//
// Native port of pipeline/contigs.py::_polish_contig/_polish_indels — the
// mechanical op-tape rewrites standing in for the reference's weighted
// heaviest-path recompute (reference: src/ConsensusGraph.cpp:559-615
// calculateMainPathGreedy). The Python versions remain the oracle; this
// must match them bit-for-bit (tests/test_native_polish.py).
//
// Pass order per contig: substitutions -> deletions -> insertions ->
// substitutions (the second sub pass settles columns whose votes shifted
// when indel columns moved).
//
// C ABI only (consumed via ctypes). Result lifetime is managed with an
// opaque handle: ns_polish_batch -> sizes, ns_polish_fetch -> copy out,
// ns_polish_free.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#include "polish_core.h"

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {
inline bool in_parallel() {
#ifdef _OPENMP
    return omp_in_parallel() != 0;
#else
    return true;
#endif
}
// inner parallelism pays off only for contigs with many members AND when
// not already inside the outer per-contig parallel loop
inline bool want_inner(size_t n_members) {
    return n_members >= 2048 && !in_parallel();
}
}  // namespace

namespace {

// first index >= x whose byte is not '=' (tapes are ~97% '=', so every
// pass that walks them skips runs in 8-byte blocks)
inline int64_t skip_eq(const uint8_t* p, int64_t x, int64_t n) {
    constexpr uint64_t EQ8 = 0x3D3D3D3D3D3D3D3DULL;  // '=' x8
    while (x + 8 <= n) {
        uint64_t v;
        std::memcpy(&v, p + x, 8);
        const uint64_t diff = v ^ EQ8;
        if (diff) return x + (int64_t)(__builtin_ctzll(diff) >> 3);
        x += 8;
    }
    while (x < n && p[x] == '=') ++x;
    return x;
}

using nsp::Member;

struct ContigResult {
    std::vector<uint8_t> cons;
    std::vector<std::vector<uint8_t>> ops;
    std::vector<int64_t> tstart;
};

struct BatchResult {
    std::vector<ContigResult> contigs;
};

using nsp::polish_subs;
using nsp::polish_indels;

// one contig: load -> subs -> indels -> subs -> store
void polish_one(int64_t c,
                const uint8_t* cons_flat, const int64_t* cons_off,
                const int64_t* cons_len,
                const uint8_t* ops_flat, const int64_t* ops_off,
                const int64_t* ops_len, const int64_t* tstart_rel,
                const int64_t* m_off, const int64_t* m_cnt,
                const uint8_t* codes_flat, const int64_t* codes_off,
                BatchResult* res)
{
    std::vector<uint8_t> cons(cons_flat + cons_off[c],
                              cons_flat + cons_off[c] + cons_len[c]);
    std::vector<Member> ms((size_t)m_cnt[c]);
    for (int64_t k = 0; k < m_cnt[c]; ++k) {
        const int64_t m = m_off[c] + k;
        ms[k].ops.assign(ops_flat + ops_off[m],
                         ops_flat + ops_off[m] + ops_len[m]);
        ms[k].tstart = tstart_rel[m];
        ms[k].codes = codes_flat + codes_off[m];
    }
    polish_subs(cons, ms);
    polish_indels(cons, ms);
    polish_subs(cons, ms);
    ContigResult& out = res->contigs[(size_t)c];
    out.cons.swap(cons);
    out.ops.resize(ms.size());
    out.tstart.resize(ms.size());
    for (size_t k = 0; k < ms.size(); ++k) {
        out.ops[k].swap(ms[k].ops);
        out.tstart[k] = ms[k].tstart;
    }
}

// one pass of majority-vote substitution polish; mutates cons + member ops.
// Votes: '=' ops vote the current consensus base by definition (tapes are
// rewritten against the live consensus, so the invariant holds), so '='
// runs become a coverage difference array and only the sparse 's' ops are
// voted individually. The rewrite touches only changed columns.
}  // namespace

void nsp::polish_subs(std::vector<uint8_t>& cons, std::vector<Member>& ms) {
    if (ms.size() < 3) return;
    const int64_t L = (int64_t)cons.size();
    if (L == 0) return;
    std::vector<int64_t> eqd((size_t)L + 2, 0);     // '='-coverage diff
    std::vector<int32_t> votes((size_t)L * 4, 0);   // 's' votes by code

    auto scan_member = [&](Member& m, int64_t* eqd_l, int32_t* votes_l) {
        const uint8_t* ops = m.ops.data();
        const int64_t n = (int64_t)m.ops.size();
        int64_t x = 0, tcol = m.tstart, qpos = 0;
        while (x < n) {
            const int64_t x2 = skip_eq(ops, x, n);
            const int64_t run = x2 - x;
            if (run) {
                const int64_t lo = tcol > 0 ? tcol : 0;
                const int64_t hi = tcol + run < L ? tcol + run : L;
                if (hi > lo) { ++eqd_l[lo]; --eqd_l[hi]; }
                tcol += run;
                qpos += run;
                x = x2;
                if (x >= n) break;
            }
            const uint8_t o = ops[x];
            if (o == 's') {
                if (tcol >= 0 && tcol < L)
                    ++votes_l[tcol * 4 + (m.codes[qpos] & 3)];
                ++tcol;
                ++qpos;
            } else if (o == 'd') {
                ++tcol;
            } else {  // 'i'
                ++qpos;
            }
            ++x;
        }
        m.tend = tcol;
    };

    if (want_inner(ms.size())) {
        #pragma omp parallel
        {
            std::vector<int64_t> eql((size_t)L + 2, 0);
            std::vector<int32_t> vl((size_t)L * 4, 0);
            #pragma omp for schedule(dynamic, 64) nowait
            for (int64_t mi = 0; mi < (int64_t)ms.size(); ++mi)
                scan_member(ms[(size_t)mi], eql.data(), vl.data());
            #pragma omp critical
            {
                for (size_t i = 0; i < eqd.size(); ++i) eqd[i] += eql[i];
                for (size_t i = 0; i < votes.size(); ++i) votes[i] += vl[i];
            }
        }
    } else {
        for (Member& m : ms) scan_member(m, eqd.data(), votes.data());
    }
    // eq coverage -> votes for the current consensus base
    {
        int64_t acc = 0;
        for (int64_t c = 0; c < L; ++c) {
            acc += eqd[(size_t)c];
            votes[(size_t)c * 4 + cons[(size_t)c]] += (int32_t)acc;
        }
    }
    // changed columns
    std::vector<int64_t> ch;
    std::vector<uint8_t> newbase;
    for (int64_t c = 0; c < L; ++c) {
        const int32_t* v = votes.data() + (size_t)c * 4;
        int best = 0;
        for (int b = 1; b < 4; ++b)
            if (v[b] > v[best]) best = b;     // tie keeps lowest index
        if (v[best] > v[cons[(size_t)c]] && (uint8_t)best != cons[(size_t)c]) {
            ch.push_back(c);
            newbase.push_back((uint8_t)best);
        }
    }
    if (ch.empty()) return;
    std::vector<uint8_t> oldc(ch.size());
    for (size_t i = 0; i < ch.size(); ++i) {
        oldc[i] = cons[(size_t)ch[i]];
        cons[(size_t)ch[i]] = newbase[i];
    }
    // targeted rewrite: only members covering a changed column, and only
    // the ops at changed columns ('=' at c -> 's'; 's' at c with code ==
    // new base -> '='; 'd'/'i' untouched — identical to the full rewrite)
    #pragma omp parallel for schedule(dynamic, 64) if (want_inner(ms.size()))
    for (int64_t mi = 0; mi < (int64_t)ms.size(); ++mi) {
        Member& m = ms[(size_t)mi];
        // first changed column >= tstart
        size_t ci = (size_t)(std::lower_bound(ch.begin(), ch.end(), m.tstart)
                             - ch.begin());
        if (ci >= ch.size() || ch[ci] >= m.tend) continue;
        uint8_t* ops = m.ops.data();
        const int64_t n = (int64_t)m.ops.size();
        int64_t x = 0, tcol = m.tstart, qpos = 0;
        while (x < n && ci < ch.size()) {
            const int64_t x2 = skip_eq(ops, x, n);
            const int64_t run = x2 - x;
            if (run) {
                // flip '='s at changed columns inside this run
                while (ci < ch.size() && ch[ci] < tcol + run) {
                    if (ch[ci] >= tcol) ops[x + (ch[ci] - tcol)] = 's';
                    ++ci;
                }
                tcol += run;
                qpos += run;
                x = x2;
                if (x >= n) break;
            }
            const uint8_t o = ops[x];
            if (o == 's') {
                if (ci < ch.size() && tcol == ch[ci]) {
                    if (m.codes[qpos] == cons[(size_t)tcol]) ops[x] = '=';
                    ++ci;
                }
                ++tcol;
                ++qpos;
            } else if (o == 'd') {
                if (ci < ch.size() && tcol == ch[ci]) ++ci;
                ++tcol;
            } else {
                ++qpos;
            }
            ++x;
        }
    }
}

// deletion + insertion column polish; mutates cons, ops, tstart
void nsp::polish_indels(std::vector<uint8_t>& cons, std::vector<Member>& ms) {
    if (ms.size() < 3) return;

    // --- deletions --------------------------------------------------------
    {
        const int64_t L = (int64_t)cons.size();
        if (L == 0) return;
        std::vector<int64_t> del_votes(L, 0), base_votes(L, 0);
        std::vector<int64_t> bdiff((size_t)L + 2, 0);
        for (const Member& m : ms) {
            // '=' runs vote base coverage via a difference array; only the
            // sparse edits are visited individually (skip_eq)
            const uint8_t* ops = m.ops.data();
            const int64_t n = (int64_t)m.ops.size();
            int64_t x = 0, tcol = m.tstart;
            while (x < n) {
                const int64_t x2 = skip_eq(ops, x, n);
                const int64_t run = x2 - x;
                if (run) {
                    const int64_t lo = tcol > 0 ? tcol : 0;
                    const int64_t hi = tcol + run < L ? tcol + run : L;
                    if (hi > lo) { ++bdiff[lo]; --bdiff[hi]; }
                    tcol += run;
                    x = x2;
                    if (x >= n) break;
                }
                const uint8_t o = ops[x];
                if (o != 'i') {
                    if (tcol >= 0 && tcol < L) {
                        if (o == 'd') ++del_votes[tcol];
                        else ++base_votes[tcol];
                    }
                    ++tcol;
                }
                ++x;
            }
        }
        {
            int64_t acc = 0;
            for (int64_t c = 0; c < L; ++c) {
                acc += bdiff[(size_t)c];
                base_votes[(size_t)c] += acc;
            }
        }
        std::vector<uint8_t> delmask(L, 0);
        bool any = false;
        for (int64_t c = 0; c < L; ++c)
            if (del_votes[c] > base_votes[c]) { delmask[c] = 1; any = true; }
        if (any) {
            std::vector<int64_t> ndel_before(L, 0);
            for (int64_t c = 1; c < L; ++c)
                ndel_before[c] = ndel_before[c - 1] + delmask[c - 1];
            #pragma omp parallel for schedule(dynamic, 64) \
                if (want_inner(ms.size()))
            for (int64_t mi = 0; mi < (int64_t)ms.size(); ++mi) {
                Member& m = ms[(size_t)mi];
                std::vector<uint8_t> out;
                out.reserve(m.ops.size());
                int64_t tcol = m.tstart;
                for (uint8_t o : m.ops) {
                    const bool consumes_t = (o != 'i');
                    // at a deleted column: 'd' ops vanish, base ops keep
                    // their base as an insertion
                    const bool at_del =
                        consumes_t && tcol >= 0 && tcol < L && delmask[tcol];
                    if (at_del) {
                        if (o != 'd') out.push_back('i');
                    } else {
                        out.push_back(o);
                    }
                    if (consumes_t) ++tcol;
                }
                m.ops.swap(out);
                int64_t ts = m.tstart;
                int64_t idx = ts < L - 1 ? ts : L - 1;
                if (idx < 0) idx = 0;
                m.tstart = ts - ndel_before[idx];
            }
            std::vector<uint8_t> nc;
            nc.reserve(cons.size());
            for (int64_t c = 0; c < L; ++c)
                if (!delmask[c]) nc.push_back(cons[c]);
            cons.swap(nc);
        }
    }

    // --- insertions -------------------------------------------------------
    {
        const int64_t L = (int64_t)cons.size();
        std::vector<int64_t> iv((size_t)(L + 1) * 4, 0);
        std::vector<int64_t> cov(L + 3, 0);
        for (const Member& m : ms) {
            const int64_t n = (int64_t)m.ops.size();
            // first/last target-consuming ops ('=' counts, so any '=' run
            // bounds them; only all-'i' prefixes/suffixes need scanning)
            int64_t first_c = -1, last_c = -1;
            for (int64_t x = 0; x < n; ++x)
                if (m.ops[x] != 'i') { first_c = x; break; }
            if (first_c < 0) continue;
            for (int64_t x = n - 1; x >= 0; --x)
                if (m.ops[x] != 'i') { last_c = x; break; }
            const uint8_t* ops = m.ops.data();
            int64_t tcol = m.tstart, qpos = 0;
            int64_t ts_rel = -1, te_rel = -1;
            int64_t prev_gap = -1;
            bool prev_was_i = false;
            int64_t x = 0;
            while (x < n) {
                const int64_t x2 = skip_eq(ops, x, n);
                if (x2 > x) {   // '=' run: consumes both, breaks 'i' runs
                    if (first_c >= x && first_c < x2)
                        ts_rel = tcol + (first_c - x);
                    if (last_c >= x && last_c < x2)
                        te_rel = tcol + (last_c - x) + 1;
                    tcol += x2 - x;
                    qpos += x2 - x;
                    prev_was_i = false;
                    x = x2;
                    if (x >= n) break;
                }
                const uint8_t o = ops[x];
                if (x == first_c) ts_rel = tcol;
                if (x == last_c) te_rel = tcol + 1;
                if (o == 'i' && x > first_c && x < last_c) {
                    if (!(prev_was_i && prev_gap == tcol)) {
                        if (tcol >= 0 && tcol <= L)
                            ++iv[(size_t)tcol * 4 + (m.codes[qpos] & 3)];
                    }
                    prev_was_i = true;
                    prev_gap = tcol;
                } else {
                    prev_was_i = false;
                }
                if (o != 'i') ++tcol;
                if (o != 'd') ++qpos;
                ++x;
            }
            int64_t a = ts_rel + 1;
            int64_t b = te_rel > a ? te_rel : a;
            if (a >= 0 && a < (int64_t)cov.size()) ++cov[a];
            if (b >= 0 && b < (int64_t)cov.size()) --cov[b];
        }
        for (size_t i = 1; i < cov.size(); ++i) cov[i] += cov[i - 1];

        std::vector<uint8_t> insmask(L + 1, 0), gap_newbase(L + 1, 255);
        int64_t nins = 0;
        for (int64_t g = 0; g <= L; ++g) {
            const int64_t* v = iv.data() + (size_t)g * 4;
            int best = 0;
            for (int b = 1; b < 4; ++b)
                if (v[b] > v[best]) best = b;
            const int64_t denom = cov[g] > 1 ? cov[g] : 1;
            if (v[best] * 2 > denom) {
                insmask[g] = 1;
                gap_newbase[g] = (uint8_t)best;
                ++nins;
            }
        }
        if (nins == 0) return;
        std::vector<int64_t> nins_leq(L + 1, 0);  // inserted gaps index <= c
        {
            int64_t acc = 0;
            for (int64_t g = 0; g <= L; ++g) {
                acc += insmask[g];
                nins_leq[g] = acc;
            }
        }
        // Member rewrite. ALL geometry (first_c/last_c, ts_rel/te_rel, gap
        // columns, 'd' insertion positions) comes from the PRE-flip tape —
        // the oracle builds its tapes once, flips 'i'->'=' as a positional
        // overlay, and inserts 'd' at indices computed against the
        // original consumes_t (pipeline/contigs.py::_polish_indels).
        #pragma omp parallel for schedule(dynamic, 64) if (want_inner(ms.size()))
        for (int64_t mi = 0; mi < (int64_t)ms.size(); ++mi) {
            Member& m = ms[(size_t)mi];
            const int64_t n = (int64_t)m.ops.size();
            int64_t first_c = -1, last_c = -1;
            for (int64_t x = 0; x < n; ++x)
                if (m.ops[x] != 'i') {
                    if (first_c < 0) first_c = x;
                    last_c = x;
                }
            if (first_c < 0) continue;  // no consuming ops: unchanged
            // matched inserted-gap columns, ascending (tape order); a
            // per-member L-sized bitmap here cost gigabytes of memset on
            // big contigs
            std::vector<int64_t> matched_gaps;
            std::vector<uint8_t> flip(n, 0);
            int64_t ts_rel = -1, te_rel = -1;
            {
                int64_t tcol = m.tstart, qpos = 0;
                int64_t prev_gap = -1;
                bool prev_was_i = false;
                for (int64_t x = 0; x < n; ++x) {
                    const uint8_t o = m.ops[x];
                    if (x == first_c) ts_rel = tcol;
                    if (x == last_c) te_rel = tcol + 1;
                    if (o == 'i' && x > first_c && x < last_c) {
                        const bool first_of_run =
                            !(prev_was_i && prev_gap == tcol);
                        if (first_of_run && tcol >= 0 && tcol <= L &&
                            insmask[tcol] &&
                            m.codes[qpos] == gap_newbase[tcol]) {
                            flip[x] = 1;
                            matched_gaps.push_back(tcol);
                        }
                        prev_was_i = true;
                        prev_gap = tcol;
                    } else {
                        prev_was_i = false;
                    }
                    if (o != 'i') ++tcol;
                    if (o != 'd') ++qpos;
                }
            }
            // emit: before each pre-flip consuming op at column g, a 'd'
            // for a needed (spanning, unmatched) inserted gap g
            std::vector<uint8_t> out;
            out.reserve((size_t)n + (size_t)nins);
            {
                int64_t col = m.tstart;
                size_t mg = 0;
                const size_t mg_end = matched_gaps.size();
                for (int64_t x = 0; x < n; ++x) {
                    const uint8_t o = m.ops[x];
                    if (o != 'i') {
                        while (mg < mg_end && matched_gaps[mg] < col) ++mg;
                        const bool is_matched =
                            mg < mg_end && matched_gaps[mg] == col;
                        if (col > ts_rel && col < te_rel &&
                            col >= 0 && col <= L && insmask[col] &&
                            !is_matched)
                            out.push_back('d');
                        out.push_back(o);
                        ++col;
                    } else {
                        out.push_back(flip[x] ? '=' : 'i');
                    }
                }
            }
            m.ops.swap(out);
            const int64_t idx = ts_rel < 0 ? 0 : (ts_rel > L ? L : ts_rel);
            m.tstart = ts_rel + nins_leq[idx];
        }
        // grow the consensus
        std::vector<uint8_t> nc;
        nc.reserve(cons.size() + (size_t)nins);
        for (int64_t c = 0; c <= L; ++c) {
            if (insmask[c]) nc.push_back(gap_newbase[c]);
            if (c < L) nc.push_back(cons[c]);
        }
        cons.swap(nc);
    }
}

extern "C" {

// Unpack member reads (ragged) into a flat oriented codes buffer.
// rids/strand per member; out_off = exclusive cumsum of lengths[rids].
void ns_unpack_oriented(
    const uint8_t* packed, const int64_t* offsets, const int64_t* lengths,
    const int64_t* rids, const uint8_t* strand, int64_t M,
    const int64_t* out_off, uint8_t* out)
{
    #pragma omp parallel for schedule(dynamic, 64)
    for (int64_t m = 0; m < M; ++m) {
        const int64_t rid = rids[m];
        const int64_t len = lengths[rid];
        const uint8_t* src = packed + offsets[rid];
        uint8_t* dst = out + out_off[m];
        if (!strand[m]) {
            for (int64_t p = 0; p < len; ++p)
                dst[p] = (src[p / 4] >> (2 * (p % 4))) & 3;
        } else {
            for (int64_t p = 0; p < len; ++p)
                dst[len - 1 - p] = 3 - ((src[p / 4] >> (2 * (p % 4))) & 3);
        }
    }
}

// Polish a batch of contigs. Members are grouped per contig:
// members of contig c are [m_off[c], m_off[c] + m_cnt[c]).
// Returns an opaque handle; out_cons_total / out_ops_total receive the
// concatenated output sizes for fetch-buffer allocation.
void* ns_polish_batch(
    const uint8_t* cons_flat, const int64_t* cons_off, const int64_t* cons_len,
    int64_t C,
    const uint8_t* ops_flat, const int64_t* ops_off, const int64_t* ops_len,
    const int64_t* tstart_rel,
    const int64_t* m_off, const int64_t* m_cnt,
    const uint8_t* codes_flat, const int64_t* codes_off,
    int64_t* out_cons_total, int64_t* out_ops_total)
{
    BatchResult* res = new BatchResult();
    res->contigs.resize((size_t)C);
    // longest-processing-time order; contigs big enough for inner (per-
    // member) parallelism run one at a time OUTSIDE the contig-parallel
    // loop, so one giant contig can't serialize the whole batch
    std::vector<int64_t> order((size_t)C);
    for (int64_t i = 0; i < C; ++i) order[(size_t)i] = i;
    std::sort(order.begin(), order.end(),
              [&](int64_t a, int64_t b) { return m_cnt[a] > m_cnt[b]; });
    int64_t n_big = 0;
    while (n_big < C && m_cnt[order[(size_t)n_big]] >= 2048) ++n_big;
    for (int64_t ci = 0; ci < n_big; ++ci)
        polish_one(order[(size_t)ci], cons_flat, cons_off, cons_len,
                   ops_flat, ops_off, ops_len, tstart_rel, m_off, m_cnt,
                   codes_flat, codes_off, res);
    #pragma omp parallel for schedule(dynamic, 1)
    for (int64_t ci = n_big; ci < C; ++ci)
        polish_one(order[(size_t)ci], cons_flat, cons_off, cons_len,
                   ops_flat, ops_off, ops_len, tstart_rel, m_off, m_cnt,
                   codes_flat, codes_off, res);
    int64_t ct = 0, ot = 0;
    for (const ContigResult& r : res->contigs) {
        ct += (int64_t)r.cons.size();
        for (const auto& o : r.ops) ot += (int64_t)o.size();
    }
    *out_cons_total = ct;
    *out_ops_total = ot;
    return res;
}

// Copy results out. cons_flat_out must hold out_cons_total bytes,
// ops_flat_out out_ops_total; cons_len_out has C entries, ops_len_out and
// tstart_out have M entries (member order preserved).
void ns_polish_fetch(void* handle,
                     uint8_t* cons_flat_out, int64_t* cons_len_out,
                     uint8_t* ops_flat_out, int64_t* ops_len_out,
                     int64_t* tstart_out)
{
    BatchResult* res = (BatchResult*)handle;
    int64_t co = 0, oo = 0, mi = 0;
    int64_t ci = 0;
    for (const ContigResult& r : res->contigs) {
        std::memcpy(cons_flat_out + co, r.cons.data(), r.cons.size());
        co += (int64_t)r.cons.size();
        cons_len_out[ci++] = (int64_t)r.cons.size();
        for (size_t k = 0; k < r.ops.size(); ++k) {
            std::memcpy(ops_flat_out + oo, r.ops[k].data(), r.ops[k].size());
            oo += (int64_t)r.ops[k].size();
            ops_len_out[mi] = (int64_t)r.ops[k].size();
            tstart_out[mi] = r.tstart[k];
            ++mi;
        }
    }
}

void ns_polish_free(void* handle) { delete (BatchResult*)handle; }

}  // extern "C"
