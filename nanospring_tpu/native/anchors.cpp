// Anchor tables + diagonal-vote matching — the native seeding hot path.
//
// From-scratch equivalent of minimap2's seed matching + chain diagonal
// (reference: minimap2/sketch.c, minimap2/chain.c as used from
// src/ConsensusGraph.cpp:161-247). Tables are kept sorted-unique by hash
// (first occurrence = smallest position wins, matching np.unique
// return_index semantics in ops/minimizers.py::match_anchors), so the
// per-candidate match is a linear merge-join instead of re-sorting the
// parent table for every child.
//
// C ABI only (consumed via ctypes).

#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" {

// Stable-sort (h, p, f) by h and drop duplicate hashes (first occurrence
// in the original order wins). In-place; returns the new count.
int64_t ns_anchor_prepare(uint64_t* h, int64_t* p, uint8_t* f, int64_t n)
{
    if (n <= 1) return n;
    std::vector<int64_t> idx((size_t)n);
    std::iota(idx.begin(), idx.end(), 0);
    std::stable_sort(idx.begin(), idx.end(),
                     [&](int64_t a, int64_t b) { return h[a] < h[b]; });
    std::vector<uint64_t> th((size_t)n);
    std::vector<int64_t> tp((size_t)n);
    std::vector<uint8_t> tf((size_t)n);
    int64_t m = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t s = idx[(size_t)i];
        if (m > 0 && th[(size_t)m - 1] == h[s]) continue;
        th[(size_t)m] = h[s];
        tp[(size_t)m] = p[s];
        tf[(size_t)m] = f[s];
        ++m;
    }
    std::copy(th.begin(), th.begin() + m, h);
    std::copy(tp.begin(), tp.begin() + m, p);
    std::copy(tf.begin(), tf.begin() + m, f);
    return m;
}

// Diagonal-vote match of read b against anchor table a (both sorted
// unique), plus the matched-anchor chain for the stitched aligner.
// Returns 1 and fills (is_rc, d0, votes) when anchors matched, 0
// otherwise. Vote semantics identical to ops/minimizers.py::match_anchors:
// evenly subsample to max_anchors, majority strand, median diagonal
// (even count: mean of middle two, truncated toward zero).
//
// When cap > 0, additionally writes up to cap majority-strand matches as
// (aq_out = b-oriented query pos, at_out = a's target pos), sorted by
// query pos (evenly subsampled with endpoints pinned if there are more
// than cap); *n_anchors_out receives the count. These are the pinning
// points ns_stitch_align verifies between (the role of minimap2's chain
// seeds feeding mm_align_skeleton's between-anchor extension,
// minimap2/align.c:864).
// Vote + chain over an explicit match list (mpa = target pos, mpb =
// b-forward pos, mrc = strand mismatch). Shared by the merge-join entry
// point below and the engine's contig-wide anchor map.
int32_t ns_anchor_vote_chain(
    const int64_t* mpa_in, const int64_t* mpb_in, const uint8_t* mrc_in,
    int64_t c,
    int64_t len_b, int32_t k, int32_t max_anchors,
    int32_t* is_rc_out, int64_t* d0_out, int64_t* votes_out,
    int64_t* aq_out, int64_t* at_out, int64_t cap, int64_t* n_anchors_out)
{
    if (n_anchors_out) *n_anchors_out = 0;
    const int64_t* mpa = mpa_in;
    const int64_t* mpb = mpb_in;
    const uint8_t* mrc = mrc_in;
    if (c == 0) return 0;
    std::vector<int64_t> sel;
    if (c > max_anchors) {
        // np.linspace(0, c-1, max_anchors).astype(int64): step computed
        // once, then multiplied (reproduces numpy's rounding exactly);
        // the endpoint is pinned to c-1 like linspace's endpoint=True.
        sel.resize((size_t)max_anchors);
        const double step = (double)(c - 1) / (double)(max_anchors - 1);
        for (int32_t s = 0; s < max_anchors; ++s)
            sel[(size_t)s] = (int64_t)((double)s * step);
        sel[(size_t)max_anchors - 1] = c - 1;
    } else {
        sel.resize((size_t)c);
        std::iota(sel.begin(), sel.end(), 0);
    }
    int64_t n_rc = 0;
    for (int64_t s : sel) n_rc += mrc[(size_t)s];
    const bool rc = n_rc * 2 > (int64_t)sel.size();
    std::vector<int64_t> diag;
    diag.reserve(sel.size());
    for (int64_t s : sel) {
        if ((bool)mrc[(size_t)s] != rc) continue;
        if (rc)
            diag.push_back(mpa[(size_t)s] - (len_b - k - mpb[(size_t)s]));
        else
            diag.push_back(mpa[(size_t)s] - mpb[(size_t)s]);
    }
    if (diag.empty()) return 0;
    std::sort(diag.begin(), diag.end());
    const size_t nd = diag.size();
    int64_t med;
    if (nd % 2 == 1) {
        med = diag[nd / 2];
    } else {
        const double m2 = ((double)diag[nd / 2 - 1] + (double)diag[nd / 2]) / 2.0;
        med = (int64_t)m2;  // trunc toward zero, as Python int(np.median(...))
    }
    *is_rc_out = rc ? 1 : 0;
    *d0_out = med;
    *votes_out = (int64_t)diag.size();

    if (cap > 0 && aq_out && at_out && n_anchors_out) {
        // full majority-strand match list in oriented query coords.
        // Sorted as contiguous pairs (lexicographic == the previous
        // (cq, ct) index sort, with in-cache compares instead of
        // double-indirect lambda loads)
        std::vector<std::pair<int64_t, int64_t>> cqt;
        cqt.reserve((size_t)c);
        for (int64_t x = 0; x < c; ++x) {
            if ((bool)mrc[(size_t)x] != rc) continue;
            const int64_t qp =
                rc ? (len_b - k - mpb[(size_t)x]) : mpb[(size_t)x];
            cqt.emplace_back(qp, mpa[(size_t)x]);
        }
        const int64_t nc = (int64_t)cqt.size();
        std::sort(cqt.begin(), cqt.end());
        int64_t m = 0;
        if (nc <= cap) {
            for (int64_t x = 0; x < nc; ++x) {
                aq_out[m] = cqt[(size_t)x].first;
                at_out[m] = cqt[(size_t)x].second;
                ++m;
            }
        } else {
            const double step = (double)(nc - 1) / (double)(cap - 1);
            for (int64_t s = 0; s < cap; ++s) {
                int64_t x = (s == cap - 1) ? nc - 1
                                           : (int64_t)((double)s * step);
                aq_out[m] = cqt[(size_t)x].first;
                at_out[m] = cqt[(size_t)x].second;
                ++m;
            }
        }
        *n_anchors_out = m;
    }
    return 1;
}

// Merge-join of two sorted-unique tables feeding the vote+chain.
int32_t ns_anchor_join_chain(
    const uint64_t* ha, const int64_t* pa, const uint8_t* fa, int64_t na,
    const uint64_t* hb, const int64_t* pb, const uint8_t* fb, int64_t nb,
    int64_t len_b, int32_t k, int32_t max_anchors,
    int32_t* is_rc_out, int64_t* d0_out, int64_t* votes_out,
    int64_t* aq_out, int64_t* at_out, int64_t cap, int64_t* n_anchors_out)
{
    std::vector<int64_t> mpa, mpb;
    std::vector<uint8_t> mrc;
    int64_t i = 0, j = 0;
    while (i < na && j < nb) {
        if (ha[i] < hb[j]) ++i;
        else if (ha[i] > hb[j]) ++j;
        else {
            mpa.push_back(pa[i]);
            mpb.push_back(pb[j]);
            mrc.push_back((uint8_t)(fa[i] != fb[j]));
            ++i;
            ++j;
        }
    }
    return ns_anchor_vote_chain(
        mpa.data(), mpb.data(), mrc.data(), (int64_t)mpa.size(),
        len_b, k, max_anchors, is_rc_out, d0_out, votes_out,
        aq_out, at_out, cap, n_anchors_out);
}

// Back-compat vote-only entry point (tests, Python oracle).
int32_t ns_anchor_join(
    const uint64_t* ha, const int64_t* pa, const uint8_t* fa, int64_t na,
    const uint64_t* hb, const int64_t* pb, const uint8_t* fb, int64_t nb,
    int64_t len_b, int32_t k, int32_t max_anchors,
    int32_t* is_rc_out, int64_t* d0_out, int64_t* votes_out)
{
    return ns_anchor_join_chain(ha, pa, fa, na, hb, pb, fb, nb, len_b, k,
                                max_anchors, is_rc_out, d0_out, votes_out,
                                nullptr, nullptr, 0, nullptr);
}

// Build an accepted member's anchor table from its (sorted-unique) forward
// minimizers and the alignment's op tape. One pass over ops builds the
// qpos->op and qpos->target maps; anchors inside insertion runs are
// dropped (they have no target position). Hash order is preserved, so
// the output table stays sorted-unique. Returns the output count.
// Mirrors _ContigState.accept + qpos_to_tpos_map (pipeline/contigs.py).
int64_t ns_accept_anchors(
    const uint8_t* ops, int64_t ops_len, int64_t tstart_abs,
    int64_t mlen, int32_t is_rc, int32_t k,
    const uint64_t* h, const int64_t* p, const uint8_t* f, int64_t n,
    uint64_t* oh, int64_t* otp, uint8_t* of)
{
    if (mlen <= 0) return 0;
    // Compressed qpos->(op, tpos) map: one segment per run of query-
    // consuming ops (tapes are ~97% '=' runs, and only ~anchor-count
    // positions are probed, so per-base arrays were mostly wasted fills).
    struct Seg { int64_t q0, t0; uint8_t op; };
    std::vector<Seg> segs;
    segs.reserve(64);
    std::vector<int64_t> seg_q;
    {
        // coalesce by CLASS, not exact op: '=' and 's' both consume one
        // query and one target base, so a 30-match/1-sub/40-match stretch
        // is ONE diagonal segment for the qpos->tpos map (10x fewer segs
        // than per-op coalescing on ~3%-error tapes)
        auto cls = [](uint8_t o) -> int {
            return o == 'i' ? 1 : (o == 'd' ? 2 : 0);
        };
        int64_t tcur = tstart_abs, q = 0, x = 0;
        while (x < ops_len && q < mlen) {
            const int c = cls(ops[x]);
            int64_t run = 1;
            while (x + run < ops_len && cls(ops[x + run]) == c) ++run;
            if (c == 2) {
                tcur += run;
            } else {
                segs.push_back({q, tcur, (uint8_t)(c == 1 ? 'i' : '=')});
                q += run;
                if (c != 1) tcur += run;
            }
            x += run;
        }
        seg_q.reserve(segs.size() + 1);
        for (const Seg& s : segs) seg_q.push_back(s.q0);
        seg_q.push_back(q);   // end sentinel
    }
    int64_t m = 0;
    for (int64_t a = 0; a < n; ++a) {
        int64_t pos = is_rc ? (mlen - k) - p[a] : p[a];
        if (pos < 0) pos = 0;
        if (pos > mlen - 1) pos = mlen - 1;
        // last segment with q0 <= pos
        const auto it = std::upper_bound(seg_q.begin(), seg_q.end() - 1, pos);
        const int64_t si = (int64_t)(it - seg_q.begin()) - 1;
        if (si < 0) continue;                        // before first segment
        if (pos >= seg_q[(size_t)si + 1]) continue;  // past the tape
        const Seg& s = segs[(size_t)si];
        if (s.op == 'i') continue;
        oh[m] = h[a];
        otp[m] = s.t0 + (pos - s.q0);
        of[m] = is_rc ? (uint8_t)(!f[a]) : f[a];
        ++m;
    }
    return m;
}

}  // extern "C"
