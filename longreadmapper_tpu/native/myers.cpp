// Myers bit-parallel edit distance (multi-block), all three edlib modes —
// the framework's equivalent of the reference's vendored-but-unlinked edlib
// fallback aligner (/root/reference/edlib/edlib.h:26-55: modes NW global /
// SHW prefix / HW infix, task DISTANCE+LOC).  Alignment PATH for a located
// pair is produced by the banded aligner (align.cpp) instead of edlib's
// Hirschberg path — same CIGAR alphabet, documented divergence.
//
// Implementation: the block recurrence of Hyyro's "A Bit-Vector Algorithm
// for Computing Levenshtein and Damerau Edit Distances" (2003) / Myers
// (JACM 1999), word size 64, no banding (the reference uses it only for
// rescoring small pairs).
//
// Exported C ABI (ctypes, native/__init__.py):
//   lrm_myers_distance(q, m, t, n, mode, out2) -> 0
//     mode: 0 = NW, 1 = SHW, 2 = HW
//     out2 = {distance, end_pos}  (end_pos = 1-based target end; n for NW)

#include <cstdint>
#include <vector>

namespace {

inline int advance_block(uint64_t Eq, uint64_t &Pv, uint64_t &Mv, int hin,
                         uint64_t hibit) {
    uint64_t Xv = Eq | Mv;
    if (hin < 0) Eq |= 1ULL;
    uint64_t Xh = (((Eq & Pv) + Pv) ^ Pv) | Eq;
    uint64_t Ph = Mv | ~(Xh | Pv);
    uint64_t Mh = Pv & Xh;
    int hout = 0;
    if (Ph & hibit) hout = 1;
    else if (Mh & hibit) hout = -1;
    Ph <<= 1;
    Mh <<= 1;
    if (hin < 0) Mh |= 1ULL;
    else if (hin > 0) Ph |= 1ULL;
    Pv = Mh | ~(Xv | Ph);
    Mv = Ph & Xv;
    return hout;
}

}  // namespace

extern "C" int lrm_myers_distance(const uint8_t *q, int64_t m,
                                  const uint8_t *t, int64_t n, int mode,
                                  int64_t *out2) {
    if (m == 0) {  // empty query: NW/SHW cost = n gaps / 0 by free end
        out2[0] = (mode == 0) ? n : 0;
        out2[1] = (mode == 0) ? n : 0;
        return 0;
    }
    const int64_t nw = (m + 63) >> 6;
    // per-symbol pattern masks (codes 0..3 = ACGT, 4 = N: matches nothing)
    std::vector<uint64_t> peq(5 * nw, 0);
    for (int64_t i = 0; i < m; ++i) {
        const int c = q[i] < 4 ? q[i] : 4;
        peq[c * nw + (i >> 6)] |= 1ULL << (i & 63);
    }
    std::vector<uint64_t> Pv(nw, ~0ULL), Mv(nw, 0);
    int64_t score = m;
    int64_t best = INT64_MAX, best_pos = 0;
    const int hin0 = (mode == 2) ? 0 : 1;  // HW: free target prefix
    for (int64_t j = 0; j < n; ++j) {
        const int c = t[j] < 4 ? t[j] : 4;
        int hin = hin0;
        for (int64_t b = 0; b < nw; ++b) {
            const uint64_t hibit =
                (b == nw - 1) ? (1ULL << ((m - 1) & 63)) : (1ULL << 63);
            hin = advance_block(peq[c * nw + b], Pv[b], Mv[b], hin, hibit);
        }
        score += hin;
        if (mode != 0 && score < best) { best = score; best_pos = j + 1; }
    }
    if (mode == 0) {
        out2[0] = score;
        out2[1] = n;
    } else {
        out2[0] = best == INT64_MAX ? score : best;
        out2[1] = best_pos;
    }
    return 0;
}
