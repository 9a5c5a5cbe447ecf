// External-memory stage-1 merge: k-way interleave of per-chunk suffix orders.
//
// The out-of-core pipeline (bfqzip_tpu/external.py) sorts each read chunk's
// suffixes on the TPU (bounded HBM) and merges the chunk orders here on the
// host — the role eGap's disk-based merge plays for the reference
// (BFQzip_ext.py:172-177; eGap --em --mem).  The merge never materialises
// suffix keys: the comparator walks the text directly (0 = terminator/pad
// sorts below every base, content ties break by read index = position,
// matching ops/suffix.py's distinct-terminator convention), so the only
// device->host transfer is each chunk's suffix-position array.
//
// Outputs per merged position: BWT symbol (text[g-1], 0 -> TERM), permuted
// quality, 1-byte LCP against the previous merged suffix (capped at 255 —
// the reference's eGap --lbytes 1 convention, BFQzip_ext.py:29-32), the
// smoothing predecessor text[g-2], and the suffix position itself.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint8_t kTermCode = 0;   // alphabet.TERM
constexpr uint8_t kTermChar = '#'; // alphabet.TERM_CHAR

struct Cursor {
    const int32_t* p;
    const int32_t* end;
};

// suffix comparator on the padded text; 0 stops a row (terminator/pad)
inline bool suffix_less(const uint8_t* text, int64_t a, int64_t b) {
    if (a == b) return false;
    const uint8_t* pa = text + a;
    const uint8_t* pb = text + b;
    while (*pa != 0 && *pa == *pb) { pa++; pb++; }
    if (*pa != *pb) return *pa < *pb;
    // both hit a terminator with equal content -> same in-read offset, so
    // position order == read-index order (distinct-terminator tie-break)
    return a < b;
}

inline uint8_t lcp255(const uint8_t* text, int64_t a, int64_t b) {
    int l = 0;
    const uint8_t* pa = text + a;
    const uint8_t* pb = text + b;
    while (l < 255 && *pa != 0 && *pa == *pb) { pa++; pb++; l++; }
    return (uint8_t)l;
}

}  // namespace

extern "C" {

// Returns total merged length, negative on error.
int64_t ext_merge(const uint8_t* text, const uint8_t* qtext, int64_t n_pad,
                  const int32_t* sa_all, const int64_t* offs, int32_t n_chunks,
                  uint8_t* bwt_out, uint8_t* qs_out, uint8_t* lcp_out,
                  uint8_t* pre_out, int32_t* sa_out) {
    if (n_chunks <= 0) return -1;
    std::vector<Cursor> cur((size_t)n_chunks);
    for (int32_t c = 0; c < n_chunks; c++) {
        cur[c] = {sa_all + offs[c], sa_all + offs[c + 1]};
        if (offs[c + 1] < offs[c]) return -2;
    }
    int64_t total = offs[n_chunks];

    // loser-tree over chunk heads: internal nodes hold the LOSER chunk id,
    // `winner` the overall minimum.  k is small (<= a few hundred), so the
    // tree lives in L1; each emit costs ceil(log2 k) suffix comparisons.
    int k = 1;
    while (k < n_chunks) k <<= 1;
    std::vector<int32_t> node((size_t)k, -1);  // internal loser slots
    auto head_less = [&](int32_t a, int32_t b) {
        // exhausted cursors sort last
        bool ea = cur[a].p == cur[a].end, eb = cur[b].p == cur[b].end;
        if (ea || eb) return !ea;
        return suffix_less(text, *cur[a].p, *cur[b].p);
    };
    // initial winner via pairwise tournament
    int32_t winner = -1;
    {
        std::vector<int32_t> level((size_t)k, -1);
        for (int32_t c = 0; c < n_chunks; c++) level[c] = c;
        int width = k;
        int base = k;  // node indices [1, k) as a heap; fill bottom-up
        while (width > 1) {
            width >>= 1;
            base -= width;
            for (int i = 0; i < width; i++) {
                int32_t a = level[2 * i], b = level[2 * i + 1];
                int32_t w, l;
                if (b < 0 || (a >= 0 && head_less(a, b))) { w = a; l = b; }
                else { w = b; l = a; }
                node[base + i] = l;
                level[i] = w;
            }
        }
        winner = level[0];
    }

    int64_t prev_g = -1;
    for (int64_t i = 0; i < total; i++) {
        if (winner < 0 || cur[winner].p == cur[winner].end) return -3;
        int64_t g = *cur[winner].p++;
        if (g <= 0 || g >= n_pad) {
            // g == 0 would need text[-1]; the padded layout always starts a
            // read at 0 whose preceding slot wraps — handle explicitly
            if (g != 0) return -4;
        }
        int64_t gp = g == 0 ? n_pad - 1 : g - 1;
        int64_t gp2 = g <= 1 ? n_pad - (2 - g) : g - 2;
        uint8_t cprev = text[gp];
        bwt_out[i] = cprev == 0 ? kTermCode : (uint8_t)(cprev - 1);
        qs_out[i] = cprev == 0 ? kTermChar : qtext[gp];
        uint8_t c2 = text[gp2];
        pre_out[i] = c2 == 0 ? kTermCode : (uint8_t)(c2 - 1);
        lcp_out[i] = prev_g < 0 ? 0 : lcp255(text, prev_g, g);
        sa_out[i] = (int32_t)g;
        prev_g = g;

        // replay the loser tree along winner's leaf-to-root path
        int32_t w = winner;
        for (int idx = (k + w) >> 1; idx >= 1; idx >>= 1) {
            int32_t l = node[idx];
            if (l >= 0 && !head_less(w, l)) {
                node[idx] = w;
                w = l;
            }
        }
        winner = w;
    }
    return total;
}

}  // extern "C"
