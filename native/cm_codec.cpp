// Adaptive context-mixing codec ("BQZC" containers) — the PPMd/BSC-class
// entropy back end for step 5 (the reference shells out to `7z a -mm=PPMd`
// and `bsc e`, BFQzip.py:253-275; this replaces both with an in-tree coder).
//
// v2 design (encoder default): binary range coder over a bit-tree
// decomposition of the dense alphabet, with a LOGISTIC MIX of several
// adaptive models per bit:
//   * order-1 / order-2 (and order-3 when the alphabet is small) symbol
//     contexts with 12-bit adaptive probabilities;
//   * a MATCH MODEL: a rolling window hash of the last kMatchLen symbols
//     indexes the most recent previous occurrence; while the match holds,
//     the matched stream predicts the next symbol with confidence that
//     adapts per match-length bucket.  This captures the long inter-read
//     repeats of coverage data (what LZ77-class compressors exploit) that
//     plain finite-order contexts cannot reach — measured on 100K-read
//     Illumina-like data it beats `xz -9` on both the DNA and quality
//     streams (BASELINE.md, compression table).
//   * per-(match-bucket, tree-node) mixing weights trained online by
//     gradient descent on coding error (lr 1/128).
//
// Container "BQZC" v2:
//   magic[4] 'BQZC', u8 version=2, u8 k-1, u8 flags=0, u8 pad
//   u64 n, u32 payload_len
//   u8 uniq[k]
//   payload bytes
//
// Container "BQZC" v3 (blocked, thread-parallel — the bsc -T analog,
// reference BFQzip.py:271): the stream is cut into fixed-size blocks, each
// coded INDEPENDENTLY with a fresh model, so encode and decode parallelise
// across a thread pool and any block is randomly accessible:
//   magic[4] 'BQZC', u8 version=3, u8 k-1, u8 flags=0, u8 pad
//   u64 n, u32 block_size, u32 nblocks
//   u8 uniq[k]
//   u32 payload_len[nblocks]
//   payload blocks (concatenated)
// Per-block model reset costs <1% ratio at the default 16M-symbol blocks
// (model warmup is ~100K symbols).
//
// Container "BQZC" v5 (the r5 speed/ratio work; layout = v4 plus):
//   flags bit1: fast profile (RC/order-4/order-6 models disabled globally)
//   per-block payload_len bit31: RC model gated off for that block
//   per-block payload_len bit30: order-4/6 models gated off for that block
//   model deltas vs v4 (both sides derive them from the version byte):
//     * match hash tables sized to the block length (zeroing 2 x 64MB per
//       small block dominated decode at 256K blocks: 1.38 -> 5.26 MB/s),
//     * hash inserts skipped >= kSkipIns deep into a match, forward probe
//       skipped while an RC match is that deep,
//     * order-2/3 context tables dropped for k <= 8 (DNA) alphabets.
//   Encoder gates RC per block on measured coverage (<1.6% of symbols ->
//   re-encode without) and the order-4/6 models on measured benefit
//   (> 0.5% payload shrink, else the cheaper no-hi coding is kept).
//   Measured (100K x 101bp realistic DNA, interleaved A/B, 1 thread):
//   16M blocks 1.63x v4 decode at +2.77% size; 256K blocks 3.81x at -0.2%.
//
// v1 containers (order-2 + run-bucket, tier ladder) remain decodable; all
// older versions decode bit-exactly (shared code paths are version-gated).

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr uint8_t kMagic[4] = {'B', 'Q', 'Z', 'C'};
constexpr int kPBits = 12;
constexpr uint16_t kPOne = 1 << kPBits;
constexpr int kRate = 5;

struct RangeEncoder {
    std::vector<uint8_t>& out;
    uint64_t low = 0;
    uint32_t range = 0xFFFFFFFFu;
    uint8_t cache = 0;
    int64_t cache_size = 1;

    explicit RangeEncoder(std::vector<uint8_t>& o) : out(o) {}

    void shift_low() {
        if ((uint32_t)low < 0xFF000000u || (int)(low >> 32) != 0) {
            uint8_t carry = (uint8_t)(low >> 32);
            do {
                out.push_back((uint8_t)(cache + carry));
                cache = 0xFF;
            } while (--cache_size != 0);
            cache = (uint8_t)(low >> 24);
        }
        cache_size++;
        low = ((uint32_t)low) << 8;
    }

    // p: probability of bit==1 in 12 bits (v1 path)
    void encode_bit(uint16_t& p, int bit) {
        uint32_t bound = (range >> kPBits) * p;
        if (bit) {
            range = bound;
            p += (kPOne - p) >> kRate;
        } else {
            low += bound;
            range -= bound;
            p -= p >> kRate;
        }
        while (range < (1u << 24)) {
            range <<= 8;
            shift_low();
        }
    }

    // p16: probability of bit==1 in 16 bits (v2 mixing path)
    void encode_bit16(uint32_t p16, int bit) {
        uint32_t bound = (uint32_t)(((uint64_t)range * p16) >> 16);
        if (bit) {
            range = bound;
        } else {
            low += bound;
            range -= bound;
        }
        while (range < (1u << 24)) {
            range <<= 8;
            shift_low();
        }
    }

    void flush() {
        for (int i = 0; i < 5; i++) shift_low();
    }
};

struct RangeDecoder {
    const uint8_t* in;
    int64_t size, pos = 0;
    uint32_t range = 0xFFFFFFFFu;
    uint32_t code = 0;

    RangeDecoder(const uint8_t* p, int64_t n) : in(p), size(n) {
        pos++;  // first byte emitted by the encoder cache is 0
        for (int i = 0; i < 4; i++) code = (code << 8) | next();
    }

    uint8_t next() { return pos < size ? in[pos++] : 0; }

    int decode_bit(uint16_t& p) {
        uint32_t bound = (range >> kPBits) * p;
        int bit;
        if (code < bound) {
            range = bound;
            p += (kPOne - p) >> kRate;
            bit = 1;
        } else {
            code -= bound;
            range -= bound;
            p -= p >> kRate;
            bit = 0;
        }
        while (range < (1u << 24)) {
            range <<= 8;
            code = (code << 8) | next();
        }
        return bit;
    }

    int decode_bit16(uint32_t p16) {
        uint32_t bound = (uint32_t)(((uint64_t)range * p16) >> 16);
        int bit;
        if (code < bound) {
            range = bound;
            bit = 1;
        } else {
            code -= bound;
            range -= bound;
            bit = 0;
        }
        while (range < (1u << 24)) {
            range <<= 8;
            code = (code << 8) | next();
        }
        return bit;
    }
};

inline int rl_bucket(int64_t rl) {
    if (rl <= 1) return (int)rl;
    if (rl <= 3) return 2;
    if (rl <= 7) return 3;
    if (rl <= 15) return 4;
    if (rl <= 63) return 5;
    if (rl <= 255) return 6;
    return 7;
}

// ---- v1 model (decode compatibility) --------------------------------------

struct ModelV1 {
    int k, tier, bits, tree;
    std::vector<uint16_t> p;

    ModelV1(int k_, int tier_) : k(k_), tier(tier_) {
        bits = 1;
        while ((1 << bits) < k) bits++;
        tree = 1 << bits;  // node indices 1..tree-1
        int64_t nctx;
        if (tier == 0) nctx = (int64_t)k * k * 8;
        else if (tier == 1) nctx = 64LL * 64 * 8;
        else nctx = 256LL * 8;
        p.assign((size_t)nctx * tree, kPOne / 2);
    }

    size_t ctx_base(int prev, int prev2, int rlb) const {
        int64_t c;
        if (tier == 0) c = ((int64_t)prev * k + prev2) * 8 + rlb;
        else if (tier == 1) c = ((int64_t)prev * 64 + prev2) * 8 + rlb;
        else c = (int64_t)prev * 8 + rlb;
        return (size_t)c * tree;
    }
};

// ---- v2 mixing model -------------------------------------------------------

constexpr int kMatchLen = 11;    // window symbols hashed for the match index
constexpr int kHashBits = 24;
constexpr float kLR = 0.0078125f;  // 1/128 mixing learning rate
// v5 decode-speed policy (part of the v5 format — both sides must agree):
// while a match is >= this deep, skip the hash-table insertions (the
// region repeats an earlier one whose windows are already indexed; a later
// probe finding the OLDER copy predicts identically) and skip the forward
// probe while an RC match is that deep.  This removes the dominant
// per-symbol cost on matchy streams: random writes into the large match
// tables.  16 measured best (8 lost 1.7% ratio, sparse half-rate inserts
// lost 0.3% for no speed).
constexpr int kSkipIns = 48;


struct Mixer {
    // stretch/squash in 12-bit probability space, t quantised to 1/256
    int str[4096];
    uint16_t sq[4096];

    Mixer() {
        for (int i = 0; i < 4096; i++) {
            double p = (i + 0.5) / 4096.0;
            str[i] = (int)std::lround(std::log(p / (1 - p)) * 256.0);
        }
        for (int t = 0; t < 4096; t++) {
            double x = (t - 2048) / 256.0;
            int v = (int)std::lround(4096.0 / (1 + std::exp(-x)));
            sq[t] = (uint16_t)(v < 1 ? 1 : (v > 4095 ? 4095 : v));
        }
    }
};

constexpr int kPosBuckets = 32;  // in-record position, 4-wide buckets
constexpr int kHash6Bits = 20;   // hashed order-6 buckets (v4 small alphabets)

// Complement pairs over RAW bytes; a dense alphabet closed under this map
// (a DNA stream) enables the reverse-complement match model.
inline int comp_byte(int b) {
    switch (b) {
        case 'A': return 'T';
        case 'T': return 'A';
        case 'C': return 'G';
        case 'G': return 'C';
        case 'N': return 'N';
        case 'a': return 't';
        case 't': return 'a';
        case 'c': return 'g';
        case 'g': return 'c';
        case 'n': return 'n';
        default: return -1;
    }
}

struct ModelV2 {
    int k, bits, tree, nm;  // nm = number of mixed models (incl. match)
    int reset_dense;        // dense code restarting the position counter
    int ver;                // container model semantics (2..5)
    bool hi;                // v4: order-4 + hashed order-6 (small alphabets)
    bool sse;               // v4: APM/SSE stage on the mixed probability
    bool rc = false;        // v4: reverse-complement match model (DNA only)
    uint8_t cmp[8] = {0};   // dense-code complement map (when rc)
    std::vector<uint16_t> p1, p2, p3, pm, p4;
    std::vector<uint16_t> p4o, p6h;  // v4 high-order models
    std::vector<uint16_t> prc;       // v4 RC-match model
    std::vector<uint16_t> apm;       // v4 SSE: nctx x 33 interpolation nodes
    std::vector<float> w;
    std::vector<uint32_t> ht;   // match hash table: pos+1 of last occurrence
    std::vector<uint32_t> htrc; // RC-window hash table (when rc)
    Mixer mx;

    int htbits = kHashBits;  // log2 of the match hash tables

    // v5 canonical skewed coding tree (flags bit2): per-symbol code lengths
    // from a global Huffman build over the container's histogram, canonical
    // (DEFLATE-style) assignment.  Frequent symbols take 2 coding steps
    // instead of ceil(log2 k) — the per-symbol mixing work is linear in the
    // coded path length, so decode speeds up by the same ratio the expected
    // depth drops.  Internal nodes are renumbered densely (id+1 is the
    // context `node`, <= k-1 < tree, so every model table layout and the
    // balanced-tree decode of older versions are untouched).
    bool canon = false;
    uint8_t dep[256];
    uint32_t cpath[256];
    int16_t child[512];      // child[2*id+b]: internal id, or -(1+sym) leaf
    uint8_t pids[256][32];   // internal ids along each symbol's path

    // Build the canonical tree from per-symbol depths; returns false (and
    // leaves the balanced tree in force) on any invalid table — the decoder
    // treats that as a hostile header.
    bool build_canon(const uint8_t* depths) {
        int64_t kraft = 0;  // in units of 2^-30
        int maxd = 0;
        for (int s = 0; s < k; s++) {
            int d = depths[s];
            if (d < 1 || d > 30) return false;
            dep[s] = (uint8_t)d;
            maxd = maxd > d ? maxd : d;
            kraft += 1ll << (30 - d);
        }
        if (kraft != (1ll << 30)) return false;  // not a full tree
        // canonical code assignment (DEFLATE): count per length, first code
        // per length, then symbols in dense-code order take consecutive codes
        uint32_t bl_count[33] = {0}, next_code[33] = {0};
        for (int s = 0; s < k; s++) bl_count[dep[s]]++;
        uint32_t code = 0;
        for (int d = 1; d <= maxd; d++) {
            code = (code + bl_count[d - 1]) << 1;
            next_code[d] = code;
        }
        for (int s = 0; s < k; s++) cpath[s] = next_code[dep[s]]++;
        // explicit child structure with densely renumbered internal nodes
        for (int j = 0; j < 512; j++) child[j] = INT16_MIN;
        int n_internal = 1;  // id 0 = root
        for (int s = 0; s < k; s++) {
            int id = 0;
            for (int t = 0; t < dep[s]; t++) {
                pids[s][t] = (uint8_t)id;
                int bit = (cpath[s] >> (dep[s] - 1 - t)) & 1;
                if (t == dep[s] - 1) {
                    if (child[2 * id + bit] != INT16_MIN) return false;
                    child[2 * id + bit] = (int16_t)-(1 + s);
                } else {
                    if (child[2 * id + bit] == INT16_MIN) {
                        if (n_internal >= k) return false;
                        child[2 * id + bit] = (int16_t)n_internal++;
                    }
                    if (child[2 * id + bit] < 0) return false;
                    id = child[2 * id + bit];
                }
            }
        }
        for (int id = 0; id < n_internal; id++)
            if (child[2 * id] == INT16_MIN || child[2 * id + 1] == INT16_MIN)
                return false;
        return true;
    }

    // predicted symbol's path bit at step t (0 past its leaf — prediction
    // confidence is priced by the match models either way)
    inline int path_bit(int sym, int t) const {
        return t < dep[sym] ? (cpath[sym] >> (dep[sym] - 1 - t)) & 1 : 0;
    }

    // uniq maps dense codes back to original bytes; it both sides derive
    // the RC complement map from, so the container format is unchanged.
    // allow_rc/allow_hi gate the expensive models (v5 per-block RC flag and
    // the fast profile); the defaults reproduce v4 semantics exactly.
    // nb (v5, the block length) sizes the match hash tables to the block:
    // a 256K-symbol block needs ~2^20 entries, not 2^24 — zeroing 2 x 64MB
    // tables per small block dominated decode in the r4 thread-scaling
    // measurement (1.6 MB/s at 256K blocks).  Deterministic from the
    // container fields, so both sides agree.
    explicit ModelV2(int k_, int reset_dense_ = -1, int ver_ = 2,
                     const uint8_t* uniq = nullptr, bool allow_rc = true,
                     bool allow_hi = true, int64_t nb = -1,
                     const uint8_t* depths = nullptr)
        : k(k_), reset_dense(reset_dense_), ver(ver_) {
        if (ver >= 5 && depths != nullptr && k >= 2 && k <= 256)
            canon = build_canon(depths);
        if (ver >= 5 && nb >= 0) {
            int hb = 16;
            while ((1ll << hb) < 4 * nb && hb < kHashBits) hb++;
            htbits = hb;
        }
        bits = 1;
        while ((1 << bits) < k) bits++;
        tree = 1 << bits;
        // small alphabets afford the order-3 table — except v5 DNA-class
        // alphabets, where the match/RC/order-1/2 ensemble already covers it
        // (EXPERIMENT: measuring ratio/speed effect)
        // v5 drops the order-2/3 tables on DNA-class alphabets: measured on
        // the 100K realistic DNA stream they are fully subsumed by the
        // match/RC/order-1 ensemble (687,359 B without vs 688,004 with) and
        // cost two mixing slots per bit (~12% of decode wall)
        bool o2 = !(ver >= 5 && k <= 8);
        bool o3 = k <= 16 && !(ver >= 5 && k <= 8);
        nm = 2 + (o2 ? 1 : 0) + (o3 ? 1 : 0);  // o1 + pm + optional o2/o3
        p1.assign((size_t)k * tree, kPOne / 2);
        if (o2) p2.assign((size_t)k * k * tree, kPOne / 2);
        if (o3) p3.assign((size_t)k * k * k * tree, kPOne / 2);
        pm.assign((size_t)16 * tree * 2, kPOne / 2);
        if (reset_dense >= 0) {
            // positional model: quality profiles correlate with in-read
            // position (tools/make_realistic.py's 3' decline is typical), so
            // (pos-bucket x prev symbol) is a strong extra context for .qs
            p4.assign((size_t)kPosBuckets * k * tree, kPOne / 2);
            nm++;
        }
        // v4 (PPMd-class push on the DNA stream): direct order-4 and a
        // hashed order-6 for alphabets that fit 3 bits/symbol, both read
        // from the rolling match window so no extra state is carried.
        // (Neutral on synthetic genomes, which have no high-order structure;
        // real genomes do — BASELINE.md ratio notes.)
        hi = ver >= 4 && allow_hi && k <= 8 && !getenv("BFQ_CM_NOHI");
        if (hi) {
            p4o.assign((size_t)4096 * tree, kPOne / 2);  // 4 symbols x 3 bits
            p6h.assign(((size_t)1 << kHash6Bits) * tree, kPOne / 2);
            nm += 2;
        }
        // v4 RC match: Illumina reads come from both strands, so half the
        // inter-read repeats only exist as reverse complements — a second
        // match model follows an earlier occurrence BACKWARD, predicting
        // complement symbols.  DNA alphabets only (uniq closed under
        // complement); derived from uniq on both sides, no format change.
        if (ver >= 4 && allow_rc && k >= 2 && k <= 6 && uniq != nullptr) {
            uint8_t dense_of[256];
            int paired = 0;
            bool ok = true;
            for (int d = 0; d < k; d++) dense_of[uniq[d]] = (uint8_t)d;
            for (int d = 0; d < k && ok; d++) {
                int cb = comp_byte(uniq[d]);
                bool present = false;
                for (int e = 0; e < k; e++) present |= uniq[e] == cb;
                if (cb >= 0 && present) {
                    cmp[d] = dense_of[cb];
                    paired++;
                } else if (cb < 0) {
                    cmp[d] = (uint8_t)d;  // separator bytes ('\n') self-map
                } else {
                    ok = false;  // a base whose complement is absent
                }
            }
            ok = ok && paired >= 4;  // genuinely a DNA stream
            if (ok) {
                rc = true;
                prc.assign((size_t)16 * tree * 2, kPOne / 2);
                htrc.assign((size_t)1 << htbits, 0);
                nm++;
            }
        }
        // v4 SSE: secondary estimation of the mixed probability, keyed on
        // (match bucket, tree node, predicted bit), 33-node interpolation.
        // Small alphabets only: measured on the 46-symbol quality stream it
        // COSTS 5.7% (the mix is already calibrated there) while the DNA
        // stream gains (BASELINE.md ratio notes).
        sse = ver >= 4 && k <= 8;
        if (sse) {
            apm.assign((size_t)16 * tree * 2 * 33, 0);
            for (size_t c = 0; c < apm.size() / 33; c++)
                for (int j = 0; j <= 32; j++) {
                    int t = j * 128;  // identity: squash(stretch domain)
                    apm[c * 33 + j] = mx.sq[t > 4095 ? 4095 : t];
                }
        }
        w.assign((size_t)(rc ? 32 : 16) * tree * nm, 1.0f / nm);
        ht.assign((size_t)1 << htbits, 0);
    }
};

// Rolling per-stream coder state threaded through code_symbol_v2.
struct CodeState {
    int prev = 0, prev2 = 0, prev3 = 0;
    int64_t match = -1;   // forward match: position predicting data[i]
    int mlen = 0;
    int64_t rcmatch = -1; // RC match: comp(data[rcmatch]) predicts data[i]
    int rcmlen = 0;
    uint64_t win = 0, winrc = 0;
    int64_t lpos = 0;     // in-record position (positional model)
};

inline int mlen_bucket(int t) {
    return t <= 7 ? t + 1
                  : (t <= 15 ? 9 : (t <= 31 ? 10 : (t <= 63 ? 11
                  : (t <= 127 ? 12 : (t <= 255 ? 13 : (t <= 511 ? 14 : 15))))));
}

// Shared per-symbol coding step: predicts, codes (encode or decode), updates.
// `data` must hold the already-known prefix [0, i) in dense codes; on decode
// the function writes data[i].
template <bool kEncode>
inline void code_symbol_v2(ModelV2& m, std::vector<uint8_t>& data, int64_t i,
                           CodeState& st,
                           RangeEncoder* enc, RangeDecoder* dec) {
    int& prev = st.prev;
    int& prev2 = st.prev2;
    int& prev3 = st.prev3;
    int64_t& match = st.match;
    int& mlen = st.mlen;
    uint64_t& win = st.win;
    int64_t& lpos = st.lpos;
    int mlb = match < 0 ? 0 : mlen_bucket(mlen);
    int psym = match >= 0 ? data[match] : 0;
    int rcmlb = 0, psym_rc = 0;
    if (m.rc) {
        rcmlb = st.rcmatch < 0 ? 0 : mlen_bucket(st.rcmlen);
        psym_rc = st.rcmatch >= 0 ? m.cmp[data[st.rcmatch]] : 0;
    }
    size_t b1 = (size_t)prev * m.tree;
    size_t b2 = ((size_t)prev * m.k + prev2) * m.tree;
    bool has_o2 = m.p2.size() > 0;
    bool has_o3 = m.p3.size() > 0;
    size_t b3 = has_o3 ? (((size_t)prev * m.k + prev2) * m.k + prev3) * m.tree : 0;
    size_t b4 = 0;
    if (m.reset_dense >= 0) {
        int posb = lpos / 4 < kPosBuckets ? (int)(lpos / 4) : kPosBuckets - 1;
        b4 = ((size_t)posb * m.k + prev) * m.tree;
    }
    size_t b4o = 0, b6 = 0;
    if (m.hi) {
        // `win` holds the last kMatchLen symbols, 3 bits each, newest in the
        // low bits and biased +1 — its low 12/18 bits ARE the order-4/6
        // contexts of position i (it is updated after each symbol)
        b4o = (size_t)(win & 0xFFF) * m.tree;
        uint64_t c6 = win & ((1ull << 18) - 1);
        b6 = (size_t)((c6 * 0x9E3779B97F4A7C15ull) >> (64 - kHash6Bits)) * m.tree;
    }

    // one bit of the tree decomposition at context `node`, with the match/RC
    // predicted bits pb/pbrc; enc_bit is the bit to encode (ignored on decode)
    auto code_one = [&](int node, int pb, int pbrc, int enc_bit) __attribute__((always_inline)) -> int {
        uint16_t* ps[8];
        ps[0] = &m.p1[b1 + node];
        int j = 1;
        if (has_o2) ps[j++] = &m.p2[b2 + node];
        if (has_o3) ps[j++] = &m.p3[b3 + node];
        ps[j++] = &m.pm[((size_t)mlb * m.tree + node) * 2 + pb];
        if (m.reset_dense >= 0) ps[j++] = &m.p4[b4 + node];
        if (m.hi) {
            ps[j++] = &m.p4o[b4o + node];
            ps[j++] = &m.p6h[b6 + node];
        }
        if (m.rc)
            ps[j++] = &m.prc[((size_t)rcmlb * m.tree + node) * 2 + pbrc];

        float sv[8];
        float t = 0;
        size_t wctx = m.rc ? ((size_t)(st.rcmatch >= 0 ? 16 : 0) + mlb)
                           : (size_t)mlb;
        float* wv = &m.w[(wctx * m.tree + node) * m.nm];
        for (int q = 0; q < m.nm; q++) {
            sv[q] = m.mx.str[*ps[q]] * (1.0f / 256.0f);
            t += wv[q] * sv[q];
        }
        int ti = (int)std::lround(t * 256.0f) + 2048;
        ti = ti < 0 ? 0 : (ti > 4095 ? 4095 : ti);
        int pmix = m.mx.sq[ti];
        int p12 = pmix;

        uint16_t* an = nullptr;
        if (m.sse) {
            // SSE/APM: re-map the mixed probability through a per-context
            // transfer curve (33 nodes over the stretch domain), blended
            // 3:1 with the raw mix (lpaq-style)
            int idx = ti >> 7, frac = ti & 127;  // ti IS the stretch-domain mix
            uint16_t* ap =
                &m.apm[(((size_t)mlb * m.tree + node) * 2 + pb) * 33];
            int pa = (ap[idx] * (128 - frac) + ap[idx + 1] * frac) >> 7;
            an = &ap[idx + (frac >> 6)];
            p12 = (p12 + 3 * pa) >> 2;
            p12 = p12 < 1 ? 1 : (p12 > 4095 ? 4095 : p12);
        }
        uint32_t p16 = ((uint32_t)p12 << 4) | 8;

        int bit;
        if (kEncode) {
            bit = enc_bit;
            enc->encode_bit16(p16, bit);
        } else {
            bit = dec->decode_bit16(p16);
        }

        // mixer trains on ITS OWN output error (pre-SSE), the APM on the
        // final coded probability — standard two-stage training
        float err = bit - pmix * (1.0f / 4096.0f);
        for (int q = 0; q < m.nm; q++) {
            wv[q] += kLR * err * sv[q];
            if (bit) *ps[q] += (kPOne - *ps[q]) >> kRate;
            else *ps[q] -= *ps[q] >> kRate;
        }
        if (an) {
            if (bit) *an += (kPOne - *an) >> 6;
            else *an -= *an >> 6;
        }
        return bit;
    };

    int s;
    if (!m.canon) {
        int node = 1;
        s = kEncode ? data[i] : 0;
        for (int b = m.bits - 1; b >= 0; b--) {
            int bit = code_one(node, (psym >> b) & 1, (psym_rc >> b) & 1,
                               kEncode ? (s >> b) & 1 : -1);
            node = node * 2 + bit;
        }
        if (!kEncode) {
            s = node - m.tree;
            data[i] = (uint8_t)s;
        }
    } else if (kEncode) {
        s = data[i];
        int d = m.dep[s];
        for (int t = 0; t < d; t++)
            code_one(m.pids[s][t] + 1, m.path_bit(psym, t),
                     m.rc ? m.path_bit(psym_rc, t) : 0,
                     (m.cpath[s] >> (d - 1 - t)) & 1);
    } else {
        int id = 0, t = 0;
        for (;;) {
            int bit = code_one(id + 1, m.path_bit(psym, t),
                               m.rc ? m.path_bit(psym_rc, t) : 0, -1);
            int c = m.child[2 * id + bit];
            if (c < 0) {
                s = -1 - c;
                break;
            }
            id = c;
            t++;
        }
        data[i] = (uint8_t)s;
    }

    // ---- match state + rolling window hash (identical both directions) ----
    if (match >= 0 && data[match] == s) {
        match++;
        mlen++;
    } else {
        match = -1;
        mlen = 0;
    }
    if (m.rc) {
        if (st.rcmatch >= 0 && m.cmp[data[st.rcmatch]] == s) {
            st.rcmatch--;  // RC matches walk BACKWARD through the earlier hit
            st.rcmlen++;
        } else {
            st.rcmatch = -1;
            st.rcmlen = 0;
        }
    }
    const uint64_t wmask =
        kMatchLen * 3 >= 64 ? ~0ull : ((1ull << (kMatchLen * 3)) - 1);
    win = ((win << 3) | (uint64_t)((s & 7) + 1)) & wmask;
    if (m.rc)
        st.winrc = (st.winrc >> 3)
                   | ((uint64_t)((m.cmp[s] & 7) + 1) << (3 * (kMatchLen - 1)));
    if (i >= kMatchLen - 1) {
        // v5: deep inside a live match the current region is a repeat of an
        // already-indexed earlier one — skip the random hash-table writes
        // (the dominant per-symbol cost) and the RC probe.  v4 containers
        // keep the unconditional-update semantics bit-for-bit.
        bool deep = m.ver >= 5 && mlen >= kSkipIns;
        bool rcprobe = m.rc && st.rcmatch < 0;
        uint64_t key = 0;
        if (!deep || rcprobe)
            key = (win * 0x9E3779B97F4A7C15ull) >> (64 - m.htbits);
        if (!deep) {
            // v5 also skips the forward probe while an RC match is deep
            // (the RC stream is already predicting; measured size-neutral)
            if (match < 0 && !(m.ver >= 5 && st.rcmlen >= kSkipIns)) {
                uint32_t cand = m.ht[key];
                if (cand > 0) {
                    // verify the candidate: the 24-bit hash collides often on
                    // multi-MB streams, and a false match poisons pm confidence
                    int64_t c = (int64_t)cand;
                    bool ok = true;
                    for (int t = 0; t < kMatchLen && ok; t++)
                        ok = data[c - 1 - t] == data[i - t];
                    if (ok) {
                        match = c;
                        mlen = 0;
                    }
                }
            }
            m.ht[key] = (uint32_t)(i + 1);
        }
        if (m.rc) {
            if (rcprobe) {
                // forward window == an earlier RC window: continue that
                // occurrence backward, predicting complements
                uint32_t cand = m.htrc[key];
                if (cand > 0 && (int64_t)cand - 1 >= 0) {
                    int64_t c = (int64_t)cand - 1;  // predicts comp(data[c])
                    bool ok = true;
                    for (int t = 0; t < kMatchLen && ok; t++)
                        ok = m.cmp[data[c + 1 + t]] == data[i - t];
                    if (ok) {
                        st.rcmatch = c;
                        st.rcmlen = 0;
                    }
                }
            }
            bool deeprc =
                m.ver >= 5 && (mlen >= kSkipIns || st.rcmlen >= kSkipIns);
            if (i >= kMatchLen && !deeprc) {
                uint64_t krc =
                    (st.winrc * 0x9E3779B97F4A7C15ull) >> (64 - m.htbits);
                m.htrc[krc] = (uint32_t)(i - kMatchLen + 1);
            }
        }
    }
    if (m.reset_dense >= 0) lpos = (s == m.reset_dense) ? 0 : lpos + 1;
    prev3 = prev2;
    prev2 = prev;
    prev = s;
}

// Encode one dense-coded stream with a fresh v2 model.  `uniq` (dense ->
// original byte) enables the v4+ RC match model on DNA alphabets.  Returns
// the number of symbols coded under a live RC match (the per-block gating
// signal: a block where RC coverage is negligible re-encodes without it).
int64_t encode_stream_v2(const uint8_t* dense, int64_t n, int k,
                         std::vector<uint8_t>& payload, int reset_dense = -1,
                         int ver = 2, const uint8_t* uniq = nullptr,
                         bool allow_rc = true, bool allow_hi = true,
                         const uint8_t* depths = nullptr) {
    std::vector<uint8_t> d(dense, dense + n);
    ModelV2 m(k, reset_dense, ver, uniq, allow_rc, allow_hi, n, depths);
    payload.reserve((size_t)(n / 3 + 64));
    RangeEncoder rc(payload);
    CodeState cs;
    int64_t rc_cov = 0;
    for (int64_t i = 0; i < n; i++) {
        rc_cov += cs.rcmatch >= 0;
        code_symbol_v2<true>(m, d, i, cs, &rc, nullptr);
    }
    rc.flush();
    return m.rc ? rc_cov : -1;
}

// Decode one v2 stream; writes n ORIGINAL bytes via uniq. Returns 0 / -4.
int decode_stream_v2(const uint8_t* payload, int64_t plen, int64_t n, int k,
                     const uint8_t* uniq, uint8_t* out, int reset_dense = -1,
                     int ver = 2, bool allow_rc = true, bool allow_hi = true,
                     const uint8_t* depths = nullptr) {
    ModelV2 m(k, reset_dense, ver, uniq, allow_rc, allow_hi, n, depths);
    if (depths != nullptr && !m.canon) return -1;  // hostile depth table
    RangeDecoder rc(payload, plen);
    std::vector<uint8_t> d((size_t)n);
    CodeState cs;
    for (int64_t i = 0; i < n; i++) {
        code_symbol_v2<false>(m, d, i, cs, nullptr, &rc);
        if (d[i] >= k) return -4;
        out[i] = uniq[d[i]];
    }
    return 0;
}

int default_threads() {
    const char* env = getenv("BFQ_CM_THREADS");
    if (env && env[0]) {
        int v = atoi(env);
        if (v >= 1) return v;
    }
    unsigned hw = std::thread::hardware_concurrency();
    return hw ? (int)hw : 1;
}

// Run fn(block_index) for blocks [0, nblocks) on a small pool.
template <typename F>
void parallel_blocks(int64_t nblocks, int nthreads, F fn) {
    if (nthreads <= 1 || nblocks <= 1) {
        for (int64_t b = 0; b < nblocks; b++) fn(b);
        return;
    }
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
        for (;;) {
            int64_t b = next.fetch_add(1);
            if (b >= nblocks) return;
            fn(b);
        }
    };
    int nt = (int)std::min<int64_t>(nthreads, nblocks);
    std::vector<std::thread> pool;
    for (int t = 1; t < nt; t++) pool.emplace_back(worker);
    worker();
    for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Encode n bytes; returns container size, negative on error/overflow.
int64_t cm_encode(const uint8_t* data, int64_t n, uint8_t* out, int64_t out_cap) {
    int64_t hist[256] = {0};
    for (int64_t i = 0; i < n; i++) hist[data[i]]++;
    uint8_t dense[256], uniq[256];
    int k = 0;
    for (int b = 0; b < 256; b++)
        if (hist[b]) {
            dense[b] = (uint8_t)k;
            uniq[k++] = (uint8_t)b;
        }
    if (k == 0) { uniq[0] = 0; k = 1; }

    std::vector<uint8_t> d((size_t)n);
    for (int64_t i = 0; i < n; i++) d[i] = dense[data[i]];

    std::vector<uint8_t> payload;
    encode_stream_v2(d.data(), n, k, payload);

    int64_t total = 20 + k + (int64_t)payload.size();
    if (total > out_cap) return -2;
    uint8_t* q = out;
    std::memcpy(q, kMagic, 4); q += 4;
    *q++ = 2; *q++ = (uint8_t)(k - 1); *q++ = 0; *q++ = 0;
    uint64_t n64 = (uint64_t)n;
    std::memcpy(q, &n64, 8); q += 8;
    uint32_t plen = (uint32_t)payload.size();
    std::memcpy(q, &plen, 4); q += 4;
    std::memcpy(q, uniq, (size_t)k); q += k;
    std::memcpy(q, payload.data(), payload.size()); q += payload.size();
    return q - out;
}

// Per-symbol Huffman code lengths over the container histogram (k <= 256,
// O(k^2) two-smallest merge — trivial next to coding).  Returns max depth.
int huffman_depths(const int64_t* freq, int k, uint8_t* dep) {
    struct Node { int64_t f; int parent; };
    std::vector<Node> nodes;
    nodes.reserve(2 * k);
    std::vector<int> alive;
    for (int s = 0; s < k; s++) {
        nodes.push_back({freq[s] > 0 ? freq[s] : 1, -1});
        alive.push_back(s);
    }
    while (alive.size() > 1) {
        int a = 0, b = 1;
        if (nodes[alive[b]].f < nodes[alive[a]].f) std::swap(a, b);
        for (size_t j = 2; j < alive.size(); j++) {
            if (nodes[alive[j]].f < nodes[alive[a]].f) { b = a; a = (int)j; }
            else if (nodes[alive[j]].f < nodes[alive[b]].f) b = (int)j;
        }
        int ia = alive[a], ib = alive[b];
        nodes.push_back({nodes[ia].f + nodes[ib].f, -1});
        nodes[ia].parent = nodes[ib].parent = (int)nodes.size() - 1;
        if (a < b) std::swap(a, b);  // erase higher index first
        alive.erase(alive.begin() + a);
        alive.erase(alive.begin() + b);
        alive.push_back((int)nodes.size() - 1);
    }
    int maxd = 0;
    for (int s = 0; s < k; s++) {
        int d = 0;
        for (int p = nodes[s].parent; p >= 0; p = nodes[p].parent) d++;
        if (k == 1) d = 1;
        dep[s] = (uint8_t)d;
        maxd = maxd > d ? maxd : d;
    }
    return maxd;
}

// Blocked v3 encoder: independent per-block models, pool-parallel.
// bsize <= 0 selects the 16M-symbol default; nthreads <= 0 auto-detects.
// reset_byte >= 0 enables the positional context model: the in-record
// position counter restarts after each occurrence of that ORIGINAL byte
// (pass '\n' for line-structured streams like .fq.qs).
int64_t cm_encode_blocked(const uint8_t* data, int64_t n, uint8_t* out,
                          int64_t out_cap, int64_t bsize, int nthreads,
                          int reset_byte) {
    if (bsize <= 0) bsize = 16 * 1024 * 1024;
    // the v3 header stores bsize as u32; a larger value would truncate into a
    // self-inconsistent container (wrong block boundaries on decode)
    if (bsize > 0xFFFFFFFFll) return -5;
    if (nthreads <= 0) nthreads = default_threads();
    int64_t hist[256] = {0};
    for (int64_t i = 0; i < n; i++) hist[data[i]]++;
    uint8_t dense[256], uniq[256];
    int k = 0;
    for (int b = 0; b < 256; b++)
        if (hist[b]) {
            dense[b] = (uint8_t)k;
            uniq[k++] = (uint8_t)b;
        }
    if (k == 0) { uniq[0] = 0; k = 1; }
    std::vector<uint8_t> d((size_t)n);
    for (int64_t i = 0; i < n; i++) d[i] = dense[data[i]];
    int reset_dense = -1;
    if (reset_byte >= 0 && reset_byte < 256 && hist[reset_byte])
        reset_dense = dense[reset_byte];

    // speed/ratio profile (the bsc-vs-PPMd axis, reference BFQzip.py:253-275):
    // max (default) keeps every model and gates RC per block on measured
    // benefit; fast drops the RC/order-4/order-6/SSE models for ~v2-class
    // decode throughput at a small ratio cost.
    const char* prof = getenv("BFQ_CM_PROFILE");
    bool fast = prof && strcmp(prof, "fast") == 0;

    // canonical skewed tree (flags bit2): Huffman depths over the global
    // histogram, used when the expected coded path shortens >=3% vs the
    // balanced ceil(log2 k) tree.  The per-symbol model work is linear in
    // path length, so this is a direct decode-speed (and size) win on
    // skewed alphabets; a uniform alphabet would LENGTHEN, so the encoder
    // measures instead of assuming.
    uint8_t depths[256];
    bool canon = false;
    // k <= 8 alphabets keep the balanced tree: their per-node contexts are
    // few and well-trained, and collapsing frequent symbols to 2-step paths
    // measured +5% DNA size for NEGATIVE speed (the balanced loop is
    // branch-predictable); the win is large alphabets (QS k=46: -1% size,
    // +49% decode speed — BASELINE.md)
    if (!getenv("BFQ_CM_NOCANON") && k > 8 && k <= 256) {
        int64_t freq[256];
        for (int s = 0; s < k; s++) freq[s] = hist[uniq[s]];
        int maxd = huffman_depths(freq, k, depths);
        int bits_bal = 1;
        while ((1 << bits_bal) < k) bits_bal++;
        long double steps_h = 0, steps_b = 0;
        for (int s = 0; s < k; s++) {
            steps_h += (long double)freq[s] * depths[s];
            steps_b += (long double)freq[s] * bits_bal;
        }
        canon = maxd <= 30 && steps_h <= steps_b * 0.97L;
    }
    const uint8_t* dp = canon ? depths : nullptr;

    int64_t nblocks = n > 0 ? (n + bsize - 1) / bsize : 1;
    if (nblocks > 0xFFFFFFFFll) return -5;
    std::vector<std::vector<uint8_t>> payloads((size_t)nblocks);
    std::vector<uint8_t> rc_off((size_t)nblocks, 0), hi_off((size_t)nblocks, 0);
    parallel_blocks(nblocks, nthreads, [&](int64_t b) {
        int64_t lo = b * bsize;
        int64_t nb = std::min(bsize, n - lo) < 0 ? 0 : std::min(bsize, n - lo);
        int64_t cov = encode_stream_v2(d.data() + lo, nb, k, payloads[(size_t)b],
                                       reset_dense, /*ver=*/5, uniq,
                                       /*allow_rc=*/!fast, /*allow_hi=*/!fast,
                                       dp);
        if (!fast && cov >= 0 && cov < nb / 64) {
            // RC match coverage < 1.6% of symbols: the model cannot pay for
            // its decode cost (an extra random hash write per symbol) — the
            // encoder measured the gain and turns it off for this block
            std::vector<uint8_t> alt;
            encode_stream_v2(d.data() + lo, nb, k, alt, reset_dense, /*ver=*/5,
                             uniq, /*allow_rc=*/false, /*allow_hi=*/true, dp);
            if (alt.size() <= payloads[(size_t)b].size()) {
                payloads[(size_t)b].swap(alt);
                rc_off[(size_t)b] = 1;
            }
        }
        if (!fast && k <= 8 && !getenv("BFQ_CM_NOHI")) {
            // hi gating: the order-4/order-6 models cost ~25% of decode
            // (one random 16MB-table read per symbol) — the encoder codes
            // the block both ways and keeps them only when they earn >0.5%
            // (real genomes with repeat structure; synthetic/random ones
            // measure neutral-to-negative, BASELINE.md ratio notes)
            std::vector<uint8_t> alt;
            encode_stream_v2(d.data() + lo, nb, k, alt, reset_dense, /*ver=*/5,
                             uniq, /*allow_rc=*/!rc_off[(size_t)b],
                             /*allow_hi=*/false, dp);
            if ((double)alt.size() <= 1.005 * payloads[(size_t)b].size()) {
                payloads[(size_t)b].swap(alt);
                hi_off[(size_t)b] = 1;
            }
        }
    });

    int64_t total = 24 + k + (canon ? k : 0) + 4 * nblocks;
    for (auto& p : payloads) {
        if (p.size() > 0x3FFFFFFFull) return -5;  // bits 30/31 carry model flags
        total += (int64_t)p.size();
    }
    if (total > out_cap) return -2;
    uint8_t* q = out;
    std::memcpy(q, kMagic, 4); q += 4;
    *q++ = 5; *q++ = (uint8_t)(k - 1);
    // flags bit0: positional model; bit1: fast profile (RC/hi disabled);
    // bit2: canonical depth table follows uniq
    *q++ = (uint8_t)((reset_dense >= 0 ? 1 : 0) | (fast ? 2 : 0) | (canon ? 4 : 0));
    *q++ = reset_dense >= 0 ? (uint8_t)reset_dense : 0;
    uint64_t n64 = (uint64_t)n;
    std::memcpy(q, &n64, 8); q += 8;
    uint32_t b32 = (uint32_t)bsize, nb32 = (uint32_t)nblocks;
    std::memcpy(q, &b32, 4); q += 4;
    std::memcpy(q, &nb32, 4); q += 4;
    std::memcpy(q, uniq, (size_t)k); q += k;
    if (canon) { std::memcpy(q, depths, (size_t)k); q += k; }
    for (int64_t b = 0; b < nblocks; b++) {
        // bit31: block coded with RC gated off; bit30: hi models gated off
        uint32_t plen = (uint32_t)payloads[(size_t)b].size()
                        | (rc_off[(size_t)b] ? 0x80000000u : 0)
                        | (hi_off[(size_t)b] ? 0x40000000u : 0);
        std::memcpy(q, &plen, 4); q += 4;
    }
    for (auto& p : payloads) {
        std::memcpy(q, p.data(), p.size()); q += p.size();
    }
    return q - out;
}

// Returns decoded length (pass out=nullptr to query), negative on error.
int64_t cm_decode(const uint8_t* blob, int64_t size, uint8_t* out, int64_t out_cap) {
    if (size < 20 || std::memcmp(blob, kMagic, 4) != 0) return -1;
    int version = blob[4];
    if (version < 1 || version > 5) return -1;
    int k = blob[5] + 1;
    int tier = blob[6];
    if (version < 3 && tier > 2) return -1;
    uint64_t n;
    std::memcpy(&n, blob + 8, 8);

    if (version >= 3) {  // 3 = legacy blocked, 4/5 = blocked + v4/v5 model
        if (size < 24) return -1;
        int flags = blob[6];
        if (flags > (version >= 5 ? 7 : 1)) return -1;
        bool fast = version >= 5 && (flags & 2);
        bool canon = version >= 5 && (flags & 4);
        int reset_dense = (flags & 1) ? blob[7] : -1;
        if (reset_dense >= k) return -1;
        uint32_t bsize, nblocks;
        std::memcpy(&bsize, blob + 16, 4);
        std::memcpy(&nblocks, blob + 20, 4);
        if (out == nullptr) return (int64_t)n;
        if ((int64_t)n > out_cap) return -2;
        if (bsize == 0 || nblocks == 0) return -3;
        // coverage + table bounds (hostile headers must fail cleanly)
        if ((uint64_t)bsize * nblocks < n) return -3;
        if ((uint64_t)bsize * (nblocks - 1) >= n && n > 0 && nblocks > 1) return -3;
        int64_t tab = 24 + k + (canon ? k : 0);
        if (tab + 4ll * nblocks > size) return -3;
        std::vector<int64_t> off((size_t)nblocks + 1);
        std::vector<uint8_t> rc_off((size_t)nblocks, 0), hi_off((size_t)nblocks, 0);
        off[0] = tab + 4ll * nblocks;
        for (uint32_t b = 0; b < nblocks; b++) {
            uint32_t plen;
            std::memcpy(&plen, blob + tab + 4ll * b, 4);
            if (version >= 5) {
                // bit31: RC model gated off; bit30: hi models gated off
                rc_off[b] = (uint8_t)(plen >> 31);
                hi_off[b] = (uint8_t)((plen >> 30) & 1);
                plen &= 0x3FFFFFFFu;
            }
            off[b + 1] = off[b] + plen;
            if (off[b + 1] > size) return -3;
        }
        const uint8_t* uniq = blob + 24;
        const uint8_t* depths = canon ? blob + 24 + k : nullptr;
        std::atomic<int> err(0);
        // BFQ_CM_BLOCKTIME=<path>: append one per-block decode wall-time (ns)
        // per line — the measured input for thread-scaling extrapolation on
        // hosts with fewer cores than production (tools/bench_decode_scaling.py)
        const char* bt_path = getenv("BFQ_CM_BLOCKTIME");
        std::vector<int64_t> block_ns(bt_path ? (size_t)nblocks : 0);
        parallel_blocks((int64_t)nblocks, default_threads(), [&](int64_t b) {
            auto t0 = std::chrono::steady_clock::now();
            int64_t lo = (int64_t)b * bsize;
            int64_t nb = std::min<int64_t>(bsize, (int64_t)n - lo);
            if (nb < 0) nb = 0;
            int rc = decode_stream_v2(blob + off[(size_t)b],
                                      off[(size_t)b + 1] - off[(size_t)b], nb, k,
                                      uniq, out + lo, reset_dense, version,
                                      /*allow_rc=*/!fast && !rc_off[(size_t)b],
                                      /*allow_hi=*/!fast && !hi_off[(size_t)b],
                                      depths);
            if (rc < 0) err.store(rc);
            if (bt_path)
                block_ns[(size_t)b] = std::chrono::duration_cast<std::chrono::nanoseconds>(
                                          std::chrono::steady_clock::now() - t0)
                                          .count();
        });
        if (bt_path) {
            if (FILE* f = fopen(bt_path, "a")) {
                for (uint32_t b = 0; b < nblocks; b++)
                    fprintf(f, "%lld\n", (long long)block_ns[b]);
                fclose(f);
            }
        }
        if (err.load() < 0) return err.load();
        return (int64_t)n;
    }

    uint32_t plen;
    std::memcpy(&plen, blob + 16, 4);
    if (out == nullptr) return (int64_t)n;
    if ((int64_t)n > out_cap) return -2;
    if (20 + k + (int64_t)plen > size) return -3;
    const uint8_t* uniq = blob + 20;
    const uint8_t* payload = blob + 20 + k;

    if (version == 2) {
        int rc = decode_stream_v2(payload, plen, (int64_t)n, k, uniq, out);
        return rc < 0 ? rc : (int64_t)n;
    }

    // v1 tier tables are sized for k <= 64 (tier 1) — reject mismatched
    // headers instead of indexing out of bounds
    if (tier == 1 && k > 64) return -1;
    ModelV1 m(k, tier);
    RangeDecoder rc(payload, plen);
    int prev = 0, prev2 = 0;
    int64_t rl = 0;
    for (int64_t i = 0; i < (int64_t)n; i++) {
        size_t base = m.ctx_base(prev, prev2, rl_bucket(rl));
        int node = 1;
        for (int b = m.bits - 1; b >= 0; b--) node = node * 2 + rc.decode_bit(m.p[base + node]);
        int s = node - m.tree;
        if (s >= k) return -4;
        out[i] = uniq[s];
        rl = (s == prev) ? rl + 1 : 0;
        prev2 = prev;
        prev = s;
    }
    return (int64_t)n;
}

}  // extern "C"
