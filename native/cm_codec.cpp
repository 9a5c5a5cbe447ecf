// Adaptive context-model codec ("BQZC" containers) — the PPMd/BSC-class
// entropy back end for step 5 (the reference shells out to `7z a -mm=PPMd`
// and `bsc e`, BFQzip.py:253-275; this replaces both with an in-tree coder).
//
// Design: binary range coder (carry-counting, 32-bit renormalisation) over a
// bit-tree decomposition of a dense alphabet, with adaptive 12-bit
// probabilities conditioned on (previous symbol, second-previous symbol,
// run-length bucket).  That context set is what makes BWT-domain streams
// (long runs, strong order-1 structure) compress at block-sorter rates; on
// plain streams it behaves like an order-2 byte model.
//
// Container "BQZC" v1:
//   magic[4] 'BQZC', u8 version, u8 k-1, u8 tier, u8 pad
//   u64 n, u32 payload_len
//   u8 uniq[k]
//   payload bytes
//
// tier 0: ctx = prev * k * 8 + prev2 * 8 + rlb          (k <= 16)
// tier 1: ctx = (prev * 64 + prev2q) * 8 + rlb          (k <= 64, q = full)
// tier 2: ctx = prev * 8 + rlb                          (k <= 256)

#include <cstdint>
#include <cstring>
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

struct Model {
    int k, tier, bits, tree;
    std::vector<uint16_t> p;

    Model(int k_, int tier_) : k(k_), tier(tier_) {
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
    int tier = k <= 16 ? 0 : (k <= 64 ? 1 : 2);

    Model m(k, tier);
    std::vector<uint8_t> payload;
    payload.reserve((size_t)(n / 3 + 64));
    RangeEncoder rc(payload);

    int prev = 0, prev2 = 0;
    int64_t rl = 0;
    for (int64_t i = 0; i < n; i++) {
        int s = dense[data[i]];
        size_t base = m.ctx_base(prev, prev2, rl_bucket(rl));
        int node = 1;
        for (int b = m.bits - 1; b >= 0; b--) {
            int bit = (s >> b) & 1;
            rc.encode_bit(m.p[base + node], bit);
            node = node * 2 + bit;
        }
        rl = (s == prev) ? rl + 1 : 0;
        prev2 = prev;
        prev = s;
    }
    rc.flush();

    int64_t total = 20 + k + (int64_t)payload.size();
    if (total > out_cap) return -2;
    uint8_t* q = out;
    std::memcpy(q, kMagic, 4); q += 4;
    *q++ = 1; *q++ = (uint8_t)(k - 1); *q++ = (uint8_t)tier; *q++ = 0;
    uint64_t n64 = (uint64_t)n;
    std::memcpy(q, &n64, 8); q += 8;
    uint32_t plen = (uint32_t)payload.size();
    std::memcpy(q, &plen, 4); q += 4;
    std::memcpy(q, uniq, (size_t)k); q += k;
    std::memcpy(q, payload.data(), payload.size()); q += payload.size();
    return q - out;
}

// Returns decoded length (pass out=nullptr to query), negative on error.
int64_t cm_decode(const uint8_t* blob, int64_t size, uint8_t* out, int64_t out_cap) {
    if (size < 20 || std::memcmp(blob, kMagic, 4) != 0) return -1;
    if (blob[4] != 1) return -1;
    int k = blob[5] + 1;
    int tier = blob[6];
    if (tier > 2) return -1;
    uint64_t n;
    uint32_t plen;
    std::memcpy(&n, blob + 8, 8);
    std::memcpy(&plen, blob + 16, 4);
    if (out == nullptr) return (int64_t)n;
    if ((int64_t)n > out_cap) return -2;
    if (20 + k + (int64_t)plen > size) return -3;
    const uint8_t* uniq = blob + 20;
    const uint8_t* payload = blob + 20 + k;

    Model m(k, tier);
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
