// Native host-side kernels: BN254 Fr Montgomery arithmetic + Poseidon.
//
// Role-equivalent of the reference's native layer (arkworks ark-ff with the
// x86-64 `asm` feature, plonk-core/Cargo.toml:65): the host hot paths of
// witness synthesis — Poseidon hashing for Merkle trees / nullifiers and
// bulk field ops — run here instead of Python big-ints.  The TPU compute
// path (NTT/MSM/quotient) is unaffected; this is the CPU runtime side.
//
// Exposed as a C ABI consumed via ctypes (no pybind11 dependency).
// Field elements cross the boundary as canonical little-endian 4x64-bit
// limbs; Montgomery form is internal.

#include <cstdint>
#include <cstring>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;

namespace {

struct Fr {
    u64 v[4];
};

// BN254 Fr modulus and Montgomery constants (R = 2^256)
static const Fr MOD = {{0x43e1f593f0000001ULL, 0x2833e84879b97091ULL,
                        0xb85045b68181585dULL, 0x30644e72e131a029ULL}};
static const u64 N0INV = 0xc2e1f593efffffffULL;
static const Fr R2 = {{0x1bb8e645ae216da7ULL, 0x53fe3ab1e35c59e3ULL,
                       0x8c49833d53bb8085ULL, 0x0216d0b17f4e44a5ULL}};
static const Fr ONE_MONT = {{0xac96341c4ffffffbULL, 0x36fc76959f60cd29ULL,
                             0x666ea36f7879462eULL, 0x0e0a77c19a07df2fULL}};

inline bool geq(const Fr& a, const Fr& b) {
    for (int i = 3; i >= 0; --i) {
        if (a.v[i] != b.v[i]) return a.v[i] > b.v[i];
    }
    return true;
}

inline void sub_mod_raw(Fr& a, const Fr& b) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.v[i] - b.v[i] - borrow;
        a.v[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

inline void reduce(Fr& a) {
    if (geq(a, MOD)) sub_mod_raw(a, MOD);
}

inline void add(Fr& out, const Fr& a, const Fr& b) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a.v[i] + b.v[i] + carry;
        out.v[i] = (u64)s;
        carry = s >> 64;
    }
    // a, b < p < 2^254 so no overflow past 4 limbs
    reduce(out);
}

inline void sub(Fr& out, const Fr& a, const Fr& b) {
    out = a;
    if (!geq(out, b)) {
        // add modulus first
        u128 carry = 0;
        for (int i = 0; i < 4; ++i) {
            u128 s = (u128)out.v[i] + MOD.v[i] + carry;
            out.v[i] = (u64)s;
            carry = s >> 64;
        }
    }
    sub_mod_raw(out, b);
}

// CIOS Montgomery multiplication
inline void mul(Fr& out, const Fr& a, const Fr& b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
        u128 carry = 0;
        for (int j = 0; j < 4; ++j) {
            u128 cur = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
            t[j] = (u64)cur;
            carry = cur >> 64;
        }
        u128 cur = (u128)t[4] + carry;
        t[4] = (u64)cur;
        t[5] = (u64)(cur >> 64);

        u64 m = t[0] * N0INV;
        carry = ((u128)t[0] + (u128)m * MOD.v[0]) >> 64;
        for (int j = 1; j < 4; ++j) {
            u128 c2 = (u128)t[j] + (u128)m * MOD.v[j] + carry;
            t[j - 1] = (u64)c2;
            carry = c2 >> 64;
        }
        cur = (u128)t[4] + carry;
        t[3] = (u64)cur;
        t[4] = t[5] + (u64)(cur >> 64);
    }
    for (int i = 0; i < 4; ++i) out.v[i] = t[i];
    reduce(out);
}

inline void to_mont(Fr& out, const Fr& a) { mul(out, a, R2); }

inline void from_mont(Fr& out, const Fr& a) {
    Fr one_plain = {{1, 0, 0, 0}};
    mul(out, a, one_plain);
}

inline void pow_mont(Fr& out, const Fr& base, const Fr& exp_plain) {
    Fr acc = ONE_MONT;
    Fr b = base;
    for (int limb = 0; limb < 4; ++limb) {
        u64 e = exp_plain.v[limb];
        (void)e;
    }
    // MSB-first square and multiply over 256 bits
    bool started = false;
    for (int bit = 255; bit >= 0; --bit) {
        if (started) mul(acc, acc, acc);
        if ((exp_plain.v[bit / 64] >> (bit % 64)) & 1) {
            if (started) {
                mul(acc, acc, b);
            } else {
                acc = b;
                started = true;
            }
        }
    }
    out = started ? acc : ONE_MONT;
}

inline void inv_mont(Fr& out, const Fr& a) {
    Fr p_minus_2 = MOD;
    // p - 2 (p is odd, low limb ends in 1)
    p_minus_2.v[0] -= 2;
    pow_mont(out, a, p_minus_2);
}

// ---------------------------------------------------------------------------
// Poseidon
// ---------------------------------------------------------------------------

struct PoseidonParams {
    int width = 0;
    int full_rounds = 0;
    int partial_rounds = 0;
    Fr domain_tag;
    std::vector<Fr> mds;  // width*width, Montgomery
    std::vector<Fr> rcs;  // round constants, Montgomery
};

static PoseidonParams g_poseidon[8];  // indexed by width

inline void sbox5(Fr& x) {
    Fr x2, x4;
    mul(x2, x, x);
    mul(x4, x2, x2);
    mul(x, x4, x);
}

void poseidon_permute(const PoseidonParams& P, Fr* state) {
    int off = 0;
    const int w = P.width;
    const int half = P.full_rounds / 2;
    Fr next[8];
    auto mds_mul = [&](Fr* st) {
        for (int j = 0; j < w; ++j) {
            Fr acc = {{0, 0, 0, 0}};
            for (int i = 0; i < w; ++i) {
                Fr t;
                mul(t, st[i], P.mds[i * w + j]);
                add(acc, acc, t);
            }
            next[j] = acc;
        }
        for (int j = 0; j < w; ++j) st[j] = next[j];
    };

    for (int r = 0; r < half; ++r) {
        for (int i = 0; i < w; ++i) {
            add(state[i], state[i], P.rcs[off + i]);
            sbox5(state[i]);
        }
        off += w;
        mds_mul(state);
    }
    for (int r = 0; r < P.partial_rounds; ++r) {
        for (int i = 0; i < w; ++i) add(state[i], state[i], P.rcs[off + i]);
        off += w;
        sbox5(state[0]);
        mds_mul(state);
    }
    for (int r = 0; r < half; ++r) {
        for (int i = 0; i < w; ++i) {
            add(state[i], state[i], P.rcs[off + i]);
            sbox5(state[i]);
        }
        off += w;
        mds_mul(state);
    }
}

}  // namespace

extern "C" {

// Batch ops: canonical LE 4x64 limbs in row-major (n, 4) arrays.

void zkt_fr_mul_batch(const u64* a, const u64* b, u64* out, size_t n) {
    for (size_t k = 0; k < n; ++k) {
        Fr am, bm, r;
        std::memcpy(am.v, a + 4 * k, 32);
        std::memcpy(bm.v, b + 4 * k, 32);
        to_mont(am, am);
        to_mont(bm, bm);
        mul(r, am, bm);
        from_mont(r, r);
        std::memcpy(out + 4 * k, r.v, 32);
    }
}

void zkt_fr_add_batch(const u64* a, const u64* b, u64* out, size_t n) {
    for (size_t k = 0; k < n; ++k) {
        Fr am, bm, r;
        std::memcpy(am.v, a + 4 * k, 32);
        std::memcpy(bm.v, b + 4 * k, 32);
        add(r, am, bm);
        std::memcpy(out + 4 * k, r.v, 32);
    }
}

void zkt_fr_inv_batch(const u64* a, u64* out, size_t n) {
    // Montgomery batch inversion (prefix-product trick)
    std::vector<Fr> vals(n), prefix(n + 1);
    prefix[0] = ONE_MONT;
    for (size_t k = 0; k < n; ++k) {
        std::memcpy(vals[k].v, a + 4 * k, 32);
        to_mont(vals[k], vals[k]);
        bool is_zero =
            !(vals[k].v[0] | vals[k].v[1] | vals[k].v[2] | vals[k].v[3]);
        Fr m = is_zero ? ONE_MONT : vals[k];
        mul(prefix[k + 1], prefix[k], m);
    }
    Fr inv_all;
    inv_mont(inv_all, prefix[n]);
    for (size_t k = n; k-- > 0;) {
        bool is_zero =
            !(vals[k].v[0] | vals[k].v[1] | vals[k].v[2] | vals[k].v[3]);
        Fr r = {{0, 0, 0, 0}};
        if (!is_zero) {
            mul(r, inv_all, prefix[k]);
            mul(inv_all, inv_all, vals[k]);
        }
        from_mont(r, r);
        std::memcpy(out + 4 * k, r.v, 32);
    }
}

int zkt_poseidon_init(int width, int full_rounds, int partial_rounds,
                      const u64* domain_tag, const u64* mds, const u64* rcs,
                      int n_rcs) {
    if (width < 2 || width >= 8) return -1;
    PoseidonParams& P = g_poseidon[width];
    P.width = width;
    P.full_rounds = full_rounds;
    P.partial_rounds = partial_rounds;
    std::memcpy(P.domain_tag.v, domain_tag, 32);
    to_mont(P.domain_tag, P.domain_tag);
    P.mds.resize(width * width);
    for (int i = 0; i < width * width; ++i) {
        std::memcpy(P.mds[i].v, mds + 4 * i, 32);
        to_mont(P.mds[i], P.mds[i]);
    }
    P.rcs.resize(n_rcs);
    for (int i = 0; i < n_rcs; ++i) {
        std::memcpy(P.rcs[i].v, rcs + 4 * i, 32);
        to_mont(P.rcs[i], P.rcs[i]);
    }
    return 0;
}

// inputs: (n, width-1, 4) canonical limbs; out: (n, 4)
int zkt_poseidon_hash_batch(int width, const u64* inputs, u64* out, size_t n) {
    PoseidonParams& P = g_poseidon[width];
    if (P.width != width) return -1;
    const int arity = width - 1;
    for (size_t k = 0; k < n; ++k) {
        Fr state[8];
        state[0] = P.domain_tag;
        for (int i = 0; i < arity; ++i) {
            Fr x;
            std::memcpy(x.v, inputs + 4 * (k * arity + i), 32);
            to_mont(x, x);
            state[i + 1] = x;
        }
        poseidon_permute(P, state);
        Fr r;
        from_mont(r, state[1]);
        std::memcpy(out + 4 * k, r.v, 32);
    }
    return 0;
}

}  // extern "C"
