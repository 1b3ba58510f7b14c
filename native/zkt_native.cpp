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

// ---------------------------------------------------------------------------
// BN254 Fq (base field) + G1 Jacobian + Pippenger MSM
//
// Host-side variable-base MSM — role of arkworks VariableBaseMSM on the
// CPU runtime side (plonk-core/src/commitment.rs:42).  Used by the KZG
// committer's host fallback so CPU-backend test/CLI runs take milliseconds
// instead of the pathological XLA:CPU device MSM.
// ---------------------------------------------------------------------------

struct Fq {
    u64 v[4];
};

static const Fq MODQ = {{0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                         0xb85045b68181585dULL, 0x30644e72e131a029ULL}};
static const u64 N0INVQ = 0x87d20782e4866389ULL;
static const Fq R2Q = {{0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL,
                        0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL}};
static const Fq ONEQ_MONT = {{0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL,
                              0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL}};

inline bool geqq(const Fq& a, const Fq& b) {
    for (int i = 3; i >= 0; --i) {
        if (a.v[i] != b.v[i]) return a.v[i] > b.v[i];
    }
    return true;
}

inline void sub_mod_rawq(Fq& a, const Fq& b) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.v[i] - b.v[i] - borrow;
        a.v[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

inline void reduceq(Fq& a) {
    if (geqq(a, MODQ)) sub_mod_rawq(a, MODQ);
}

inline void addq(Fq& out, const Fq& a, const Fq& b) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a.v[i] + b.v[i] + carry;
        out.v[i] = (u64)s;
        carry = s >> 64;
    }
    reduceq(out);
}

inline void subq(Fq& out, const Fq& a, const Fq& b) {
    out = a;
    if (!geqq(out, b)) {
        u128 carry = 0;
        for (int i = 0; i < 4; ++i) {
            u128 s = (u128)out.v[i] + MODQ.v[i] + carry;
            out.v[i] = (u64)s;
            carry = s >> 64;
        }
    }
    sub_mod_rawq(out, b);
}

inline void mulq(Fq& out, const Fq& a, const Fq& b) {
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

        u64 m = t[0] * N0INVQ;
        carry = ((u128)t[0] + (u128)m * MODQ.v[0]) >> 64;
        for (int j = 1; j < 4; ++j) {
            u128 c2 = (u128)t[j] + (u128)m * MODQ.v[j] + carry;
            t[j - 1] = (u64)c2;
            carry = c2 >> 64;
        }
        cur = (u128)t[4] + carry;
        t[3] = (u64)cur;
        t[4] = t[5] + (u64)(cur >> 64);
    }
    for (int i = 0; i < 4; ++i) out.v[i] = t[i];
    reduceq(out);
}

inline void to_montq(Fq& out, const Fq& a) { mulq(out, a, R2Q); }

inline void from_montq(Fq& out, const Fq& a) {
    Fq one_plain = {{1, 0, 0, 0}};
    mulq(out, a, one_plain);
}

inline bool is_zeroq(const Fq& a) {
    return !(a.v[0] | a.v[1] | a.v[2] | a.v[3]);
}

inline void inv_montq(Fq& out, const Fq& a) {
    // Fermat: a^(q-2), MSB-first
    Fq e = MODQ;
    e.v[0] -= 2;
    Fq acc = ONEQ_MONT;
    bool started = false;
    for (int bit = 255; bit >= 0; --bit) {
        if (started) mulq(acc, acc, acc);
        if ((e.v[bit / 64] >> (bit % 64)) & 1) {
            if (started) {
                mulq(acc, acc, a);
            } else {
                acc = a;
                started = true;
            }
        }
    }
    out = acc;
}

// G1 point, Jacobian coordinates (x = X/Z^2, y = Y/Z^3), Montgomery form.
struct G1 {
    Fq X, Y, Z;  // Z == 0 <=> infinity
};

// affine (Montgomery) point with explicit infinity flag
struct G1Aff {
    Fq x, y;
    bool inf;
};

inline void g1_set_inf(G1& p) {
    p.X = ONEQ_MONT;
    p.Y = ONEQ_MONT;
    std::memset(p.Z.v, 0, 32);
}

inline bool g1_is_inf(const G1& p) { return is_zeroq(p.Z); }

// dbl-2009-l (a = 0)
inline void g1_dbl(G1& out, const G1& p) {
    if (g1_is_inf(p)) {
        out = p;
        return;
    }
    Fq A, B, C, D, E, F, t0, t1;
    mulq(A, p.X, p.X);
    mulq(B, p.Y, p.Y);
    mulq(C, B, B);
    addq(t0, p.X, B);
    mulq(t0, t0, t0);
    subq(t0, t0, A);
    subq(t0, t0, C);
    addq(D, t0, t0);
    addq(E, A, A);
    addq(E, E, A);
    mulq(F, E, E);
    subq(out.X, F, D);
    subq(out.X, out.X, D);
    subq(t0, D, out.X);
    mulq(t0, E, t0);
    addq(t1, C, C);
    addq(t1, t1, t1);
    addq(t1, t1, t1);  // 8C
    mulq(out.Z, p.Y, p.Z);
    addq(out.Z, out.Z, out.Z);
    subq(out.Y, t0, t1);
}

// madd-2007-bl mixed addition (q affine, Montgomery)
inline void g1_madd(G1& out, const G1& p, const G1Aff& q) {
    if (q.inf) {
        out = p;
        return;
    }
    if (g1_is_inf(p)) {
        out.X = q.x;
        out.Y = q.y;
        out.Z = ONEQ_MONT;
        return;
    }
    Fq Z1Z1, U2, S2, H, HH, I, J, r, V, t0, t1;
    mulq(Z1Z1, p.Z, p.Z);
    mulq(U2, q.x, Z1Z1);
    mulq(S2, q.y, p.Z);
    mulq(S2, S2, Z1Z1);
    subq(H, U2, p.X);
    subq(r, S2, p.Y);
    if (is_zeroq(H)) {
        if (is_zeroq(r)) {
            G1 qj;
            qj.X = q.x;
            qj.Y = q.y;
            qj.Z = ONEQ_MONT;
            g1_dbl(out, qj);
            return;
        }
        g1_set_inf(out);
        return;
    }
    addq(r, r, r);  // r = 2(S2 - Y1)
    mulq(HH, H, H);
    addq(I, HH, HH);
    addq(I, I, I);  // 4HH
    mulq(J, H, I);
    mulq(V, p.X, I);
    mulq(t0, r, r);
    subq(t0, t0, J);
    subq(t0, t0, V);
    subq(out.X, t0, V);
    subq(t0, V, out.X);
    mulq(t0, r, t0);
    mulq(t1, p.Y, J);
    addq(t1, t1, t1);
    subq(out.Y, t0, t1);
    addq(t0, p.Z, H);
    mulq(t0, t0, t0);
    subq(t0, t0, Z1Z1);
    subq(out.Z, t0, HH);
}

// full Jacobian-Jacobian addition (add-2007-bl)
inline void g1_add(G1& out, const G1& p, const G1& q) {
    if (g1_is_inf(p)) {
        out = q;
        return;
    }
    if (g1_is_inf(q)) {
        out = p;
        return;
    }
    Fq Z1Z1, Z2Z2, U1, U2, S1, S2, H, I, J, r, V, t0, t1;
    mulq(Z1Z1, p.Z, p.Z);
    mulq(Z2Z2, q.Z, q.Z);
    mulq(U1, p.X, Z2Z2);
    mulq(U2, q.X, Z1Z1);
    mulq(S1, p.Y, q.Z);
    mulq(S1, S1, Z2Z2);
    mulq(S2, q.Y, p.Z);
    mulq(S2, S2, Z1Z1);
    subq(H, U2, U1);
    subq(r, S2, S1);
    if (is_zeroq(H)) {
        if (is_zeroq(r)) {
            g1_dbl(out, p);
            return;
        }
        g1_set_inf(out);
        return;
    }
    addq(t0, H, H);
    mulq(I, t0, t0);
    mulq(J, H, I);
    addq(r, r, r);
    mulq(V, U1, I);
    mulq(t0, r, r);
    subq(t0, t0, J);
    subq(t0, t0, V);
    subq(out.X, t0, V);
    subq(t0, V, out.X);
    mulq(t0, r, t0);
    mulq(t1, S1, J);
    addq(t1, t1, t1);
    subq(out.Y, t0, t1);
    addq(t0, p.Z, q.Z);
    mulq(t0, t0, t0);
    subq(t0, t0, Z1Z1);
    subq(t0, t0, Z2Z2);
    mulq(out.Z, t0, H);
}

}  // namespace

extern "C" {

// Projective (X, Y, Z with x = X/Z) canonical points -> affine + inf flags.
// proj: (n, 3, 4) LE limbs; affine_out: (n, 2, 4); inf_out: (n,) bytes.
void zkt_g1_normalize_batch(const u64* proj, u64* affine_out, uint8_t* inf_out,
                            size_t n) {
    std::vector<Fq> zs(n), prefix(n + 1);
    std::vector<bool> infs(n);
    prefix[0] = ONEQ_MONT;
    for (size_t k = 0; k < n; ++k) {
        Fq z;
        std::memcpy(z.v, proj + 12 * k + 8, 32);
        to_montq(z, z);
        infs[k] = is_zeroq(z);
        zs[k] = z;
        Fq m = infs[k] ? ONEQ_MONT : z;
        mulq(prefix[k + 1], prefix[k], m);
    }
    Fq inv_all;
    inv_montq(inv_all, prefix[n]);
    for (size_t k = n; k-- > 0;) {
        Fq zinv = {{0, 0, 0, 0}};
        if (!infs[k]) {
            mulq(zinv, inv_all, prefix[k]);
            mulq(inv_all, inv_all, zs[k]);
        }
        Fq x, y;
        std::memcpy(x.v, proj + 12 * k, 32);
        std::memcpy(y.v, proj + 12 * k + 4, 32);
        to_montq(x, x);
        to_montq(y, y);
        mulq(x, x, zinv);
        mulq(y, y, zinv);
        from_montq(x, x);
        from_montq(y, y);
        std::memcpy(affine_out + 8 * k, x.v, 32);
        std::memcpy(affine_out + 8 * k + 4, y.v, 32);
        inf_out[k] = infs[k] ? 1 : 0;
    }
}

// Pippenger variable-base MSM over affine canonical points.
// points: (n, 2, 4); inf: (n,) bytes; scalars: (n, 4) canonical LE (Fr).
// out: (2, 4) affine canonical. Returns 1 if the result is infinity.
int zkt_g1_msm(const u64* points, const uint8_t* inf, const u64* scalars,
               u64* out, size_t n) {
    if (n == 0) return 1;
    int c = 3;
    while ((size_t)1 << (c + 3) < n && c < 16) ++c;  // ~log2(n) - 3
    const int W = (254 + c - 1) / c;
    const size_t K = ((size_t)1 << c) - 1;

    std::vector<G1Aff> pts(n);
    for (size_t k = 0; k < n; ++k) {
        Fq x, y;
        std::memcpy(x.v, points + 8 * k, 32);
        std::memcpy(y.v, points + 8 * k + 4, 32);
        to_montq(pts[k].x, x);
        to_montq(pts[k].y, y);
        pts[k].inf = inf[k] != 0;
    }

    G1 total;
    g1_set_inf(total);
    std::vector<G1> buckets(K);
    for (int w = W - 1; w >= 0; --w) {
        for (int b = 0; b < c; ++b) g1_dbl(total, total);
        for (size_t k = 0; k < K; ++k) g1_set_inf(buckets[k]);
        const int bitpos = c * w;
        for (size_t k = 0; k < n; ++k) {
            if (pts[k].inf) continue;
            const int limb = bitpos / 64, off = bitpos % 64;
            u64 word = scalars[4 * k + limb] >> off;
            if (off + c > 64 && limb + 1 < 4)
                word |= scalars[4 * k + limb + 1] << (64 - off);
            const size_t d = word & (((size_t)1 << c) - 1);
            if (d) g1_madd(buckets[d - 1], buckets[d - 1], pts[k]);
        }
        // suffix trick: running = sum_{j>=k} B_j; acc += running
        G1 running, acc;
        g1_set_inf(running);
        g1_set_inf(acc);
        for (size_t k = K; k-- > 0;) {
            g1_add(running, running, buckets[k]);
            g1_add(acc, acc, running);
        }
        g1_add(total, total, acc);
    }

    if (g1_is_inf(total)) {
        std::memset(out, 0, 64);
        return 1;
    }
    Fq zinv, z2, z3, x, y;
    inv_montq(zinv, total.Z);
    mulq(z2, zinv, zinv);
    mulq(z3, z2, zinv);
    mulq(x, total.X, z2);
    mulq(y, total.Y, z3);
    from_montq(x, x);
    from_montq(y, y);
    std::memcpy(out, x.v, 32);
    std::memcpy(out + 4, y.v, 32);
    return 0;
}

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
