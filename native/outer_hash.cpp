// BN254-Fr Poseidon2 batch hashing for the wrap stage (outer context).
//
// Reference roles: slop/crates/bn254/src/lib.rs (OuterPerm, Hasher,
// Compressor) and the MultiField32Challenger grind of
// crates/recursion/circuit/src/challenger.rs. The wrap commit hashes
// millions of KoalaBear codeword rows into one-element BN254 digests;
// this library provides the Montgomery-form width-3 permutation with
// batch row-hash / layer-compress / transcript-grind entry points so the
// Python wrap prover (pcs/outer_merkle.py) stays off the bigint path.
//
// Field constants (modulus, R^2, round constants) are injected from
// sp1_tpu/field/bn254.py at init so the tables live in ONE place.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

typedef unsigned __int128 u128;

struct Fe { uint64_t w[4]; };  // little-endian limbs

static Fe P;            // modulus
static Fe R2;           // 2^512 mod p
static uint64_t N0INV;  // -p^{-1} mod 2^64
static int ROUNDS_F = 0, ROUNDS_P = 0;
static std::vector<Fe> RC;   // montgomery, rounds x 3
static Fe DIAG[3];           // montgomery internal diagonal (1,1,2)
static Fe ONE_M;             // montgomery 1
static uint64_t KB_P = 0x7f000001ULL;  // KoalaBear modulus (2^31-2^24+1)

inline bool geq(const Fe& a, const Fe& b) {
    for (int i = 3; i >= 0; i--) {
        if (a.w[i] != b.w[i]) return a.w[i] > b.w[i];
    }
    return true;
}

inline void sub_p(Fe& a) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a.w[i] - P.w[i] - (uint64_t)borrow;
        a.w[i] = (uint64_t)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

inline Fe add(const Fe& a, const Fe& b) {
    Fe r; u128 carry = 0;
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a.w[i] + b.w[i] + (uint64_t)carry;
        r.w[i] = (uint64_t)s;
        carry = s >> 64;
    }
    if (carry || geq(r, P)) sub_p(r);
    return r;
}

// Montgomery multiplication (CIOS).
inline Fe mul(const Fe& a, const Fe& b) {
    uint64_t t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)a.w[i] * b.w[j] + t[j] + (uint64_t)carry;
            t[j] = (uint64_t)cur;
            carry = cur >> 64;
        }
        u128 s = (u128)t[4] + (uint64_t)carry;
        t[4] = (uint64_t)s;
        t[5] = (uint64_t)(s >> 64);
        uint64_t m = t[0] * N0INV;
        carry = ((u128)m * P.w[0] + t[0]) >> 64;
        for (int j = 1; j < 4; j++) {
            u128 cur = (u128)m * P.w[j] + t[j] + (uint64_t)carry;
            t[j - 1] = (uint64_t)cur;
            carry = cur >> 64;
        }
        s = (u128)t[4] + (uint64_t)carry;
        t[3] = (uint64_t)s;
        t[4] = t[5] + (uint64_t)(s >> 64);
        t[5] = 0;
    }
    Fe r;
    memcpy(r.w, t, 32);
    if (t[4] || geq(r, P)) sub_p(r);
    return r;
}

inline Fe sbox(const Fe& x) {
    Fe x2 = mul(x, x);
    Fe x4 = mul(x2, x2);
    return mul(x4, x);
}

inline void external_layer(Fe st[3]) {
    Fe s = add(add(st[0], st[1]), st[2]);
    st[0] = add(st[0], s);
    st[1] = add(st[1], s);
    st[2] = add(st[2], s);
}

inline void internal_layer(Fe st[3]) {
    Fe s = add(add(st[0], st[1]), st[2]);
    st[0] = add(mul(st[0], DIAG[0]), s);
    st[1] = add(mul(st[1], DIAG[1]), s);
    st[2] = add(mul(st[2], DIAG[2]), s);
}

// Poseidon2 on a Montgomery-form state (field/bn254.py permute()).
inline void permute_m(Fe st[3]) {
    external_layer(st);
    int half = ROUNDS_F / 2;
    for (int r = 0; r < half; r++) {
        for (int i = 0; i < 3; i++) st[i] = sbox(add(st[i], RC[r * 3 + i]));
        external_layer(st);
    }
    for (int r = 0; r < ROUNDS_P; r++) {
        st[0] = sbox(add(st[0], RC[(half + r) * 3]));
        internal_layer(st);
    }
    for (int r = half; r < ROUNDS_F; r++) {
        for (int i = 0; i < 3; i++)
            st[i] = sbox(add(st[i], RC[(ROUNDS_P + r) * 3 + i]));
        external_layer(st);
    }
}

inline Fe to_monty(const Fe& a) { return mul(a, R2); }

inline Fe from_monty(const Fe& a) {
    Fe one = {{1, 0, 0, 0}};
    return mul(a, one);
}

// Pack up to 8 KoalaBear canonical values little-endian base 2^31
// (multifield.py:_reduce_31; 8*31 = 248 bits < 254 so no reduction).
inline Fe pack8(const uint32_t* vals, int n) {
    Fe r = {{0, 0, 0, 0}};
    for (int i = 0; i < n; i++) {
        int bit = 31 * i;
        uint64_t v = vals[i];
        r.w[bit / 64] |= v << (bit % 64);
        if ((bit % 64) + 31 > 64) r.w[bit / 64 + 1] |= v >> (64 - bit % 64);
    }
    return r;
}

}  // namespace

extern "C" {

int oh_init(const uint64_t* p_limbs, const uint64_t* r2_limbs,
            uint64_t n0inv, const uint64_t* rc_canon, int rounds_f,
            int rounds_p) {
    memcpy(P.w, p_limbs, 32);
    memcpy(R2.w, r2_limbs, 32);
    N0INV = n0inv;
    ROUNDS_F = rounds_f;
    ROUNDS_P = rounds_p;
    int n_rc = (rounds_f + rounds_p) * 3;
    RC.resize(n_rc);
    for (int i = 0; i < n_rc; i++) {
        Fe c;
        memcpy(c.w, rc_canon + 4 * i, 32);
        RC[i] = to_monty(c);
    }
    Fe one = {{1, 0, 0, 0}};
    ONE_M = to_monty(one);
    Fe two = {{2, 0, 0, 0}};
    DIAG[0] = ONE_M;
    DIAG[1] = ONE_M;
    DIAG[2] = to_monty(two);
    return 0;
}

// Canonical-form permutation (3 x 4 limbs in/out) — parity testing hook.
void oh_permute(uint64_t* state) {
    Fe st[3];
    for (int i = 0; i < 3; i++) {
        memcpy(st[i].w, state + 4 * i, 32);
        st[i] = to_monty(st[i]);
    }
    permute_m(st);
    for (int i = 0; i < 3; i++) {
        Fe c = from_monty(st[i]);
        memcpy(state + 4 * i, c.w, 32);
    }
}

// Hash H rows of W canonical KoalaBear values each -> H canonical
// one-element digests (pcs/outer_merkle.py:hash_row convention: pack 8
// felts per element, absorb 2 elements per permutation, digest =
// state[0]).
void oh_hash_rows(const uint32_t* rows, uint64_t h, uint64_t w,
                  uint64_t* out) {
    uint64_t n_elems = (w + 7) / 8;
    for (uint64_t r = 0; r < h; r++) {
        const uint32_t* row = rows + r * w;
        Fe st[3] = {{{0, 0, 0, 0}}, {{0, 0, 0, 0}}, {{0, 0, 0, 0}}};
        for (uint64_t e = 0; e < n_elems; e += 2) {
            int n0 = (int)((e * 8 + 8 <= w) ? 8 : w - e * 8);
            st[0] = to_monty(pack8(row + e * 8, n0));
            if (e + 1 < n_elems) {
                int n1 = (int)(((e + 1) * 8 + 8 <= w) ? 8 : w - (e + 1) * 8);
                st[1] = to_monty(pack8(row + (e + 1) * 8, n1));
            }
            permute_m(st);
        }
        Fe d = from_monty(st[0]);
        memcpy(out + 4 * r, d.w, 32);
    }
}

// (2n) canonical digests -> n parents: permute([l, r, 0])[0].
void oh_compress_layer(const uint64_t* in, uint64_t n, uint64_t* out) {
    for (uint64_t i = 0; i < n; i++) {
        Fe st[3];
        memcpy(st[0].w, in + 8 * i, 32);
        memcpy(st[1].w, in + 8 * i + 4, 32);
        st[0] = to_monty(st[0]);
        st[1] = to_monty(st[1]);
        st[2] = Fe{{0, 0, 0, 0}};
        permute_m(st);
        Fe d = from_monty(st[0]);
        memcpy(out + 4 * i, d.w, 32);
    }
}

// MultiField32 transcript grind (iop/multifield.py:grind): find the
// smallest witness w such that observing w and sampling `bits` low bits
// yields zero. state: 3x4 canonical limbs; buf: the pending input
// buffer (canonical KoalaBear felts, nbuf < 16). The sample drawn is
// split_32(state'[1])[3] where state' = duplex(state, buf + [w]).
uint64_t oh_grind(const uint64_t* state_limbs, const uint32_t* buf,
                  uint64_t nbuf, int bits) {
    Fe base[3];
    for (int i = 0; i < 3; i++) {
        memcpy(base[i].w, state_limbs + 4 * i, 32);
        base[i] = to_monty(base[i]);
    }
    uint64_t mask = (bits >= 64) ? ~0ULL : ((1ULL << bits) - 1);
    uint32_t inputs[16];
    for (uint64_t i = 0; i < nbuf && i < 16; i++) inputs[i] = buf[i];
    for (uint64_t wcand = 0;; wcand++) {
        inputs[nbuf] = (uint32_t)(wcand % KB_P);
        uint64_t n_in = nbuf + 1;
        Fe st[3] = {base[0], base[1], base[2]};
        for (uint64_t i = 0; i < n_in; i += 8) {
            int cn = (int)((i + 8 <= n_in) ? 8 : n_in - i);
            st[i / 8] = to_monty(pack8(inputs + i, cn));
        }
        permute_m(st);
        Fe s1 = from_monty(st[1]);
        uint64_t felt3 = s1.w[3] % KB_P;  // split_32 chunk 3 = bits 192..255
        if ((felt3 & mask) == 0) return wcand;
    }
}

}  // extern "C"
