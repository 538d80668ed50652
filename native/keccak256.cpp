// Keccak-256 (original Keccak padding 0x01, NOT SHA3's 0x06) — the hash the
// reference uses for Merkle trees, the Fiat-Shamir transcript and grinding
// (lambdaworks-crypto Keccak256 backend; see config.rs:10-20 usage).
//
// Plain portable C++ implementation of Keccak-f[1600] from the Keccak
// specification; built as a shared library consumed via ctypes
// (lambdaworks_cairo_prover_tpu/hash/keccak_host.py) to replace the pure
// python permutation on hot host paths (transcript, host Merkle tails,
// proof-path verification).
//
// Build: make -C native   (produces libkeccak256.so)

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

constexpr int ROUNDS = 24;

constexpr uint64_t RC[ROUNDS] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};

// rotation offsets for the rho step, indexed [x][y]
constexpr int RHO[5][5] = {
    {0, 36, 3, 41, 18},
    {1, 44, 10, 45, 2},
    {62, 6, 43, 15, 61},
    {28, 55, 25, 21, 56},
    {27, 20, 39, 8, 14},
};

inline uint64_t rotl(uint64_t v, int s) {
    return s == 0 ? v : (v << s) | (v >> (64 - s));
}

void keccak_f(uint64_t a[25]) {
    for (int round = 0; round < ROUNDS; ++round) {
        // theta
        uint64_t c[5], d[5];
        for (int x = 0; x < 5; ++x)
            c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
        for (int x = 0; x < 5; ++x)
            d[x] = c[(x + 4) % 5] ^ rotl(c[(x + 1) % 5], 1);
        for (int y = 0; y < 5; ++y)
            for (int x = 0; x < 5; ++x)
                a[x + 5 * y] ^= d[x];
        // rho + pi
        uint64_t b[25];
        for (int y = 0; y < 5; ++y)
            for (int x = 0; x < 5; ++x)
                b[y + 5 * ((2 * x + 3 * y) % 5)] = rotl(a[x + 5 * y], RHO[x][y]);
        // chi
        for (int y = 0; y < 5; ++y)
            for (int x = 0; x < 5; ++x)
                a[x + 5 * y] =
                    b[x + 5 * y] ^ (~b[(x + 1) % 5 + 5 * y] & b[(x + 2) % 5 + 5 * y]);
        // iota
        a[0] ^= RC[round];
    }
}

constexpr size_t RATE = 136;  // 1088-bit rate for 256-bit capacity

void keccak256_one(const uint8_t* in, size_t len, uint8_t out[32]) {
    uint64_t st[25];
    std::memset(st, 0, sizeof(st));
    // absorb
    while (len >= RATE) {
        for (size_t i = 0; i < RATE / 8; ++i) {
            uint64_t w;
            std::memcpy(&w, in + 8 * i, 8);
            st[i] ^= w;  // little-endian hosts only (x86/arm64)
        }
        keccak_f(st);
        in += RATE;
        len -= RATE;
    }
    // final block with original Keccak pad 0x01 ... 0x80
    uint8_t block[RATE];
    std::memset(block, 0, RATE);
    std::memcpy(block, in, len);
    block[len] = 0x01;
    block[RATE - 1] |= 0x80;
    for (size_t i = 0; i < RATE / 8; ++i) {
        uint64_t w;
        std::memcpy(&w, block + 8 * i, 8);
        st[i] ^= w;
    }
    keccak_f(st);
    std::memcpy(out, st, 32);
}

}  // namespace

extern "C" {

void keccak256(const uint8_t* in, size_t len, uint8_t* out) {
    keccak256_one(in, len, out);
}

// n independent messages of equal length `len` packed contiguously
void keccak256_batch(const uint8_t* in, size_t len, size_t n, uint8_t* out) {
    for (size_t i = 0; i < n; ++i)
        keccak256_one(in + i * len, len, out + 32 * i);
}

// build a full binary Merkle level-by-level: digests (n*32 bytes, n a power
// of two) -> parent level (n/2 * 32 bytes), node = keccak(left || right)
void keccak256_merkle_level(const uint8_t* digests, size_t n, uint8_t* out) {
    for (size_t i = 0; i < n / 2; ++i)
        keccak256_one(digests + 64 * i, 64, out + 32 * i);
}

// fold one Merkle authentication path: h = leaf; per level
// h = keccak(h || sib) if the index bit is even else keccak(sib || h)
// (lambdaworks Proof::verify rule).  One call per path instead of one
// ctypes round trip per level — the verifier's hot loop.
void keccak256_merkle_fold(const uint8_t* leaf, const uint8_t* siblings,
                           size_t n_levels, uint64_t index, uint8_t* out) {
    uint8_t buf[64];
    uint8_t h[32];
    std::memcpy(h, leaf, 32);
    for (size_t i = 0; i < n_levels; ++i) {
        if ((index & 1) == 0) {
            std::memcpy(buf, h, 32);
            std::memcpy(buf + 32, siblings + 32 * i, 32);
        } else {
            std::memcpy(buf, siblings + 32 * i, 32);
            std::memcpy(buf + 32, h, 32);
        }
        keccak256_one(buf, 64, h);
        index >>= 1;
    }
    std::memcpy(out, h, 32);
}

// batch of equal-depth paths: leaves (n_paths*32), siblings path-major
// (n_paths * n_levels * 32), indices (n_paths u64) -> roots (n_paths*32).
// One ctypes call per tree instead of one per path.
void keccak256_merkle_fold_batch(const uint8_t* leaves,
                                 const uint8_t* siblings, size_t n_levels,
                                 const uint64_t* indices, size_t n_paths,
                                 uint8_t* out) {
    for (size_t p = 0; p < n_paths; ++p)
        keccak256_merkle_fold(leaves + 32 * p,
                              siblings + 32 * n_levels * p, n_levels,
                              indices[p], out + 32 * p);
}

}  // extern "C"
