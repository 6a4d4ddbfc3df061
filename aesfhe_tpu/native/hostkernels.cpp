// Native host runtime kernels for aesfhe_tpu.
//
// The TPU (XLA/Pallas) owns the ciphertext compute path; these C++ kernels
// own the HOST legs that the reference delegated to desilofhe's native C++
// core (/root/reference/engine_context.py:6, SURVEY.md section 2.1): key
// generation NTTs, plain<->Montgomery conversion, and CRT reconstruction.
// Dispatching those through jit'd XLA graphs costs a shape-specialized
// compile per (rows, n) combination (dozens per keygen); plain C++ loops at
// -O3 run them in milliseconds with zero compile cost.
//
// Semantics are bit-identical to the JAX kernels in core/rns.py and
// core/ntt.py (asserted in tests/test_native.py):
//   - values are uint32 residues mod q, q <= 2^30 (NTT-friendly primes)
//   - Montgomery form is x*2^32 mod q; REDC matches rns.mont_mul
//   - twiddles are plain-domain constants applied with Shoup multiplication
//     (rns.shoup_mul), tables in Harvey/SEAL bit-reversed layout
//     (ntt.NTTTables: w[rev(j)] = psi^j)
//   - forward NTT: Cooley-Tukey with merged psi-twist, natural coefficient
//     order in, bit-reversed evaluation order out (ntt.ntt_fwd_unrolled)
//   - inverse NTT: Gentleman-Sande, bit-reversed in, natural out, final
//     scaling by n^-1 (ntt.ntt_inv_unrolled)
//
// Build: g++ -O3 -shared -fPIC (see aesfhe_tpu/native/__init__.py; no
// external dependencies, bound via ctypes).

#include <cstdint>

namespace {

inline uint32_t redc(uint64_t t, uint32_t q, uint32_t qinv_neg) {
    // Montgomery reduction: (t + m*q) / 2^32 with m = t*(-q^-1) mod 2^32.
    // t < 2^60 for all call sites (operands < q <= 2^30), so the sum fits
    // in 64 bits with room to spare.
    uint32_t m = (uint32_t)t * qinv_neg;
    uint64_t u = (t + (uint64_t)m * q) >> 32;
    return (u >= q) ? (uint32_t)(u - q) : (uint32_t)u;
}

inline uint32_t shoup(uint32_t x, uint32_t w, uint32_t wsh, uint32_t q) {
    // x*w mod q with precomputed wsh = floor(w*2^32/q); result matches
    // rns.shoup_mul (uint32 wraparound difference, one conditional subtract).
    uint32_t hi = (uint32_t)(((uint64_t)x * wsh) >> 32);
    uint32_t r = x * w - hi * q;
    return (r >= q) ? r - q : r;
}

inline uint32_t add_mod(uint32_t a, uint32_t b, uint32_t q) {
    uint32_t s = a + b;
    return (s >= q) ? s - q : s;
}

inline uint32_t sub_mod(uint32_t a, uint32_t b, uint32_t q) {
    return (a >= b) ? a - b : a + q - b;
}

void ntt_fwd_row(uint32_t* x, int64_t n, uint32_t q,
                 const uint32_t* w, const uint32_t* wsh) {
    for (int64_t m = 1, t = n; m < n; m <<= 1) {
        t >>= 1;
        for (int64_t i = 0; i < m; ++i) {
            const uint32_t tw = w[m + i], twsh = wsh[m + i];
            uint32_t* lo = x + i * 2 * t;
            uint32_t* hi = lo + t;
            for (int64_t j = 0; j < t; ++j) {
                uint32_t u = lo[j];
                uint32_t v = shoup(hi[j], tw, twsh, q);
                lo[j] = add_mod(u, v, q);
                hi[j] = sub_mod(u, v, q);
            }
        }
    }
}

void ntt_inv_row(uint32_t* x, int64_t n, uint32_t q,
                 const uint32_t* wi, const uint32_t* wish,
                 uint32_t ninv, uint32_t ninv_sh) {
    for (int64_t m = n >> 1, t = 1; m >= 1; m >>= 1, t <<= 1) {
        for (int64_t i = 0; i < m; ++i) {
            const uint32_t tw = wi[m + i], twsh = wish[m + i];
            uint32_t* lo = x + i * 2 * t;
            uint32_t* hi = lo + t;
            for (int64_t j = 0; j < t; ++j) {
                uint32_t u = lo[j], v = hi[j];
                lo[j] = add_mod(u, v, q);
                hi[j] = shoup(sub_mod(u, v, q), tw, twsh, q);
            }
        }
    }
    for (int64_t j = 0; j < n; ++j)
        x[j] = shoup(x[j], ninv, ninv_sh, q);
}

}  // namespace

extern "C" {

// Plain coeff residues [L, n] -> Montgomery evaluation order, in place.
// q/qinv_neg/r2: [L]; w/wsh: [L, n] forward twiddles for each row's prime.
void aesfhe_to_eval_batch(uint32_t* x, int64_t L, int64_t n,
                          const uint32_t* q, const uint32_t* qinv_neg,
                          const uint32_t* r2,
                          const uint32_t* w, const uint32_t* wsh) {
#pragma omp parallel for schedule(dynamic)
    for (int64_t l = 0; l < L; ++l) {
        uint32_t* row = x + l * n;
        for (int64_t j = 0; j < n; ++j)
            row[j] = redc((uint64_t)row[j] * r2[l], q[l], qinv_neg[l]);
        ntt_fwd_row(row, n, q[l], w + l * n, wsh + l * n);
    }
}

// Forward NTT in place on [L, n] (any domain; twiddles are Shoup-applied).
void aesfhe_ntt_fwd_batch(uint32_t* x, int64_t L, int64_t n,
                          const uint32_t* q,
                          const uint32_t* w, const uint32_t* wsh) {
#pragma omp parallel for schedule(dynamic)
    for (int64_t l = 0; l < L; ++l)
        ntt_fwd_row(x + l * n, n, q[l], w + l * n, wsh + l * n);
}

// Inverse NTT in place on [L, n].
void aesfhe_ntt_inv_batch(uint32_t* x, int64_t L, int64_t n,
                          const uint32_t* q,
                          const uint32_t* wi, const uint32_t* wish,
                          const uint32_t* ninv, const uint32_t* ninv_sh) {
#pragma omp parallel for schedule(dynamic)
    for (int64_t l = 0; l < L; ++l)
        ntt_inv_row(x + l * n, n, q[l], wi + l * n, wish + l * n,
                    ninv[l], ninv_sh[l]);
}

// Montgomery -> plain in place on [L, n] (REDC by 1), for decrypt host legs.
void aesfhe_from_mont_batch(uint32_t* x, int64_t L, int64_t n,
                            const uint32_t* q, const uint32_t* qinv_neg) {
#pragma omp parallel for schedule(dynamic)
    for (int64_t l = 0; l < L; ++l) {
        uint32_t* row = x + l * n;
        for (int64_t j = 0; j < n; ++j)
            row[j] = redc((uint64_t)row[j], q[l], qinv_neg[l]);
    }
}

}  // extern "C"
