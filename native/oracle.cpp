// Native verification oracle: exact schoolbook convolutions and an
// independent NTT over 128-bit intermediates, callable from Python via
// ctypes (tpu_ntt/native.py).
//
// Role: fast independent cross-check for large-n tests and the benchmark
// --check path, replacing minutes of pure-Python big-int schoolbook with
// milliseconds of C++.  Counterpart of the reference's C++ checkers
// (software_benchmark/benchmark_ntt.cpp negacyclic_mul_reference and the
// cocotb golden models) — all math here is written directly from the
// published algorithm definitions.
//
// Valid for any modulus q < 2^64 (including the Goldilocks prime
// 2^64 - 2^32 + 1): products ride unsigned __int128 and the modular
// add/sub helpers are wrap-aware, so q > 2^63 cannot overflow u64 sums.

#include <cstdint>
#include <cstring>
#include <vector>

using u64 = std::uint64_t;
using u128 = unsigned __int128;

static inline u64 mulmod(u64 a, u64 b, u64 q) { return (u128)a * b % q; }

// a + b mod q for a, b < q < 2^64: on u64 wrap, s - q re-adds the lost
// 2^64 (mod-2^64 arithmetic), so one subtract covers both cases.
static inline u64 addmod(u64 a, u64 b, u64 q) {
  u64 s = a + b;
  if (s < a || s >= q) s -= q;
  return s;
}

static inline u64 submod(u64 a, u64 b, u64 q) {
  return a >= b ? a - b : a + (q - b);
}

static u64 powmod(u64 b, u64 e, u64 q) {
  u64 r = 1;
  b %= q;
  while (e) {
    if (e & 1) r = mulmod(r, b, q);
    b = mulmod(b, b, q);
    e >>= 1;
  }
  return r;
}

extern "C" {

// out[k] = sum_{i+j==k} a_i b_j - sum_{i+j==n+k} a_i b_j  (mod q)  [x^n = -1]
void nwc_schoolbook(const u64* a, const u64* b, u64* out, u64 n, u64 q) {
  std::vector<u64> acc(n, 0);
  for (u64 i = 0; i < n; ++i) {
    if (!a[i]) continue;
    for (u64 j = 0; j < n; ++j) {
      u64 t = mulmod(a[i], b[j], q);
      u64 k = i + j;
      if (k < n) {
        acc[k] = addmod(acc[k], t, q);
      } else {
        acc[k - n] = submod(acc[k - n], t, q);
      }
    }
  }
  std::memcpy(out, acc.data(), n * sizeof(u64));
}

// out[k] = sum_{i+j==k mod n} a_i b_j (mod q)  [x^n = 1]
void cyclic_schoolbook(const u64* a, const u64* b, u64* out, u64 n, u64 q) {
  std::vector<u64> acc(n, 0);
  for (u64 i = 0; i < n; ++i) {
    if (!a[i]) continue;
    for (u64 j = 0; j < n; ++j) {
      u64 t = mulmod(a[i], b[j], q);
      acc[(i + j) % n] = addmod(acc[(i + j) % n], t, q);
    }
  }
  std::memcpy(out, acc.data(), n * sizeof(u64));
}

// Direct O(n^2) DFT mod q: out[k] = sum_n x[n] * omega^(n k).  Independent
// of any fast-transform implementation (no butterflies, no bit reversal).
void dft_direct(const u64* x, u64* out, u64 n, u64 q, u64 omega) {
  std::vector<u64> wpow(n);
  u64 w = 1;
  for (u64 i = 0; i < n; ++i) {
    wpow[i] = w;
    w = mulmod(w, omega, q);
  }
  for (u64 k = 0; k < n; ++k) {
    u64 s = 0;
    for (u64 i = 0; i < n; ++i)
      s = addmod(s, mulmod(x[i], wpow[(i * k) % n], q), q);
    out[k] = s;
  }
}

// Negacyclic product via an independent iterative NTT (fast path used when
// n^2 schoolbook is too slow yet an oracle stronger than the library under
// test is still wanted).
void nwc_fast(const u64* a_in, const u64* b_in, u64* out, u64 n, u64 q,
              u64 psi) {
  std::vector<u64> a(a_in, a_in + n), b(b_in, b_in + n);
  u64 psi_inv = powmod(psi, q - 2, q);
  u64 omega = mulmod(psi, psi, q);
  u64 n_inv = powmod(n, q - 2, q);
  // twist
  u64 pw = 1;
  for (u64 i = 0; i < n; ++i) {
    a[i] = mulmod(a[i], pw, q);
    b[i] = mulmod(b[i], pw, q);
    pw = mulmod(pw, psi, q);
  }
  unsigned log_n = 0;
  while ((u64{1} << log_n) < n) ++log_n;
  auto ntt = [&](std::vector<u64>& x, u64 root) {
    // iterative DIT with bit-reversal
    for (u64 i = 0; i < n; ++i) {
      u64 r = 0;
      for (unsigned bit = 0; bit < log_n; ++bit)
        r |= ((i >> bit) & 1u) << (log_n - 1 - bit);
      if (i < r) std::swap(x[i], x[r]);
    }
    for (u64 m = 1; m < n; m <<= 1) {
      u64 wm = powmod(root, n / (2 * m), q);
      for (u64 k = 0; k < n; k += 2 * m) {
        u64 w2 = 1;
        for (u64 j = 0; j < m; ++j) {
          u64 t = mulmod(w2, x[k + j + m], q);
          u64 u = x[k + j];
          x[k + j] = addmod(u, t, q);
          x[k + j + m] = submod(u, t, q);
          w2 = mulmod(w2, wm, q);
        }
      }
    }
  };
  ntt(a, omega);
  ntt(b, omega);
  for (u64 i = 0; i < n; ++i) a[i] = mulmod(a[i], b[i], q);
  ntt(a, powmod(omega, q - 2, q));
  pw = 1;
  for (u64 i = 0; i < n; ++i) {
    out[i] = mulmod(mulmod(a[i], n_inv, q), pw, q);
    pw = mulmod(pw, psi_inv, q);
  }
}

}  // extern "C"
