// CPU baseline benchmark for NTT-based negacyclic polynomial multiplication.
//
// Native counterpart of the TPU framework's bench harness, filling the role
// of the reference's software_benchmark/ suite (benchmark_ntt.cpp,
// benchmark_ntt_60bit.cpp, benchmark_simple*.cpp): it provides the CPU
// numbers that TPU speedups are quoted against, with the same reported
// metrics (forward_ntt_avg_ns, avg_ns, checksum) and a --check mode against
// a direct O(n^2) negacyclic convolution.
//
// Fresh implementation, runtime-configurable (the reference fixes n/q/psi at
// compile time and lists a runtime-configured version as future work):
//   ./ntt_bench --n 4096 --q 8380417 --psi 283817 --reps 200 --check
//   ./ntt_bench --preset p60_4096 --reps 100
//   ./ntt_bench --preset dilithium_256 --direct --reps 10
//
// Algorithms: iterative in-place Cooley-Tukey NTT (decimation-in-time,
// bit-reversed input ordering), psi-twist negacyclic wrapping, 128-bit
// modular multiply via unsigned __int128.
//
// SIMD: --simd scalar|avx2|avx512|auto (default auto) — the counterpart of
// the reference's 12 BENCH_SIMD_KIND build targets
// (software_benchmark/CMakeLists.txt:31-60), selected at RUN time via
// target-attribute multiversioning instead of 12 binaries.  Where the
// reference vectorizes only the pointwise product (benchmark_ntt.cpp:
// 151-192, with a scalar % Q per lane), this harness vectorizes the full
// Barrett reduction and applies it to the pointwise pass, the psi twists,
// the NTT butterfly inner loops AND the direct O(n^2) path (the
// benchmark_simple AVX dot-kernel analog) — valid for q < 2^31; the 60-bit
// modulus needs 128-bit products and stays scalar, matching the reference
// whose 60-bit SIMD kinds are also scalar passthrough
// (benchmark_ntt_60bit.cpp:142-146 has no SIMD pointwise).

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#if defined(__x86_64__)
#include <immintrin.h>
#define NTT_BENCH_X86 1
#else
#define NTT_BENCH_X86 0
#endif

using u64 = std::uint64_t;
using u128 = unsigned __int128;

enum class Simd { kScalar, kAvx2, kAvx512 };

static const char* simd_name(Simd s) {
  switch (s) {
    case Simd::kAvx2: return "avx2";
    case Simd::kAvx512: return "avx512";
    default: return "scalar";
  }
}

static Simd detect_simd() {
#if NTT_BENCH_X86
  __builtin_cpu_init();
  if (__builtin_cpu_supports("avx512f")) return Simd::kAvx512;
  if (__builtin_cpu_supports("avx2")) return Simd::kAvx2;
#endif
  return Simd::kScalar;
}

#if NTT_BENCH_X86
// ---------------------------------------------------------------------------
// Vectorized Barrett arithmetic, valid for q < 2^31: operands in [0, q)
// keep every _mm*_mul_epu32 exact (both factors < 2^32) and every
// intermediate below 2^63, so signed 64-bit compares are safe.
// q1 = p >> (k-1); q2 = (q1*mu) >> (k+1); r = p - q2*q; r -= q twice.
// ---------------------------------------------------------------------------

__attribute__((target("avx2"))) static inline __m256i barrett_mul_4(
    __m256i a, __m256i b, __m256i qv, __m256i muv, __m128i sh_lo,
    __m128i sh_hi) {
  const __m256i p = _mm256_mul_epu32(a, b);
  const __m256i q1 = _mm256_srl_epi64(p, sh_lo);
  const __m256i q2 = _mm256_srl_epi64(_mm256_mul_epu32(q1, muv), sh_hi);
  __m256i r = _mm256_sub_epi64(p, _mm256_mul_epu32(q2, qv));
  for (int rep = 0; rep < 2; ++rep) {
    const __m256i ge =
        _mm256_cmpgt_epi64(_mm256_add_epi64(r, _mm256_set1_epi64x(1)), qv);
    r = _mm256_sub_epi64(r, _mm256_and_si256(ge, qv));
  }
  return r;
}

__attribute__((target("avx2"))) static inline __m256i add_mod_4(__m256i a,
                                                                __m256i b,
                                                                __m256i qv) {
  const __m256i s = _mm256_add_epi64(a, b);
  const __m256i ge =
      _mm256_cmpgt_epi64(_mm256_add_epi64(s, _mm256_set1_epi64x(1)), qv);
  return _mm256_sub_epi64(s, _mm256_and_si256(ge, qv));
}

__attribute__((target("avx2"))) static inline __m256i sub_mod_4(__m256i a,
                                                                __m256i b,
                                                                __m256i qv) {
  const __m256i d = _mm256_sub_epi64(a, b);
  const __m256i lt = _mm256_cmpgt_epi64(b, a);
  return _mm256_add_epi64(d, _mm256_and_si256(lt, qv));
}

__attribute__((target("avx512f"))) static inline __m512i barrett_mul_8(
    __m512i a, __m512i b, __m512i qv, __m512i muv, unsigned k) {
  const __m512i p = _mm512_mul_epu32(a, b);
  const __m512i q1 = _mm512_srli_epi64(p, k - 1);
  const __m512i q2 = _mm512_srli_epi64(_mm512_mul_epu32(q1, muv), k + 1);
  __m512i r = _mm512_sub_epi64(p, _mm512_mul_epu32(q2, qv));
  for (int rep = 0; rep < 2; ++rep) {
    const __mmask8 ge = _mm512_cmpge_epu64_mask(r, qv);
    r = _mm512_mask_sub_epi64(r, ge, r, qv);
  }
  return r;
}

__attribute__((target("avx512f"))) static inline __m512i add_mod_8(__m512i a,
                                                                   __m512i b,
                                                                   __m512i qv) {
  const __m512i s = _mm512_add_epi64(a, b);
  return _mm512_mask_sub_epi64(s, _mm512_cmpge_epu64_mask(s, qv), s, qv);
}

__attribute__((target("avx512f"))) static inline __m512i sub_mod_8(__m512i a,
                                                                   __m512i b,
                                                                   __m512i qv) {
  const __m512i d = _mm512_sub_epi64(a, b);
  return _mm512_mask_add_epi64(d, _mm512_cmplt_epu64_mask(a, b), d, qv);
}
// Elementwise a[i] = a[i] * b[i] mod q over a contiguous run.
__attribute__((target("avx2"))) static void mulmod_arr_avx2(
    u64* a, const u64* b, std::size_t n, u64 q, u64 mu, unsigned k) {
  const __m256i qv = _mm256_set1_epi64x((long long)q);
  const __m256i muv = _mm256_set1_epi64x((long long)mu);
  const __m128i sl = _mm_cvtsi32_si128((int)k - 1);
  const __m128i sh = _mm_cvtsi32_si128((int)k + 1);
  std::size_t i = 0;
  for (; i + 4 <= n; i += 4) {
    const __m256i av = _mm256_loadu_si256((const __m256i*)(a + i));
    const __m256i bv = _mm256_loadu_si256((const __m256i*)(b + i));
    _mm256_storeu_si256((__m256i*)(a + i),
                        barrett_mul_4(av, bv, qv, muv, sl, sh));
  }
  for (; i < n; ++i) a[i] = (u128)a[i] * b[i] % q;
}

__attribute__((target("avx512f"))) static void mulmod_arr_avx512(
    u64* a, const u64* b, std::size_t n, u64 q, u64 mu, unsigned k) {
  const __m512i qv = _mm512_set1_epi64((long long)q);
  const __m512i muv = _mm512_set1_epi64((long long)mu);
  std::size_t i = 0;
  for (; i + 8 <= n; i += 8) {
    const __m512i av = _mm512_loadu_si512(a + i);
    const __m512i bv = _mm512_loadu_si512(b + i);
    _mm512_storeu_si512(a + i, barrett_mul_8(av, bv, qv, muv, k));
  }
  for (; i < n; ++i) a[i] = (u128)a[i] * b[i] % q;
}

// One butterfly row: (u, v) -> (u + w*v, u - w*v) over m lanes.
__attribute__((target("avx2"))) static void butterflies_avx2(
    u64* u, u64* v, const u64* tw, std::size_t m, u64 q, u64 mu, unsigned k) {
  const __m256i qv = _mm256_set1_epi64x((long long)q);
  const __m256i muv = _mm256_set1_epi64x((long long)mu);
  const __m128i sl = _mm_cvtsi32_si128((int)k - 1);
  const __m128i sh = _mm_cvtsi32_si128((int)k + 1);
  for (std::size_t j = 0; j + 4 <= m; j += 4) {
    const __m256i wv = _mm256_loadu_si256((const __m256i*)(tw + j));
    const __m256i vv = _mm256_loadu_si256((const __m256i*)(v + j));
    const __m256i uv = _mm256_loadu_si256((const __m256i*)(u + j));
    const __m256i t = barrett_mul_4(wv, vv, qv, muv, sl, sh);
    _mm256_storeu_si256((__m256i*)(u + j), add_mod_4(uv, t, qv));
    _mm256_storeu_si256((__m256i*)(v + j), sub_mod_4(uv, t, qv));
  }
}

__attribute__((target("avx512f"))) static void butterflies_avx512(
    u64* u, u64* v, const u64* tw, std::size_t m, u64 q, u64 mu, unsigned k) {
  const __m512i qv = _mm512_set1_epi64((long long)q);
  const __m512i muv = _mm512_set1_epi64((long long)mu);
  for (std::size_t j = 0; j + 8 <= m; j += 8) {
    const __m512i wv = _mm512_loadu_si512(tw + j);
    const __m512i vv = _mm512_loadu_si512(v + j);
    const __m512i uv = _mm512_loadu_si512(u + j);
    const __m512i t = barrett_mul_8(wv, vv, qv, muv, k);
    _mm512_storeu_si512(u + j, add_mod_8(uv, t, qv));
    _mm512_storeu_si512(v + j, sub_mod_8(uv, t, qv));
  }
}

// Direct-path inner run: out[j] (+|-)= ai * b[j] mod q over a contiguous
// run (the benchmark_simple AVX dot-kernel analog).
__attribute__((target("avx2"))) static void direct_run_avx2(
    u64 ai, const u64* b, u64* out, std::size_t len, bool add_into, u64 q,
    u64 mu, unsigned k) {
  const __m256i qv = _mm256_set1_epi64x((long long)q);
  const __m256i muv = _mm256_set1_epi64x((long long)mu);
  const __m256i aiv = _mm256_set1_epi64x((long long)ai);
  const __m128i sl = _mm_cvtsi32_si128((int)k - 1);
  const __m128i sh = _mm_cvtsi32_si128((int)k + 1);
  std::size_t j = 0;
  for (; j + 4 <= len; j += 4) {
    const __m256i bv = _mm256_loadu_si256((const __m256i*)(b + j));
    const __m256i ov = _mm256_loadu_si256((const __m256i*)(out + j));
    const __m256i t = barrett_mul_4(aiv, bv, qv, muv, sl, sh);
    _mm256_storeu_si256((__m256i*)(out + j), add_into
                                                 ? add_mod_4(ov, t, qv)
                                                 : sub_mod_4(ov, t, qv));
  }
  for (; j < len; ++j) {
    const u64 t = (u128)ai * b[j] % q;
    out[j] = add_into ? (out[j] + t >= q ? out[j] + t - q : out[j] + t)
                      : (out[j] >= t ? out[j] - t : out[j] + q - t);
  }
}

__attribute__((target("avx512f"))) static void direct_run_avx512(
    u64 ai, const u64* b, u64* out, std::size_t len, bool add_into, u64 q,
    u64 mu, unsigned k) {
  const __m512i qv = _mm512_set1_epi64((long long)q);
  const __m512i muv = _mm512_set1_epi64((long long)mu);
  const __m512i aiv = _mm512_set1_epi64((long long)ai);
  std::size_t j = 0;
  for (; j + 8 <= len; j += 8) {
    const __m512i bv = _mm512_loadu_si512(b + j);
    const __m512i ov = _mm512_loadu_si512(out + j);
    const __m512i t = barrett_mul_8(aiv, bv, qv, muv, k);
    _mm512_storeu_si512(out + j, add_into ? add_mod_8(ov, t, qv)
                                          : sub_mod_8(ov, t, qv));
  }
  for (; j < len; ++j) {
    const u64 t = (u128)ai * b[j] % q;
    out[j] = add_into ? (out[j] + t >= q ? out[j] + t - q : out[j] + t)
                      : (out[j] >= t ? out[j] - t : out[j] + q - t);
  }
}
#endif  // NTT_BENCH_X86

static u64 mulmod(u64 a, u64 b, u64 q) { return (u128)a * b % q; }

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

struct NttCtx {
  u64 q, psi, psi_inv, n_inv;
  std::size_t n;
  unsigned log_n;
  // Barrett constants (k = bitlen(q), mu = floor(2^2k / q)) for the
  // vectorized paths; SIMD applies only when q < 2^31 (wider moduli need
  // 128-bit products — scalar, as in the reference's 60-bit binaries).
  unsigned bk = 0;
  u64 mu = 0;
  Simd simd = Simd::kScalar;
  bool simd_ok() const { return simd != Simd::kScalar && q < (1ull << 31); }
  // stage twiddle tables, bit-reverse permutation
  std::vector<u64> fwd_tw, inv_tw, psi_pow, psi_inv_pow;
  std::vector<std::uint32_t> bitrev;

  NttCtx(std::size_t n_, u64 q_, u64 psi_) : q(q_), psi(psi_), n(n_) {
    log_n = 0;
    while ((std::size_t{1} << log_n) < n) ++log_n;
    if ((std::size_t{1} << log_n) != n) {
      std::fprintf(stderr, "n must be a power of two\n");
      std::exit(2);
    }
    if (powmod(psi, n, q) != q - 1) {
      std::fprintf(stderr, "psi is not a primitive 2n-th root mod q\n");
      std::exit(2);
    }
    psi_inv = powmod(psi, q - 2, q);
    n_inv = powmod((u64)n, q - 2, q);
    bk = 0;
    while ((q >> bk) != 0) ++bk;
    if (q < (1ull << 31)) mu = (u64)(((u128)1 << (2 * bk)) / q);
    u64 omega = mulmod(psi, psi, q);
    u64 omega_inv = powmod(omega, q - 2, q);

    bitrev.resize(n);
    for (std::size_t i = 0; i < n; ++i) {
      std::uint32_t r = 0;
      for (unsigned b = 0; b < log_n; ++b) r |= ((i >> b) & 1u) << (log_n - 1 - b);
      bitrev[i] = r;
    }
    auto build = [&](u64 root, std::vector<u64>& tw) {
      // tw layout: per stage s (len = 2^s butterfly groups of size m = 2^s),
      // the m twiddles root_{2m}^j, packed consecutively: offset m holds
      // stage with half-size m.
      tw.resize(n);
      for (std::size_t m = 1; m < n; m <<= 1) {
        u64 wm = powmod(root, n / (2 * m), q);
        u64 w = 1;
        for (std::size_t j = 0; j < m; ++j) {
          tw[m + j] = w;
          w = mulmod(w, wm, q);
        }
      }
    };
    build(omega, fwd_tw);
    build(omega_inv, inv_tw);
    psi_pow.resize(n);
    psi_inv_pow.resize(n);
    u64 a = 1, b = 1;
    for (std::size_t i = 0; i < n; ++i) {
      psi_pow[i] = a;
      psi_inv_pow[i] = b;
      a = mulmod(a, psi, q);
      b = mulmod(b, psi_inv, q);
    }
  }

  // In-place cyclic NTT, natural order in/out.
  void ntt(std::vector<u64>& x, bool inverse) const {
    for (std::size_t i = 0; i < n; ++i) {
      std::uint32_t r = bitrev[i];
      if (i < r) std::swap(x[i], x[r]);
    }
    const std::vector<u64>& tw = inverse ? inv_tw : fwd_tw;
    for (std::size_t m = 1; m < n; m <<= 1) {
      for (std::size_t k = 0; k < n; k += 2 * m) {
#if NTT_BENCH_X86
        if (simd_ok() && simd == Simd::kAvx512 && m >= 8) {
          butterflies_avx512(&x[k], &x[k + m], &tw[m], m, q, mu, bk);
          continue;
        }
        if (simd_ok() && m >= 4) {
          butterflies_avx2(&x[k], &x[k + m], &tw[m], m, q, mu, bk);
          continue;
        }
#endif
        for (std::size_t j = 0; j < m; ++j) {
          u64 t = mulmod(tw[m + j], x[k + j + m], q);
          u64 u = x[k + j];
          x[k + j] = u + t >= q ? u + t - q : u + t;
          x[k + j + m] = u >= t ? u - t : u + q - t;
        }
      }
    }
    if (inverse) scale_all(x, n_inv);
  }

  void twist(std::vector<u64>& x, const std::vector<u64>& pw) const {
    mulmod_arr(x.data(), pw.data(), n);
  }

  void scale_all(std::vector<u64>& x, u64 c) const {
    std::vector<u64> cs(n, c);
    mulmod_arr(x.data(), cs.data(), n);
  }

  // a[i] = a[i] * b[i] mod q, SIMD-dispatched.
  void mulmod_arr(u64* a, const u64* b, std::size_t len) const {
#if NTT_BENCH_X86
    if (simd_ok()) {
      if (simd == Simd::kAvx512) return mulmod_arr_avx512(a, b, len, q, mu, bk);
      return mulmod_arr_avx2(a, b, len, q, mu, bk);
    }
#endif
    for (std::size_t i = 0; i < len; ++i) a[i] = mulmod(a[i], b[i], q);
  }

  // Negacyclic product via psi-twist + cyclic transform.
  std::vector<u64> nwc_mul(std::vector<u64> a, std::vector<u64> b) const {
    twist(a, psi_pow);
    twist(b, psi_pow);
    ntt(a, false);
    ntt(b, false);
    mulmod_arr(a.data(), b.data(), n);
    ntt(a, true);
    twist(a, psi_inv_pow);
    return a;
  }

  std::vector<u64> direct_nwc(const std::vector<u64>& a,
                              const std::vector<u64>& b) const {
    // Row i contributes two CONTIGUOUS runs (the wrap splits the j loop at
    // n - i), so the inner products vectorize like the reference's
    // benchmark_simple AVX dot kernels.
    std::vector<u64> out(n, 0);
    for (std::size_t i = 0; i < n; ++i) {
      if (!a[i]) continue;
#if NTT_BENCH_X86
      if (simd_ok()) {
        auto run = simd == Simd::kAvx512 ? direct_run_avx512 : direct_run_avx2;
        run(a[i], b.data(), out.data() + i, n - i, true, q, mu, bk);
        if (i) run(a[i], b.data() + (n - i), out.data(), i, false, q, mu, bk);
        continue;
      }
#endif
      for (std::size_t j = 0; j < n; ++j) {
        u64 t = mulmod(a[i], b[j], q);
        std::size_t k = i + j;
        if (k < n)
          out[k] = out[k] + t >= q ? out[k] + t - q : out[k] + t;
        else {
          std::size_t kk = k - n;
          out[kk] = out[kk] >= t ? out[kk] - t : out[kk] + q - t;
        }
      }
    }
    return out;
  }
};

// Deterministic LCG inputs (same role as the reference's make_poly).
static std::vector<u64> make_poly(std::size_t n, u64 q, u64 seed) {
  std::vector<u64> p(n);
  u64 s = seed * 6364136223846793005ull + 1442695040888963407ull;
  for (std::size_t i = 0; i < n; ++i) {
    s = s * 6364136223846793005ull + 1442695040888963407ull;
    p[i] = (s >> 11) % q;
  }
  return p;
}

static u64 checksum(const std::vector<u64>& v) {
  u64 h = 1469598103934665603ull;
  for (u64 x : v) {
    h ^= x;
    h *= 1099511628211ull;
  }
  return h;
}

struct Preset {
  const char* name;
  std::size_t n;
  u64 q, psi;
};
static const Preset kPresets[] = {
    {"dilithium_256", 256, 8380417ull, 1239911ull},
    {"p24_1024", 1024, 8380417ull, 5548360ull},
    {"p24_4096", 4096, 8380417ull, 283817ull},
    {"p60_4096", 4096, 1152921504606830593ull, 431606828070683274ull},
};

int main(int argc, char** argv) {
  std::size_t n = 4096;
  u64 q = 8380417, psi = 283817;
  int reps = 100;
  bool check = false, direct = false;
  Simd simd_req = detect_simd();
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> const char* {
      if (i + 1 >= argc) {
        std::fprintf(stderr, "missing value for %s\n", a.c_str());
        std::exit(2);
      }
      return argv[++i];
    };
    if (a == "--n") n = std::strtoull(next(), nullptr, 0);
    else if (a == "--q") q = std::strtoull(next(), nullptr, 0);
    else if (a == "--psi") psi = std::strtoull(next(), nullptr, 0);
    else if (a == "--reps") reps = std::atoi(next());
    else if (a == "--simd") {
      std::string v = next();
      if (v == "scalar") simd_req = Simd::kScalar;
      else if (v == "avx2") simd_req = Simd::kAvx2;
      else if (v == "avx512") simd_req = Simd::kAvx512;
      else if (v == "auto") simd_req = detect_simd();
      else {
        std::fprintf(stderr, "unknown --simd %s\n", v.c_str());
        return 2;
      }
      if (simd_req != Simd::kScalar && static_cast<int>(detect_simd()) < static_cast<int>(simd_req)) {
        std::fprintf(stderr, "--simd %s unsupported on this CPU\n", v.c_str());
        return 2;
      }
    }
    else if (a == "--check") check = true;
    else if (a == "--direct") direct = true;
    else if (a == "--preset") {
      std::string p = next();
      bool found = false;
      for (const auto& pr : kPresets)
        if (p == pr.name) { n = pr.n; q = pr.q; psi = pr.psi; found = true; }
      if (!found) {
        std::fprintf(stderr, "unknown preset %s\n", p.c_str());
        return 2;
      }
    } else {
      std::fprintf(stderr, "usage: %s [--preset NAME | --n N --q Q --psi PSI]"
                           " [--reps R] [--check] [--direct]"
                           " [--simd scalar|avx2|avx512|auto]\n", argv[0]);
      return 2;
    }
  }

  NttCtx ctx(n, q, psi);
  ctx.simd = simd_req;
  std::printf("simd %s\n", simd_name(ctx.simd_ok() || simd_req == Simd::kScalar
                                          ? simd_req
                                          : Simd::kScalar));
  auto a = make_poly(n, q, 1), b = make_poly(n, q, 2);

  using clk = std::chrono::steady_clock;
  auto ns = [](clk::duration d) {
    return std::chrono::duration_cast<std::chrono::nanoseconds>(d).count();
  };

  if (check || direct) {
    auto want = ctx.direct_nwc(a, b);
    if (direct) {
      auto t0 = clk::now();
      std::vector<u64> out;
      for (int r = 0; r < reps; ++r) out = ctx.direct_nwc(a, b);
      auto total = ns(clk::now() - t0);
      std::printf("direct_total_ns %lld\ndirect_avg_ns %lld\nchecksum %llu\n",
                  (long long)total, (long long)(total / reps),
                  (unsigned long long)checksum(out));
      return 0;
    }
    auto got = ctx.nwc_mul(a, b);
    if (got != want) {
      std::printf("check FAILED\n");
      return 1;
    }
    std::printf("check ok\n");
  }

  // forward NTT (incl. twist) — matches the reference's forward_ntt metric.
  {
    auto t0 = clk::now();
    for (int r = 0; r < reps; ++r) {
      auto x = a;
      ctx.twist(x, ctx.psi_pow);
      ctx.ntt(x, false);
    }
    auto total = ns(clk::now() - t0);
    std::printf("forward_ntt_total_ns %lld\nforward_ntt_avg_ns %lld\n",
                (long long)total, (long long)(total / reps));
  }
  // full negacyclic poly-mult
  {
    std::vector<u64> out;
    auto t0 = clk::now();
    for (int r = 0; r < reps; ++r) out = ctx.nwc_mul(a, b);
    auto total = ns(clk::now() - t0);
    std::printf("total_ns %lld\navg_ns %lld\nchecksum %llu\n",
                (long long)total, (long long)(total / reps),
                (unsigned long long)checksum(out));
  }
  return 0;
}
