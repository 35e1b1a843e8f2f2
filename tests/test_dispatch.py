"""Dispatch-layer tests: one backend-selection policy, bit-identical results.

The policy table (tpu_ntt/dispatch.py) is consumed by both users and
bench.py; these tests pin the selected backend per preset and check every
routed operation against the golden models.
"""

import numpy as np
import pytest

from tpu_ntt import DILITHIUM_256, P60_4096, reference
from tpu_ntt import dispatch
from tpu_ntt.params import make_params


def test_impl_selection():
    from tpu_ntt.modmath import GOLDILOCKS_Q

    assert dispatch.impl_name(DILITHIUM_256) == "pallas-mxu"
    # the shipped 60-bit modulus is 2^60 - 2^14 + 1: Solinas fold kernel
    # (465k vs 413k nwc/s on hardware, BENCH_NOTES.md round 2)
    assert dispatch.impl_name(P60_4096) == "pallas-sol64"
    # power-of-two n below 256 can't use the kernel
    assert dispatch.impl_name(make_params(128, 8380417)) == "xla-merged"
    # 31-bit modulus: double-word ring territory — the kernel when n fits,
    # the XLA double-word path otherwise
    assert dispatch.impl_name(make_params(16, 1073741857)) == "xla-merged-64"
    # 2013265921 = 15 * 2^27 + 1 (width 31): smallest double-word-ring width
    assert dispatch.impl_name(make_params(4096, 2013265921)) == \
        "pallas-mxu64"
    # every op routes to the same backend for a given params
    for op in dispatch.OPS:
        assert dispatch.impl_name(DILITHIUM_256, op) == "pallas-mxu"
    # single-word-ring widths outside the one-tile int8 window go to the
    # XLA merged path — measured ~2.1x faster than the double-word kernel
    # wherever Ring32 exists (BENCH_NOTES.md round-2 width-band A/B)
    assert dispatch.impl_name(make_params(4096, 998244353)) == "xla-merged"
    assert dispatch.impl_name(make_params(32768, 16580609)) == "xla-merged"
    # beyond the single-word ring (width 31..62) the multi-tile double-word
    # kernel takes over up to n = 32768
    assert (dispatch.impl_name(make_params(32768, 576460752308273153))
            == "pallas-mxu64")
    # n = 65536 double-word: the DENSE flat kernel exceeds scoped VMEM on
    # v5e so the four-step window opens one size early for width > 30 —
    # but for q < 2^62 the depth-2 split-radix left transform lets the
    # flat fused kernel compile and win the nwc product 1.7x (round 3),
    # so that single op is overridden on top of the four-step backend
    assert (dispatch.impl_name(make_params(65536, 576460752308273153))
            == "kernel-fourstep-64+flat-split2-nwc")
    assert dispatch.impl_name(make_params(65536, GOLDILOCKS_Q)) == \
        "kernel-fourstep-64"
    # ...while single-word widths keep the flat XLA path at 65536
    assert dispatch.impl_name(make_params(65536, 998244353)) == "xla-merged"
    # the Goldilocks prime (width 64) gets its phi-fold kernel inside the
    # kernel n-window and the dedicated XLA ring outside it
    assert dispatch.impl_name(make_params(256, GOLDILOCKS_Q)) == "pallas-gl64"
    assert (dispatch.impl_name(make_params(16, GOLDILOCKS_Q))
            == "xla-merged-64")


def test_dispatch_goldilocks_matches_golden(rng):
    from tpu_ntt.modmath import GOLDILOCKS_Q

    p = make_params(256, GOLDILOCKS_Q)
    mult = dispatch.best_nwc_poly_mult(p)
    a = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=np.uint64)
    b = np.array([[p.q - 1] * p.n], dtype=np.uint64)
    hi, lo = mult(a, b)
    got = (np.asarray(hi).astype(object) << 32) + np.asarray(lo).astype(object)
    want = reference.nwc_poly_mult(
        [int(v) for v in a[0]], [int(v) for v in b[0]], p
    )
    assert [int(v) for v in got[0]] == want


def test_unknown_op_rejected():
    with pytest.raises(ValueError):
        dispatch.best(DILITHIUM_256, "nope")
    with pytest.raises(ValueError):
        dispatch.impl_name(DILITHIUM_256, "nope")


def test_dispatch_24bit_matches_golden(rng):
    p = DILITHIUM_256
    mult = dispatch.best_nwc_poly_mult(p)
    a = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=np.uint32)
    b = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=np.uint32)
    got = np.asarray(mult(a, b))
    want = reference.nwc_poly_mult(
        [int(v) for v in a[0]], [int(v) for v in b[0]], p
    )
    assert [int(v) for v in got[0]] == want


def test_dispatch_60bit_accepts_u64(rng):
    p = P60_4096
    mult = dispatch.best_nwc_poly_mult(p)
    a = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=np.uint64)
    b = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=np.uint64)
    hi, lo = mult(a, b)
    got = (np.asarray(hi).astype(object) << 32) + np.asarray(lo).astype(object)
    want = reference.nwc_poly_mult(
        [int(v) for v in a[0]], [int(v) for v in b[0]], p
    )
    assert [int(v) for v in got[0]] == want


def test_dispatch_60bit_accepts_pair(rng):
    """(hi, lo) tuples (the zero-copy production form) pass through the
    u64 splitter unchanged."""
    p = P60_4096
    mult = dispatch.best_nwc_poly_mult(p)
    au = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=np.uint64)
    bu = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=np.uint64)
    pair = lambda x: ((x >> np.uint64(32)).astype(np.uint32),
                      (x & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi, lo = mult(pair(au), pair(bu))
    got = (np.asarray(hi).astype(object) << 32) + np.asarray(lo).astype(object)
    want = reference.nwc_poly_mult(
        [int(v) for v in au[0]], [int(v) for v in bu[0]], p
    )
    assert [int(v) for v in got[0]] == want


@pytest.mark.parametrize(
    "p", [DILITHIUM_256, make_params(128, 8380417)],
    ids=["pallas-mxu", "xla-merged"],
)
def test_all_ops_consistent_single_word(p, rng):
    """fwd/inv compose, cyclic matches golden, cached == plain nwc — for
    both a kernel-backed and an XLA-backed parameter set."""
    a = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=np.uint32)
    b = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=np.uint32)

    rt = np.asarray(dispatch.best_ntt_inv(p)(dispatch.best_ntt_fwd(p)(a)))
    assert (rt == a).all()

    got_cyc = np.asarray(dispatch.best_cyclic_poly_mult(p)(a, b))
    want_cyc = reference.cyclic_poly_mult(
        [int(v) for v in a[0]], [int(v) for v in b[0]], p
    )
    assert [int(v) for v in got_cyc[0]] == want_cyc

    spec = dispatch.best_nwc_spectrum(p)(b)
    got_cached = np.asarray(dispatch.best_nwc_poly_mult_cached(p)(a, spec))
    got_plain = np.asarray(dispatch.best_nwc_poly_mult(p)(a, b))
    assert (got_cached == got_plain).all()

    # the twisted transform pair composes to identity: nwc_inv consumes
    # exactly nwc_fwd's layout (untwist + n^-1 folded)
    fwd = np.asarray(dispatch.best_nwc_ntt_fwd(p)(a))
    assert fwd.shape == a.shape
    rt_nwc = np.asarray(dispatch.best_nwc_ntt_inv(p)(fwd))
    assert (rt_nwc == a).all()


@pytest.mark.parametrize(
    "p", [DILITHIUM_256, make_params(128, 8380417)],
    ids=["pallas-mxu", "xla-merged"],
)
def test_dispatch_dot_single_word(p, rng):
    """best_nwc_dot == Σ_k golden products for kernel- and XLA-backed
    single-word presets (K=3, boundary row included)."""
    K, B = 3, 2
    a = np.array(
        [[[rng.randrange(p.q) for _ in range(p.n)] for _ in range(B)]
         for _ in range(K)], dtype=np.uint32)
    b = np.array(
        [[[rng.randrange(p.q) for _ in range(p.n)] for _ in range(B)]
         for _ in range(K)], dtype=np.uint32)
    a[0, 0, :] = p.q - 1
    b[0, 0, :] = p.q - 1
    got = np.asarray(dispatch.best_nwc_dot(p)(a, b))
    for i in range(B):
        want = [0] * p.n
        for k in range(K):
            prod = reference.nwc_poly_mult(
                [int(v) for v in a[k, i]], [int(v) for v in b[k, i]], p
            )
            want = [(x + y) % p.q for x, y in zip(want, prod)]
        assert [int(v) for v in got[i]] == want


def test_dispatch_dot_double_word(rng):
    """best_nwc_dot through the pairs path (pallas-sol64 backend)."""
    p = P60_4096
    K = 2
    a = np.array(
        [[[rng.randrange(p.q) for _ in range(p.n)]] for _ in range(K)],
        dtype=np.uint64)
    b = np.array(
        [[[rng.randrange(p.q) for _ in range(p.n)]] for _ in range(K)],
        dtype=np.uint64)
    a[0, 0, :] = p.q - 1
    hi, lo = dispatch.best_nwc_dot(p)(a, b)
    got = (np.asarray(hi).astype(object) << 32) + np.asarray(lo).astype(
        object
    )
    want = [0] * p.n
    for k in range(K):
        prod = reference.nwc_poly_mult(
            [int(v) for v in a[k, 0]], [int(v) for v in b[k, 0]], p
        )
        want = [(x + y) % p.q for x, y in zip(want, prod)]
    assert [int(v) for v in got[0]] == want


@pytest.mark.parametrize(
    "p", [DILITHIUM_256, make_params(128, 8380417)],
    ids=["pallas-mxu", "xla-merged"],
)
def test_dispatch_dot_cached_matches_dot(p, rng):
    """best_nwc_dot_cached on per-k best_nwc_spectrum stacks ==
    best_nwc_dot (spectrum layout is backend-consistent by contract)."""
    K, B = 2, 1
    a = np.array(
        [[[rng.randrange(p.q) for _ in range(p.n)] for _ in range(B)]
         for _ in range(K)], dtype=np.uint32)
    b = np.array(
        [[[rng.randrange(p.q) for _ in range(p.n)] for _ in range(B)]
         for _ in range(K)], dtype=np.uint32)
    a[0, 0, :] = p.q - 1
    spec = dispatch.best_nwc_spectrum(p)
    spectra = np.stack([np.asarray(spec(b[k])) for k in range(K)])
    got = np.asarray(dispatch.best_nwc_dot_cached(p)(a, spectra))
    want = np.asarray(dispatch.best_nwc_dot(p)(a, b))
    assert (got == want).all()


def test_dispatch_dot_cached_double_word(rng):
    """dot_cached through the pairs path (pallas-sol64 backend)."""
    p = P60_4096
    K = 2
    rng64 = np.random.default_rng(51)
    a = rng64.integers(0, p.q, size=(K, 1, p.n), dtype=np.uint64)
    b = rng64.integers(0, p.q, size=(K, 1, p.n), dtype=np.uint64)
    spec = dispatch.best_nwc_spectrum(p)
    specs = [spec(b[k]) for k in range(K)]
    spectra = (np.stack([np.asarray(s[0]) for s in specs]),
               np.stack([np.asarray(s[1]) for s in specs]))
    ghi, glo = dispatch.best_nwc_dot_cached(p)(a, spectra)
    whi, wlo = dispatch.best_nwc_dot(p)(a, b)
    assert (np.asarray(ghi) == np.asarray(whi)).all()
    assert (np.asarray(glo) == np.asarray(wlo)).all()


@pytest.mark.parametrize(
    "p", [DILITHIUM_256, make_params(128, 8380417)],
    ids=["pallas-mxu", "xla-merged"],
)
def test_dispatch_matvec_matches_golden(p, rng):
    """best_nwc_matvec on best_nwc_matvec_spectra == golden row sums."""
    k, l, B = 2, 2, 1
    a = np.array(
        [[[rng.randrange(p.q) for _ in range(p.n)] for _ in range(l)]
         for _ in range(k)], dtype=np.uint32)
    s = np.array(
        [[[rng.randrange(p.q) for _ in range(p.n)] for _ in range(B)]
         for _ in range(l)], dtype=np.uint32)
    a[0, 0, :] = p.q - 1
    s[0, 0, :] = p.q - 1
    blocks = dispatch.best_nwc_matvec_spectra(p)(a)
    out = np.asarray(dispatch.best_nwc_matvec(p)(s, blocks))
    for i in range(k):
        want = [0] * p.n
        for j in range(l):
            prod = reference.nwc_poly_mult(
                [int(v) for v in a[i, j]], [int(v) for v in s[j, 0]], p
            )
            want = [(x + y) % p.q for x, y in zip(want, prod)]
        assert [int(v) for v in out[i, 0]] == want


def test_dispatch_matvec_double_word(rng):
    """matvec through the pairs path (pallas-sol64 backend)."""
    p = P60_4096
    k, l = 2, 2
    rng64 = np.random.default_rng(53)
    a = rng64.integers(0, p.q, size=(k, l, p.n), dtype=np.uint64)
    s = rng64.integers(0, p.q, size=(l, 1, p.n), dtype=np.uint64)
    blocks = dispatch.best_nwc_matvec_spectra(p)(a)
    oh, ol = dispatch.best_nwc_matvec(p)(s, blocks)
    got = (np.asarray(oh).astype(object) << 32) + np.asarray(ol).astype(
        object
    )
    for i in range(k):
        want = [0] * p.n
        for j in range(l):
            prod = reference.nwc_poly_mult(
                [int(v) for v in a[i, j]], [int(v) for v in s[j, 0]], p
            )
            want = [(x + y) % p.q for x, y in zip(want, prod)]
        assert [int(v) for v in got[i, 0]] == want


def test_dispatch_dot_fourstep(rng):
    """best_nwc_dot above the flat window (n = 2^17, xla-fourstep):
    spectrum-domain accumulate over the four-step layout vs the native
    O(n log n) oracle."""
    from tpu_ntt import native

    if not native.available():
        pytest.skip("native oracle unavailable")
    q = 998244353
    p = make_params(1 << 17, q)
    K = 2
    nrng = np.random.default_rng(47)
    a = nrng.integers(0, q, size=(K, 1, p.n), dtype=np.uint64).astype(
        np.uint32
    )
    b = nrng.integers(0, q, size=(K, 1, p.n), dtype=np.uint64).astype(
        np.uint32
    )
    got = np.asarray(dispatch.best_nwc_dot(p)(a, b))
    want = [0] * p.n
    for k in range(K):
        prod = native.nwc_fast(
            [int(v) for v in a[k, 0]], [int(v) for v in b[k, 0]], q, p.psi
        )
        want = [(x + y) % q for x, y in zip(want, prod)]
    assert [int(v) for v in got[0]] == want

    # cached variant consumes per-k "spectrum" stacks of the same backend
    spec = dispatch.best_nwc_spectrum(p)
    spectra = np.stack([np.asarray(spec(b[k])) for k in range(K)])
    got_c = np.asarray(dispatch.best_nwc_dot_cached(p)(a, spectra))
    assert (got_c == got).all()

    # matvec with k=1 degenerates to the same inner product: A = b as a
    # (1, K, n) matrix against the (K, 1, n) vector
    blocks = dispatch.best_nwc_matvec_spectra(p)(b.transpose(1, 0, 2))
    got_m = np.asarray(dispatch.best_nwc_matvec(p)(a, blocks))
    assert (got_m[0] == got).all()


def test_impl_selection_large_n_fourstep():
    """Above the kernel window (n > 65536) the policy picks the single-chip
    four-step decomposition — the flat merged path's O(n log n) tables are
    pathological at this scale (dispatch module docstring).  Sub-transforms
    follow plan_for: Pallas-kernel locals where they win (width <= 24,
    31..62, Goldilocks), XLA no-gather locals for the single-word-ring
    widths 25..30 where the XLA form is 2.4x faster on chip."""
    assert dispatch.impl_name(make_params(1 << 17, 998244353)) == \
        "xla-fourstep"
    assert dispatch.impl_name(make_params(1 << 17, 786433)) == \
        "kernel-fourstep"
    # 60-bit widths at n = 2^17: the nwc op is overridden by the depth-3
    # split-radix FLAT kernel (+41% on chip, BENCH_NOTES.md round 3); the
    # other ops keep the four-step backend.
    assert dispatch.impl_name(make_params(1 << 17, 576460752364240897)) == \
        "kernel-fourstep-64+flat-split3-nwc"
    from tpu_ntt.modmath import GOLDILOCKS_Q

    assert dispatch.impl_name(make_params(1 << 17, GOLDILOCKS_Q)) == \
        "kernel-fourstep-64"


def test_dispatch_fourstep_large_n_vs_oracle(rng):
    """n = 2^17 single-word product through dispatch vs the independent
    native O(n log n) oracle; fwd/inv roundtrip; cached == direct.  This is
    the single-chip analog of the config-5 sharded test
    (tests/test_sharded.py::test_config5_n_two_pow_20_nwc_product)."""
    from tpu_ntt import native

    if not native.available():
        pytest.skip("native oracle unavailable")
    q = 998244353
    p = make_params(1 << 17, q)
    nrng = np.random.default_rng(41)
    a = nrng.integers(0, q, size=(1, p.n), dtype=np.uint64).astype(np.uint32)
    b = nrng.integers(0, q, size=(1, p.n), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(dispatch.best_nwc_poly_mult(p)(a, b))
    want = native.nwc_fast(
        [int(v) for v in a[0]], [int(v) for v in b[0]], q, p.psi
    )
    assert [int(v) for v in got[0]] == want

    rt = np.asarray(dispatch.best_ntt_inv(p)(dispatch.best_ntt_fwd(p)(a)))
    assert (rt == a).all()

    spec = dispatch.best_nwc_spectrum(p)(b)
    got_cached = np.asarray(dispatch.best_nwc_poly_mult_cached(p)(a, spec))
    assert (got_cached == got).all()


def test_dispatch_kernel_fourstep_single_word(rng):
    """n = 2^17 with a width-20 prime: dispatch routes to kernel-fourstep
    (MxuPlan int8 locals, measured 1.6x over the XLA locals on chip);
    product vs the native oracle + nwc staged-pair roundtrip."""
    from tpu_ntt import native

    if not native.available():
        pytest.skip("native oracle unavailable")
    q = 786433
    p = make_params(1 << 17, q)
    assert dispatch.impl_name(p) == "kernel-fourstep"
    nrng = np.random.default_rng(44)
    a = nrng.integers(0, q, size=(1, p.n), dtype=np.uint64).astype(np.uint32)
    b = nrng.integers(0, q, size=(1, p.n), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(dispatch.best_nwc_poly_mult(p)(a, b))
    want = native.nwc_fast(
        [int(v) for v in a[0]], [int(v) for v in b[0]], q, p.psi
    )
    assert [int(v) for v in got[0]] == want
    rt = np.asarray(
        dispatch.best_nwc_ntt_inv(p)(dispatch.best_nwc_ntt_fwd(p)(a))
    )
    assert (rt == a).all()


def test_dispatch_flat_split2_nwc_override_n65536(rng):
    """At n = 65536 width 31..62 the nwc op rides the FLAT depth-2-split
    kernel while every other op keeps the four-step backend; both must
    agree with the native oracle and with each other (the override is a
    policy change, not a semantics change)."""
    from tpu_ntt import native

    if not native.available():
        pytest.skip("native oracle unavailable")
    q = (1 << 60) - (1 << 18) + 1
    p = make_params(1 << 16, q)
    assert dispatch.impl_name(p) == "kernel-fourstep-64+flat-split2-nwc"
    nrng = np.random.default_rng(44)
    a = nrng.integers(0, q, size=(1, p.n), dtype=np.uint64)
    b = nrng.integers(0, q, size=(1, p.n), dtype=np.uint64)
    a[0, :3] = [0, 1, q - 1]
    phi, plo = dispatch.best_nwc_poly_mult(p)(a, b)
    prod = (np.asarray(phi).astype(object) << 32) + np.asarray(
        plo).astype(object)
    want = native.nwc_fast(
        [int(v) for v in a[0]], [int(v) for v in b[0]], q, p.psi)
    assert [int(v) for v in prod[0]] == want

    # the non-overridden ops still compose to the same product
    spec = dispatch.best_nwc_spectrum(p)(b)
    chi, clo = dispatch.best_nwc_poly_mult_cached(p)(a, spec)
    cprod = (np.asarray(chi).astype(object) << 32) + np.asarray(
        clo).astype(object)
    assert [int(v) for v in cprod[0]] == want

    # round-5 session 2: the standalone fwd/inv pair is ALSO overridden
    # onto the flat split kernels (~2x the four-step on chip) — the pair
    # must stay a matched-layout roundtrip
    rt = dispatch.best_nwc_ntt_inv(p)(dispatch.best_nwc_ntt_fwd(p)(a))
    got_rt = ((np.asarray(rt[0]).astype(np.uint64) << np.uint64(32))
              | np.asarray(rt[1]).astype(np.uint64))
    assert (got_rt == a).all()


def test_dispatch_fourstep_large_n_double_word(rng):
    """n = 2^17 with a 2-adicity-21 60-bit prime through the pairs path.

    fwd/inv ride the kernel-locals four-step; the nwc product is
    overridden onto the FLAT depth-3-split kernel (round 3: 9.2k vs
    6.5k nwc/s on v5e), so the oracle check below covers that path."""
    q = 576460752364240897
    p = make_params(1 << 17, q)
    assert dispatch.impl_name(p) == "kernel-fourstep-64+flat-split3-nwc"
    nrng = np.random.default_rng(42)
    a = nrng.integers(0, q, size=(1, p.n), dtype=np.uint64)
    b = nrng.integers(0, q, size=(1, p.n), dtype=np.uint64)
    hi, lo = dispatch.best_ntt_inv(p)(dispatch.best_ntt_fwd(p)(a))
    got = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | np.asarray(
        lo
    ).astype(np.uint64)
    assert (got == a).all()

    # boundary-heavy product row vs the reference golden on a few indices
    # would be O(n^2); instead check the full product against the native
    # fast oracle when available
    from tpu_ntt import native

    if native.available():
        phi, plo = dispatch.best_nwc_poly_mult(p)(a, b)
        prod = (np.asarray(phi).astype(object) << 32) + np.asarray(
            plo
        ).astype(object)
        want = native.nwc_fast(
            [int(v) for v in a[0]], [int(v) for v in b[0]], q, p.psi
        )
        assert [int(v) for v in prod[0]] == want


def test_all_ops_consistent_double_word(rng):
    p = P60_4096
    a = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=np.uint64)
    b = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=np.uint64)

    hi, lo = dispatch.best_ntt_inv(p)(dispatch.best_ntt_fwd(p)(a))
    got = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | np.asarray(
        lo
    ).astype(np.uint64)
    assert (got == a).all()

    spec = dispatch.best_nwc_spectrum(p)(b)
    chi, clo = dispatch.best_nwc_poly_mult_cached(p)(a, spec)
    phi, plo = dispatch.best_nwc_poly_mult(p)(a, b)
    assert (np.asarray(chi) == np.asarray(phi)).all()
    assert (np.asarray(clo) == np.asarray(plo)).all()

    hi, lo = dispatch.best_nwc_ntt_inv(p)(dispatch.best_nwc_ntt_fwd(p)(a))
    got = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | np.asarray(
        lo
    ).astype(np.uint64)
    assert (got == a).all()
