"""Double-word (60-bit) MXU Pallas-kernel tests — interpret mode on CPU.

Oracle: pure-Python goldens.  The 60-bit modulus is the reference's WIDTH=60
configuration (rtl/ntt_poly_mult.sv:18-24)."""

import numpy as np
import pytest

from tpu_ntt import P60_4096, DILITHIUM_256
from tpu_ntt import reference
from tpu_ntt.params import make_params
from tpu_ntt.kernels.mxu64 import MxuPlan64

P60_SMALL = make_params(256, P60_4096.q)


def enc(rows):
    return (
        np.array([[x >> 32 for x in r] for r in rows], dtype=np.uint32),
        np.array([[x & 0xFFFFFFFF for x in r] for r in rows], dtype=np.uint32),
    )


def dec(hi, lo):
    return (np.asarray(hi).astype(object) << 32) + np.asarray(lo).astype(object)


@pytest.mark.parametrize("p", [P60_SMALL, P60_4096], ids=lambda p: p.name)
def test_nwc64_matches_golden(p, rng):
    mp = MxuPlan64(p)
    mp.groups_per_step = 1  # keep interpret-mode cost down
    B = 2
    a = [[rng.randrange(p.q) for _ in range(p.n)] for _ in range(B)]
    b = [[rng.randrange(p.q) for _ in range(p.n)] for _ in range(B)]
    got = dec(*mp.nwc_poly_mult(enc(a), enc(b), interpret=True))
    for i in range(B):
        want = reference.nwc_poly_mult(a[i], b[i], p)
        assert [int(v) for v in got[i]] == want


def test_nwc64_boundary_and_padding(rng):
    p = P60_SMALL
    mp = MxuPlan64(p)
    mp.groups_per_step = 1
    rows = mp.t + 1  # exercises the pad/unpad path
    a = [[p.q - 1] * p.n for _ in range(rows)]
    b = [[p.q - 1] * p.n] + [
        [rng.randrange(p.q) for _ in range(p.n)] for _ in range(rows - 1)
    ]
    got = dec(*mp.nwc_poly_mult(enc(a), enc(b), interpret=True))
    for i in (0, rows - 1):
        want = reference.nwc_poly_mult(a[i], b[i], p)
        assert [int(v) for v in got[i]] == want


def test_nwc64_vs_schoolbook_small(rng):
    p = P60_SMALL
    mp = MxuPlan64(p)
    mp.groups_per_step = 1
    a = [[rng.randrange(p.q) for _ in range(p.n)]]
    b = [[rng.randrange(p.q) for _ in range(p.n)]]
    got = dec(*mp.nwc_poly_mult(enc(a), enc(b), interpret=True))
    want = reference.schoolbook_negacyclic(a[0], b[0], p.q)
    assert [int(v) for v in got[0]] == want


def test_plan_validation():
    with pytest.raises(ValueError):
        MxuPlan64(make_params(128, P60_4096.q))  # n too small
    # 24-bit modulus is allowed (the double-word kernel is just overkill)
    MxuPlan64(DILITHIUM_256)


def test_cyclic64_matches_golden(rng):
    p = P60_SMALL
    mp = MxuPlan64(p)
    mp.groups_per_step = 1
    a = [[rng.randrange(p.q) for _ in range(p.n)]]
    b = [[rng.randrange(p.q) for _ in range(p.n)]]
    got = dec(*mp.cyclic_poly_mult(enc(a), enc(b), interpret=True))
    want = reference.cyclic_poly_mult(a[0], b[0], p)
    assert [int(v) for v in got[0]] == want


def test_fwd64_matches_golden_and_roundtrips(rng):
    p = P60_SMALL
    mp = MxuPlan64(p)
    mp.groups_per_step = 1
    x = [[rng.randrange(p.q) for _ in range(p.n)]]
    f = mp.ntt_fwd(enc(x), interpret=True)
    got4 = dec(*f)[0]
    perm = mp.fourstep_to_natural_perm()
    nat = [int(got4[perm[j]]) for j in range(p.n)]  # natural = flat[perm]
    want = reference.cg_ntt(x[0], p.omega, p.q)
    assert nat == want
    rt = dec(*mp.ntt_inv(f, interpret=True))
    assert [int(v) for v in rt[0]] == x[0]


def test_nwc_fwd64_kernel_matches_twisted_ntt(rng):
    p = P60_SMALL
    mp = MxuPlan64(p)
    mp.groups_per_step = 1
    x = [rng.randrange(p.q) for _ in range(p.n)]
    hi, lo = mp.nwc_ntt_fwd(enc([x]), interpret=True)
    out = dec(hi, lo)[0]
    twisted = [x[i] * pow(p.psi, i, p.q) % p.q for i in range(p.n)]
    nat = reference.cg_ntt(twisted, p.omega, p.q)
    perm = mp.fourstep_to_natural_perm()
    assert [int(out[perm[j]]) for j in range(p.n)] == nat


def test_nwc_inv64_staged_spectrum_product(rng):
    """Staged-spectrum API (double-word): fwd both operands, pointwise
    multiply host-side with big ints, nwc_ntt_inv back — equals the golden
    product; boundary roundtrip included."""
    p = P60_SMALL
    mp = MxuPlan64(p)
    mp.groups_per_step = 1
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [rng.randrange(p.q) for _ in range(p.n)]
    sa = dec(*mp.nwc_ntt_fwd(enc([a]), interpret=True))[0]
    sb = dec(*mp.nwc_ntt_fwd(enc([b]), interpret=True))[0]
    prod = [int(x) * int(y) % p.q for x, y in zip(sa, sb)]
    got = dec(*mp.nwc_ntt_inv(enc([prod]), interpret=True))
    want = reference.nwc_poly_mult(a, b, p)
    assert [int(v) for v in got[0]] == want

    edge = [[0, 1, p.q - 1] + [0] * (p.n - 3), [p.q - 1] * p.n]
    rt = dec(*mp.nwc_ntt_inv(
        mp.nwc_ntt_fwd(enc(edge), interpret=True), interpret=True
    ))
    assert [[int(v) for v in row] for row in rt] == edge


def test_cached_spectrum_product_64(rng):
    p = P60_SMALL
    mp = MxuPlan64(p)
    mp.groups_per_step = 1
    b = [rng.randrange(p.q) for _ in range(p.n)]
    a_rows = [[rng.randrange(p.q) for _ in range(p.n)] for _ in range(2)]
    spec = mp.nwc_spectrum(enc([b, b]), interpret=True)
    got = dec(*mp.nwc_poly_mult_cached(enc(a_rows), spec, interpret=True))
    for i in range(2):
        want = reference.nwc_poly_mult(a_rows[i], b, p)
        assert [int(v) for v in got[i]] == want


def test_n_32768_multi_tile(rng):
    """n = 32768 (n1 = 256 > 128: dense multi-tile left matmul, one poly
    per group) with a 60-bit prime of 2-adicity 17, checked against the
    independent native oracle.  Round-1 capped the kernel at n = 16384
    (VERDICT #4); the reference scales N purely by parameterization."""
    from tpu_ntt import native
    from tpu_ntt.params import make_params

    if not native.available():
        pytest.skip("native oracle unavailable")
    q = 576460752308273153  # 60-bit, q-1 divisible by 2^17
    p = make_params(32768, q)
    mp = MxuPlan64(p)
    assert (mp.n1, mp.t, mp.rows) == (256, 1, 256)
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [rng.randrange(p.q) for _ in range(p.n)]
    enc = lambda v: (
        np.array([[x >> 32 for x in v]], dtype=np.uint32),
        np.array([[x & 0xFFFFFFFF for x in v]], dtype=np.uint32),
    )
    hi, lo = mp.nwc_poly_mult(enc(a), enc(b), interpret=True)
    got = [
        (int(h) << 32) | int(l)
        for h, l in zip(np.asarray(hi)[0], np.asarray(lo)[0])
    ]
    want = native.nwc_fast(a, b, q, p.psi)
    assert got == want


@pytest.mark.parametrize("carry_save", [True, False], ids=["cs", "words"])
def test_accumulate_strategies_bit_identical(rng, carry_save):
    """Both accumulate/reduce strategies (signed 16-bit carry-save digits
    vs u32 words with explicit carries) are bit-exact vs the golden."""
    p = P60_SMALL
    mp = MxuPlan64(p)
    mp.groups_per_step = 1
    mp.carry_save = carry_save
    a = [[p.q - 1] * p.n]
    b = [[rng.randrange(p.q) for _ in range(p.n)]]
    got = dec(*mp.nwc_poly_mult(enc(a), enc(b), interpret=True))
    want = reference.nwc_poly_mult(a[0], b[0], p)
    assert [int(v) for v in got[0]] == want


@pytest.mark.parametrize(
    "prefix_scan,shoup_lazy",
    [(True, True), (True, False), (False, False)],
    ids=["sklansky-lazy", "sklansky-strict", "serial-strict"],
)
def test_scan_and_shoup_toggles_bit_identical(rng, prefix_scan, shoup_lazy):
    """The digit-scan borrow chain (Sklansky prefix vs serial ripple) and
    the Shoup final-subtract (strict vs lazy pass-through) are pure
    scheduling choices — every combination must match the golden exactly
    (defaults: serial + lazy, the hardware-measured winner)."""
    p = P60_SMALL
    mp = MxuPlan64(p)
    mp.groups_per_step = 1
    mp.prefix_scan = prefix_scan
    mp.shoup_lazy = shoup_lazy
    a = [[p.q - 1] * p.n]
    b = [[rng.randrange(p.q) for _ in range(p.n)]]
    got = dec(*mp.nwc_poly_mult(enc(a), enc(b), interpret=True))
    want = reference.nwc_poly_mult(a[0], b[0], p)
    assert [int(v) for v in got[0]] == want


def test_non_lazy_window_61bit(rng):
    """A 61-bit modulus outside the lazy-reduction window (q >= 2^61-2^40)
    must disable laziness and still be bit-exact: every intermediate is
    fully reduced, exercising the final=False -> strict path."""
    q = 2305843009213687297  # 61-bit prime, 512 | q-1, within 2^40 of 2^61
    p = make_params(256, q)
    mp = MxuPlan64(p)
    assert not mp.lazy
    mp.groups_per_step = 1
    a = [[q - 1] * p.n]
    b = [[rng.randrange(q) for _ in range(p.n)]]
    got = dec(*mp.nwc_poly_mult(enc(a), enc(b), interpret=True))
    want = reference.nwc_poly_mult(a[0], b[0], p)
    assert [int(v) for v in got[0]] == want


def test_split_left_bit_identical_n32768(rng):
    """Split-radix left transform (``split_left``, DESIGN.md §2.5c): the
    DIF-factored forward + mirrored inverse with pi-permuted mid tables
    must be bit-identical to the dense (256, 256) left matmul at
    n = 32768, for both the generic and the Solinas-trinomial plans
    (random + boundary operands)."""
    from tpu_ntt.kernels.sol64 import SolinasPlan64
    from tpu_ntt.params import make_params

    q = (1 << 60) - (1 << 18) + 1  # trinomial with 2-adicity 18
    p = make_params(32768, q)

    def enc(rows):
        return (
            np.array([[x >> 32 for x in v] for v in rows], dtype=np.uint32),
            np.array([[x & 0xFFFFFFFF for x in v] for v in rows],
                     dtype=np.uint32),
        )

    a = enc([[rng.randrange(q) for _ in range(p.n)]])
    b = enc([[q - 1] * p.n])  # boundary operand
    for cls in (MxuPlan64, SolinasPlan64):
        dense = cls(p)
        dense.split_left = False
        split = cls(p)
        assert split.split_left  # measured default at this size
        d = dense.nwc_poly_mult(a, b, interpret=True)
        s = split.nwc_poly_mult(a, b, interpret=True)
        for x, y in zip(d, s):
            assert np.array_equal(np.asarray(x), np.asarray(y)), cls.__name__


def test_split2_left_bit_identical_n65536(rng):
    """Depth-2 split-radix left transform (n1 = 512, n = 65536): two DIF
    butterfly levels + four 128-contraction leaves must be bit-identical
    to the dense (512, 512) left matmul, for both the generic and the
    Solinas plans.  On hardware the dense control CANNOT compile (scoped
    VMEM) — the split is what makes the flat 65536 kernel exist at all —
    but in interpret mode both paths run, so the identity is testable."""
    from tpu_ntt.kernels.sol64 import SolinasPlan64
    from tpu_ntt.params import make_params

    q = (1 << 60) - (1 << 18) + 1  # trinomial with 2-adicity 18
    p = make_params(65536, q)

    def enc(rows):
        return (
            np.array([[x >> 32 for x in v] for v in rows], dtype=np.uint32),
            np.array([[x & 0xFFFFFFFF for x in v] for v in rows],
                     dtype=np.uint32),
        )

    a = enc([[rng.randrange(q) for _ in range(p.n)]])
    b = enc([[q - 1] * p.n])  # boundary operand
    for cls in (MxuPlan64, SolinasPlan64):
        dense = cls(p)
        dense.split_left = False
        split = cls(p)
        assert split.split_left and hasattr(split, "w1s2_nwc")
        d = dense.nwc_poly_mult(a, b, interpret=True)
        s = split.nwc_poly_mult(a, b, interpret=True)
        for x, y in zip(d, s):
            assert np.array_equal(np.asarray(x), np.asarray(y)), cls.__name__


def test_split3_left_bit_identical_n131072(rng):
    """Depth-3 split-radix left transform (n1 = 1024, n = 2^17): three
    DIF butterfly levels + eight 128-contraction leaves must be
    bit-identical to the dense (1024, 1024) left matmul, for both the
    generic and the Solinas plans.  Like depth-2 this is an EXISTENCE
    proof for the flat kernel (the dense left blows scoped VMEM 4x on
    hardware); one toggled plan instance keeps the 33 s host table build
    from doubling.  The Solinas plan does NOT cover this size — its
    carry-save fold bound proof fails at lane_bound(2^17) >= 2^27
    (sol64._FoldPlan step-1 bias) — so covers_q must say no and the
    generic plan carries the size alone."""
    from tpu_ntt.kernels.sol64 import SolinasPlan64
    from tpu_ntt.params import make_params

    q = (1 << 60) - (1 << 18) + 1  # trinomial with 2-adicity 18 = log2(2n)
    assert not SolinasPlan64.covers_q(q, 1 << 17)
    p = make_params(1 << 17, q)

    def enc(rows):
        return (
            np.array([[x >> 32 for x in v] for v in rows], dtype=np.uint32),
            np.array([[x & 0xFFFFFFFF for x in v] for v in rows],
                     dtype=np.uint32),
        )

    a = enc([[rng.randrange(q) for _ in range(p.n)]])
    b = enc([[q - 1] * p.n])  # boundary operand
    plan = MxuPlan64(p)
    assert plan.split_left and hasattr(plan, "w1s3_nwc")
    s = plan.nwc_poly_mult(a, b, interpret=True)
    plan.split_left = False
    d = plan.nwc_poly_mult(a, b, interpret=True)
    for x, y in zip(d, s):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_split4_left_bit_identical_n262144(rng):
    """Depth-4 split-radix left transform (n1 = 2048, n = 2^18): four
    DIF butterfly levels + sixteen 128-contraction leaves must be
    bit-identical to the dense (2048, 2048) left matmul.  Existence
    proof for the flat kernel at n = 2^18 (dense left is 16x over the
    VMEM budget on hardware); leaf contractions stay 128 MACs/coef, so
    the flat kernel's per-coefficient MXU cost is FLAT in n.  NOTE: the
    heaviest test in the suite (~5 min: ~2.5 min host table build at
    n1 = 2048 + interpret passes); q is the largest 60-bit prime with
    2-adicity >= 19 (no trinomial of that 2-adicity is prime near
    2^60, and sol64 is excluded by its fold-bound proof regardless)."""
    from tpu_ntt.params import make_params

    q = 1152921504577486849
    p = make_params(1 << 18, q)

    def enc(rows):
        return (
            np.array([[x >> 32 for x in v] for v in rows], dtype=np.uint32),
            np.array([[x & 0xFFFFFFFF for x in v] for v in rows],
                     dtype=np.uint32),
        )

    a = enc([[rng.randrange(q) for _ in range(p.n)]])
    b = enc([[q - 1] * p.n])  # boundary operand
    plan = MxuPlan64(p)
    assert plan.split_left and hasattr(plan, "w1s4_nwc")
    s = plan.nwc_poly_mult(a, b, interpret=True)
    plan.split_left = False
    d = plan.nwc_poly_mult(a, b, interpret=True)
    for x, y in zip(d, s):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_split5_left_bit_identical_n524288(rng):
    """Depth-5 split-radix left transform (n1 = 4096, n = 2^19): five
    DIF butterfly levels + thirty-two 128-contraction leaves.  Oracle is
    the XLA four-step locals (an INDEPENDENT formulation) rather than
    the dense left matmul — at n1 = 4096 the dense tables are an ~8 min
    lazy build serving no compilable kernel, while the four-step locals
    are O(n)-table and already golden-tested at every smaller size.
    Also locks the lazy-dense contract: the constructor must NOT build
    dense tables at split-only sizes (production dispatch path)."""
    from tpu_ntt import sharded
    from tpu_ntt.params import make_params

    q = 576460752364240897  # 59-bit, 2-adicity 21
    n = 1 << 19
    p = make_params(n, q)
    plan = MxuPlan64(p)
    assert plan.split_left and hasattr(plan, "w1s5_nwc")
    assert "_dense_build" in plan.__dict__, "dense must be lazy here"

    def enc(rows):
        return (
            np.array([[x >> 32 for x in v] for v in rows], dtype=np.uint32),
            np.array([[x & 0xFFFFFFFF for x in v] for v in rows],
                     dtype=np.uint32),
        )

    a = enc([[rng.randrange(q) for _ in range(n)]])
    b = enc([[q - 1] * n])  # boundary operand
    s = plan.nwc_poly_mult(a, b, interpret=True)
    assert "_dense_build" in plan.__dict__, "nwc split path touched dense"
    n1, n2 = sharded.default_split(n)
    fsx = sharded.FourStepPlan(p, n1, n2)
    mat = lambda x: tuple(v.reshape(v.shape[:-1] + (n1, n2)) for v in x)
    w = sharded.fourstep_nwc_poly_mult_local(fsx, mat(a), mat(b))
    for x, y in zip(w, s):
        assert np.array_equal(np.asarray(x).reshape(-1, n), np.asarray(y))


def test_split_left_silently_dense_when_unavailable(rng):
    """At n1 != 256 no split tables exist: the default split_left=True
    must fall back to the dense left matmul, with correct results."""
    mp = MxuPlan64(P60_SMALL)
    assert mp.split_left and not hasattr(mp, "w1s_e_nwc")
    a = [rng.randrange(P60_SMALL.q) for _ in range(P60_SMALL.n)]
    b = [rng.randrange(P60_SMALL.q) for _ in range(P60_SMALL.n)]
    enc = lambda v: (
        np.array([[x >> 32 for x in v]], dtype=np.uint32),
        np.array([[x & 0xFFFFFFFF for x in v]], dtype=np.uint32),
    )
    hi, lo = mp.nwc_poly_mult(enc(a), enc(b), interpret=True)
    got = [(int(h) << 32) | int(l)
           for h, l in zip(np.asarray(hi)[0], np.asarray(lo)[0])]
    assert got == reference.nwc_poly_mult(a, b, P60_SMALL)


def test_split_standalone_entries_n32768(rng):
    """Round 5: the split-radix left transform serves the STANDALONE
    entries too (nwc_ntt_fwd / nwc_ntt_inv / nwc_spectrum /
    nwc_poly_mult_cached), not just the fused product.  The staged
    spectrum comes out in the pi-permuted four-step layout
    (``nwc_fourstep_to_natural_perm`` is the map): the forward matches
    the psi-twisted golden through it, the host-pointwise staged product
    and the cached product match the golden, and the standalone inverse
    (r96 plain-domain split leaves) closes the roundtrip."""
    q = (1 << 60) - (1 << 18) + 1  # trinomial with 2-adicity 18
    p = make_params(32768, q)
    mp = MxuPlan64(p)
    mp.groups_per_step = 1
    assert mp._split_depth() == 1
    a = [rng.randrange(q) for _ in range(p.n)]
    b = [q - 1] * p.n  # boundary operand
    sa = dec(*mp.nwc_ntt_fwd(enc([a]), interpret=True))[0]
    perm = mp.nwc_fourstep_to_natural_perm()
    twisted = [a[i] * pow(p.psi, i, q) % q for i in range(p.n)]
    nat = reference.cg_ntt(twisted, p.omega, q)
    assert [int(sa[perm[j]]) for j in range(p.n)] == nat
    sb = dec(*mp.nwc_ntt_fwd(enc([b]), interpret=True))[0]
    prod = [int(x) * int(y) % q for x, y in zip(sa, sb)]
    got = dec(*mp.nwc_ntt_inv(enc([prod]), interpret=True))
    want = reference.nwc_poly_mult(a, b, p)
    assert [int(v) for v in got[0]] == want
    spec = mp.nwc_spectrum(enc([b]), interpret=True)
    got2 = dec(*mp.nwc_poly_mult_cached(enc([a]), spec, interpret=True))
    assert [int(v) for v in got2[0]] == want


def test_split_inv_plain_leaves_jit_first(rng):
    """The lazily-built plain-domain inverse leaves must be CONSTANTS
    even when first touched inside a user jit trace
    (ensure_compile_time_eval) — a first-touch-under-trace would cache
    TRACERS and poison every later call (third sighting of that bug
    family after kyber's KyberPlan and rns._u32; found by the round-5
    chip driver, which jitted the standalone inverse before any eager
    call)."""
    import jax

    q = (1 << 60) - (1 << 18) + 1
    p = make_params(32768, q)
    mp = MxuPlan64(p)
    mp.groups_per_step = 1
    x = enc([[rng.randrange(q) for _ in range(p.n)]])
    first = jax.jit(lambda v: mp.nwc_ntt_inv(v, interpret=True))(x)
    again = mp.nwc_ntt_inv(x, interpret=True)  # eager call after
    for u, v in zip(first, again):
        assert np.array_equal(np.asarray(u), np.asarray(v))
