"""RNS/CRT wide-modulus negacyclic multiplication (VERDICT.md next #8).

The reference caps WIDTH at 60 (rtl/ntt_poly_mult.sv:15-28); RNS extends
the framework to arbitrary moduli — including non-NTT-friendly ones — by
running each residue channel on the standard (kernel-backed) dispatch
path and recombining exactly via CRT.
"""

import random

import numpy as np
import pytest

from tpu_ntt import rns
from tpu_ntt.modmath import GOLDILOCKS_Q
from tpu_ntt.params import make_params


def schoolbook_nwc(a, b, q):
    n = len(a)
    c = [0] * n
    for i in range(n):
        if not a[i]:
            continue
        for j in range(n):
            k = i + j
            v = a[i] * b[j]
            if k >= n:
                c[k - n] = (c[k - n] - v) % q
            else:
                c[k] = (c[k] + v) % q
    return c


def test_ntt_friendly_primes():
    ps = rns.ntt_friendly_primes(4096, 24, 3)
    assert len(ps) == 3 and len(set(ps)) == 3
    for p in ps:
        assert p.bit_length() <= 24 and (p - 1) % 8192 == 0


def test_rns_80bit_modulus_vs_bigint_oracle(rng):
    """>62-bit modulus (80-bit prime, NOT NTT-friendly) — the headline
    deliverable: bit-exact vs an independent big-int schoolbook."""
    q = (1 << 80) - 65  # 2^80 - 65 is prime
    from tpu_ntt.params import _is_probable_prime

    assert _is_probable_prime(q)
    assert (q - 1) % 512 != 0  # genuinely not NTT-friendly for n=256
    n = 256
    a = [rng.randrange(q) for _ in range(n)]
    b = [rng.randrange(q) for _ in range(n)]
    got = rns.nwc_poly_mult(n, q, a, b)
    assert [int(v) for v in got] == schoolbook_nwc(a, b, q)


def test_rns_128bit_modulus_small_n(rng):
    q = (1 << 128) - 159  # prime
    n = 64
    a = [rng.randrange(q) for _ in range(n)]
    b = [rng.randrange(q) for _ in range(n)]
    got = rns.nwc_poly_mult(n, q, a, b)
    assert [int(v) for v in got] == schoolbook_nwc(a, b, q)


def test_rns_batched_and_matches_direct_ring(rng):
    """For a modulus the direct Ring64 path also supports, RNS must agree."""
    from tpu_ntt import reference

    p = make_params(256, 1152921504606830593)  # the 60-bit preset prime
    a = [[rng.randrange(p.q) for _ in range(p.n)] for _ in range(2)]
    b = [[rng.randrange(p.q) for _ in range(p.n)] for _ in range(2)]
    got = rns.nwc_poly_mult(p.n, p.q, a, b)
    for i in range(2):
        assert [int(v) for v in got[i]] == reference.nwc_poly_mult(
            a[i], b[i], p
        )


def test_goldilocks_ring_and_transform(rng):
    """Goldilocks prime 2^64 - 2^32 + 1: dedicated special-form reduction
    ring, full transform path (VERDICT.md next #8 second half)."""
    import jax
    from tpu_ntt import reference
    from tpu_ntt.modmath import make_ring, GoldilocksRing
    from tpu_ntt.ntt import NttPlan, nwc_poly_mult_merged

    q = GOLDILOCKS_Q
    p = make_params(256, q, name="goldilocks_256")
    ring = make_ring(p)
    assert isinstance(ring, GoldilocksRing)

    edge = [0, 1, q - 1, q - 2, (1 << 32) - 1, 1 << 32, 1 << 63, q >> 1]
    pairs = [(a, b) for a in edge for b in edge] + [
        (rng.randrange(q), rng.randrange(q)) for _ in range(128)
    ]
    a = ring.encode([x for x, _ in pairs])
    b = ring.encode([y for _, y in pairs])
    mul = ring.decode(ring.mul(a, b))
    add = ring.decode(ring.add(a, b))
    sub = ring.decode(ring.sub(a, b))
    for (x, y), m, s, d in zip(pairs, mul, add, sub):
        assert m == x * y % q
        assert s == (x + y) % q
        assert d == (x - y) % q

    plan = NttPlan(p)
    av = [rng.randrange(q) for _ in range(p.n)]
    bv = [rng.randrange(q) for _ in range(p.n)]
    got = plan.decode(
        jax.jit(lambda u, v: nwc_poly_mult_merged(plan, u, v))(
            plan.encode(av), plan.encode(bv)
        )
    )
    assert list(got) == reference.nwc_poly_mult(av, bv, p)


def test_wide_modulus_rejected_by_direct_ring():
    """A >62-bit non-Goldilocks modulus cannot use the double-word ring;
    the error must point at the RNS path."""
    from tpu_ntt.modmath import make_ring

    q80 = rns.ntt_friendly_primes(64, 80, 1)[0]
    with pytest.raises(ValueError, match="rns"):
        make_ring(make_params(64, q80))


# ---------------------------------------------------------------------------
# RnsRing: RNS-resident ring (q = prod p_j) + exact device reconstruction
# ---------------------------------------------------------------------------


def test_rns_ring_roundtrip_and_product(rng=random.Random(40)):
    n = 256
    ring = rns.RnsRing(n, channels=6)
    q = ring.q
    assert q.bit_length() >= 128  # a CKKS-scale ciphertext modulus
    a = [rng.randrange(q) for _ in range(n)]
    b = [rng.randrange(q) for _ in range(n)]
    ra, rb = ring.encode([a]), ring.encode([b])
    # roundtrip
    assert [int(v) for v in ring.decode(ra)[0]] == a
    # single product vs big-int oracle
    rc = ring.nwc_mult(ra, rb)
    assert [int(v) for v in ring.decode(rc)[0]] == schoolbook_nwc(a, b, q)


def test_rns_ring_chained_ops_stay_exact(rng=random.Random(41)):
    """The FHE-practice property: products/adds chain indefinitely in RNS
    (q = prod p_j makes per-channel reduction reduction mod q) with no
    recombination between operations."""
    n = 256
    ring = rns.RnsRing(n, channels=4)
    q = ring.q
    a = [rng.randrange(q) for _ in range(n)]
    b = [rng.randrange(q) for _ in range(n)]
    ra, rb = ring.encode([a]), ring.encode([b])
    # d = (a*b + a) * b - b
    rc = ring.add(ring.nwc_mult(ra, rb), ra)
    rd = ring.sub(ring.nwc_mult(rc, rb), rb)
    t = schoolbook_nwc(a, b, q)
    t = [(x + y) % q for x, y in zip(t, a)]
    want = schoolbook_nwc(t, b, q)
    want = [(x - y) % q for x, y in zip(want, b)]
    assert [int(v) for v in ring.decode(rd)[0]] == want


def test_rns_ring_device_reconstruction(rng=random.Random(42)):
    """reconstruct_words (exact on-device CRT, float32 k-estimate + exact
    fixups) must match the host big-int decode bit-for-bit — including the
    k-estimate edge cases (c = 0, c = q-1, single tiny coefficient)."""
    n = 256
    ring = rns.RnsRing(n, channels=6)
    q = ring.q
    rows = [
        [rng.randrange(q) for _ in range(n)],
        [0] * n,
        [q - 1] * n,
        [1] + [0] * (n - 1),
        [q - 1] + [0] * (n - 1),
    ]
    res = ring.encode(rows)
    want = ring.decode(res)
    got = ring.decode_words(np.asarray(ring.reconstruct_words(res)))
    assert (want == got).all()
    # and through a product (the real exit path)
    ra = ring.encode([rows[0]])
    rc = ring.nwc_mult(ra, ra)
    want_c = ring.decode(rc)
    got_c = ring.decode_words(np.asarray(ring.reconstruct_words(rc)))
    assert (want_c == got_c).all()


def test_rns_ring_rejects_duplicate_moduli():
    with pytest.raises(ValueError, match="distinct"):
        rns.RnsRing(256, moduli=[16770049, 16770049])


# ---------------------------------------------------------------------------
# FHE modulus-chain ops: rescale, automorphism, base extension, gadget dot
# ---------------------------------------------------------------------------


def test_rns_ring_rescale_is_exact_floor_division(rng=random.Random(43)):
    """rescale = exact floor(c / p_last) in the sub-basis (the CKKS
    rescaling / BGV modulus-switching core), incl. divisibility edges."""
    n = 256
    ring = rns.RnsRing(n, channels=4)
    q, pk = ring.q, ring.moduli[-1]
    sub = ring.drop_last()
    assert sub.moduli == ring.moduli[:-1]
    rows = [
        [rng.randrange(q) for _ in range(n)],
        [0] * n,
        [q - 1] * n,
        [pk] + [pk - 1] * (n - 1),      # exactly divisible / one less
        [k * pk for k in range(n)],     # all exactly divisible
    ]
    res = ring.encode(rows)
    got = sub.decode(ring.rescale(res))
    for gi, row in zip(got, rows):
        assert [int(v) for v in gi] == [c // pk for c in row]


def test_rns_ring_rescale_after_product(rng=random.Random(44)):
    """The CKKS usage: multiply then rescale, all in RNS form."""
    n = 256
    ring = rns.RnsRing(n, channels=4)
    q, pk = ring.q, ring.moduli[-1]
    a = [rng.randrange(q) for _ in range(n)]
    b = [rng.randrange(q) for _ in range(n)]
    rc = ring.nwc_mult(ring.encode([a]), ring.encode([b]))
    got = ring.drop_last().decode(ring.rescale(rc))[0]
    want = [c // pk for c in schoolbook_nwc(a, b, q)]
    assert [int(v) for v in got] == want


def test_automorphism_tables_bijection_and_inverse():
    n = 64
    for g in (3, 5, 2 * n - 1, 7):
        src, neg = rns.automorphism_tables(n, g)
        assert sorted(src.tolist()) == list(range(n))
    with pytest.raises(ValueError, match="odd"):
        rns.automorphism_tables(n, 4)


def test_rns_ring_automorphism_vs_bigint_oracle(rng=random.Random(45)):
    """x -> x^g on coefficients vs direct big-int substitution mod
    (x^n + 1, q), including g = 2n-1 (conjugation) and composition
    sigma_g . sigma_ginv = id."""
    n = 64
    ring = rns.RnsRing(n, channels=3)
    q = ring.q
    a = [rng.randrange(q) for _ in range(n)]
    ra = ring.encode([a])
    for g in (3, 5, 2 * n - 1):
        got = ring.decode(ring.automorphism(ra, g))[0]
        want = [0] * n
        for j in range(n):
            t = (j * g) % (2 * n)
            if t < n:
                want[t] = (want[t] + a[j]) % q
            else:
                want[t - n] = (want[t - n] - a[j]) % q
        assert [int(v) for v in got] == want
        # inverse automorphism restores the input
        ginv = pow(g, -1, 2 * n)
        back = ring.decode(ring.automorphism(ring.automorphism(ra, g),
                                             ginv))[0]
        assert [int(v) for v in back] == a


def test_rns_ring_base_extend_exact(rng=random.Random(46)):
    """Exact base extension: the SAME canonical integer re-expressed in a
    disjoint basis — no +kq approximate-CRT error (boundary rows incl.)."""
    n = 256
    ring = rns.RnsRing(n, channels=4)
    q = ring.q
    # disjoint target basis: next primes below the source basis
    tgt_moduli = rns.ntt_friendly_primes(n, 24, 3, below=min(ring.moduli))
    target = rns.RnsRing(n, moduli=tgt_moduli)
    rows = [
        [rng.randrange(q) for _ in range(n)],
        [0] * n,
        [q - 1] * n,
    ]
    res = ring.encode(rows)
    ext = ring.base_extend(res, target)
    for i, p in enumerate(target.moduli):
        got = np.asarray(ext[i])
        for r, row in zip(got, rows):
            assert [int(v) for v in r] == [c % p for c in row]


def test_rns_ring_gadget_dot_vs_bigint_oracle(rng=random.Random(47)):
    """Key-switch core: sum_j [c]_{p_j} * ksk_j over R_q, digits decomposed
    per-channel (the RNS gadget), computed as fused dots — vs the big-int
    oracle, full and cached-key variants."""
    n = 256
    B = 2
    ring = rns.RnsRing(n, channels=3)
    q = ring.q
    cs = [[rng.randrange(q) for _ in range(n)] for _ in range(B)]
    ksk = [[[rng.randrange(p) for _ in range(n)] for p in ring.moduli]
           for _ in range(len(ring.moduli))]
    rc = ring.encode(cs)

    want = []
    for b in range(B):
        acc = [0] * n
        for j, pj in enumerate(ring.moduli):
            digit = [c % pj for c in cs[b]]
            kj = [0] * n  # ksk_j lifted to Z_q via CRT of its channels
            kj_ring = rns.RnsRing(n, moduli=ring.moduli)
            kj = [int(v) for v in
                  kj_ring.decode([np.array([ksk[j][i]], dtype=np.uint32)
                                  for i in range(len(ring.moduli))])[0]]
            prod = schoolbook_nwc(digit, kj, q)
            acc = [(x + y) % q for x, y in zip(acc, prod)]
        want.append(acc)

    got = ring.decode(ring.gadget_dot(rc, ksk))
    for b in range(B):
        assert [int(v) for v in got[b]] == want[b]

    specs = ring.ksk_spectra(ksk, batch=B)
    got2 = ring.decode(ring.gadget_dot_cached(rc, specs))
    for b in range(B):
        assert [int(v) for v in got2[b]] == want[b]


def test_rns_ring_crt_exit_composes_under_user_jit(rng=random.Random(48)):
    """reconstruct_words / base_extend must be safe to wrap in a USER jit
    (regression: the unconditional np.asarray broke on tracers — the same
    latent bug class as kyber._u32)."""
    import jax

    n = 64
    ring = rns.RnsRing(n, channels=3)
    q = ring.q
    tgt = rns.RnsRing(n, moduli=rns.ntt_friendly_primes(
        n, 24, 2, below=min(ring.moduli)))
    rows = [[rng.randrange(q) for _ in range(n)]]
    res = ring.encode(rows)
    jw = jax.jit(lambda *r: ring.reconstruct_words(list(r)))(*res)
    want = ring.decode(res)
    assert (ring.decode_words(np.asarray(jw)) == want).all()
    jext = jax.jit(lambda *r: tuple(ring.base_extend(list(r), tgt)))(*res)
    for i, p in enumerate(tgt.moduli):
        assert [int(v) for v in np.asarray(jext[i])[0]] == [
            int(c) % p for c in want[0]]


def test_rns_ring_hybrid_key_switch_vs_bigint_oracle(rng=random.Random(49)):
    """Hybrid key switching (ModUp -> fused digit dot over Q u P ->
    exact ModDown): the production dnum-grouped form vs the big-int
    floor formula  out = floor((sum_j d_j * K_j mod QP) / P)."""
    n = 256
    B = 2
    dnum = 2
    ring = rns.RnsRing(n, channels=4)
    special = rns.ntt_friendly_primes(n, 24, 2, below=min(ring.moduli))
    qp = ring.extended(special)
    p_prod = special[0] * special[1]
    assert qp.moduli[-2:] == special  # ModDown drops exactly P

    cs = [[rng.randrange(ring.q) for _ in range(n)] for _ in range(B)]
    cs[0][:3] = [0, 1, ring.q - 1]  # boundary coefficients
    groups = ring.digit_groups(dnum)
    ksk_int = [[rng.randrange(qp.q) for _ in range(n)] for _ in groups]
    ksk = [qp.encode(np.array(kj, dtype=object)) for kj in ksk_int]

    want = []
    for b in range(B):
        acc = [0] * n
        for idxs, kj in zip(groups, ksk_int):
            qg = 1
            for i in idxs:
                qg *= ring.moduli[i]
            digit = [v % qg for v in cs[b]]
            prod = schoolbook_nwc(digit, kj, qp.q)
            acc = [(x + y) % qp.q for x, y in zip(acc, prod)]
        want.append([v // p_prod for v in acc])

    rc = ring.encode(cs)
    got = ring.decode(ring.hybrid_key_switch(rc, ksk, special, dnum=dnum))
    for b in range(B):
        assert [int(v) for v in got[b]] == want[b]


def test_rns_ring_hybrid_key_switch_guards():
    ring = rns.RnsRing(64, channels=4)
    special = rns.ntt_friendly_primes(64, 24, 1, below=min(ring.moduli))
    with pytest.raises(ValueError, match="dnum"):
        ring.digit_groups(5)
    with pytest.raises(ValueError, match="digits"):
        ring.hybrid_key_switch(ring.encode([[0] * 64]), [], special,
                               dnum=2)


def test_rns_ring_gadget_dot_int_list_keys_n128(rng=random.Random(50)):
    """Regression: raw Python-list key polynomials acquire int32 under a
    bare jnp.asarray, and int32 silently corrupts the XLA path's unsigned
    wraparound arithmetic (found via examples/fhe_modulus_chain.py at
    n=128, where dispatch routes the dot to the XLA backend).  All rns
    entry seams now coerce through _u32."""
    n = 128
    ring = rns.RnsRing(n, channels=3)
    q = ring.q
    cs = [[rng.randrange(q) for _ in range(n)]]
    ksk = [[[rng.randrange(p) for _ in range(n)] for p in ring.moduli]
           for _ in range(3)]
    acc = [0] * n
    for j, pj in enumerate(ring.moduli):
        digit = [c % pj for c in cs[0]]
        kj = [int(v) for v in
              ring.decode([np.array([ksk[j][i]], dtype=np.uint32)
                           for i in range(3)])[0]]
        prod = schoolbook_nwc(digit, kj, q)
        acc = [(x + y) % q for x, y in zip(acc, prod)]
    got = ring.decode(ring.gadget_dot(ring.encode(cs), ksk))
    assert [int(v) for v in got[0]] == acc
    specs = ring.ksk_spectra(ksk, batch=1)
    got2 = ring.decode(ring.gadget_dot_cached(ring.encode(cs), specs))
    assert [int(v) for v in got2[0]] == acc


def test_rns_ring_hybrid_key_switch_cached_matches_full(
        rng=random.Random(51)):
    """Cached-key hybrid variant is bit-identical to the full one."""
    n = 128
    B = 2
    dnum = 2
    ring = rns.RnsRing(n, channels=4)
    special = rns.ntt_friendly_primes(n, 24, 1, below=min(ring.moduli))
    qp = ring.extended(special)
    cs = [[rng.randrange(ring.q) for _ in range(n)] for _ in range(B)]
    groups = ring.digit_groups(dnum)
    ksk = [qp.encode(np.array([[rng.randrange(qp.q) for _ in range(n)]],
                              dtype=object).reshape(n))
           for _ in groups]
    rc = ring.encode(cs)
    full = ring.hybrid_key_switch(rc, ksk, special, dnum=dnum)
    specs = ring.hybrid_ksk_spectra(ksk, special, batch=B, dnum=dnum)
    cached = ring.hybrid_key_switch_cached(rc, specs, special, dnum=dnum)
    for f, c in zip(full, cached):
        assert np.array_equal(np.asarray(f), np.asarray(c))
