"""CKKS approximate HE (tpu_ntt/ckks.py): the canonical embedding is
checked against a HIGH-PRECISION mpmath direct evaluation (the twisted
FFT is the only floating-point machinery in the scheme), and every
homomorphic pipeline (encrypt -> mul -> relin -> rescale -> rotate ->
decrypt) is asserted within an A-PRIORI error bound against an exact
complex oracle — not just "close".

Bound derivation used below (generous L1 form): a decrypted slot value is
sigma(m + e)(zeta^j)/scale with |sigma(e)|_inf <= ||e||_1 <= n * |e|_inf.
Fresh encryption noise coefficients satisfy |e|_inf <= err*(2n + 1) + 1/2
(e0 + u*e + s*e1 with ternary u, s plus the encoding rounding half-ulp),
so fresh slot error <= n*(err*(2n+1) + 1) / scale.  Each multiply scales
the bound by the operand magnitudes, each key switch adds the ModDown
floor term (<= dnum + 1 coefficients) — all far below the factor-4 slack
asserted here.
"""

import numpy as np
import pytest

from tpu_ntt.ckks import (CkksContext, embed_forward, embed_inverse,
                          _slot_tables)

N = 256


@pytest.fixture(scope="module")
def ctx():
    # 4-channel Q (~2^96), dnum=2 digit groups -> 2 special primes
    # (P >= max digit product, the constructor-enforced CKKS rule)
    return CkksContext(N, channels=4, num_special=2, dnum=2)


@pytest.fixture(scope="module")
def keys(ctx):
    rng = np.random.default_rng(1001)
    sk, pk = ctx.keygen(rng)
    rlk = ctx.relin_key(sk, rng)
    return rng, sk, pk, rlk


def _rand_z(rng, n2, lo=-1.0, hi=1.0):
    return (rng.uniform(lo, hi, n2) + 1j * rng.uniform(lo, hi, n2))


def _fresh_bound(ctx):
    """n*(err*(2n+1)+1)/scale (docstring derivation), x4 slack."""
    return 4 * ctx.n * (ctx.err_bound * (2 * ctx.n + 1) + 1) \
        / float(ctx.scale)


def test_embedding_matches_mpmath_direct():
    """The twisted-FFT sigma agrees with a 100-digit mpmath Vandermonde
    evaluation at every slot (n=16 so the direct form is cheap)."""
    import mpmath as mp

    mp.mp.dps = 100
    n = 16
    rng = np.random.default_rng(5)
    coeffs = rng.integers(-1000, 1000, n)
    got = embed_forward(n, coeffs.astype(float))
    pos, _, _ = _slot_tables(n)
    e = 1
    exps = []
    for _ in range(n // 2):
        exps.append(e)
        e = (e * 5) % (2 * n)
    for j, ej in enumerate(exps):
        zeta = mp.exp(1j * mp.pi * ej / n)
        want = sum(int(c) * zeta ** i for i, c in enumerate(coeffs))
        assert abs(complex(want) - got[j]) < 1e-9, f"slot {j}"


def test_embed_roundtrip_and_realness():
    rng = np.random.default_rng(6)
    z = _rand_z(rng, N // 2)
    m = embed_inverse(N, z)
    # conjugate-symmetric slot layout => real coefficients: the imag
    # part dropped by embed_inverse must be numerically zero
    pos, cpos, zpow = _slot_tables(N)
    f = np.zeros(N, dtype=complex)
    f[pos] = z
    f[cpos] = np.conj(z)
    full = np.fft.fft(f) / N * np.conj(zpow)
    assert np.max(np.abs(full.imag)) < 1e-12
    back = embed_forward(N, m)
    assert np.max(np.abs(back - z)) < 1e-12


def test_encode_decode_bound(ctx):
    rng = np.random.default_rng(7)
    z = _rand_z(rng, N // 2)
    dec = ctx.decode(ctx.encode(z), ctx.scale)
    # rounding-only error: each coefficient off by <= 1/2, slot error
    # <= n/2/scale (L1 bound)
    assert np.max(np.abs(dec - z)) < ctx.n / float(ctx.scale)


def test_encrypt_decrypt_within_bound(ctx, keys):
    rng, sk, pk, _ = keys
    z = _rand_z(rng, N // 2)
    ct = ctx.encrypt(pk, z, rng)
    got = ctx.decrypt(sk, ct)[0]
    assert np.max(np.abs(got - z)) < _fresh_bound(ctx)


def test_mul_relin_rescale_vs_oracle(ctx, keys):
    rng, sk, pk, rlk = keys
    z = _rand_z(rng, N // 2)
    w = _rand_z(rng, N // 2)
    ca, cb = ctx.encrypt(pk, z, rng), ctx.encrypt(pk, w, rng)
    prod = ctx.rescale(ctx.mul_relin(ca, cb, rlk))
    got = ctx.decrypt(sk, prod)[0]
    # product noise ~ |z|*fresh + |w|*fresh (operand magnitudes <= ~1.5)
    assert np.max(np.abs(got - z * w)) < 8 * _fresh_bound(ctx)
    # exact scale bookkeeping: scale^2 / p_k as a Fraction
    from fractions import Fraction

    assert prod.scale == Fraction(ctx.scale * ctx.scale,
                                  ctx.ring.moduli[-1])
    assert tuple(prod.ring.moduli) == tuple(ctx.ring.moduli[:-1])


def test_rotation_and_conjugation(ctx, keys):
    rng, sk, pk, _ = keys
    z = _rand_z(rng, N // 2)
    ct = ctx.encrypt(pk, z, rng)
    for k in (1, 3):
        rk = ctx.rotation_key(sk, k, rng)
        got = ctx.decrypt(sk, ctx.rotate(ct, k, rk))[0]
        assert np.max(np.abs(got - np.roll(z, -k))) < 4 * _fresh_bound(ctx)
    ckey = ctx.conjugation_key(sk, rng)
    got = ctx.decrypt(sk, ctx.conjugate(ct, ckey))[0]
    assert np.max(np.abs(got - np.conj(z))) < 4 * _fresh_bound(ctx)


def test_add_sub_mul_plain(ctx, keys):
    rng, sk, pk, _ = keys
    z, w = _rand_z(rng, N // 2), _rand_z(rng, N // 2)
    ca, cb = ctx.encrypt(pk, z, rng), ctx.encrypt(pk, w, rng)
    assert np.max(np.abs(ctx.decrypt(sk, ctx.add(ca, cb))[0] - (z + w))) \
        < 2 * _fresh_bound(ctx)
    assert np.max(np.abs(ctx.decrypt(sk, ctx.sub(ca, cb))[0] - (z - w))) \
        < 2 * _fresh_bound(ctx)
    mp_ = ctx.rescale(ctx.mul_plain(ca, w))
    assert np.max(np.abs(ctx.decrypt(sk, mp_)[0] - z * w)) \
        < 8 * _fresh_bound(ctx)


def test_encrypted_dot_product(ctx, keys):
    """mul_relin + rotate-and-sum: the canonical CKKS reduction (the
    example examples/ckks_encrypted_dot.py runs at full size)."""
    rng, sk, pk, rlk = keys
    n2 = N // 2
    z, w = _rand_z(rng, n2), _rand_z(rng, n2)
    prod = ctx.rescale(ctx.mul_relin(ctx.encrypt(pk, z, rng),
                                     ctx.encrypt(pk, w, rng), rlk))
    acc = prod
    k = 1
    while k < n2:
        rk = ctx.rotation_key(sk, k, rng, ring=acc.ring)
        acc = ctx.add(acc, ctx.rotate(acc, k, rk))
        k *= 2
    got = ctx.decrypt(sk, acc)[0][0]  # every slot holds the dot now
    want = np.sum(z * w)
    # log2(n/2) rotate+add doublings: error grows by ~2 per level
    assert abs(got - want) < 8 * n2 * _fresh_bound(ctx)


def test_depth2_chain(ctx, keys):
    """(z*w)*z across two levels: rescale between products, align the
    fresh operand via level_down (modulus reduction, scale unchanged)."""
    rng, sk, pk, rlk = keys
    z = _rand_z(rng, N // 2, -0.8, 0.8)
    w = _rand_z(rng, N // 2, -0.8, 0.8)
    ca, cb = ctx.encrypt(pk, z, rng), ctx.encrypt(pk, w, rng)
    lvl1 = ctx.rescale(ctx.mul_relin(ca, cb, rlk))
    rlk1 = ctx.relin_key(sk, rng, ring=lvl1.ring)
    cz1 = ctx.level_down(ctx.encrypt(pk, z, rng), lvl1.ring)
    lvl2 = ctx.rescale(ctx.mul_relin(lvl1, cz1, rlk1))
    got = ctx.decrypt(sk, lvl2)[0]
    assert np.max(np.abs(got - z * z * w)) < 32 * _fresh_bound(ctx)
    from tpu_ntt.rns import RnsRing

    with pytest.raises(ValueError):  # not a prefix basis
        ctx.level_down(ca, RnsRing(N, moduli=ctx.ring.moduli[1:3]))


def test_validation(ctx, keys):
    rng, sk, pk, rlk = keys
    z = _rand_z(rng, N // 2)
    ct = ctx.encrypt(pk, z, rng)
    other = ctx.encrypt(pk, z, rng, scale=ctx.scale * 2)
    with pytest.raises(ValueError):
        ctx.add(ct, other)  # scale mismatch
    low = ctx.rescale(ctx.mul(ct, ct))
    with pytest.raises(ValueError):
        ctx.mul(ct, ct and low)  # level mismatch (and degree-2 first)
    with pytest.raises(ValueError):
        ctx.relinearize(ct, rlk)  # not degree 2
    with pytest.raises(ValueError):
        CkksContext(N, channels=4, num_special=1, dnum=2)  # P too small


def test_batch_shapes(ctx, keys):
    rng, sk, pk, _ = keys
    B = 3
    z = np.stack([_rand_z(rng, N // 2) for _ in range(B)])
    ct = ctx.encrypt(pk, z, rng)
    got = ctx.decrypt(sk, ct)
    assert got.shape == (B, N // 2)
    assert np.max(np.abs(got - z)) < _fresh_bound(ctx)


def test_sharded_ckks_parity():
    """ShardedCkks mul+relin+rescale / rotation == CkksContext at the
    residue level: the full approximate-HE hot loop on the mesh (scheme
    pair complete next to ShardedBgv)."""
    import jax
    from jax.sharding import Mesh

    from tpu_ntt.ckks import ShardedCkks

    ctx = CkksContext(N, channels=4, num_special=2, dnum=2)
    rng = np.random.default_rng(2024)
    sk, pk = ctx.keygen(rng)
    rlk = ctx.relin_key(sk, rng)
    rk = ctx.rotation_key(sk, 1, rng)
    mesh2 = Mesh(np.array(jax.devices()[:2]), ("ch",))
    sc = ShardedCkks(ctx, mesh2)

    z = _rand_z(rng, N // 2)
    w = _rand_z(rng, N // 2)
    ca, cb = ctx.encrypt(pk, z, rng), ctx.encrypt(pk, w, rng)
    sa, sb = sc.put_ct(ca), sc.put_ct(cb)

    want = ctx.rescale(ctx.mul_relin(ca, cb, rlk))
    got = sc.rescale(sc.mul_relin(sa, sb, rlk))
    assert got.scale == want.scale
    for pa, pb in zip(want.parts, [got.sring.get(x) for x in got.parts]):
        for a_, b_ in zip(pa, pb):
            assert np.array_equal(np.asarray(a_), b_)
    assert np.max(np.abs(sc.decrypt(sk, got)[0] - z * w)) \
        < 8 * _fresh_bound(ctx)

    r_p = ctx.rotate(ca, 1, rk)
    r_s = sc.rotate(sa, 1, rk)
    for pa, pb in zip(r_p.parts, [r_s.sring.get(x) for x in r_s.parts]):
        for a_, b_ in zip(pa, pb):
            assert np.array_equal(np.asarray(a_), b_)


def test_sub_degree_mismatch_keeps_s2_component(ctx, keys):
    """Round-5 review: sub with a degree-2 operand must PAD (negating
    the unmatched part), not zip-truncate — a dropped s^2 component
    decrypts to garbage silently."""
    rng, sk, pk, rlk = keys
    z = _rand_z(rng, N // 2, -0.7, 0.7)
    w = _rand_z(rng, N // 2, -0.7, 0.7)
    ca, cb = ctx.encrypt(pk, z, rng), ctx.encrypt(pk, w, rng)
    d2 = ctx.mul(ca, cb)  # degree 2, unrelinearized
    cc = ctx.encrypt(pk, w, rng, scale=d2.scale)
    # d2 - cc must keep degree 2 and decrypt to z*w - w
    out = ctx.sub(d2, cc)
    assert out.degree == 2
    got = ctx.decrypt(sk, out)[0]
    assert np.max(np.abs(got - (z * w - w))) < 16 * _fresh_bound(ctx)
    # and the reversed order: cc - d2 = w - z*w
    out2 = ctx.sub(cc, d2)
    assert out2.degree == 2
    got2 = ctx.decrypt(sk, out2)[0]
    assert np.max(np.abs(got2 - (w - z * w))) < 16 * _fresh_bound(ctx)
