"""Channel-parallel sharded RNS (tpu_ntt/rns_sharded.py) on the 8-virtual-
device CPU mesh: bit-exact parity vs the single-device RnsRing / host
big-int decode, plus STRUCTURAL assertions on the compiled SPMD programs
(products must contain zero collectives; the CRT exit exactly the one
channel-axis all-reduce).  The reference has no multi-device counterpart
(single-FPGA pipeline); SURVEY.md §2.8 mandates the mesh analog."""

import random

import numpy as np
import pytest

import jax
from jax.sharding import Mesh, PartitionSpec as P

from tpu_ntt.rns import RnsRing
from tpu_ntt.rns_sharded import ShardedRnsRing

N, K, B = 256, 8, 3


def _rand_mod(rng, q, shape):
    flat = [rng.randrange(q) for _ in range(int(np.prod(shape)))]
    return np.array(flat, dtype=object).reshape(shape)


@pytest.fixture(scope="module")
def ring():
    return RnsRing(N, channels=K, prime_width=24)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:4]).reshape(4), ("ch",))


@pytest.fixture(scope="module")
def sharded(ring, mesh):
    return ShardedRnsRing(ring, mesh)


@pytest.fixture(scope="module")
def operands(ring):
    rng = random.Random(1234)
    a = _rand_mod(rng, ring.q, (B, N))
    b = _rand_mod(rng, ring.q, (B, N))
    return a, b


def test_product_parity_and_sharding(ring, sharded, operands):
    a, b = operands
    A, Bx = sharded.put(ring.encode(a)), sharded.put(ring.encode(b))
    C = sharded.nwc_mult(A, Bx)
    ref = ring.nwc_mult(ring.encode(a), ring.encode(b))
    for i, (got, want) in enumerate(zip(sharded.get(C), ref)):
        assert np.array_equal(got, np.asarray(want)), f"channel {i}"
    assert C.sharding.spec == P("ch")


def test_product_hlo_has_no_collectives(sharded, ring, operands):
    """The channel axis is embarrassingly parallel for products: the
    compiled SPMD program must move no data between devices."""
    a, b = operands
    A, Bx = sharded.put(ring.encode(a)), sharded.put(ring.encode(b))
    hlo = jax.jit(sharded._mult).lower(
        sharded.tabs, sharded.scal, A, Bx).compile().as_text()
    for op in ("all-reduce", "all-gather", "all-to-all",
               "collective-permute"):
        assert op not in hlo, f"unexpected collective {op} in product"


def test_add_sub_automorphism_parity(ring, sharded, operands):
    a, b = operands
    ea, eb = ring.encode(a), ring.encode(b)
    A, Bx = sharded.put(ea), sharded.put(eb)
    for got, want in zip(sharded.get(sharded.add(A, Bx)), ring.add(ea, eb)):
        assert np.array_equal(got, np.asarray(want))
    for got, want in zip(sharded.get(sharded.sub(A, Bx)), ring.sub(ea, eb)):
        assert np.array_equal(got, np.asarray(want))
    g = 2 * N - 1  # conjugation map
    for got, want in zip(sharded.get(sharded.automorphism(A, g)),
                         ring.automorphism(ea, g)):
        assert np.array_equal(got, np.asarray(want))


def test_crt_exit_bit_exact_with_one_all_reduce(ring, sharded, operands):
    a, b = operands
    A, Bx = sharded.put(ring.encode(a)), sharded.put(ring.encode(b))
    C = sharded.nwc_mult(A, Bx)
    words = sharded.reconstruct_words(C)
    dec = ring.decode_words(np.asarray(words))
    want = ring.decode(ring.nwc_mult(ring.encode(a), ring.encode(b)))
    assert np.array_equal(dec, want)
    hlo = sharded._reconstruct.lower(sharded.scal, C).compile().as_text()
    assert "all-reduce" in hlo  # the channel-axis digit sum


def test_rescale_parity(ring, sharded, operands):
    a, b = operands
    A, Bx = sharded.put(ring.encode(a)), sharded.put(ring.encode(b))
    C = sharded.nwc_mult(A, Bx)
    ref = ring.rescale(ring.nwc_mult(ring.encode(a), ring.encode(b)))
    for got, want in zip(sharded.get(sharded.rescale(C)), ref):
        assert np.array_equal(got, np.asarray(want))


def test_spectrum_cached_product(ring, sharded, operands):
    a, b = operands
    A, Bx = sharded.put(ring.encode(a)), sharded.put(ring.encode(b))
    want = sharded.get(sharded.nwc_mult(A, Bx))
    got = sharded.get(sharded.spectrum_mult(sharded.nwc_fwd(A),
                                            sharded.nwc_fwd(Bx)))
    for g, w in zip(got, want):
        assert np.array_equal(g, w)


def test_chain_stays_on_device_and_decodes(ring, sharded):
    """mult -> add -> automorphism -> rescale -> decode, vs big-int."""
    rng = random.Random(77)
    a = _rand_mod(rng, ring.q, (1, N))
    b = _rand_mod(rng, ring.q, (1, N))
    A, Bx = sharded.put(ring.encode(a)), sharded.put(ring.encode(b))
    C = sharded.automorphism(sharded.add(sharded.nwc_mult(A, Bx), A), 5)
    R = sharded.rescale(C)
    dec = sharded.drop_last().decode(R)
    ref = ring.rescale(ring.automorphism(
        ring.add(ring.nwc_mult(ring.encode(a), ring.encode(b)),
                 ring.encode(a)), 5))
    want = ring.drop_last().decode(ref)
    assert np.array_equal(dec, want)


def test_composes_under_user_jit(ring, sharded, operands):
    a, b = operands
    A, Bx = sharded.put(ring.encode(a)), sharded.put(ring.encode(b))

    @jax.jit
    def fused(x, y):
        return sharded.add(sharded.nwc_mult(x, y), x)

    got = sharded.get(fused(A, Bx))
    ea, eb = ring.encode(a), ring.encode(b)
    want = ring.add(ring.nwc_mult(ea, eb), ea)
    for g, w in zip(got, want):
        assert np.array_equal(g, np.asarray(w))


def test_30bit_band_parity():
    """Band edge: 30-bit primes (largest width device_stage_tables
    covers) — the float CRT k-estimate's correction must stay exact."""
    ring = RnsRing(N, channels=4, prime_width=30)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("ch",))
    sharded = ShardedRnsRing(ring, mesh)
    rng = random.Random(99)
    a = _rand_mod(rng, ring.q, (N,))
    b = _rand_mod(rng, ring.q, (N,))
    A, Bx = sharded.put(ring.encode(a)), sharded.put(ring.encode(b))
    C = sharded.nwc_mult(A, Bx)
    dec = ring.decode_words(np.asarray(sharded.reconstruct_words(C)))
    want = ring.decode(ring.nwc_mult(ring.encode(a), ring.encode(b)))
    assert np.array_equal(dec, want)


def test_rejects_mixed_width_basis():
    r24 = RnsRing(N, channels=2, prime_width=24)
    r30 = RnsRing(N, channels=2, prime_width=30)
    mixed = RnsRing(N, moduli=[r24.moduli[0], r30.moduli[0]])
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("ch",))
    with pytest.raises(ValueError, match="same-width"):
        ShardedRnsRing(mixed, mesh)


def test_2d_mesh_channel_x_batch_parity(ring):
    """Channel and data parallelism compose on a 2-D mesh: residues
    sharded P('ch', 'b'), still zero collectives in the product, CRT
    exit still one channel-axis all-reduce."""
    mesh2 = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("ch", "b"))
    sr = ShardedRnsRing(ring, mesh2, batch_axis="b")
    rng = random.Random(55)
    B2 = 8
    a = _rand_mod(rng, ring.q, (B2, N))
    b = _rand_mod(rng, ring.q, (B2, N))
    A, Bx = sr.put(ring.encode(a)), sr.put(ring.encode(b))
    assert A.sharding.spec == P("ch", "b")
    C = sr.nwc_mult(A, Bx)
    ref = ring.nwc_mult(ring.encode(a), ring.encode(b))
    for got, want in zip(sr.get(C), ref):
        assert np.array_equal(got, np.asarray(want))
    hlo = jax.jit(sr._mult).lower(
        sr.tabs, sr.scal, A, Bx).compile().as_text()
    for op in ("all-reduce", "all-gather", "all-to-all",
               "collective-permute"):
        assert op not in hlo
    dec = ring.decode_words(np.asarray(sr.reconstruct_words(C)))
    assert np.array_equal(dec, ring.decode(ref))


def test_sharded_rescale_mod_t_parity(mesh):
    """Sharded BGV modswitch == RnsRing.rescale_mod_t bit-for-bit."""
    import numpy as np

    from tpu_ntt.rns import RnsRing
    from tpu_ntt.rns_sharded import ShardedRnsRing

    rng = np.random.default_rng(41)
    ring = RnsRing(128, channels=4)
    sr = ShardedRnsRing(ring, mesh)
    t = 256
    res = [rng.integers(0, p, (2, 128), dtype=np.int64).astype(np.uint32)
           for p in ring.moduli]
    want = ring.rescale_mod_t(res, t)
    got = sr.rescale_mod_t(sr.put(res), t)
    for w, g in zip(want, np.asarray(got)):
        assert np.array_equal(np.asarray(w), g)
    import pytest

    with pytest.raises(ValueError):
        sr.rescale_mod_t(sr.put(res), 1)


# ---------------------------------------------------------------------------
# hybrid key switching on the mesh (round-5: the FHE-dominant op sharded)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hks_setup():
    """6-channel base + 2 special primes (qp = 8 even over a 2-dev ch
    mesh), dnum=3 digit groups — the production hybrid-KS shape."""
    from tpu_ntt.rns import ntt_friendly_primes

    n = 128
    ring = RnsRing(n, channels=6)
    special = tuple(ntt_friendly_primes(n, 24, 2,
                                        below=min(ring.moduli)))
    mesh2 = Mesh(np.array(jax.devices()[:2]), ("ch",))
    sr = ShardedRnsRing(ring, mesh2)
    rng = random.Random(505)
    c = _rand_mod(rng, ring.q, (2, n))
    return ring, special, sr, c, rng


def test_sharded_base_extend_and_mod_down_parity(hks_setup):
    """base_extend / mod_up / mod_down on the mesh == RnsRing bit-exact
    (the exact reconstruction collective reused per digit group)."""
    ring, special, sr, c, _ = hks_setup
    qp_plain = ring.extended(special)
    qp = sr.extended(special)
    res = ring.encode(c)
    x = sr.put(res)

    be_plain = ring.base_extend(res, qp_plain)
    be_sh = sr.base_extend(x, qp)
    for want, got in zip(be_plain, sr.get(be_sh)):
        assert np.array_equal(np.asarray(want), got)

    groups = ring.digit_groups(3)
    mu_plain = ring.mod_up(res, groups, qp_plain)
    mu_sh = sr.mod_up(x, groups, qp)
    for gp, gs in zip(mu_plain, mu_sh):
        for want, got in zip(gp, sr.get(gs)):
            assert np.array_equal(np.asarray(want), got)

    md_plain = ring.mod_down(qp_plain, be_plain, len(special))
    md_sh = sr.mod_down(qp, be_sh, len(special))
    for want, got in zip(md_plain, sr.get(md_sh)):
        assert np.array_equal(np.asarray(want), got)


@pytest.mark.parametrize("dnum", [2, 3, 6])
def test_sharded_hybrid_key_switch_parity(hks_setup, dnum):
    """ShardedRnsRing.hybrid_key_switch == RnsRing.hybrid_key_switch
    bit-for-bit (the floor contract, every dnum grouping)."""
    ring, special, sr, c, rng = hks_setup
    qp_plain = ring.extended(special)
    groups = ring.digit_groups(dnum)
    ksk = [[np.array([rng.randrange(p.q) for _ in range(ring.n)],
                     dtype=np.uint32) for p in qp_plain.params]
           for _ in range(len(groups))]
    res = ring.encode(c)
    want = ring.hybrid_key_switch(res, ksk, special, dnum)
    got = sr.hybrid_key_switch(sr.put(res), ksk, special, dnum)
    for w, g in zip(want, sr.get(got)):
        assert np.array_equal(np.asarray(w), g)
    # cached form reuses precomputed spectra, identical result
    specs = sr.hybrid_ksk_spectra(ksk, special, dnum)
    got2 = sr.hybrid_key_switch_cached(sr.put(res), specs, special, dnum)
    for w, g in zip(want, sr.get(got2)):
        assert np.array_equal(np.asarray(w), g)


def test_hks_collective_structure(hks_setup):
    """The sharded switch's collective budget: each digit-group ModUp
    carries the one channel-axis all-reduce (digit-lane sum); the
    dnum-digit spectrum dot is collective-FREE (channel-local SPMD)."""
    import jax.numpy as jnp

    ring, special, sr, c, rng = hks_setup
    qp = sr.extended(special)
    x = sr.put(ring.encode(c))
    groups = ring.digit_groups(3)

    # full-basis extension program: exactly the digit-lane all-reduce,
    # no gathers.  (A digit GROUP's slice of the block-sharded channel
    # axis often lands on a subset of devices, where XLA reduces locally
    # without any collective — the layout property that makes grouped
    # ModUp cheap; asserted implicitly by the group HLO below.)
    f = sr._extend_prog(ring, qp)
    hlo = f.lower(sr.scal["q"], sr.scal["mu"],
                  qp.scal["q"], qp.scal["mu"], x).compile().as_text()
    assert "all-reduce" in hlo
    for op in ("all-gather", "all-to-all", "collective-permute"):
        assert op not in hlo, f"unexpected {op} in ModUp"

    # a 3-channel group on the 2-device mesh spans both devices only
    # through its middle channel; whatever XLA picks, no gather may
    # appear and the result must still be exact (checked in the parity
    # tests) — here we only pin "no gathers" for the group program too
    fg = sr._extend_prog(ring._group_ring(groups[0]), qp)
    sl = slice(groups[0][0], groups[0][-1] + 1)
    hlo_g = fg.lower(sr.scal["q"][sl], sr.scal["mu"][sl],
                     qp.scal["q"], qp.scal["mu"],
                     x[sl]).compile().as_text()
    for op in ("all-gather", "all-to-all", "collective-permute"):
        assert op not in hlo_g, f"unexpected {op} in group ModUp"

    # dot program: zero collectives
    ext = jnp.stack(sr.mod_up(x, groups, qp))
    ksk = [[np.array([rng.randrange(p.q) for _ in range(ring.n)],
                     dtype=np.uint32) for p in sr.ring.extended(special).params]
           for _ in range(len(groups))]
    specs = sr.hybrid_ksk_spectra(ksk, special, 3)
    dot = sr._hks_dot(len(groups))
    hlo = dot.lower(qp.tabs, qp.scal, ext, specs).compile().as_text()
    for op in ("all-reduce", "all-gather", "all-to-all",
               "collective-permute"):
        assert op not in hlo, f"unexpected {op} in spectrum dot"


def test_sharded_bgv_parity():
    """ShardedBgv mul+relin / modswitch / rotation == BgvContext
    bit-exact: the full FHE hot loop runs on the mesh."""
    from tpu_ntt.fhe import BgvContext, ShardedBgv

    n, t = 128, 257  # t | 2n: factors stay 1
    ctx = BgvContext(n, t, channels=6, num_special=2, dnum=3)
    rng = np.random.default_rng(7)
    sk, pk = ctx.keygen(rng)
    rlk = ctx.relin_key(sk, rng)
    gk = ctx.galois_key(sk, 3, rng)
    mesh2 = Mesh(np.array(jax.devices()[:2]), ("ch",))
    sb = ShardedBgv(ctx, mesh2)

    m1 = rng.integers(0, t, n)
    m2 = rng.integers(0, t, n)
    c1, c2 = ctx.encrypt(pk, m1, rng), ctx.encrypt(pk, m2, rng)
    s1, s2 = sb.put_ct(c1), sb.put_ct(c2)

    p_plain = ctx.mul_relin(c1, c2, rlk)
    p_sh = sb.mul_relin(s1, s2, rlk)
    # residue-level bit-exactness, not just decrypt equality
    for pa, pb in zip(p_plain.parts,
                      [p_sh.sring.get(x) for x in p_sh.parts]):
        for want, got in zip(pa, pb):
            assert np.array_equal(np.asarray(want), got)
    assert np.array_equal(ctx.decrypt(sk, p_plain), sb.decrypt(sk, p_sh))

    ms_p, ms_s = ctx.mod_switch(p_plain), sb.mod_switch(p_sh)
    for pa, pb in zip(ms_p.parts,
                      [ms_s.sring.get(x) for x in ms_s.parts]):
        for want, got in zip(pa, pb):
            assert np.array_equal(np.asarray(want), got)

    r_p, r_s = ctx.apply_galois(c1, 3, gk), sb.apply_galois(s1, 3, gk)
    assert np.array_equal(ctx.decrypt(sk, r_p), sb.decrypt(sk, r_s))

    a_p, a_s = ctx.add(p_plain, p_plain), sb.add(p_sh, p_sh)
    assert np.array_equal(ctx.decrypt(sk, a_p), sb.decrypt(sk, a_s))


def test_sharded_bgv_sub_and_degree_padding():
    """ShardedBgv add/sub pad degree-mismatched operands exactly like
    BgvContext (round-5 review: a zip-truncate dropped the s^2 part)."""
    from tpu_ntt.fhe import BgvContext, ShardedBgv

    n, t = 128, 257
    ctx = BgvContext(n, t, channels=6, num_special=2, dnum=3)
    rng = np.random.default_rng(12)
    sk, pk = ctx.keygen(rng)
    mesh2 = Mesh(np.array(jax.devices()[:2]), ("ch",))
    sb = ShardedBgv(ctx, mesh2)
    m1 = rng.integers(0, t, n)
    m2 = rng.integers(0, t, n)
    c1, c2 = ctx.encrypt(pk, m1, rng), ctx.encrypt(pk, m2, rng)
    s1, s2 = sb.put_ct(c1), sb.put_ct(c2)
    d2 = sb.mul(s1, s2)      # degree 2
    out = sb.sub(d2, s1)     # must stay degree 2
    assert out.degree == 2
    want = ctx.sub(ctx.mul(c1, c2), c1)
    assert np.array_equal(ctx.decrypt(sk, want),
                          sb.decrypt(sk, out))
    out2 = sb.add(s1, d2)
    assert out2.degree == 2
    want2 = ctx.add(c1, ctx.mul(c1, c2))
    assert np.array_equal(ctx.decrypt(sk, want2), sb.decrypt(sk, out2))
