"""Mesh-sharded transform tests (SURVEY.md §4 implication (e)).

Run on 8 virtual CPU devices (conftest.py) — the same code path the driver
dry-runs and the TPU benchmark executes on real chips.  Oracles: the pure
Python golden models (reference semantics: new_reference/cg_ntt.py) and the
single-chip XLA path.
"""

import random

import jax
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from tpu_ntt import DILITHIUM_256, P24_1024, P60_4096, NttPlan, nwc_poly_mult
from tpu_ntt import reference, sharded
from tpu_ntt.params import make_params


def rand_poly(rng, p):
    return [rng.randrange(p.q) for _ in range(p.n)]


def make_mesh(shape, names):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


# ---------------------------------------------------------------------------
# Local four-step (single device) vs golden
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("p,n1", [(DILITHIUM_256, 16), (DILITHIUM_256, 4),
                                  (P24_1024, 32), (P60_4096, 64)])
def test_fourstep_local_fwd_matches_golden(p, n1, rng=random.Random(7)):
    fs = sharded.FourStepPlan(p, n1, p.n // n1)
    x = rand_poly(rng, p)
    want = reference.cg_ntt(x, p.omega, p.q)
    got4 = fs.decode(jax.jit(lambda v: sharded.fourstep_fwd_local(fs, v))(fs.encode(x)))
    # transform-domain layout: entry [j1, j2] holds X[spectrum_indices()[j1, j2]]
    got = np.empty(p.n, dtype=object)
    g = got4.reshape(fs.n1, fs.n2)
    idx = fs.spectrum_indices()
    for j1 in range(fs.n1):
        for j2 in range(fs.n2):
            got[idx[j1, j2]] = g[j1, j2]
    assert list(got) == want


@pytest.mark.parametrize("p,n1", [(DILITHIUM_256, 16), (P24_1024, 8)])
def test_fourstep_local_roundtrip(p, n1, rng=random.Random(8)):
    fs = sharded.FourStepPlan(p, n1, p.n // n1)
    x = rand_poly(rng, p)
    enc = fs.encode(x)
    out = jax.jit(
        lambda v: sharded.fourstep_inv_local(fs, sharded.fourstep_fwd_local(fs, v))
    )(enc)
    assert list(fs.decode(out)) == x


@pytest.mark.parametrize("p,n1", [(DILITHIUM_256, 16), (P60_4096, 64)])
def test_fourstep_local_nwc_matches_golden(p, n1, rng=random.Random(9)):
    fs = sharded.FourStepPlan(p, n1, p.n // n1)
    a, b = rand_poly(rng, p), rand_poly(rng, p)
    want = reference.nwc_poly_mult(a, b, p)
    got = fs.decode(
        jax.jit(lambda u, v: sharded.fourstep_nwc_poly_mult_local(fs, u, v))(
            fs.encode(a), fs.encode(b)
        )
    )
    assert list(got) == want


# ---------------------------------------------------------------------------
# Sharded four-step on the 8-device CPU mesh
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("p,n1", [(DILITHIUM_256, 16), (P24_1024, 32),
                                  (P60_4096, 64)])
def test_sharded_fwd_inv_roundtrip(p, n1, rng=random.Random(10)):
    fs = sharded.FourStepPlan(p, n1, p.n // n1)
    mesh = make_mesh((8,), ("coeff",))
    sn = sharded.ShardedNtt(fs, mesh)
    x = rand_poly(rng, p)
    enc = sn.put_natural(fs.encode(x), batched=False)
    f = sn.ntt_fwd(enc, batched=False)
    out = sn.ntt_inv(f, batched=False)
    assert list(fs.decode(out)) == x


@pytest.mark.parametrize("p,n1", [(DILITHIUM_256, 16), (P60_4096, 64)])
def test_sharded_fwd_matches_local(p, n1, rng=random.Random(11)):
    fs = sharded.FourStepPlan(p, n1, p.n // n1)
    mesh = make_mesh((8,), ("coeff",))
    sn = sharded.ShardedNtt(fs, mesh)
    x = rand_poly(rng, p)
    enc = fs.encode(x)
    want = fs.decode(sharded.fourstep_fwd_local(fs, enc))
    got = fs.decode(sn.ntt_fwd(sn.put_natural(enc, batched=False), batched=False))
    assert list(got) == list(want)


@pytest.mark.parametrize("p,n1", [(DILITHIUM_256, 16), (P24_1024, 32),
                                  (P60_4096, 64)])
def test_sharded_nwc_poly_mult_vs_golden(p, n1, rng=random.Random(12)):
    fs = sharded.FourStepPlan(p, n1, p.n // n1)
    mesh = make_mesh((8,), ("coeff",))
    sn = sharded.ShardedNtt(fs, mesh)
    a, b = rand_poly(rng, p), rand_poly(rng, p)
    want = reference.nwc_poly_mult(a, b, p)
    got = fs.decode(
        sn.nwc_poly_mult(
            sn.put_natural(fs.encode(a), batched=False),
            sn.put_natural(fs.encode(b), batched=False),
            batched=False,
        )
    )
    assert list(got) == want


def test_sharded_cyclic_poly_mult_vs_golden(rng=random.Random(35)):
    """Distributed cyclic product (the RTL top-level semantics) on the
    8-device mesh vs the schoolbook golden."""
    p = DILITHIUM_256
    fs = sharded.FourStepPlan(p, 16, 16)
    mesh = make_mesh((8,), ("coeff",))
    sn = sharded.ShardedNtt(fs, mesh)
    a, b = rand_poly(rng, p), rand_poly(rng, p)
    got = fs.decode(sn.cyclic_poly_mult(
        sn.put_natural(fs.encode(a), batched=False),
        sn.put_natural(fs.encode(b), batched=False), batched=False))
    assert list(got) == reference.schoolbook_cyclic(a, b, p.q)


def test_sharded_cached_spectrum_matches_direct(rng=random.Random(34)):
    """Sharded cached-spectrum product (two all-to-alls instead of four) ==
    the direct sharded product, XLA locals."""
    p = DILITHIUM_256
    fs = sharded.FourStepPlan(p, 16, 16)
    mesh = make_mesh((8,), ("coeff",))
    sn = sharded.ShardedNtt(fs, mesh)
    a, b = rand_poly(rng, p), rand_poly(rng, p)
    ea = sn.put_natural(fs.encode(a), batched=False)
    eb = sn.put_natural(fs.encode(b), batched=False)
    want = fs.decode(sn.nwc_poly_mult(ea, eb, batched=False))
    spec = sn.nwc_spectrum(eb, batched=False)
    got = fs.decode(sn.nwc_poly_mult_cached(ea, spec, batched=False))
    assert list(got) == list(want)


@pytest.mark.parametrize("p,n1", [(DILITHIUM_256, 16), (P60_4096, 64)])
def test_sharded_nwc_dot_vs_golden(p, n1, rng=random.Random(61)):
    """Distributed fused inner product Σ_k a_k ⊛ b_k on the 8-device
    mesh: one inverse-side all-to-all per output instead of K; cached
    variant (K-stacked nwc_spectrum) bit-identical."""
    fs = sharded.FourStepPlan(p, n1, p.n // n1)
    mesh = make_mesh((8,), ("coeff",))
    sn = sharded.ShardedNtt(fs, mesh)
    K = 2
    a = [rand_poly(rng, p) for _ in range(K)]
    b = [rand_poly(rng, p) for _ in range(K)]
    a[0] = [p.q - 1] * p.n
    b[0] = [p.q - 1] * p.n
    stack = lambda polys: jax.tree.map(
        lambda *leaves: np.stack(leaves), *[fs.encode(x) for x in polys])
    sa = sn.put_natural(stack(a), batched=False, stacked=True)
    sb = sn.put_natural(stack(b), batched=False, stacked=True)
    got = fs.decode(sn.nwc_dot(sa, sb, batched=False))
    want = [0] * p.n
    for k in range(K):
        prod = reference.nwc_poly_mult(a[k], b[k], p)
        want = [(x + y) % p.q for x, y in zip(want, prod)]
    assert list(got) == want

    # cached: K-stacked spectra in the four-step layout
    from jax.sharding import NamedSharding

    specs = [sn.nwc_spectrum(sn.put_natural(fs.encode(x), batched=False),
                             batched=False) for x in b]
    spectra = jax.tree.map(lambda *leaves: np.stack(
        [np.asarray(v) for v in leaves]), *specs)
    sspec = jax.tree.map(
        lambda v: jax.device_put(v, NamedSharding(
            mesh, sn.spec_fourstep(False, stacked=True))), spectra)
    got_c = fs.decode(sn.nwc_dot_cached(sa, sspec, batched=False))
    assert list(got_c) == want


def test_sharded_kernel_locals_nwc_dot(rng=random.Random(62)):
    """The fused dot composes with kernel locals (KernelFourStep inside
    shard_map): vs the native oracle at n = 2^16."""
    from tpu_ntt import native

    if not native.available():
        pytest.skip("native oracle unavailable")
    q = 786433
    p = make_params(1 << 16, q)
    fs = sharded.KernelFourStep(p, 256, 256, interpret=True)
    mesh = make_mesh((8,), ("coeff",))
    sn = sharded.ShardedNtt(fs, mesh)
    nrng = np.random.default_rng(62)
    K = 2
    a = [[int(v) for v in nrng.integers(0, q, size=p.n, dtype=np.uint64)]
         for _ in range(K)]
    b = [[int(v) for v in nrng.integers(0, q, size=p.n, dtype=np.uint64)]
         for _ in range(K)]
    a[0][:3] = [0, 1, q - 1]
    stack = lambda polys: jax.tree.map(
        lambda *leaves: np.stack(leaves), *[fs.encode(x) for x in polys])
    got = fs.decode(sn.nwc_dot(
        sn.put_natural(stack(a), batched=False, stacked=True),
        sn.put_natural(stack(b), batched=False, stacked=True),
        batched=False))
    want = [0] * p.n
    for k in range(K):
        prod = native.nwc_fast(a[k], b[k], q, p.psi)
        want = [(x + y) % q for x, y in zip(want, prod)]
    assert [int(v) for v in got] == want


def test_sharded_goldilocks_nwc_vs_golden(rng=random.Random(33)):
    """The width-64 Goldilocks ring composes with the sharded four-step
    path unchanged (its dedicated reduction rides the same (hi, lo)
    element layout) — transform-internal sharding is not capped at the
    generic ring's q < 2^62."""
    from tpu_ntt.modmath import GOLDILOCKS_Q
    from tpu_ntt.params import make_params

    p = make_params(1024, GOLDILOCKS_Q)
    fs = sharded.FourStepPlan(p, 32, 32)
    mesh = make_mesh((8,), ("coeff",))
    sn = sharded.ShardedNtt(fs, mesh)
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [p.q - 1] * p.n
    want = reference.nwc_poly_mult(a, b, p)
    got = fs.decode(
        sn.nwc_poly_mult(
            sn.put_natural(fs.encode(a), batched=False),
            sn.put_natural(fs.encode(b), batched=False),
            batched=False,
        )
    )
    assert list(got) == want


def test_sharded_batched_2d_mesh(rng=random.Random(13)):
    """batch x coeff mesh: 2-way data parallel, 4-way transform-internal."""
    p = DILITHIUM_256
    fs = sharded.FourStepPlan(p, 16, 16)
    mesh = make_mesh((2, 4), ("batch", "coeff"))
    sn = sharded.ShardedNtt(fs, mesh, batch_axis="batch")
    batch = 4
    polys_a = [rand_poly(rng, p) for _ in range(batch)]
    polys_b = [rand_poly(rng, p) for _ in range(batch)]
    a = sn.put_natural(fs.encode(np.array(polys_a, dtype=object)))
    b = sn.put_natural(fs.encode(np.array(polys_b, dtype=object)))
    got = fs.decode(sn.jit_nwc_poly_mult()(a, b))
    for i in range(batch):
        want = reference.nwc_poly_mult(polys_a[i], polys_b[i], p)
        assert list(got[i]) == want


def test_large_n_two_pow_16(rng=random.Random(14)):
    """A beyond-reference size (n=65536) through the sharded path.  The
    24-bit Dilithium q only supports n<=4096 (2-adicity of q-1 is 13), so
    this uses the classic 30-bit NTT prime 998244353 = 119*2^23 + 1."""
    q = 998244353
    p = make_params(65536, q)
    fs = sharded.FourStepPlan(p, 256, 256)
    mesh = make_mesh((8,), ("coeff",))
    sn = sharded.ShardedNtt(fs, mesh)
    x = [rng.randrange(q) for _ in range(p.n)]
    enc = sn.put_natural(fs.encode(x), batched=False)
    out = sn.ntt_inv(sn.ntt_fwd(enc, batched=False), batched=False)
    assert list(fs.decode(out)) == x


@pytest.mark.parametrize("p,n1", [(DILITHIUM_256, 16), (P60_4096, 64)])
def test_fused_exchange_matches_xla_a2a(p, n1, rng=random.Random(30)):
    """Flag-guarded Pallas RDMA all-to-all (make_async_remote_copy) is
    bit-identical to the jax.lax.all_to_all exchange, via TPU interpret
    mode's simulated remote DMAs on the CPU mesh.  Cannot be perf-tested
    on this 1-chip setup (see sharded.py docs) — correctness only."""
    fs = sharded.FourStepPlan(p, n1, p.n // n1)
    mesh = make_mesh((8,), ("coeff",))
    sn_x = sharded.ShardedNtt(fs, mesh)
    sn_f = sharded.ShardedNtt(fs, mesh, fused_exchange=True)
    x = rand_poly(rng, p)
    enc = lambda sn: sn.put_natural(fs.encode(x), batched=False)
    want = fs.decode(sn_x.ntt_fwd(enc(sn_x), batched=False))
    got = fs.decode(sn_f.ntt_fwd(enc(sn_f), batched=False))
    assert list(got) == list(want)
    rt = fs.decode(
        sn_f.ntt_inv(sn_f.ntt_fwd(enc(sn_f), batched=False), batched=False)
    )
    assert list(rt) == x


def test_fused_exchange_nwc_product_vs_golden(rng=random.Random(31)):
    """Full NWC product through the RDMA exchange — interpret-mode only
    (simulated remote DMAs on the CPU mesh; no multi-chip hardware here),
    so this validates correctness, never performance."""
    p = DILITHIUM_256
    fs = sharded.FourStepPlan(p, 16, 16)
    mesh = make_mesh((8,), ("coeff",))
    sn = sharded.ShardedNtt(fs, mesh, fused_exchange=True)
    a, b = rand_poly(rng, p), rand_poly(rng, p)
    got = fs.decode(
        sn.nwc_poly_mult(
            sn.put_natural(fs.encode(a), batched=False),
            sn.put_natural(fs.encode(b), batched=False),
            batched=False,
        )
    )
    assert list(got) == reference.nwc_poly_mult(a, b, p)


def test_fused_exchange_2d_mesh_batched(rng=random.Random(32)):
    """RDMA exchange with a 2-axis mesh: peer coordinates vary only on the
    coeff axis while the batch axis coordinate rides along.  Interpret-mode
    only (simulated remote DMAs; correctness, not performance)."""
    p = DILITHIUM_256
    fs = sharded.FourStepPlan(p, 16, 16)
    mesh = make_mesh((2, 4), ("batch", "coeff"))
    sn = sharded.ShardedNtt(fs, mesh, batch_axis="batch",
                            fused_exchange=True)
    batch = 4
    polys_a = [rand_poly(rng, p) for _ in range(batch)]
    polys_b = [rand_poly(rng, p) for _ in range(batch)]
    a = sn.put_natural(fs.encode(np.array(polys_a, dtype=object)))
    b = sn.put_natural(fs.encode(np.array(polys_b, dtype=object)))
    got = fs.decode(sn.jit_nwc_poly_mult()(a, b))
    for i in range(batch):
        assert list(got[i]) == reference.nwc_poly_mult(
            polys_a[i], polys_b[i], p
        )


def test_config5_n_two_pow_20_nwc_product(rng=random.Random(20)):
    """The SURVEY §2.8 config-5 target size: a full n = 2^20 negacyclic
    product through the sharded four-step path on the 8-device mesh,
    checked against the independent native O(n log n) oracle.  The
    reference explicitly defers this scale to future work
    (reports/final-report.tex:1811); here it is one all-to-all per
    transform over the mesh (ICI/DCN on real hardware)."""
    from tpu_ntt import native

    if not native.available():
        pytest.skip("native oracle unavailable")
    q = 998244353  # 119 * 2^23 + 1: 2-adicity 23 supports 2n = 2^21
    p = make_params(1 << 20, q)
    fs = sharded.FourStepPlan(p, 1024, 1024)
    mesh = make_mesh((8,), ("coeff",))
    sn = sharded.ShardedNtt(fs, mesh)
    nrng = np.random.default_rng(20)
    a = nrng.integers(0, q, size=p.n, dtype=np.uint64)
    b = nrng.integers(0, q, size=p.n, dtype=np.uint64)
    enc = lambda v: sn.put_natural(
        v.astype(np.uint32).reshape(fs.n1, fs.n2), batched=False
    )
    got = fs.decode(sn.nwc_poly_mult(enc(a), enc(b), batched=False))
    want = native.nwc_fast([int(v) for v in a], [int(v) for v in b], q, p.psi)
    assert [int(v) for v in got] == want


def test_kernel_fourstep_nwc_product_vs_native(rng=random.Random(40)):
    """Kernel-locals four-step (sharded.KernelFourStep): the large-N
    single-chip production path dispatch routes n > 65536 to.  n = 2^16
    (col 256 x row 256, both MxuPlan-covered) product vs the independent
    native O(n log n) oracle, plus nwc and cyclic roundtrips."""
    from tpu_ntt import native

    if not native.available():
        pytest.skip("native oracle unavailable")
    q = 786433  # 3 * 2^18 + 1: 2-adicity 18 supports 2n = 2^17
    p = make_params(1 << 16, q)
    fs = sharded.KernelFourStep(p, 256, 256, interpret=True)
    nrng = np.random.default_rng(40)
    a = [int(v) for v in nrng.integers(0, q, size=p.n, dtype=np.uint64)]
    b = [int(v) for v in nrng.integers(0, q, size=p.n, dtype=np.uint64)]
    a[:3] = [0, 1, q - 1]  # boundary operands
    ea, eb = fs.encode([a]), fs.encode([b])
    got = fs.decode(sharded.fourstep_nwc_poly_mult_kernel(fs, ea, eb))
    assert [int(v) for v in got[0]] == native.nwc_fast(a, b, q, p.psi)
    # cyclic fwd/inv roundtrip (the nwc pair is exercised by the product)
    rt = fs.decode(sharded.fourstep_inv_kernel(
        fs, sharded.fourstep_fwd_kernel(fs, ea)))
    assert [int(v) for v in rt[0]] == a


def test_kernel_fourstep_goldilocks_vs_native(rng=random.Random(41)):
    """Width-64 Goldilocks through the kernel-locals four-step (col/row =
    GoldilocksPlan64): the large-N fast path is not capped at the generic
    kernel's q < 2^62.  Oracle: native nwc_fast (wrap-aware add/sub, valid
    for q up to 2^64)."""
    from tpu_ntt import native
    from tpu_ntt.modmath import GOLDILOCKS_Q

    if not native.available():
        pytest.skip("native oracle unavailable")
    q = GOLDILOCKS_Q
    p = make_params(1 << 16, q)
    fs = sharded.KernelFourStep(p, 256, 256, interpret=True)
    nrng = np.random.default_rng(41)
    a = [int(v) for v in nrng.integers(0, q, size=p.n, dtype=np.uint64)]
    b = [int(v) for v in nrng.integers(0, q, size=p.n, dtype=np.uint64)]
    a[:3] = [0, 1, q - 1]
    got = fs.decode(
        sharded.fourstep_nwc_poly_mult_kernel(fs, fs.encode([a]),
                                              fs.encode([b]))
    )
    assert [int(v) for v in got[0]] == native.nwc_fast(a, b, q, p.psi)


def test_kernel_fourstep_solinas_vs_native(rng=random.Random(43)):
    """Trinomial 60-bit modulus through the kernel-locals four-step: the
    local transforms route to SolinasPlan64 (kernels.plan_for), so the
    large-N path inherits the headline fold speedup.  q = 2^60 - 2^18 + 1
    (2-adicity 18) is the production choice for n in (32768, 2^17]."""
    from tpu_ntt import native
    from tpu_ntt.kernels import covers
    from tpu_ntt.kernels.sol64 import SolinasPlan64

    if not native.available():
        pytest.skip("native oracle unavailable")
    q = (1 << 60) - (1 << 18) + 1
    p = make_params(1 << 16, q)
    assert covers(256, q) is SolinasPlan64
    fs = sharded.KernelFourStep(p, 256, 256, interpret=True)
    nrng = np.random.default_rng(43)
    a = [int(v) for v in nrng.integers(0, q, size=p.n, dtype=np.uint64)]
    b = [int(v) for v in nrng.integers(0, q, size=p.n, dtype=np.uint64)]
    a[:3] = [0, 1, q - 1]
    got = fs.decode(
        sharded.fourstep_nwc_poly_mult_kernel(fs, fs.encode([a]),
                                              fs.encode([b]))
    )
    assert [int(v) for v in got[0]] == native.nwc_fast(a, b, q, p.psi)


def test_kernel_fourstep_fused_row_matches_composed(rng=random.Random(45)):
    """The fused row stage (ONE row_k.cyclic_poly_mult replacing
    rowF x2 + XLA pointwise + rowI; the round-3 large-N attack) is
    bit-exact vs the composed control path — the convolution-theorem
    identity rowI(rowF(ma) . rowF(mb)) == cyclic_n2(ma, mb) holds exactly
    because both sides are bit-exact cyclic convolutions mod q."""
    q = 786433
    p = make_params(1 << 16, q)
    fs = sharded.KernelFourStep(p, 256, 256, interpret=True)
    nrng = np.random.default_rng(45)
    a = nrng.integers(0, q, size=(2, p.n), dtype=np.uint64)
    a[0, :3] = [0, 1, q - 1]
    ea, eb = fs.encode([list(map(int, a[0]))]), fs.encode(
        [list(map(int, a[1]))])
    fused = fs.decode(
        sharded.fourstep_nwc_poly_mult_kernel(fs, ea, eb, fused_row=True))
    composed = fs.decode(
        sharded.fourstep_nwc_poly_mult_kernel(fs, ea, eb, fused_row=False))
    assert [int(v) for v in fused[0]] == [int(v) for v in composed[0]]


def test_kernel_fourstep_scaled_row_matches_composed(rng=random.Random(46)):
    """Pairs-kernel variant of the fused-row A/B: the 60-bit path takes
    the cyclic_poly_mult_scaled branch (outer mids folded INTO the row
    kernel as entry/exit Shoup scales with the period-P BlockSpec), which
    must stay bit-exact vs the composed control."""
    q = (1 << 60) - (1 << 18) + 1
    p = make_params(1 << 16, q)
    fs = sharded.KernelFourStep(p, 256, 256, interpret=True)
    assert fs.row_scales is not None  # the fold applies on this path
    nrng = np.random.default_rng(46)
    a = nrng.integers(0, q, size=(2, p.n), dtype=np.uint64)
    a[0, :3] = [0, 1, q - 1]
    ea, eb = fs.encode([list(map(int, a[0]))]), fs.encode(
        [list(map(int, a[1]))])
    fused = fs.decode(
        sharded.fourstep_nwc_poly_mult_kernel(fs, ea, eb, fused_row=True))
    composed = fs.decode(
        sharded.fourstep_nwc_poly_mult_kernel(fs, ea, eb, fused_row=False))
    assert [int(v) for v in fused[0]] == [int(v) for v in composed[0]]


def test_sharded_kernel_locals_nwc_vs_native(rng=random.Random(42)):
    """Distributed four-step with fused-kernel locals: passing a
    KernelFourStep to ShardedNtt runs the column/row passes AS the Pallas
    kernels inside shard_map (one all-to-all per transform, twist folded,
    zero elementwise twist passes).  8-device mesh, n = 2^16, vs the native
    oracle; forward must equal the local kernel four-step bit-for-bit."""
    from tpu_ntt import native

    if not native.available():
        pytest.skip("native oracle unavailable")
    q = 786433
    p = make_params(1 << 16, q)
    fs = sharded.KernelFourStep(p, 256, 256, interpret=True)
    mesh = make_mesh((8,), ("coeff",))
    sn = sharded.ShardedNtt(fs, mesh)
    assert sn.kernel_locals
    nrng = np.random.default_rng(42)
    a = [int(v) for v in nrng.integers(0, q, size=p.n, dtype=np.uint64)]
    b = [int(v) for v in nrng.integers(0, q, size=p.n, dtype=np.uint64)]
    a[:3] = [0, 1, q - 1]
    ea, eb = fs.encode(a), fs.encode(b)
    got = fs.decode(sn.nwc_poly_mult(sn.put_natural(ea, batched=False),
                                     sn.put_natural(eb, batched=False),
                                     batched=False))
    assert [int(v) for v in got] == native.nwc_fast(a, b, q, p.psi)
    f_sh = fs.decode(sn.ntt_fwd(sn.put_natural(ea, batched=False),
                                batched=False))
    f_lo = fs.decode(sharded.fourstep_fwd_kernel(fs, ea))
    assert [int(v) for v in f_sh] == [int(v) for v in f_lo]
    # cached-spectrum product (kernel locals) == direct
    spec = sn.nwc_spectrum(sn.put_natural(eb, batched=False), batched=False)
    gc = fs.decode(sn.nwc_poly_mult_cached(
        sn.put_natural(ea, batched=False), spec, batched=False))
    assert [int(v) for v in gc] == [int(v) for v in got]


def test_kernel_fourstep_spectrum_indices():
    """KernelFourStep.spectrum_indices reflects the KERNEL layout (each
    sub-kernel's four-step order), not the base class's bit-reversed
    no-gather layout.  Closed form: fwd of the delta at index 1 has
    natural spectrum X[k] = omega^k, so position [j1, j2] must hold
    omega^spectrum_indices()[j1, j2]."""
    q = 786433
    p = make_params(1 << 16, q)
    fs = sharded.KernelFourStep(p, 256, 256, interpret=True)
    x = [0] * p.n
    x[1] = 1
    flat = fs.decode(sharded.fourstep_fwd_kernel(fs, fs.encode([x])))[0]
    idx = fs.spectrum_indices().reshape(-1)
    want = [pow(p.omega, int(k), q) for k in idx]
    assert [int(v) for v in flat] == want
    # and the base-class map stays correct for the no-gather locals
    fsx = sharded.FourStepPlan(p, 256, 256)
    flatx = fsx.decode(
        jax.jit(lambda v: sharded.fourstep_fwd_local(fsx, v))(fsx.encode(x))
    )
    idxx = fsx.spectrum_indices().reshape(-1)
    assert [int(v) for v in flatx] == [pow(p.omega, int(k), q) for k in idxx]


def test_sharded_kernel_locals_fused_exchange(rng=random.Random(44)):
    """Kernel locals compose with the flag-guarded Pallas RDMA exchange
    (both production features on): bit-identical to the XLA-exchange
    kernel-locals product."""
    from tpu_ntt import native

    if not native.available():
        pytest.skip("native oracle unavailable")
    q = 786433
    p = make_params(1 << 16, q)
    fs = sharded.KernelFourStep(p, 256, 256, interpret=True)
    mesh = make_mesh((8,), ("coeff",))
    sn = sharded.ShardedNtt(fs, mesh, fused_exchange=True)
    nrng = np.random.default_rng(44)
    a = [int(v) for v in nrng.integers(0, q, size=p.n, dtype=np.uint64)]
    b = [int(v) for v in nrng.integers(0, q, size=p.n, dtype=np.uint64)]
    got = fs.decode(sn.nwc_poly_mult(
        sn.put_natural(fs.encode(a), batched=False),
        sn.put_natural(fs.encode(b), batched=False), batched=False))
    assert [int(v) for v in got] == native.nwc_fast(a, b, q, p.psi)


def test_sharded_kernel_locals_goldilocks_2d_mesh(rng=random.Random(43)):
    """Width-64 Goldilocks through the distributed kernel-locals path on a
    2x4 batch x coeff mesh (gl64 col/row kernels + pairs all-to-all)."""
    from tpu_ntt import native
    from tpu_ntt.modmath import GOLDILOCKS_Q

    if not native.available():
        pytest.skip("native oracle unavailable")
    q = GOLDILOCKS_Q
    p = make_params(1 << 16, q)
    fs = sharded.KernelFourStep(p, 256, 256, interpret=True)
    mesh = make_mesh((2, 4), ("batch", "coeff"))
    sn = sharded.ShardedNtt(fs, mesh, batch_axis="batch")
    nrng = np.random.default_rng(43)
    pa = [[int(v) for v in nrng.integers(0, q, size=p.n, dtype=np.uint64)]
          for _ in range(2)]
    pb = [[int(v) for v in nrng.integers(0, q, size=p.n, dtype=np.uint64)]
          for _ in range(2)]
    a = sn.put_natural(fs.encode(np.array(pa, dtype=object)))
    b = sn.put_natural(fs.encode(np.array(pb, dtype=object)))
    got = fs.decode(sn.nwc_poly_mult(a, b))
    for i in range(2):
        assert [int(v) for v in got[i]] == native.nwc_fast(
            pa[i], pb[i], q, p.psi)


def test_kernel_fourstep_rejects_uncovered_width():
    """No fused-kernel coverage for a sub-transform -> ValueError (the
    dispatch layer then falls back to the XLA no-gather locals).  Width
    25..30 is the real uncovered band: plan_for measured the single-word
    XLA path 2.1x faster there, so it declines."""
    p = make_params(1 << 16, 998244353)  # width 30
    with pytest.raises(ValueError, match="kernel coverage"):
        sharded.KernelFourStep(p, 256, 256, interpret=True)


def test_batch_pjit_data_parallel(rng=random.Random(15)):
    plan = NttPlan(DILITHIUM_256)
    mesh = make_mesh((8,), ("batch",))
    batch = 16
    p = DILITHIUM_256
    polys_a = [rand_poly(rng, p) for _ in range(batch)]
    polys_b = [rand_poly(rng, p) for _ in range(batch)]
    a = sharded.shard_batch(mesh, "batch", plan.encode(np.array(polys_a, dtype=object)))
    b = sharded.shard_batch(mesh, "batch", plan.encode(np.array(polys_b, dtype=object)))
    run = sharded.batch_pjit(plan, nwc_poly_mult, mesh)
    got = plan.decode(run(a, b))
    for i in range(batch):
        assert list(got[i]) == reference.nwc_poly_mult(polys_a[i], polys_b[i], p)


def test_default_split():
    assert sharded.default_split(4096) == (64, 64)
    assert sharded.default_split(1024) == (32, 32)
    assert sharded.default_split(2 ** 20) == (1024, 1024)
    # odd log2: the larger factor is n1 (column pass) — measured +11% on
    # the kernel-locals four-step (BENCH_NOTES.md round-2 split sweep)
    assert sharded.default_split(512) == (32, 16)
    assert sharded.default_split(2 ** 17) == (512, 256)


def test_kernel_under_shard_map(rng=random.Random(21)):
    """Pallas kernel composed with data-parallel shard_map (the production
    multi-chip serving shape: one fused kernel per device, no collectives)."""
    from tpu_ntt.kernels.mxu import MxuPlan

    p = DILITHIUM_256
    mp = MxuPlan(p)
    mesh = make_mesh((8,), ("batch",))
    B = 8 * mp.t  # one kernel group per device
    a = np.array([[rng.randrange(p.q) for _ in range(p.n)] for _ in range(B)],
                 dtype=np.uint32)
    b = np.array([[rng.randrange(p.q) for _ in range(p.n)] for _ in range(B)],
                 dtype=np.uint32)

    fn = jax.jit(
        jax.shard_map(
            lambda x, y: mp.nwc_poly_mult(x, y, interpret=True),
            mesh=mesh,
            in_specs=(P("batch", None), P("batch", None)),
            out_specs=P("batch", None),
            # pallas_call does not annotate varying-mesh-axes metadata yet
            check_vma=False,
        )
    )
    got = np.asarray(fn(a, b))
    for i in (0, B - 1):
        want = reference.nwc_poly_mult(
            [int(v) for v in a[i]], [int(v) for v in b[i]], p
        )
        assert [int(v) for v in got[i]] == want
