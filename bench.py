"""TPU benchmark harness — prints ONE JSON line for the driver.

Headline metric: 4096-point 60-bit negacyclic polynomial multiplications per
second on one chip (the BASELINE.json north-star workload).  ``vs_baseline``
is the speedup over the reference accelerator's best published number for the
same operation: 153.10 us per poly-mult on UltraScale+ @ 250 MHz
(reference: reports/final-report.tex:1339-1347) = 6531.7 poly-mults/s.

Timing is done on-device (tpu_ntt.benchlib): the op runs inside a
lax.fori_loop with data-dependent chaining and only a scalar probe is
fetched, then constant overhead is removed by differencing two iteration
counts — host wall-clock around tunneled dispatches is meaningless.

Secondary metrics (other parameter sets, forward-NTT-only) go to stderr so
the stdout contract stays one line.

Usage: python bench.py [--quick] [--all] [--metric nwc60|nwc24|fwd60|fwd24]
"""

import argparse
import json
import sys

import numpy as np

import jax

from tpu_ntt import PRESETS, dispatch
from tpu_ntt.benchlib import (device_seconds_per_iter,
                              device_seconds_per_iter_binary)
from tpu_ntt.params import make_params

# beyond-reference size: n = 32768, 60-bit prime of 2-adicity 17 (the
# multi-tile kernel path; the reference's largest shipped config is 4096)
P60_32768 = make_params(32768, 576460752308273153, name="p60_32768")
# config-5 scale on ONE chip via the four-step dispatch backend: n = 2^20
# with the classic 30-bit NTT prime (2-adicity 23) and a 2-adicity-21
# 60-bit prime (the shipped P60 prime only supports n <= 65536)
P30_1M = make_params(1 << 20, 998244353, name="p30_1048576")
P60_1M = make_params(1 << 20, 576460752364240897, name="p60_1048576")
EXTRA = {"p60_32768": P60_32768, "p30_1048576": P30_1M,
         "p60_1048576": P60_1M}

# Reference FPGA best for the full 4096-pt poly-mult (153.10 us @ 250 MHz).
BASELINE_NWC4096_PER_SEC = 1e6 / 153.10
# Reference FPGA best forward NTT (12.77 us 24-bit, 17.56 us 60-bit).
BASELINE_FWD4096_24_PER_SEC = 1e6 / 12.77
BASELINE_FWD4096_60_PER_SEC = 1e6 / 17.56


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_batch(p, pairs, batch, seed):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, p.q, size=(batch, p.n), dtype=np.uint64)
    if not pairs:
        return jax.device_put(vals.astype(np.uint32))
    return (
        jax.device_put((vals >> 32).astype(np.uint32)),
        jax.device_put((vals & 0xFFFFFFFF).astype(np.uint32)),
    )


def bench_case(name, batch, iters, kind="nwc"):
    """Time one workload via the SINGLE dispatch policy (tpu_ntt.dispatch):
    the benchmark measures exactly what users get, with no second copy of
    the backend-selection table."""
    p = PRESETS.get(name) or EXTRA[name]
    pairs = dispatch.takes_pairs(p)
    a = make_batch(p, pairs, batch, 1)
    op = "nwc_fwd" if kind == "fwd" else "nwc"
    impl = dispatch.impl_name(p, op)
    fn = dispatch.best(p, op)
    if kind == "fwd":
        dt = device_seconds_per_iter(fn, a, iters=iters)
    else:
        b = make_batch(p, pairs, batch, 2)
        # COMPOSED backends (multi-dispatch products: xla/fourstep) must be
        # timed with both operands loop-carried, or XLA's while-loop
        # invariant code motion hoists NTT(b) out of the timing loop and
        # inflates the rate ~1.2-1.7x (BENCH_NOTES.md round-3 honesty
        # audit).  Single-pallas_call backends are opaque to ICM; the
        # plain chain avoids the swap-chain's loop-carry copy overhead.
        if "fourstep" in impl or "xla" in impl:
            dt = device_seconds_per_iter_binary(fn, a, b, iters=iters)
        else:
            dt = device_seconds_per_iter(fn, a, b, iters=iters)
    rate = batch / dt
    log(f"  {name} {kind} [{impl}]: batch={batch} {dt * 1e3:.3f} ms/iter "
        f"-> {rate:,.0f} op/s")
    return rate


def bench_matvec(name, k, l, batch, iters):
    """Time the fused A @ s workload (k = l so the output chains back as
    the next vector); reports matvecs/s and effective products/s."""
    p = PRESETS.get(name) or EXTRA[name]
    pairs = dispatch.takes_pairs(p)
    rng = np.random.default_rng(5)
    A = rng.integers(0, p.q, size=(k, l, p.n), dtype=np.uint64)
    s_np = rng.integers(0, p.q, size=(l, batch, p.n), dtype=np.uint64)
    enc = (lambda v: ((v >> 32).astype(np.uint32),
                      (v & 0xFFFFFFFF).astype(np.uint32))
           ) if pairs else (lambda v: v.astype(np.uint32))
    blocks = dispatch.best_nwc_matvec_spectra(p)(enc(A))
    fn = dispatch.best_nwc_matvec(p)
    s = jax.device_put(enc(s_np))
    dt = device_seconds_per_iter(fn, s, blocks, iters=iters)
    impl = dispatch.impl_name(p, "matvec")
    log(f"  {name} matvec {k}x{l} [{impl}]: batch={batch} "
        f"{dt * 1e3:.3f} ms/iter -> {batch / dt:,.0f} matvecs/s "
        f"({k * l * batch / dt:,.0f} eff products/s)")
    return batch / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small batches/iters")
    ap.add_argument("--metric", default="nwc60",
                    choices=["nwc60", "nwc24", "fwd60", "fwd24"])
    ap.add_argument("--all", action="store_true", help="run every case")
    args = ap.parse_args()

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")
    batch = 256 if args.quick else 2048
    iters = (2, 8) if args.quick else (10, 50)

    cases = {
        "nwc60": ("p60_4096", "nwc", BASELINE_NWC4096_PER_SEC),
        "nwc24": ("p24_4096", "nwc", BASELINE_NWC4096_PER_SEC),
        "fwd60": ("p60_4096", "fwd", BASELINE_FWD4096_60_PER_SEC),
        "fwd24": ("p24_4096", "fwd", BASELINE_FWD4096_24_PER_SEC),
    }

    if args.all:
        for key, (name, kind, _) in cases.items():
            if key != args.metric:
                bench_case(name, batch, iters, kind)
        for name in ("dilithium_256", "p24_1024", "falcon_512",
                     "falcon_1024"):
            bench_case(name, batch * 4, iters, "nwc")
        bench_case("p60_32768", max(batch // 8, 32), iters, "nwc")
        # width-64 Goldilocks: beyond the reference's WIDTH=60 ceiling
        bench_case("goldilocks_4096", batch, iters, "nwc")
        # n = 2^20 single-chip four-step (the config-5 size on ONE chip)
        bench_case("p30_1048576", max(batch // 256, 4), iters, "nwc")
        bench_case("p60_1048576", max(batch // 512, 2), iters, "nwc")
        # the fused A @ s workload (Dilithium ML-DSA-44 shape + 60-bit)
        bench_matvec("dilithium_256", 4, 4, batch * 4, iters)
        bench_matvec("p60_4096", 4, 4, max(batch // 8, 32), iters)
        bench_kyber(batch * 8, iters)
        bench_mldsa(batch * 4, iters)
        bench_rns_keyswitch(max(batch // 8, 32), iters)
        bench_hybrid_keyswitch(max(batch // 32, 16), iters)
        bench_sharded_rns(max(batch // 16, 32), iters)
        bench_poseidon(batch * 64, iters)
        bench_bgv(max(batch // 256, 4), iters)
        bench_ckks(max(batch // 512, 2), iters)

    name, kind, baseline = cases[args.metric]
    rate = bench_case(name, batch, iters, kind)
    print(json.dumps({
        "metric": f"nwc_poly_mult_{name}_per_sec"
        if kind == "nwc" else f"fwd_ntt_{name}_per_sec",
        "value": round(rate, 1),
        "unit": "op/s",
        "vs_baseline": round(rate / baseline, 2),
    }))


def bench_mldsa(batch, iters):
    """ML-DSA (FIPS-204) A o NTT(y) at the -87 shape (8, 7) — the largest
    deployed matrix product (tpu_ntt.mldsa; round-4 surface)."""
    from tpu_ntt import mldsa
    from tpu_ntt.kernels.mxu import MxuPlan

    kp = MxuPlan(mldsa.PARAMS)
    k, l = mldsa.MATRIX_SHAPES[87]
    rng = np.random.default_rng(13)
    A = rng.integers(0, mldsa.Q, size=(k, l, mldsa.N), dtype=np.uint64)
    s = rng.integers(0, mldsa.Q, size=(l, batch, mldsa.N), dtype=np.uint64)
    blocks = kp.nwc_matvec_spectra(jax.device_put(A.astype(np.uint32)))
    sv = jax.device_put(s.astype(np.uint32))
    # chain: next s = first l rows of the (k, B, n) output (k >= l)
    fn = lambda x, blk: kp.nwc_matvec_cached(x, blk)[: l]
    dt = device_seconds_per_iter(fn, sv, blocks, iters=iters)
    log(f"  mldsa-87 matvec (8,7) [pallas-mxu]: batch={batch} "
        f"{dt * 1e3:.3f} ms/iter -> {batch / dt:,.0f} matvecs/s "
        f"({k * l * batch / dt:,.0f} eff products/s)")
    return batch / dt


def bench_rns_keyswitch(batch, iters):
    """RNS gadget key-switch (keys cached): the FHE hot-loop composite
    (round-4 surface; docs/DESIGN.md §2.8)."""
    from tpu_ntt import rns

    n = 4096
    ring = rns.RnsRing(n, channels=6)
    rng = np.random.default_rng(17)
    host = rng.integers(0, 1 << 63, size=(batch, n), dtype=np.uint64)
    res = tuple(jax.device_put((host % np.uint64(m)).astype(np.uint32))
                for m in ring.moduli)
    ksk = [[rng.integers(0, m, size=(n,)).astype(np.uint32)
            for m in ring.moduli] for _ in range(len(ring.moduli))]
    specs = [jax.block_until_ready(s)
             for s in ring.ksk_spectra(ksk, batch=batch)]
    fn = lambda state: tuple(ring.gadget_dot_cached(list(state), specs))
    dt = device_seconds_per_iter(fn, res, iters=iters)
    log(f"  rns keyswitch n={n} 144-bit 6-digit [fused dots]: "
        f"batch={batch} {dt * 1e3:.3f} ms/iter -> "
        f"{batch / dt:,.0f} switches/s")
    return batch / dt


def bench_hybrid_keyswitch(batch, iters):
    """Hybrid (dnum-grouped) key switch with cached keys: ModUp ->
    fused digit dots over Q u P -> exact ModDown (rns.py)."""
    from tpu_ntt import rns

    n, dnum = 4096, 2
    ring = rns.RnsRing(n, channels=6)
    special = rns.ntt_friendly_primes(n, 24, 1, below=min(ring.moduli))
    qp = ring.extended(special)
    rng = np.random.default_rng(21)
    res = tuple(jax.device_put(
        rng.integers(0, m, size=(batch, n)).astype(np.uint32))
        for m in ring.moduli)
    groups = ring.digit_groups(dnum)
    ksk = [[rng.integers(0, m, size=(n,)).astype(np.uint32)
            for m in qp.moduli] for _ in groups]
    specs = [jax.block_until_ready(s) for s in
             ring.hybrid_ksk_spectra(ksk, special, batch=batch, dnum=dnum)]
    fn = lambda state: tuple(ring.hybrid_key_switch_cached(
        list(state), specs, special, dnum=dnum))
    dt = device_seconds_per_iter(fn, res, iters=iters)
    log(f"  rns hybrid keyswitch n={n} 144-bit dnum={dnum} P=1: "
        f"batch={batch} {dt * 1e3:.3f} ms/iter -> "
        f"{batch / dt:,.0f} switches/s")
    return batch / dt


def bench_sharded_rns(batch, iters):
    """Channel-parallel sharded RNS product (rns_sharded.py): the
    q-generic vmapped SPMD program on a 1-device mesh (honest
    single-chip rate; value is the channel scale-out)."""
    from jax.sharding import Mesh

    from tpu_ntt import rns
    from tpu_ntt.rns_sharded import ShardedRnsRing

    n = 4096
    ring = rns.RnsRing(n, channels=6)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1), ("ch",))
    sr = ShardedRnsRing(ring, mesh)
    rng = np.random.default_rng(23)
    a = sr.put([rng.integers(0, m, size=(batch, n)).astype(np.uint32)
                for m in ring.moduli])
    b = sr.put([rng.integers(0, m, size=(batch, n)).astype(np.uint32)
                for m in ring.moduli])
    fn = lambda x, y: sr._mult(sr.tabs, sr.scal, x, y)
    dt = device_seconds_per_iter_binary(fn, a, b, iters=iters)
    log(f"  sharded-rns nwc n={n} 144-bit 6ch [q-generic vmapped]: "
        f"batch={batch} {dt * 1e3:.3f} ms/iter -> "
        f"{batch / dt:,.0f} wide-products/s")
    return batch / dt


def bench_poseidon(batch, iters):
    """Poseidon2-GL permutation (= Merkle 2-to-1 compress) on the fused
    Pallas kernel (kernels/poseidon.py; round-4 surface) vs the XLA scan
    form."""
    import jax.numpy as jnp

    from tpu_ntt.benchlib import device_seconds_per_iter
    from tpu_ntt.poseidon import Poseidon2GL, to_pairs

    rng = np.random.default_rng(31)
    Q = (1 << 64) - (1 << 32) + 1
    st = [tuple(jnp.asarray(x) for x in
                to_pairs(rng.integers(0, Q, batch, dtype=np.uint64)))
          for _ in range(8)]
    hk = Poseidon2GL(backend="kernel")
    dt = device_seconds_per_iter(hk.permute_j, st, iters=iters)
    log(f"  poseidon2-gl permute [pallas kernel]: batch={batch} "
        f"{dt * 1e3:.3f} ms/iter -> {batch / dt / 1e6:.1f}M perm/s")
    hx = Poseidon2GL()
    dtx = device_seconds_per_iter(hx.permute_j, st, iters=iters)
    log(f"  poseidon2-gl permute [xla scan]: batch={batch} "
        f"{dtx * 1e3:.3f} ms/iter -> {batch / dtx / 1e6:.1f}M perm/s")
    return batch / dt


def bench_bgv(batch, iters):
    """BGV ciphertext multiply + hybrid relinearization (tpu_ntt.fhe):
    the FHE scheme hot path, n=4096 over a 4x24-bit RNS basis, keys
    cached as spectra at keygen.  The WHOLE op compiles as ONE jitted
    program (output parts chain as the next input) and is timed with
    the canonical fori-loop slope — the round-4 trace-window form was
    unstable on the tunneled backend (6.3/0.53/0.40 ms for the same op
    depending on forcing; BENCH_NOTES round 5)."""
    from tpu_ntt.benchlib import device_seconds_per_iter_binary
    from tpu_ntt.fhe import BgvContext, Ciphertext

    rng = np.random.default_rng(37)
    ctx = BgvContext(4096, 256, channels=4, dnum=2)
    sk, pk = ctx.keygen(rng)
    rlk = ctx.relin_key(sk, rng)
    m1 = rng.integers(0, 256, (batch, 4096))
    m2 = rng.integers(0, 256, (batch, 4096))
    c1 = ctx.encrypt(pk, m1, rng)
    c2 = ctx.encrypt(pk, m2, rng)

    def step(pa, pb):
        return ctx.mul_relin(Ciphertext(ring=ctx.ring, parts=pa),
                             Ciphertext(ring=ctx.ring, parts=pb),
                             rlk).parts

    jstep = jax.jit(step)
    dt = device_seconds_per_iter_binary(jstep, c1.parts, c2.parts,
                                        traced=True, iters=iters)
    log(f"  bgv mul+relin n=4096 96-bit 4ch dnum=2 (one jitted program): "
        f"batch={batch} {dt * 1e3:.2f} ms -> "
        f"{batch / dt:,.0f} ct-products/s")
    return batch / dt


def bench_ckks(batch, iters):
    """CKKS mul + relin at the deployed shape (n = 2^14, 8-ch 192-bit Q,
    dnum=4) — tpu_ntt.ckks, round-5 surface; same whole-op-jit slope
    methodology as bench_bgv (rescale changes the basis size so it is
    benched in its own ledger rows, not chained here)."""
    from tpu_ntt.benchlib import device_seconds_per_iter_binary
    from tpu_ntt.ckks import CkksCiphertext, CkksContext

    rng = np.random.default_rng(41)
    n = 1 << 14
    ctx = CkksContext(n, channels=8, num_special=2, dnum=4)
    sk, pk = ctx.keygen(rng)
    rlk = ctx.relin_key(sk, rng)
    z = rng.uniform(-1, 1, (batch, n // 2)) \
        + 1j * rng.uniform(-1, 1, (batch, n // 2))
    w = rng.uniform(-1, 1, (batch, n // 2)) \
        + 1j * rng.uniform(-1, 1, (batch, n // 2))
    ca = ctx.encrypt(pk, z, rng)
    cb = ctx.encrypt(pk, w, rng)

    def step(pa, pb):
        a = CkksCiphertext(ring=ctx.ring, parts=pa, scale=ctx.scale)
        b = CkksCiphertext(ring=ctx.ring, parts=pb, scale=ctx.scale)
        return ctx.mul_relin(a, b, rlk).parts[:2]

    jstep = jax.jit(step)
    dt = device_seconds_per_iter_binary(jstep, ca.parts, cb.parts,
                                        traced=True, iters=iters)
    log(f"  ckks mul+relin n=16384 192-bit 8ch dnum=4 (one jitted "
        f"program): batch={batch} {dt * 1e3:.2f} ms -> "
        f"{batch / dt:,.0f} ct-products/s")
    return batch / dt


def bench_kyber(batch, iters):
    """ML-KEM (FIPS-203) incomplete-NTT products — the workload the
    reference explored and abandoned (test/archive/ntt_inverse_kyber.py);
    here a fused surface (tpu_ntt.kyber)."""
    from tpu_ntt.kernels.kyber import KyberPlan
    from tpu_ntt.reference import KYBER_N, KYBER_Q

    kp = KyberPlan()
    rng = np.random.default_rng(9)
    a = jax.device_put(rng.integers(0, KYBER_Q, size=(batch, KYBER_N),
                                    dtype=np.uint32))
    b = jax.device_put(rng.integers(0, KYBER_Q, size=(batch, KYBER_N),
                                    dtype=np.uint32))
    fn = jax.jit(lambda x, y: kp.poly_mult(x, y))
    dt = device_seconds_per_iter(fn, a, b, iters=iters)
    log(f"  mlkem_3329 poly_mult [pallas-kyber]: batch={batch} "
        f"{dt * 1e3:.3f} ms/iter -> {batch / dt:,.0f} op/s")
    return batch / dt


if __name__ == "__main__":
    main()
