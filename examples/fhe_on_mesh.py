"""Both FHE schemes running their ciphertext hot loops on a device mesh.

Demonstrates the round-5 multi-chip axis (SURVEY.md §2.8 applied to the
op that dominates FHE cost — hybrid key switching): a BGV product +
relinearization + modulus switch, and a CKKS product + relinearization +
rescale + rotation, each executed by `ShardedBgv` / `ShardedCkks` over a
channel-sharded `ShardedRnsRing` and checked against the single-chip
contexts.  BGV results are BIT-EXACT (the scheme is exact); CKKS results
are residue-bit-exact vs the single-chip context and within the a-priori
precision bound of the true values.

On CPU this runs over 8 virtual devices (set up below); on real hardware
the same code spans the physical mesh — per-channel work is
collective-free, each digit group's ModUp costs one channel-axis
all-reduce (tpu_ntt/rns_sharded.py module docstring).

Usage:  python examples/fhe_on_mesh.py [--n 128] [--devices 2]
"""

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

if "XLA_FLAGS" not in os.environ:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--devices", type=int, default=2)
    args = ap.parse_args()

    import jax

    if jax.devices()[0].platform != "tpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh

    from tpu_ntt.ckks import CkksContext, ShardedCkks
    from tpu_ntt.fhe import BgvContext, ShardedBgv

    n = args.n
    ndev = min(args.devices, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("ch",))
    rng = np.random.default_rng(9)
    print(f"mesh: {ndev} device(s) on the channel axis")

    # ---- BGV: exact product + relin + modswitch on the mesh -------------
    t = 257  # t | 2n keeps plaintext factors at 1
    bctx = BgvContext(n, t, channels=6, num_special=2, dnum=3)
    sk, pk = bctx.keygen(rng)
    rlk = bctx.relin_key(sk, rng)
    sb = ShardedBgv(bctx, mesh)
    m1, m2 = rng.integers(0, t, n), rng.integers(0, t, n)
    c1, c2 = bctx.encrypt(pk, m1, rng), bctx.encrypt(pk, m2, rng)
    out_sh = sb.mod_switch(sb.mul_relin(sb.put_ct(c1), sb.put_ct(c2), rlk))
    out_pl = bctx.mod_switch(bctx.mul_relin(c1, c2, rlk))
    assert np.array_equal(sb.decrypt(sk, out_sh),
                          bctx.decrypt(sk, out_pl))
    print(f"BGV  n={n} ({bctx.ring.q.bit_length()}-bit Q, dnum=3): "
          f"mesh mul+relin+modswitch == single-chip, decrypt exact")

    # ---- CKKS: approximate product + relin + rescale + rotate -----------
    cctx = CkksContext(n, channels=4, num_special=2, dnum=2)
    sk2, pk2 = cctx.keygen(rng)
    rlk2 = cctx.relin_key(sk2, rng)
    rk = cctx.rotation_key(sk2, 1, rng)
    sc = ShardedCkks(cctx, mesh)
    z = rng.uniform(-1, 1, n // 2) + 1j * rng.uniform(-1, 1, n // 2)
    w = rng.uniform(-1, 1, n // 2) + 1j * rng.uniform(-1, 1, n // 2)
    ca, cb = cctx.encrypt(pk2, z, rng), cctx.encrypt(pk2, w, rng)
    prod = sc.rescale(sc.mul_relin(sc.put_ct(ca), sc.put_ct(cb), rlk2))
    rot = sc.rotate(sc.put_ct(ca), 1, rk)
    err_p = np.max(np.abs(sc.decrypt(sk2, prod)[0] - z * w))
    err_r = np.max(np.abs(sc.decrypt(sk2, rot)[0] - np.roll(z, -1)))
    bound = 32 * cctx.n * (cctx.err_bound * (2 * cctx.n + 1) + 1) \
        / float(cctx.scale)
    print(f"CKKS n={n} ({cctx.ring.q.bit_length()}-bit Q, dnum=2): "
          f"mesh mul+relin+rescale err {err_p:.2e}, rotate err "
          f"{err_r:.2e} (bound {bound:.2e})")
    assert err_p < bound and err_r < bound
    print("both schemes OK on the mesh")


if __name__ == "__main__":
    main()
