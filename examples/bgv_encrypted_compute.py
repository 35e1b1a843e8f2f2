"""End-to-end encrypted computation with the BGV scheme (tpu_ntt.fhe).

Evaluates  f(x, y, z) = (x * y + z) * x  over SIMD-packed Z_t slots
(t = 65537, n slots per ciphertext) without ever decrypting the
intermediates: tensor multiply, hybrid relinearization, modulus
switching between levels, and a Galois rotation at the end — every ring
product riding the dispatched fused kernels.  The decrypted result is
checked bit-exactly against the plaintext evaluation (the construction
is exact: no probabilistic slack in the comparison).

Runs on CPU (kernels in interpret mode) or the real chip unchanged.

Usage:  python examples/bgv_encrypted_compute.py [--n 256] [--channels 5]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--channels", type=int, default=5)
    args = ap.parse_args()

    import jax

    from tpu_ntt.fhe import BgvContext
    from tpu_ntt.rns import automorphism_tables

    print(f"device: {jax.devices()[0].device_kind}")
    t = 65537
    ctx = BgvContext(args.n, t, channels=args.channels, dnum=2)
    rng = np.random.default_rng(1234)
    t0 = time.perf_counter()
    sk, pk = ctx.keygen(rng)
    rlk = ctx.relin_key(sk, rng)
    g = 3  # rotation generator
    print(f"keygen + relin key: {time.perf_counter() - t0:.2f}s "
          f"(Q = {ctx.ring.q.bit_length()} bits, "
          f"special = {[p.bit_length() for p in ctx.special]}-bit)")

    # SIMD-packed operands: n independent Z_t values per ciphertext
    x = rng.integers(0, t, args.n)
    y = rng.integers(0, t, args.n)
    z = rng.integers(0, t, args.n)
    cx = ctx.encrypt(pk, ctx.slot_encode(x), rng)
    cy = ctx.encrypt(pk, ctx.slot_encode(y), rng)
    cz = ctx.encrypt(pk, ctx.slot_encode(z), rng)
    print(f"fresh noise budget: {ctx.noise_budget(sk, cx)} bits")

    # (x*y + z) * x, with a modulus switch between the two levels
    t0 = time.perf_counter()
    xy = ctx.mul_relin(cx, cy, rlk)
    xy_z = ctx.add(xy, cz)
    lvl1 = ctx.mod_switch(xy_z)
    rlk1 = ctx.relin_key(sk, rng, lvl1.ring)
    out = ctx.mul_relin(lvl1, ctx.mod_switch(cx), rlk1)
    gk = ctx.galois_key(sk, g, rng, out.ring)
    rotated = ctx.apply_galois(out, g, gk)
    print(f"encrypted evaluation: {time.perf_counter() - t0:.2f}s, "
          f"budget left: {ctx.noise_budget(sk, rotated)} bits, "
          f"level: {len(out.ring.moduli)}/{len(ctx.ring.moduli)} primes")

    got = ctx.slot_decode(ctx.decrypt(sk, rotated)[0])
    # plaintext oracle: slotwise f, then the same automorphism on slots
    want_coeffs = ctx.slot_encode((x * y % t + z) * x % t)
    src, neg = automorphism_tables(args.n, g)
    rot_coeffs = np.where(neg, (t - want_coeffs[src]) % t,
                          want_coeffs[src])
    want = ctx.slot_decode(rot_coeffs)
    assert np.array_equal(got, want), "MISMATCH"
    print(f"decrypted slots == plaintext evaluation (n = {args.n}): OK")


if __name__ == "__main__":
    main()
