"""Encrypted dot product with CKKS (tpu_ntt.ckks).

Computes <x, y> for two complex vectors of n/2 slots without decrypting
intermediates: one tensor multiply + hybrid relinearization + rescale,
then log2(n/2) rotate-and-sum doublings (each a Galois automorphism +
hybrid key switch).  The decrypted scalar is compared against the exact
complex dot product and against the scheme's a-priori noise bound
(tests/test_ckks.py docstring derivation) — CKKS is APPROXIMATE by
design, so the check is a bound, not bit-equality (contrast
examples/bgv_encrypted_compute.py).

Runs on CPU or the real chip unchanged (every ring product rides the
dispatched fused kernels).

Usage:  python examples/ckks_encrypted_dot.py [--n 1024] [--channels 4]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--channels", type=int, default=4)
    ap.add_argument("--dnum", type=int, default=2)
    args = ap.parse_args()

    from tpu_ntt.ckks import CkksContext

    n = args.n
    ctx = CkksContext(n, channels=args.channels, dnum=args.dnum,
                      num_special=-(-args.channels // args.dnum))
    print(f"n={n} ({n // 2} slots), Q = {ctx.ring.q.bit_length()}-bit "
          f"({args.channels} ch), scale = 2^"
          f"{float(ctx.scale).hex().split('p')[1]}")

    rng = np.random.default_rng(42)
    t0 = time.perf_counter()
    sk, pk = ctx.keygen(rng)
    rlk = ctx.relin_key(sk, rng)
    print(f"keygen + relin key: {time.perf_counter() - t0:.2f}s")

    n2 = n // 2
    x = rng.uniform(-1, 1, n2) + 1j * rng.uniform(-1, 1, n2)
    y = rng.uniform(-1, 1, n2) + 1j * rng.uniform(-1, 1, n2)
    cx = ctx.encrypt(pk, x, rng)
    cy = ctx.encrypt(pk, y, rng)

    t0 = time.perf_counter()
    acc = ctx.rescale(ctx.mul_relin(cx, cy, rlk))
    k = 1
    while k < n2:
        rk = ctx.rotation_key(sk, k, rng, ring=acc.ring)
        acc = ctx.add(acc, ctx.rotate(acc, k, rk))
        k *= 2
    print(f"encrypted dot ({int(np.log2(n2))} rotations): "
          f"{time.perf_counter() - t0:.2f}s")

    got = ctx.decrypt(sk, acc)[0][0]
    want = np.sum(x * y)
    err = abs(got - want)
    bound = 8 * n2 * 4 * n * (ctx.err_bound * (2 * n + 1) + 1) \
        / float(ctx.scale)
    print(f"decrypted = {got:.6f}")
    print(f"exact     = {want:.6f}")
    print(f"|error|   = {err:.3e}  (bound {bound:.3e})")
    assert err < bound
    print("encrypted dot product OK")


if __name__ == "__main__":
    main()
