"""Example: negacyclic products modulo a 128-bit (or any-width) modulus.

The reference accelerator is parameterized up to WIDTH=60
(rtl/ntt_poly_mult.sv:15-28); FHE coefficient moduli are far wider and —
per the standard practice its report defers to — are handled by residue
number system (RNS) decomposition.  `tpu_ntt.rns` is that extension,
TPU-style: the wide product is assembled from products modulo several
24-bit NTT-friendly primes, EACH of which runs batched on the fused
int8-MXU Pallas kernel via the normal dispatch policy, then recombined
exactly by the CRT.  The wide modulus itself needs no NTT-friendly
structure at all (the CRT determines the integer result, hence the
result mod ANY q).

Here: a CKKS/BGV-flavored 128-bit prime modulus at n = 4096, checked
against a plain big-int schoolbook oracle.

Run:  python examples/rns_wide_modulus.py [--n 4096] [--batch 4] [--cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def schoolbook_nwc(a, b, q, n):
    out = [0] * n
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            k = i + j
            if k < n:
                out[k] = (out[k] + ai * bj) % q
            else:
                out[k - n] = (out[k - n] - ai * bj) % q
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--check", type=int, default=1,
                    help="how many batch rows to oracle-check (O(n^2) each)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tpu_ntt import rns

    # a 128-bit prime (2^128 - 159, the largest below 2^128); ANY odd
    # modulus — prime or not, NTT-friendly or not — works the same way.
    q = (1 << 128) - 159
    n = args.n

    plan = rns.RnsPlan(n, q)
    widths = [p.q.bit_length() for p in plan.params]
    print(f"q = 2^128 - 159, n = {n}: {len(plan.params)} residue channels "
          f"({min(widths)}-{max(widths)} bit primes, each on the fused "
          f"MXU kernel)")

    rng = np.random.default_rng(0)

    def wide(batch, seed):
        # three 48-bit draws span 144 bits; reducing mod q covers the FULL
        # residue range [0, q), including the top bits of the 128-bit word
        r = np.random.default_rng(seed)
        d = [r.integers(0, 1 << 48, size=(batch, n), dtype=np.uint64)
             for _ in range(3)]
        return np.frompyfunc(
            lambda x, y, z: ((int(x) << 96) | (int(y) << 48) | int(z)) % q,
            3, 1)(*d)

    a, b = wide(args.batch, 1), wide(args.batch, 2)
    t0 = time.time()
    c = plan.nwc_poly_mult(a, b)
    print(f"product of {args.batch} pairs: {time.time() - t0:.2f}s "
          f"(includes per-channel compile on first call)")

    for row in range(min(args.check, args.batch)):
        want = schoolbook_nwc(
            [int(v) for v in a[row]], [int(v) for v in b[row]], q, n)
        assert [int(v) for v in c[row]] == want, f"row {row} mismatch"
    print(f"OK: {min(args.check, args.batch)} row(s) bit-exact vs the "
          f"big-int schoolbook oracle")

    # ---- Part 2: the PRODUCTION form — RNS-resident ring, device CRT ----
    # Arbitrary-q RnsPlan above recombines on the host per call (fine for
    # IO, host-bound at rate).  FHE practice instead makes the modulus a
    # PRODUCT of word-sized NTT primes (SEAL/OpenFHE moduli are built this
    # way), so every ring op is exact per-channel device arithmetic and
    # values never leave RNS between ops; the CRT exit itself runs ON
    # DEVICE (rns.RnsRing.reconstruct_words — exact uint32 multiword).
    from tpu_ntt.rns import RnsRing

    ring = RnsRing(n, channels=6)
    print(f"\nRnsRing: q = prod of 6 NTT primes ({ring.q.bit_length()} bits)"
          f", residues device-resident")
    rng2 = np.random.default_rng(7)

    def full_range_row():  # four 48-bit draws cover [0, q) for q < 2^192
        ds = rng2.integers(0, 1 << 48, size=(4, n), dtype=np.uint64)
        return [
            ((int(ds[0, i]) << 144) | (int(ds[1, i]) << 96)
             | (int(ds[2, i]) << 48) | int(ds[3, i])) % ring.q
            for i in range(n)
        ]

    rows = [full_range_row() for _ in range(args.batch)]
    ra = ring.encode(rows)
    # chain 3 products + 1 add entirely in RNS: d = ((a*a + a) * a) * a
    t0 = time.time()
    rc = ring.add(ring.nwc_mult(ra, ra), ra)
    rc = ring.nwc_mult(rc, ra)
    rc = ring.nwc_mult(rc, ra)
    words = ring.reconstruct_words(rc)
    import jax

    jax.block_until_ready(words)
    t_all = time.time() - t0
    t0 = time.time()
    got = ring.decode_words(np.asarray(words))
    t_host = time.time() - t0
    print(f"3 chained products + add + ON-DEVICE CRT exit: {t_all:.2f}s "
          f"(includes compile); host share = words->ints view only "
          f"({t_host:.2f}s)")

    qr = ring.q
    a0 = rows[0]
    want = schoolbook_nwc(a0, a0, qr, n)
    want = [(x + y) % qr for x, y in zip(want, a0)]
    want = schoolbook_nwc(want, a0, qr, n)
    want = schoolbook_nwc(want, a0, qr, n)
    assert [int(v) for v in got[0]] == want, "RnsRing chain mismatch"
    print("OK: chained RNS-resident products + device reconstruction "
          "bit-exact vs the big-int schoolbook oracle")


if __name__ == "__main__":
    main()
