"""End-to-end RNS modulus-chain demo: the op sequence an RNS-CKKS/BGV
evaluator actually runs, chained device-resident and verified exact.

    encode -> nwc product -> gadget key-switch -> automorphism (rotate)
           -> rescale (drop a prime) -> exact CRT exit

Every step is the EXACT integer operation (no approximate-CRT error
terms anywhere — see docs/DESIGN.md §2.8); the final value is checked
against a host big-int replay of the same chain.  Runs on CPU (kernels
in interpret mode via dispatch) or the real chip unchanged.

Usage:  python examples/fhe_modulus_chain.py [--n 4096] [--channels 6]
"""

import argparse
import random
import sys

import numpy as np

sys.path.insert(0, ".")

from tpu_ntt import rns  # noqa: E402


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256,
                    help="ring degree (256 keeps the oracle fast; the "
                         "chip rates in BENCH_NOTES.md use 4096)")
    ap.add_argument("--channels", type=int, default=4)
    ap.add_argument("--rot", type=int, default=5,
                    help="odd Galois exponent (rotation)")
    args = ap.parse_args()

    n, ch, g = args.n, args.channels, args.rot
    rng = random.Random(2026)
    ring = rns.RnsRing(n, channels=ch)
    q = ring.q
    print(f"n={n}, {ch} channels, q ~ 2^{q.bit_length()}")

    a = [rng.randrange(q) for _ in range(n)]
    b = [rng.randrange(q) for _ in range(n)]
    ksk = [[[rng.randrange(p) for _ in range(n)] for p in ring.moduli]
           for _ in range(ch)]

    # --- device chain (residues never leave RNS form) --------------------
    ra, rb = ring.encode([a]), ring.encode([b])
    rc = ring.nwc_mult(ra, rb)                      # 1. product
    specs = ring.ksk_spectra(ksk, batch=1)
    rk = ring.gadget_dot_cached(rc, specs)          # 2. key-switch
    rr = ring.automorphism(rk, g)                   # 3. rotate
    rs = ring.rescale(rr)                           # 4. drop a prime
    sub = ring.drop_last()
    got = [int(v) for v in sub.decode(rs)[0]]       # 5. exit

    # --- host big-int replay --------------------------------------------
    c = schoolbook_nwc(a, b, q)
    acc = [0] * n
    for j, pj in enumerate(ring.moduli):
        digit = [v % pj for v in c]
        kj = [int(v) for v in ring.decode(
            [np.array([ksk[j][i]], dtype=np.uint32)
             for i in range(ch)])[0]]
        prod = schoolbook_nwc(digit, kj, q)
        acc = [(x + y) % q for x, y in zip(acc, prod)]
    rot = [0] * n
    for j in range(n):
        t = (j * g) % (2 * n)
        if t < n:
            rot[t] = (rot[t] + acc[j]) % q
        else:
            rot[t - n] = (rot[t - n] - acc[j]) % q
    pk = ring.moduli[-1]
    want = [v // pk for v in rot]

    assert got == want, "device chain diverged from host big-int replay"
    print("device modulus-chain == host big-int replay: EXACT")
    print("  product -> key-switch -> rotate -> rescale -> CRT exit, all "
          "device-resident")

    # --- hybrid key switch (ModUp / ModDown, the production dnum form) ---
    dnum = 2
    special = rns.ntt_friendly_primes(n, 24, 1, below=min(ring.moduli))
    qp = ring.extended(special)
    groups = ring.digit_groups(dnum)
    hksk_int = [[rng.randrange(qp.q) for _ in range(n)] for _ in groups]
    hksk = [qp.encode(np.array(kj, dtype=object)) for kj in hksk_int]
    hy = ring.decode(ring.hybrid_key_switch(rc, hksk, special, dnum=dnum))

    acc = [0] * n
    for idxs, kj in zip(groups, hksk_int):
        qg = 1
        for i in idxs:
            qg *= ring.moduli[i]
        digit = [v % qg for v in c]
        prod = schoolbook_nwc(digit, kj, qp.q)
        acc = [(x + y) % qp.q for x, y in zip(acc, prod)]
    hwant = [v // special[0] for v in acc]
    assert [int(v) for v in hy[0]] == hwant, "hybrid key-switch diverged"
    print(f"hybrid key-switch (dnum={dnum}, 1 special prime): EXACT "
          "(ModUp -> fused digit dot over Q u P -> exact ModDown)")


if __name__ == "__main__":
    main()
