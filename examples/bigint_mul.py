"""Big-integer multiplication demo: million-bit products on the NTT
kernels (tpu_ntt.bigint), verified against Python's own big-int.

Usage: python examples/bigint_mul.py [--bits 1048576] [--batch 4]
"""

import argparse
import random
import sys
import time

sys.path.insert(0, ".")

from tpu_ntt import bigint  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=1 << 20)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()
    rng = random.Random(2026)

    t0 = time.time()
    plan = bigint.BigMulPlan(args.bits)
    print(f"plan: n={plan.n}, {len(plan.ring.moduli)} RNS channels "
          f"({plan.ring.moduli[0].bit_length()}-bit), "
          f"built in {time.time()-t0:.1f}s")

    xs = [rng.getrandbits(args.bits) for _ in range(args.batch)]
    ys = [rng.getrandbits(args.bits) for _ in range(args.batch)]
    t0 = time.time()
    got = plan.mul_many(xs, ys)
    dt = time.time() - t0
    assert got == [x * y for x, y in zip(xs, ys)], "mismatch!"
    print(f"{args.batch} x {args.bits}-bit products: EXACT vs x*y "
          f"({dt:.2f}s end-to-end incl. first-call compile)")


if __name__ == "__main__":
    main()
