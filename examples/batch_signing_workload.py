"""Example: Dilithium-style batched polynomial arithmetic on TPU.

The reference accelerator targets lattice-crypto workloads where the hot
operation is negacyclic polynomial multiplication in
Z_q[x]/(x^256 + 1) with the Dilithium modulus q = 8380417
(reference: README.md:3-7, new_reference/cg_ntt.py:5-7).  A production
signer multiplies *vectors/matrices* of such polynomials; on TPU the right
shape is "one huge batch, one fused program".

Run:  python examples/batch_signing_workload.py [--batch 8192] [--tpu-kernel]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

from tpu_ntt import DILITHIUM_256, NttPlan, nwc_poly_mult_merged
from tpu_ntt.benchlib import device_seconds_per_iter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--tpu-kernel", action="store_true",
                    help="use the fused Pallas MXU kernel")
    args = ap.parse_args()

    p = DILITHIUM_256
    plan = NttPlan(p)
    rng = np.random.default_rng(0)

    # A batch of (s1 * c)-style products: random polys as stand-ins.
    s = rng.integers(0, p.q, size=(args.batch, p.n), dtype=np.uint64)
    c = rng.integers(0, p.q, size=(args.batch, p.n), dtype=np.uint64)
    a = jax.device_put(plan.encode_u64(s))
    b = jax.device_put(plan.encode_u64(c))

    if args.tpu_kernel:
        from tpu_ntt.kernels.mxu import MxuPlan

        mp = MxuPlan(p)
        fn = lambda x, y: mp.nwc_poly_mult(x, y)
        label = "pallas-mxu"
    else:
        fn = lambda x, y: nwc_poly_mult_merged(plan, x, y)
        label = "xla-merged"

    # one checked result
    out = jax.jit(fn)(a, b)
    first = plan.decode_u64(jax.tree.map(lambda v: v[:1], out))[0]
    from tpu_ntt import reference

    want = reference.nwc_poly_mult(
        [int(v) for v in s[0]], [int(v) for v in c[0]], p
    )
    assert [int(v) for v in first] == want, "mismatch vs golden"
    print(f"[{label}] correctness: OK")

    dt = device_seconds_per_iter(fn, a, b, iters=(5, 25))
    print(f"[{label}] {args.batch} poly-mults in {dt*1e3:.2f} ms "
          f"-> {args.batch/dt:,.0f} poly-mults/s on {jax.devices()[0].device_kind}")


if __name__ == "__main__":
    main()
