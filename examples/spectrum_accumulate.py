"""Example: matrix-vector polynomial products via the staged-spectrum API.

Lattice schemes spend their time on A @ s — a (k x l) matrix of
Z_q[x]/(x^n + 1) polynomials times a length-l vector — where every output
is a SUM of negacyclic products.  The naive route pays a full
forward+inverse per product (k*l inverses); the staged-spectrum route pays
one forward per operand and ONE inverse per output:

    spectra  = nwc_ntt_fwd(every a_ij, every s_j)      # k*l + l forwards
    acc_i    = sum_j spectra(a_ij) . spectra(s_j)       # pointwise in Z_q
    result_i = nwc_ntt_inv(acc_i)                       # k inverses only

`dispatch.best_nwc_ntt_fwd/inv` are a matched pair (the inverse consumes
exactly the forward's transform layout, untwist and n^-1 folded into its
tables), and `make_ring` supplies the jittable plain-domain pointwise
ops — so the whole accumulation jits into one fused device program.

This mirrors the reference's staging of repeated products through its
load/start/read FSM (rtl/ntt_poly_mult.v state machine; ntt-test.c drives
one product per full pipeline) — on TPU the spectrum cache lives in HBM
and the accumulation rides the VPU.

Fused one-launch alternatives (dispatch.py) now cover the common shapes:
`best_nwc_dot` (one row dot, fresh operands), `best_nwc_dot_cached`
(fixed b-side spectra), and `best_nwc_matvec` (+`_spectra`) — the FULL
A @ s here in one kernel, with A's spectra as VMEM constants, s
transformed once, and k in-kernel inverses; measured 3.8x this staged
route's product rate at the ML-DSA-44 shape (BENCH_NOTES.md).  This
example remains the reference for the general staged pattern (arbitrary
k/l beyond the kernel's k, l <= 8 caps, or reuse patterns that span
multiple calls).

Run:  python examples/spectrum_accumulate.py [--k 4] [--l 4] [--batch 64]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import jax

from tpu_ntt import DILITHIUM_256, dispatch, reference
from tpu_ntt.benchlib import device_seconds_per_iter
from tpu_ntt.modmath import make_ring


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--l", type=int, default=4)
    ap.add_argument("--batch", type=int, default=64,
                    help="independent A @ s instances")
    args = ap.parse_args()

    p = DILITHIUM_256
    ring = make_ring(p)
    fwd = dispatch.best_nwc_ntt_fwd(p)
    inv = dispatch.best_nwc_ntt_inv(p)
    rng = np.random.default_rng(0)
    B, k, l = args.batch, args.k, args.l

    A = rng.integers(0, p.q, size=(B, k, l, p.n), dtype=np.uint64)
    s = rng.integers(0, p.q, size=(B, l, p.n), dtype=np.uint64)

    def mat_vec(s_flat, a_flat):
        # forwards: (B*l, n) and (B*k*l, n) in one batched call each
        fa = fwd(a_flat).reshape(B, k, l, p.n)
        fs = fwd(s_flat).reshape(B, l, p.n)
        # pointwise multiply-accumulate in the spectrum domain
        acc = ring.mul(fa[:, :, 0], fs[:, None, 0])
        for j in range(1, l):
            acc = ring.add(acc, ring.mul(fa[:, :, j], fs[:, None, j]))
        # ONE inverse per output polynomial
        return inv(acc.reshape(B * k, p.n))

    run = jax.jit(mat_vec)
    out = np.asarray(run(s.reshape(-1, p.n).astype(np.uint32),
                         A.reshape(-1, p.n).astype(np.uint32)))
    out = out.reshape(B, k, p.n)

    # check one instance against the golden model, product by product
    for i in range(k):
        want = [0] * p.n
        for j in range(l):
            prod = reference.nwc_poly_mult(
                [int(v) for v in A[0, i, j]], [int(v) for v in s[0, j]], p
            )
            want = [(x + y) % p.q for x, y in zip(want, prod)]
        assert [int(v) for v in out[0, i]] == want, f"row {i} mismatch"
    print(f"correctness: OK ({k}x{l} @ batch {B}, "
          f"impl {dispatch.impl_name(p, 'nwc_fwd')})")

    if k == l:
        # time the chained iteration s <- A @ s (valid: outputs are
        # canonical residues, so they feed straight back in)
        dt = device_seconds_per_iter(
            run, s.reshape(-1, p.n).astype(np.uint32),
            A.reshape(-1, p.n).astype(np.uint32), iters=(3, 9))
        per = B * k * l
        print(f"{per} products (as {B*k*l + B*l} forwards + {B*k} "
              f"inverses) in {dt*1e3:.2f} ms -> {per/dt:,.0f} effective "
              f"poly-mults/s on {jax.devices()[0].device_kind}")
    else:
        print("(timing loop needs k == l so the output chains back in)")


if __name__ == "__main__":
    main()
