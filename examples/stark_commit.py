"""Full STARK-style commitment pipeline over Goldilocks:

    trace column -> coset LDE (bit-reversed) -> Poseidon2 Merkle root
    of the extended rows -> FRI low-degree proof -> independent verify

i.e. both halves of the prover workload — the transform half the
reference accelerates (stark.LdePlan) and the hashing half
(tpu_ntt.poseidon), finished by the FRI protocol that makes the
commitment useful, with the proof checked by the pure-big-int verifier.

On a TPU pass --kernel to route hashing through the fused Pallas
permutation (58M perm/s vs 14.6M for the XLA scan form).

Usage:  python examples/stark_commit.py [--n 512] [--blowup 8] [--kernel]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--blowup", type=int, default=8)
    ap.add_argument("--kernel", action="store_true",
                    help="fused Pallas hashing (TPU)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_ntt.modmath import GOLDILOCKS_Q as Q
    from tpu_ntt.poseidon import Poseidon2GL, digest_ints, merkle_levels
    from tpu_ntt.stark import FriProver, LdePlan, fri_verify

    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(7)
    plan = LdePlan(args.n, Q, args.blowup, order="bitrev")
    hasher = Poseidon2GL(backend="kernel" if args.kernel else "xla")

    # a random degree-< n trace column, extended blowup x
    coeffs = [int(v) for v in rng.integers(0, Q, args.n, dtype=np.uint64)]
    t0 = time.perf_counter()
    evals = plan.extend(plan.encode([coeffs]))
    vals = (jnp.asarray(evals[0])[0], jnp.asarray(evals[1])[0])
    print(f"LDE {args.n} -> {plan.N}: {time.perf_counter() - t0:.2f}s")

    # Merkle-commit the extended word (pairs per leaf, as FRI consumes it)
    t0 = time.perf_counter()
    pairs = (jnp.stack([vals[0][0::2], vals[0][1::2]], axis=-1),
             jnp.stack([vals[1][0::2], vals[1][1::2]], axis=-1))
    root = digest_ints(merkle_levels(hasher, hasher.hash_rows_j(pairs))[-1])
    print(f"Merkle root ({plan.N // 2} leaves): "
          f"{[hex(v) for v in root]} ({time.perf_counter() - t0:.2f}s)")

    prover = FriProver(plan, final_size=4 * args.blowup, num_queries=16,
                       hasher=hasher)
    t0 = time.perf_counter()
    proof = prover.prove(vals)
    print(f"FRI proof: {len(proof['roots'])} layers, "
          f"{len(proof['queries'])} queries "
          f"({time.perf_counter() - t0:.2f}s)")
    assert proof["roots"][0] == root, "layer-0 root == trace commitment"

    t0 = time.perf_counter()
    ok = fri_verify(plan, proof, final_size=4 * args.blowup,
                    num_queries=16)
    print(f"independent big-int verify: {ok} "
          f"({time.perf_counter() - t0:.2f}s)")
    assert ok
    print("commitment pipeline OK")


if __name__ == "__main__":
    main()
