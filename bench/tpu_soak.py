"""Hardware soak: randomized + adversarial differential test on the TPU.

Usage:  python bench/tpu_soak.py        (requires the real chip + g++)


Every fused kernel path vs the independent native C++ oracle, with inputs
chosen to stress carry chains: values near q, words with 0xFFFFFFFF
patterns, impulses, zeros, dense boundary mixes.
"""
import sys, random, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np
import jax
from tpu_ntt import DILITHIUM_256, P24_4096, P60_4096, native
from tpu_ntt.kernels.mxu import MxuPlan
from tpu_ntt.kernels.mxu64 import MxuPlan64

rng = random.Random(0xC0FFEE)

def adversarial_rows(p, count):
    rows = []
    q = p.q
    n = p.n
    # carry-edge candidate values (clipped to [0, q))
    edge_vals = [0, 1, 2, q - 1, q - 2, q // 2]
    for k in range(1, q.bit_length() // 32 + 2):
        for d in (-1, 0, 1):
            v = (1 << (32 * k)) + d
            if 0 <= v < q:
                edge_vals.append(v)
    for i in range(count):
        mode = i % 5
        if mode == 0:
            rows.append([rng.randrange(q) for _ in range(n)])
        elif mode == 1:
            rows.append([rng.choice(edge_vals) for _ in range(n)])
        elif mode == 2:
            r = [0] * n
            r[rng.randrange(n)] = rng.choice(edge_vals[3:]) or q - 1
            rows.append(r)
        elif mode == 3:
            rows.append([q - 1] * n)
        else:
            rows.append([rng.choice([rng.randrange(q), q - 1, 0])
                         for _ in range(n)])
    return rows

def soak24(p, rounds, per_round):
    mp = MxuPlan(p)
    fails = 0
    for r in range(rounds):
        A = adversarial_rows(p, per_round)
        B = adversarial_rows(p, per_round)
        a = np.array(A, dtype=np.uint32)
        b = np.array(B, dtype=np.uint32)
        got = np.asarray(mp.nwc_poly_mult(a, b))
        spec = mp.nwc_spectrum(b)
        got_c = np.asarray(mp.nwc_poly_mult_cached(a, spec))
        for i in range(per_round):
            want = native.nwc_fast(A[i], B[i], p.q, p.psi)
            if [int(v) for v in got[i]] != want:
                fails += 1
                print(f"  MISMATCH full {p.name} round {r} row {i}")
            if [int(v) for v in got_c[i]] != want:
                fails += 1
                print(f"  MISMATCH cached {p.name} round {r} row {i}")
        print(f"{p.name} round {r+1}/{rounds}: {2*per_round} products checked",
              flush=True)
    return fails

def soak64(p, rounds, per_round):
    mp = MxuPlan64(p)
    enc = lambda rows: (
        np.array([[x >> 32 for x in row] for row in rows], dtype=np.uint32),
        np.array([[x & 0xFFFFFFFF for x in row] for row in rows], dtype=np.uint32),
    )
    fails = 0
    for r in range(rounds):
        A = adversarial_rows(p, per_round)
        B = adversarial_rows(p, per_round)
        hi, lo = mp.nwc_poly_mult(enc(A), enc(B))
        got = (np.asarray(hi).astype(object) << 32) + np.asarray(lo).astype(object)
        for i in range(per_round):
            want = native.nwc_fast(A[i], B[i], p.q, p.psi)
            if [int(v) for v in got[i]] != want:
                fails += 1
                print(f"  MISMATCH {p.name} round {r} row {i}")
        print(f"{p.name} round {r+1}/{rounds}: {per_round} products checked",
              flush=True)
    return fails

t0 = time.time()
fails = 0
fails += soak24(DILITHIUM_256, rounds=4, per_round=64)
fails += soak24(P24_4096, rounds=3, per_round=16)
fails += soak64(P60_4096, rounds=3, per_round=16)
print(f"SOAK: {'PASS' if fails == 0 else f'FAIL ({fails})'} "
      f"in {time.time()-t0:.0f}s")
