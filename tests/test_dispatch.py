"""Dispatch-layer tests: backend choice + bit-identical results."""

import numpy as np

from tpu_ntt import DILITHIUM_256, P60_4096, reference
from tpu_ntt import dispatch
from tpu_ntt.params import make_params


def test_impl_selection():
    assert dispatch.impl_name(DILITHIUM_256) == "pallas-mxu"
    assert dispatch.impl_name(P60_4096) == "pallas-mxu64"
    # power-of-two n below 256 can't use the kernel
    assert dispatch.impl_name(make_params(128, 8380417)) == "xla-merged"


def test_dispatch_24bit_matches_golden(rng):
    p = DILITHIUM_256
    mult = dispatch.best_nwc_poly_mult(p)
    a = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=np.uint32)
    b = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=np.uint32)
    got = np.asarray(mult(a, b))
    want = reference.nwc_poly_mult(
        [int(v) for v in a[0]], [int(v) for v in b[0]], p
    )
    assert [int(v) for v in got[0]] == want


def test_dispatch_60bit_accepts_u64(rng):
    p = P60_4096
    mult = dispatch.best_nwc_poly_mult(p)
    a = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=np.uint64)
    b = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=np.uint64)
    hi, lo = mult(a, b)
    got = (np.asarray(hi).astype(object) << 32) + np.asarray(lo).astype(object)
    want = reference.nwc_poly_mult(
        [int(v) for v in a[0]], [int(v) for v in b[0]], p
    )
    assert [int(v) for v in got[0]] == want
