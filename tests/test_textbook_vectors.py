"""Replay of the reference's published textbook vectors (n=4, q=7681).

The reference self-verifies its merged-psi NWC model against the worked
examples of the Longa-Naehrig NTT tutorial — n=4, q=7681, psi=1925
(reference: test/refs/fast_ntt_negacyclic_convolution.py:156-220):

  * Example 4.1: NTT_psi([1, 2, 3, 4]) = [1467, 2807, 3471, 7621] in
    natural order, [1467, 3471, 2807, 7621] in bit-reversed order.
  * Example 4.3: INTT_psi of that spectrum returns [1, 2, 3, 4].
  * Example 4.7: negacyclic([1,2,3,4] * [5,6,7,8]) = [7625, 7645, 2, 60]
    (= [-56, -36, 2, 60] mod q).

Here the same shipped vectors replay through every layer that exists at
n=4: the pure-Python golden (reference.py), the XLA merged-psi transforms
(ntt.py — the same formulation the reference file implements), and the
arbitrary-(n, q) parameter builder (make_params must derive this psi's
ring correctly).
"""

import numpy as np

from tpu_ntt import ntt, reference
from tpu_ntt.params import NttParams, make_params

Q, PSI = 7681, 1925
P = NttParams(n=4, q=Q, psi=PSI, name="textbook_4")

G = [1, 2, 3, 4]
H = [5, 6, 7, 8]
SPEC_NO = [1467, 2807, 3471, 7621]  # Example 4.1, natural order
SPEC_BO = [1467, 3471, 2807, 7621]  # same spectrum, bit-reversed order
CONV = [7625, 7645, 2, 60]          # Example 4.7


def test_params_accept_textbook_psi():
    # construction itself validates psi^n == -1 (mod q)
    P.validate_roots()
    assert P.omega == pow(PSI, 2, Q)


def test_golden_forward_matches_example_4_1():
    twisted = [G[i] * pow(PSI, i, Q) % Q for i in range(4)]
    assert reference.cg_ntt(twisted, P.omega, Q) == SPEC_NO


def test_golden_inverse_matches_example_4_3():
    c = reference.cg_intt(SPEC_NO, P.omega, Q)
    got = [c[i] * pow(P.psi_inv, i, Q) % Q for i in range(4)]
    assert got == G


def test_golden_convolution_matches_example_4_7():
    assert reference.nwc_poly_mult(G, H, P) == CONV
    assert reference.schoolbook_negacyclic(G, H, Q) == CONV


def test_merged_forward_emits_example_4_1_bit_reversed():
    plan = ntt.NttPlan(P)
    x = plan.encode(np.array([G], dtype=object))
    got = plan.decode(ntt.nwc_fwd_merged(plan, x))[0]
    assert [int(v) for v in got] == SPEC_BO


def test_merged_inverse_consumes_example_4_3_spectrum():
    plan = ntt.NttPlan(P)
    spec = plan.encode(np.array([SPEC_BO], dtype=object))
    got = plan.decode(ntt.nwc_inv_merged(plan, spec))[0]
    assert [int(v) for v in got] == G


def test_merged_convolution_matches_example_4_7():
    plan = ntt.NttPlan(P)
    a = plan.encode(np.array([G], dtype=object))
    b = plan.encode(np.array([H], dtype=object))
    got = plan.decode(ntt.nwc_poly_mult_merged(plan, a, b))[0]
    assert [int(v) for v in got] == CONV


def test_make_params_derives_a_valid_psi_for_textbook_ring():
    # the derived psi need not equal 1925, but its transform must produce
    # the same negacyclic algebra
    p2 = make_params(4, Q)
    assert reference.nwc_poly_mult(G, H, p2) == CONV
