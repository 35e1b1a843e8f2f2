"""STARK-prover polynomial ops: coset low-degree extension (LDE).

The dominant compute of a STARK prover is extending trace polynomials
from their n-point evaluation/coefficient form to a blowup·n-point
evaluation over a multiplicative coset — i.e. one cyclic NTT of the
zero-padded, coset-scaled coefficients per column.  The reference
accelerator computes exactly this transform (its cyclic pipeline,
rtl/ntt_forward.v) but exposes only the n=const product FSM; here the
LDE is a first-class batched op over any ring the framework supports —
including the Goldilocks field (q = 2⁶⁴−2³²+1, modmath.GoldilocksRing)
that STARK ecosystems standardized on, one bit beyond the reference's
WIDTH=60 ceiling.

Math.  For coefficients c of degree < n, the evaluations over the coset
g·H_N (H_N the N-th roots of unity, N = blowup·n) are

    y_j = Σ_i c_i (g ω_N^j)^i  =  CyclicNTT_N( c_i · g^i, zero-padded )

so the whole extension is one elementwise coset scale + one cyclic
forward transform.  ``order="bitrev"`` uses the no-gather DIF forward
(the fastest formulation on TPU, docs/DESIGN.md §2.1) and returns
evaluations in bit-reversed index order — the order STARK commitment
trees consume anyway; ``order="natural"`` pays the bit-reversal gather.

Bit-exactness oracle: direct big-int evaluation at every coset point
(tests/test_stark.py).
"""

from __future__ import annotations

import numpy as np

from . import ntt
from .ntt import NttPlan
from .params import make_params


class LdePlan:
    """Reusable coset-LDE plan: degree-< n inputs, N = blowup·n output
    evaluations over shift·H_N.

    Requires 2N | q−1 (the big ring's existence condition — Goldilocks'
    2-adicity of 32 allows N up to 2³¹).  ``extend`` is jit/vmap-safe and
    batched over leading dimensions.
    """

    def __init__(self, n: int, q: int, blowup: int, shift: int = 7,
                 order: str = "bitrev"):
        if blowup < 1 or blowup & (blowup - 1):
            raise ValueError("blowup must be a power of two >= 1")
        if order not in ("bitrev", "natural", "kernel"):
            raise ValueError("order must be 'bitrev', 'natural' or "
                             "'kernel'")
        if shift % q == 0:
            raise ValueError("coset shift must be a unit")
        self.n = n
        self.blowup = blowup
        self.N = blowup * n
        self.order = order
        self.shift = shift % q
        self.big = NttPlan(make_params(self.N, q))
        ring = self.big.ring
        self.ring = ring
        # coset scale table g^i, i < n (one-time host O(n) build; the
        # ring's twiddle encoding so the scale is a mul_tw pass)
        self.scale_tw = ring.encode_tw(
            [pow(self.shift, i, q) for i in range(n)])
        if order == "kernel":
            # fused-kernel cyclic forward (e.g. pallas-gl64 for the
            # Goldilocks STARK field — ~3x the XLA formulation on chip);
            # output is the kernels' four-step layout, exposed via
            # spectrum_indices.  The dispatch wrapper takes the ring's
            # own (hi, lo)/uint32 layout (dispatch._split_u64 passes
            # pairs through).
            from . import dispatch, kernels

            impl = dispatch.impl_name(self.big.p, "fwd")
            if not impl.startswith("pallas-"):
                raise ValueError(
                    f"order='kernel' needs a fused kernel for "
                    f"(n={self.N}, q={q}); dispatch selects {impl!r}")
            self._kernel_fwd = dispatch.best_ntt_fwd(self.big.p)
            self._kernel_inv = dispatch.best_ntt_inv(self.big.p)
            self._kernel_n1 = kernels.plan_for(self.big.p).n1

    def extend(self, x):
        """Coefficients (..., n) -> coset evaluations (..., N)."""
        import jax.numpy as jnp

        scaled = self.ring.mul_tw(x, ntt._tmap(jnp.asarray, self.scale_tw))
        pad = self.N - self.n

        def zp(a):
            return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])

        padded = ntt._tmap(zp, scaled)
        if self.order == "kernel":
            return self._kernel_fwd(padded)
        if self.order == "bitrev":
            return ntt.ntt_fwd_nogather(self.big, padded)
        return ntt.ntt_fwd(self.big, padded)

    def interpolate(self, evals):
        """Inverse direction: coset evaluations (..., N) in this plan's
        order -> the N coefficients of the interpolating polynomial
        (c_i = shift^{-i} · INTT(y)_i).  extend/interpolate are an exact
        roundtrip; a degree-< n input comes back with its top N−n
        coefficients zero."""
        import jax.numpy as jnp

        if self.order == "kernel":
            c = self._kernel_inv(evals)
        elif self.order == "bitrev":
            c = ntt.ntt_inv_nogather(self.big, evals)
        else:
            c = ntt.ntt_inv(self.big, evals)
        if getattr(self, "_unscale_tw", None) is None:
            inv_s = pow(self.shift, -1, self.big.p.q)
            self._unscale_tw = self.ring.encode_tw(
                [pow(inv_s, i, self.big.p.q) for i in range(self.N)])
        return self.ring.mul_tw(c, ntt._tmap(jnp.asarray,
                                             self._unscale_tw))

    # -- host IO convenience ---------------------------------------------------
    def encode(self, coeffs) -> object:
        return self.big.encode(np.asarray(coeffs, dtype=object))

    def decode(self, evals) -> list:
        return self.big.decode(evals)

    def spectrum_indices(self) -> np.ndarray:
        """Which domain point each output slot holds: slot t carries the
        evaluation at shift·ω^idx[t] (idx = bitrev for the no-gather
        order, identity for natural)."""
        if self.order == "natural":
            return np.arange(self.N, dtype=np.int64)
        if self.order == "kernel":
            # flat[t] holds natural[j] with perm[j] = t, where
            # natural = flat[perm] (kernels fourstep_to_natural_perm)
            perm = np.arange(self.N).reshape(self._kernel_n1,
                                             self.N // self._kernel_n1
                                             ).T.reshape(-1)
            return np.argsort(perm).astype(np.int64)
        lg = self.N.bit_length() - 1
        return np.array(
            [int(f"{t:0{lg}b}"[::-1], 2) for t in range(self.N)],
            dtype=np.int64,
        )
