"""Roofline accounting for the fused kernels vs TPU v5e peaks.

Codifies the op-count derivations (so the DESIGN.md §2.5b table is
reproducible): for each kernel family at its headline configuration this
computes, per polynomial product,

* int8 MXU ops (counting the PHYSICAL systolic work, i.e. block-diagonal
  padding executes as real MACs) and the % of v5e int8 peak at the
  measured ledger rate;
* HBM bytes moved (the fused kernels touch HBM once per operand/result)
  and % of peak bandwidth;
* an instruction-count ESTIMATE of VPU work per coefficient, counted from
  the kernel source (digit scans, carry-save REDC steps, Shoup passes,
  diagonal assembly), and the implied % of VPU issue peak.  These counts
  are code-derived but necessarily approximate (+-20%): Mosaic's actual
  instruction selection is not visible; treat them as scale indicators.

v5e peaks (public spec): 394.7 int8 TOPS, 819 GB/s HBM; VPU issue
~8 sublanes x 128 lanes x 4 ALUs x 940 MHz = 3.85e12 32-bit ops/s.

Usage: python bench/roofline.py   (pure host arithmetic, no device)
"""

import sys

PEAK_INT8_OPS = 394.7e12  # ops/s (1 MAC = 2 ops)
PEAK_HBM = 819e9          # bytes/s
PEAK_VPU = 3.85e12        # 32-bit ops/s

UNIT = 2 * 128 ** 3       # int8 ops in one 128x128x128 MXU pass


def mxu24():
    """kernels/mxu.py @ p24_4096, nwc 1.97M/s (ledger).

    n1=32, t=4 polys/tile, L=3 limbs (zero-point int8): each matmul = L^2 = 9
    unit dots per 4-poly group; fused product = 6 matmuls (2 per transform
    x 3 transforms) -> 54/4 = 13.5 unit dots/poly.  VPU per coeff (from
    mxu.py kernel body, per product): 6 REDC_pair (~15 ops) + 6 diagonal
    assemblies (~15) + 6 limb extractions (~9) + zero-point linesum/KS
    (~12 total) + 3 Shoup mids (~15) + 1 pointwise mont (~15) ~= 300."""
    return dict(name="mxu (24-bit)", preset="p24_4096 nwc", rate=1.97e6,
                n=4096, words=1, unit_dots=6 * 9 / 4, vpu_per_coeff=300,
                note="left matmuls 3/6 are block-diag n1=32/128 "
                     "(75% padding): effective MXU% is 5/8 of physical")


def mxu64_():
    """kernels/mxu64.py @ p60_4096 (generic q), nwc 413k/s.

    8 balanced digits -> 64 unit dots per matmul per 4-poly group; 6
    matmuls -> 96 unit dots/poly.  VPU per coeff: 6 digit scans (~60) +
    6 carry-save assemblies (~30) + 6 REDC96_cs (3 steps x ~40 + ~20
    final ~= 140) + 3 Shoup64 (~40) + 1 mont_mul64 (~60) ~= 1560."""
    return dict(name="mxu64 (60-bit)", preset="p60_4096 nwc", rate=413e3,
                n=4096, words=2, unit_dots=6 * 64 / 4, vpu_per_coeff=1560,
                note="same 5/8 block-diag padding note as mxu")


def sol64_():
    """kernels/sol64.py @ p60_4096 (q = 2^60-2^14+1), nwc 483k/s: identical
    matmul structure to mxu64; the reducer swaps REDC96 chains for
    shift-add folds (~90 ops vs ~140)."""
    d = mxu64_()
    d.update(name="sol64 (trinomial)", rate=483e3, vpu_per_coeff=1250)
    return d


def gl64_():
    """kernels/gl64.py @ goldilocks_4096, nwc 425k/s: 9 digits -> 81 unit
    dots per matmul; phi-fold reducer (~80 ops)."""
    return dict(name="gl64 (Goldilocks)", preset="goldilocks_4096 nwc",
                rate=425e3, n=4096, words=2, unit_dots=6 * 81 / 4,
                vpu_per_coeff=1300, note="9th digit covers v < 2^64")


def mxu64_32k():
    """kernels/sol64.py @ n=32768 (n1=256): the left DFT is a dense
    (256,256) = 4 unit dots per digit-pair vs the right's 2 — per poly:
    3 transforms x (4+2) x 64 = 1152 unit dots.  This is the size where
    the left-transform factorization lever lives (see split_left)."""
    return dict(name="sol64 n=32768", preset="w60 trinomial nwc", rate=45.0e3,
                n=32768, words=2, unit_dots=3 * (4 + 2) * 64,
                vpu_per_coeff=1560,
                note="left matmul = 2/3 of MXU work at this size")


def kyber_():
    """kernels/kyber.py @ mlkem, poly_mult 57.7M/s: 2 six-bit limbs -> 4
    unit dots per matmul per 64-poly group; 3 matmuls -> 12/64 unit
    dots/poly.  VPU per coeff: 3 REDC32 (~10) + 3 limb splits (~6) +
    basemul (~30 over 2 coeffs ~= 15) + assembly (~6) ~= 80."""
    return dict(name="kyber (ML-KEM)", preset="mlkem poly_mult", rate=57.7e6,
                n=256, words=1, unit_dots=3 * 4 / 64, vpu_per_coeff=80,
                note="6-bit unsigned limbs: no zero-point machinery")


def report(d):
    ops = d["unit_dots"] * UNIT
    mxu_frac = ops * d["rate"] / PEAK_INT8_OPS
    bytes_per = 3 * d["n"] * 4 * d["words"]  # 2 inputs + 1 output
    hbm_frac = bytes_per * d["rate"] / PEAK_HBM
    vpu_ops = d["vpu_per_coeff"] * d["n"]
    vpu_frac = vpu_ops * d["rate"] / PEAK_VPU
    print(f"{d['name']:<20} {d['preset']:<22} {d['rate']:>12,.0f}/s  "
          f"MXU {ops/1e6:>7.2f}M ops/poly = {mxu_frac:>5.1%} peak | "
          f"HBM {bytes_per/1024:>6.1f} KB = {hbm_frac:>5.1%} | "
          f"VPU ~{d['vpu_per_coeff']:>4} ops/coeff = {vpu_frac:>5.1%}")
    if d.get("note"):
        print(f"{'':>20} note: {d['note']}")
    return mxu_frac, hbm_frac, vpu_frac


def main():
    print("v5e peaks: 394.7 int8 TOPS | 819 GB/s HBM | ~3.85e12 VPU ops/s\n")
    for fn in (mxu24, mxu64_, sol64_, gl64_, mxu64_32k, kyber_):
        report(fn())
    print("""
Reading: no single engine is saturated; the 60-bit families run the MXU at
42-55% of int8 peak WHILE the VPU estimate sits at 60-75% — consistent
with the measured diagnosis (DESIGN.md §2.5) that reduction-chain LATENCY,
not issue rate, is the bound: neither unit can be driven past ~2/3 when
every matmul's output feeds a 3-step serial REDC chain before the next
stage may start.  The structural MXU lever that remains is the n1=256
left transform at n=32768 (2/3 of that size's MXU work, half of it
removable by a split-radix factorization) — measured in §2.5b.""")


if __name__ == "__main__":
    sys.exit(main())
