"""Command-line constant toolchain.

TPU-native replacement for the reference's scripts/ directory
(generate_twiddles.py, generate_inverse_twiddles.py, precompute_constants.py,
find_psi.py) and test/refs/generate_twiddle_hex.py:

    python -m tpu_ntt.tools twiddles --preset p24_4096 [--inverse] [-o F]
    python -m tpu_ntt.tools twiddles --n 1024 --q 8380417 --psi 5548360
    python -m tpu_ntt.tools find-psi --n 4096 --q 8380417 [--all]
    python -m tpu_ntt.tools constants --preset p60_4096
    python -m tpu_ntt.tools verify-hex --preset p24_4096 --file fwd.hex
    python -m tpu_ntt.tools find-trinomial --n 4096 --min-width 48

Output formats are bit-compatible with the reference's hex images
(rtl/twiddle_*.hex): uppercase, zero-padded to ceil(width/4) digits.
"""

from __future__ import annotations

import argparse
import sys

from . import tables
from .params import PRESETS, NttParams, find_psi, make_params


def _params_from_args(args) -> NttParams:
    if args.preset:
        if args.preset not in PRESETS:
            sys.exit(f"unknown preset {args.preset!r}; have {sorted(PRESETS)}")
        return PRESETS[args.preset]
    if args.n is None or args.q is None:
        sys.exit("need --preset or --n/--q (and optionally --psi)")
    return make_params(args.n, args.q, args.psi)


def _add_param_flags(sp) -> None:
    sp.add_argument("--preset", help=f"one of {sorted(PRESETS)}")
    sp.add_argument("--n", type=int)
    sp.add_argument("--q", type=int)
    sp.add_argument("--psi", type=int)


def cmd_twiddles(args) -> int:
    p = _params_from_args(args)
    if args.device:
        # On-the-fly generation on the accelerator (ntt_twiddle_table
        # analog; see tables.device_psi_powers) — same hex bytes out.
        from .modmath import make_ring

        vals = make_ring(p).decode(
            tables.device_psi_powers(p, inverse=args.inverse))
        text = tables.dump_hex(vals, p.width)
    else:
        text = tables.dump_twiddle_hex(p, inverse=args.inverse)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)
        print(f"wrote {p.n} {'inverse' if args.inverse else 'forward'} "
              f"twiddles ({p.width}-bit) to {args.output}", file=sys.stderr)
    else:
        sys.stdout.write(text)
    return 0


def cmd_find_psi(args) -> int:
    if args.all:
        # enumerate all primitive 2n-th roots like scripts/find_psi.py --all
        q, n = args.q, args.n
        if (q - 1) % (2 * n):
            sys.exit(f"q={q} does not support n={n} (need 2n | q-1)")
        base = find_psi(n, q)
        count = 0
        for e in range(1, 2 * n, 2):  # odd exponents of a primitive root
            psi = pow(base, e, q)
            if pow(psi, n, q) == q - 1:
                print(psi)
                count += 1
                if count >= args.limit:
                    break
        return 0
    psi = find_psi(args.n, args.q)
    print(psi)
    return 0


def cmd_constants(args) -> int:
    p = _params_from_args(args)
    p.validate_roots()
    rows = [
        ("n", p.n),
        ("q", p.q),
        ("width", p.width),
        ("psi", p.psi),
        ("psi_inv", p.psi_inv),
        ("omega", p.omega),
        ("omega_inv", p.omega_inv),
        ("n_inv", p.n_inv),
        ("barrett_k", p.barrett_k),
        ("barrett_mu", p.barrett_mu),
        ("mont_bits", p.mont_bits),
        ("mont_q_prime", p.mont_q_prime),
        ("mont_r_mod_q", p.mont_r_mod_q),
        ("mont_r2_mod_q", p.mont_r2_mod_q),
    ]
    for k, v in rows:
        print(f"{k:14s} {v}")
    return 0


def cmd_verify_hex(args) -> int:
    p = _params_from_args(args)
    with open(args.file) as f:
        got = tables.load_hex(f.read())
    want = (tables.psi_inv_powers(p) if args.inverse else tables.psi_powers(p))
    if got == want:
        print(f"OK: {args.file} matches "
              f"{'inverse' if args.inverse else 'forward'} table for {p.name or p.n}")
        return 0
    bad = next(i for i, (g, w) in enumerate(zip(got, want)) if g != w) \
        if len(got) == len(want) else -1
    print(f"MISMATCH: {args.file} (length {len(got)} vs {len(want)}, "
          f"first differing index {bad})")
    return 1


def cmd_find_trinomial(args) -> int:
    """Enumerate Solinas trinomial NTT primes q = 2^a - 2^b + 1.

    These get the fold fast path (kernels/sol64.py, zero reducer
    multiplies — the reference's own shipped 60-bit modulus is
    2^60 - 2^14 + 1); 2-adicity of q - 1 is exactly b, so b >= log2(2n)
    is required for a primitive 2n-th root to exist (the analog of
    scripts/find_psi.py's existence condition)."""
    from .kernels.sol64 import SolinasPlan64
    from .params import _is_probable_prime

    need_b = (2 * args.n).bit_length() - 1  # log2(2n)
    found = 0
    for a in range(args.min_width, args.max_width + 1):
        for b in range(need_b, a):
            q = (1 << a) - (1 << b) + 1
            if not _is_probable_prime(q):
                continue
            kernel = SolinasPlan64.covers_q(q, args.n) and args.n <= 32768
            print(f"q = 2^{a} - 2^{b} + 1 = {q}  (width {a}, 2-adicity {b},"
                  f" n <= 2^{b - 1}, "
                  f"{'pallas-sol64' if kernel else 'XLA/four-step'})")
            found += 1
            if found >= args.limit:
                return 0
    if not found:
        print(f"no trinomial primes with 2-adicity >= {need_b} in widths "
              f"[{args.min_width}, {args.max_width}]", file=sys.stderr)
        return 1
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tpu_ntt.tools", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("twiddles", help="emit a twiddle hex table")
    _add_param_flags(sp)
    sp.add_argument("--inverse", action="store_true")
    sp.add_argument("--device", action="store_true",
                    help="generate on the accelerator from the scalar seed "
                         "(tables.device_psi_powers)")
    sp.add_argument("-o", "--output")
    sp.set_defaults(fn=cmd_twiddles)

    sp = sub.add_parser("find-psi", help="find primitive 2n-th roots")
    sp.add_argument("--n", type=int, required=True)
    sp.add_argument("--q", type=int, required=True)
    sp.add_argument("--all", action="store_true")
    sp.add_argument("--limit", type=int, default=16)
    sp.set_defaults(fn=cmd_find_psi)

    sp = sub.add_parser("constants", help="print all derived constants")
    _add_param_flags(sp)
    sp.set_defaults(fn=cmd_constants)

    sp = sub.add_parser(
        "find-trinomial",
        help="find Solinas trinomial NTT primes (sol64 fast-path moduli)",
    )
    sp.add_argument("--n", type=int, required=True)
    sp.add_argument("--min-width", type=int, default=31)
    sp.add_argument("--max-width", type=int, default=62)
    sp.add_argument("--limit", type=int, default=16)
    sp.set_defaults(fn=cmd_find_trinomial)

    sp = sub.add_parser("verify-hex", help="check a hex file against the generator")
    _add_param_flags(sp)
    sp.add_argument("--file", required=True)
    sp.add_argument("--inverse", action="store_true")
    sp.set_defaults(fn=cmd_verify_hex)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
