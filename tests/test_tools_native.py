"""CLI toolchain + native-oracle tests (reference analogs: scripts/ CLIs,
software_benchmark --check)."""

import io
import os
import random
import subprocess
import sys

import pytest

from tpu_ntt import DILITHIUM_256, P24_4096, P60_4096
from tpu_ntt import native, reference, tables, tools

from conftest import reference_hex_path


def run_cli(argv):
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = tools.main(argv)
    return rc, buf.getvalue()


def test_cli_twiddles_matches_tables():
    rc, out = run_cli(["twiddles", "--preset", "dilithium_256"])
    assert rc == 0
    assert tables.load_hex(out) == tables.psi_powers(DILITHIUM_256)


def test_cli_twiddles_inverse_custom_params():
    rc, out = run_cli(
        ["twiddles", "--n", "256", "--q", "8380417", "--psi", "1239911",
         "--inverse"]
    )
    assert rc == 0
    assert tables.load_hex(out) == tables.psi_inv_powers(DILITHIUM_256)


def test_cli_twiddles_device_generation():
    """--device emits the same hex bytes via the on-device generator."""
    rc, out = run_cli(["twiddles", "--preset", "dilithium_256", "--device"])
    assert rc == 0
    assert out == tables.dump_twiddle_hex(DILITHIUM_256)


def test_cli_find_psi():
    rc, out = run_cli(["find-psi", "--n", "256", "--q", "8380417"])
    assert rc == 0
    psi = int(out.strip())
    assert pow(psi, 256, 8380417) == 8380416


def test_cli_find_psi_all():
    rc, out = run_cli(["find-psi", "--n", "256", "--q", "8380417", "--all",
                       "--limit", "5"])
    assert rc == 0
    vals = [int(v) for v in out.split()]
    assert len(vals) == 5
    for psi in vals:
        assert pow(psi, 256, 8380417) == 8380416


def test_cli_find_trinomial():
    """Solinas modulus finder: every line is a prime 2^a - 2^b + 1 with
    enough 2-adicity for the requested n; the shipped headline q appears
    in the 60-bit window (it IS 2^60 - 2^14 + 1)."""
    rc, out = run_cli(["find-trinomial", "--n", "4096", "--min-width", "60",
                       "--max-width", "60", "--limit", "4"])
    assert rc == 0
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert any("2^60 - 2^14 + 1" in ln and "pallas-sol64" in ln
               for ln in lines)
    for ln in lines:
        q = int(ln.split("=")[2].split("(")[0])
        assert pow(2, q - 1, q) == 1  # Fermat witness
        assert (q - 1) % (2 * 4096) == 0


def test_cli_constants():
    rc, out = run_cli(["constants", "--preset", "p60_4096"])
    assert rc == 0
    assert f"psi_inv        {P60_4096.psi_inv}" in out
    assert f"barrett_mu     {P60_4096.barrett_mu}" in out


def test_cli_verify_hex_against_reference(tmp_path):
    path = reference_hex_path("twiddle_forward_4096.hex")
    if path is None:
        path = str(tmp_path / "fwd.hex")
        with open(path, "w") as f:
            f.write(tables.dump_twiddle_hex(P24_4096))
    rc, out = run_cli(["verify-hex", "--preset", "p24_4096", "--file", path])
    assert rc == 0 and out.startswith("OK")


def test_cli_verify_hex_detects_corruption(tmp_path):
    path = tmp_path / "bad.hex"
    text = tables.dump_twiddle_hex(DILITHIUM_256).splitlines()
    text[5] = "000001"
    path.write_text("\n".join(text) + "\n")
    rc, out = run_cli(["verify-hex", "--preset", "dilithium_256",
                       "--file", str(path)])
    assert rc == 1 and "MISMATCH" in out


# ---------------------------------------------------------------------------
# Native oracle
# ---------------------------------------------------------------------------

needs_native = pytest.mark.skipif(
    not native.available(), reason="no g++ / native oracle unavailable"
)


@needs_native
def test_native_schoolbook_matches_python(rng):
    p = DILITHIUM_256
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [rng.randrange(p.q) for _ in range(p.n)]
    assert native.nwc_schoolbook(a, b, p.q) == reference.schoolbook_negacyclic(a, b, p.q)
    assert native.cyclic_schoolbook(a, b, p.q) == reference.schoolbook_cyclic(a, b, p.q)


@needs_native
def test_native_60bit_schoolbook(rng):
    q = P60_4096.q
    n = 64
    # independent small-n 60-bit case: compare vs big-int python schoolbook
    a = [rng.randrange(q) for _ in range(n)]
    b = [rng.randrange(q) for _ in range(n)]
    got = native.nwc_schoolbook(a, b, q)
    want = reference.schoolbook_negacyclic(a, b, q)
    assert got == want


@needs_native
def test_native_fast_matches_schoolbook(rng):
    p = DILITHIUM_256
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [rng.randrange(p.q) for _ in range(p.n)]
    assert native.nwc_fast(a, b, p.q, p.psi) == native.nwc_schoolbook(a, b, p.q)


@needs_native
def test_native_dft_matches_cg_ntt(rng):
    p = DILITHIUM_256
    x = [rng.randrange(p.q) for _ in range(p.n)]
    assert native.dft_direct(x, p.q, p.omega) == reference.cg_ntt(x, p.omega, p.q)


@needs_native
def test_native_goldilocks_q_above_2_63(rng):
    """Regression: the oracle's modular add/sub must be wrap-aware —
    for q > 2^63 (the Goldilocks prime) a u64 ``a + b`` overflows, which
    silently corrupted nwc_fast/schoolbook results before the fix."""
    from tpu_ntt.modmath import GOLDILOCKS_Q
    from tpu_ntt.params import make_params

    q = GOLDILOCKS_Q
    p = make_params(256, q)
    a = [rng.randrange(q) for _ in range(p.n)]
    b = [q - 1] * p.n  # maximal operands exercise the wrap everywhere
    a[:3] = [0, 1, q - 1]
    want = reference.nwc_poly_mult(a, b, p)
    assert native.nwc_fast(a, b, q, p.psi) == want
    assert native.nwc_schoolbook(a, b, q) == want


@needs_native
def test_native_fast_60bit_full_size(rng):
    """Full 4096-point 60-bit check: native fast NTT vs the python golden —
    feasible only because the oracle is native."""
    p = P60_4096
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [rng.randrange(p.q) for _ in range(p.n)]
    got = native.nwc_fast(a, b, p.q, p.psi)
    want = reference.nwc_poly_mult(a, b, p)
    assert got == want


# ---------------------------------------------------------------------------
# CPU benchmark binary: SIMD variants (reference: the 12 BENCH_SIMD_KIND
# targets, software_benchmark/CMakeLists.txt:31-60)
# ---------------------------------------------------------------------------

import shutil
import subprocess

BENCH_DIR = os.path.join(os.path.dirname(__file__), "..", "bench", "cpu")


def _build_bench():
    if shutil.which("g++") is None:
        return None
    exe = os.path.join(BENCH_DIR, "ntt_bench")
    r = subprocess.run(["make", "-s"], cwd=BENCH_DIR, capture_output=True)
    if r.returncode or not os.path.exists(exe):
        return None
    return exe


@pytest.mark.parametrize("simd", ["scalar", "avx2", "avx512"])
def test_bench_simd_kinds_check(simd):
    """Every SIMD kind builds into the one binary, passes --check against
    the O(n^2) oracle, and produces the same checksum."""
    exe = _build_bench()
    if exe is None:
        pytest.skip("no g++ / build failed")
    r = subprocess.run(
        [exe, "--preset", "p24_1024", "--simd", simd, "--reps", "3",
         "--check"],
        capture_output=True, text=True,
    )
    if r.returncode == 2 and "unsupported on this CPU" in r.stderr:
        pytest.skip(f"{simd} not supported on this host")
    assert r.returncode == 0, r.stderr
    assert f"simd {simd}" in r.stdout
    assert "check ok" in r.stdout


def test_bench_simd_checksums_agree():
    exe = _build_bench()
    if exe is None:
        pytest.skip("no g++ / build failed")
    sums = {}
    for simd in ("scalar", "avx2", "avx512"):
        r = subprocess.run(
            [exe, "--preset", "dilithium_256", "--simd", simd, "--reps", "2"],
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            continue  # unsupported kind on this host
        for line in r.stdout.splitlines():
            if line.startswith("checksum"):
                sums[simd] = line.split()[1]
    assert len(set(sums.values())) == 1 and "scalar" in sums


def test_bench_60bit_simd_falls_back_scalar():
    """q >= 2^31 cannot use the 32-bit-lane Barrett; the binary must report
    (and use) scalar, mirroring the reference's scalar-only 60-bit SIMD
    kinds (benchmark_ntt_60bit.cpp)."""
    exe = _build_bench()
    if exe is None:
        pytest.skip("no g++ / build failed")
    r = subprocess.run(
        [exe, "--preset", "p60_4096", "--simd", "auto", "--reps", "2",
         "--check"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert "simd scalar" in r.stdout
    assert "check ok" in r.stdout
