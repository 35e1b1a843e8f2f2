"""Host driver API tests — the integration-test analog of the RoCC
bare-metal check (chipyard/ntt-test.c:91-172): load A and B, start, poll
status, read back, compare against an independent product."""

import numpy as np
import pytest

from tpu_ntt import DILITHIUM_256
from tpu_ntt import reference
from tpu_ntt.host import NttDevice, NttStream, Phase


def test_device_end_to_end_small_product(rng):
    """Mirrors ntt-test.c: small sparse polys, full command sequence."""
    dev = NttDevice(DILITHIUM_256)
    p = DILITHIUM_256
    # a = 1 + 2x, b = 3 + x  (the shape of the bare-metal test's vectors)
    dev.load_a(0, 1)
    dev.load_a(1, 2)
    dev.load_b(0, 3)
    dev.load_b(1, 1)
    assert dev.phase in (Phase.LOADED_A, Phase.LOADED_B)
    dev.start()
    dev.wait()
    assert dev.status() == 1
    # (1 + 2x)(3 + x) = 3 + 7x + 2x^2
    assert dev.read(0) == 3
    assert dev.read(1) == 7
    assert dev.read(2) == 2
    assert all(dev.read(i) == 0 for i in range(3, 16))


def test_device_random_poly(rng):
    p = DILITHIUM_256
    dev = NttDevice(p)
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [rng.randrange(p.q) for _ in range(p.n)]
    dev.load_poly(a, 0)
    dev.load_poly(b, 1)
    dev.start()
    got = dev.read_all()
    want = reference.nwc_poly_mult(a, b, p)
    assert [int(v) for v in got] == want


def test_device_cyclic_mode(rng):
    p = DILITHIUM_256
    dev = NttDevice(p)
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [rng.randrange(p.q) for _ in range(p.n)]
    dev.load_poly(a, 0)
    dev.load_poly(b, 1)
    dev.start(negacyclic=False)
    got = dev.read_all()
    want = reference.cyclic_poly_mult(a, b, p)
    assert [int(v) for v in got] == want


def test_device_validation():
    dev = NttDevice(DILITHIUM_256)
    with pytest.raises(IndexError):
        dev.load_a(DILITHIUM_256.n, 1)
    with pytest.raises(ValueError):
        dev.load_a(0, DILITHIUM_256.q)
    with pytest.raises(ValueError):
        dev.load_poly([0] * 7, 0)
    with pytest.raises(RuntimeError):
        NttDevice(DILITHIUM_256).read_all()


def test_stream_fifo_order(rng):
    p = DILITHIUM_256
    stream = NttStream(p, max_inflight=2)
    batches = []
    for k in range(4):
        a = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=object)
        b = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=object)
        batches.append((a, b))
        stream.submit(a, b)
    outs = stream.drain()
    assert len(outs) == 4
    for (a, b), got in zip(batches, outs):
        want = reference.nwc_poly_mult(list(a[0]), list(b[0]), p)
        assert [int(v) for v in got[0]] == want


def test_stream_unary_fwd(rng):
    p = DILITHIUM_256
    stream = NttStream(p, op="fwd")
    a = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=object)
    stream.submit(a)
    got = stream.get()
    want = reference.cg_ntt(list(a[0]), p.omega, p.q)
    assert [int(v) for v in got[0]] == want


def test_stream_fast_numeric_path(rng):
    """uint32 numpy input takes the vectorized encode path."""
    p = DILITHIUM_256
    stream = NttStream(p)
    a = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=np.uint32)
    b = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=np.uint32)
    stream.submit(a, b)
    got = stream.get()
    want = reference.nwc_poly_mult(
        [int(v) for v in a[0]], [int(v) for v in b[0]], p
    )
    assert [int(v) for v in got[0]] == want


def test_device_pairs_backend(rng):
    """Double-word dispatch backends ((hi, lo) uint32 pairs) work through
    the raw device driver path — layout conversion both directions."""
    from tpu_ntt.modmath import GOLDILOCKS_Q
    from tpu_ntt.params import make_params

    p = make_params(256, GOLDILOCKS_Q)
    dev = NttDevice(p)
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [p.q - 1] * p.n
    dev.load_poly(a, 0)
    dev.load_poly(b, 1)
    dev.start()
    got = dev.read_all()
    want = reference.nwc_poly_mult(a, b, p)
    assert [int(v) for v in got] == want


def test_stream_pairs_backend(rng):
    from tpu_ntt.modmath import GOLDILOCKS_Q
    from tpu_ntt.params import make_params

    p = make_params(256, GOLDILOCKS_Q)
    stream = NttStream(p)
    a = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=np.uint64)
    b = np.array([[rng.randrange(p.q) for _ in range(p.n)]], dtype=np.uint64)
    stream.submit(a, b)
    got = stream.get()
    want = reference.nwc_poly_mult(
        [int(v) for v in a[0]], [int(v) for v in b[0]], p
    )
    assert [int(v) for v in got[0]] == want


def test_device_pinned_reduction_path(rng):
    """Pinning a reduction backend bypasses dispatch and parameterizes the
    XLA ring (the REDUCTION_TYPE mux analog) — still bit-exact."""
    from tpu_ntt.params import Reduction

    p = DILITHIUM_256
    dev = NttDevice(p, reduction=Reduction.BARRETT)
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [rng.randrange(p.q) for _ in range(p.n)]
    dev.load_poly(a, 0)
    dev.load_poly(b, 1)
    dev.start()
    got = dev.read_all()
    want = reference.nwc_poly_mult(a, b, p)
    assert [int(v) for v in got] == want


def test_wait_times_out_on_stuck_dispatch():
    """NttDevice.wait must enforce its deadline by polling readiness, not by
    blocking unboundedly first (round-1 advisor finding)."""
    import pytest
    from tpu_ntt import DILITHIUM_256
    from tpu_ntt.host import NttDevice, Phase

    dev = NttDevice(DILITHIUM_256)

    class NeverReady:
        def is_ready(self):
            return False

    dev._result = NeverReady()
    dev.phase = Phase.RUNNING
    with pytest.raises(TimeoutError):
        dev.wait(timeout_s=0.05, poll_s=0.005)


def test_wait_before_start_raises():
    from tpu_ntt import DILITHIUM_256
    from tpu_ntt.host import NttDevice
    import pytest

    with pytest.raises(RuntimeError):
        NttDevice(DILITHIUM_256).wait(timeout_s=0.1)
