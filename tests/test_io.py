"""Text-I/O format parity tests (reference io.c:61-120 contract)."""

import numpy as np

from navierstokes_parallel_tpu.utils import io as nsio


def _fields(i_max, j_max, seed=0):
    rng = np.random.default_rng(seed)
    shape = (i_max + 2, j_max + 2)
    return (rng.standard_normal(shape), rng.standard_normal(shape),
            rng.standard_normal(shape))


def test_output_format(tmp_path):
    i_max, j_max = 5, 4
    u, v, p = _fields(i_max, j_max)
    prefix = str(tmp_path / "42")
    nsio.output(u, v, p, t=0.125, a=1.0, b=2.0, prefix=prefix, verbose=False)

    lines_u = open(prefix + "_u.txt").read().splitlines()
    lines_v = open(prefix + "_v.txt").read().splitlines()
    lines_p = open(prefix + "_p.txt").read().splitlines()

    # 3-line headers: t, a, b with 5 decimals.
    assert lines_p[:3] == ["0.12500", "1.00000", "2.00000"]
    # p: j_max+2 rows of i_max+2 values each, trailing space preserved.
    assert len(lines_p) == 3 + j_max + 2
    assert all(len(l.split()) == i_max + 2 for l in lines_p[3:])
    assert lines_p[3].endswith(" ")
    # u: i_max+1 columns.
    assert all(len(l.split()) == i_max + 1 for l in lines_u[3:])
    # v: j_max+1 data rows then one empty row.
    assert len(lines_v) == 3 + j_max + 2
    assert all(len(l.split()) == i_max + 2 for l in lines_v[3 : 3 + j_max + 1])
    assert lines_v[-1] == ""


def test_read_roundtrip(tmp_path):
    i_max, j_max = 6, 3
    u, v, p = _fields(i_max, j_max, seed=1)
    prefix = str(tmp_path / "rt")
    nsio.output(u, v, p, t=0.5, a=1.0, b=1.0, prefix=prefix, verbose=False)

    t, a, b, p_read = nsio.read_field(prefix + "_p.txt")
    assert (t, a, b) == (0.5, 1.0, 1.0)
    np.testing.assert_allclose(p_read, p, atol=1e-5)

    _, _, _, u_read = nsio.read_field(prefix + "_u.txt")
    np.testing.assert_allclose(u_read, u[: i_max + 1, :], atol=1e-5)


def test_comparator(tmp_path):
    i_max, j_max = 4, 4
    u, v, p = _fields(i_max, j_max, seed=2)
    a_prefix = str(tmp_path / "a")
    b_prefix = str(tmp_path / "b")
    nsio.output(u, v, p, 0.1, 1.0, 1.0, a_prefix, verbose=False)
    # Perturb within tolerance.
    nsio.output(u + 5e-6, v, p, 0.1, 1.0, 1.0, b_prefix, verbose=False)
    assert nsio.compare_outputs_with_tolerance(a_prefix + "_u.txt", b_prefix + "_u.txt")
    # Perturb beyond tolerance.
    c_prefix = str(tmp_path / "c")
    nsio.output(u + 5e-3, v, p, 0.1, 1.0, 1.0, c_prefix, verbose=False)
    assert not nsio.compare_outputs_with_tolerance(a_prefix + "_u.txt", c_prefix + "_u.txt")


def test_backend_output_file_parity(tmp_path):
    """End-to-end file contract: two backends' --final-output-prefix files
    must pass the notebook comparator (the reference's actual validation
    flow, colab-runner.ipynb)."""
    from navierstokes_parallel_tpu import cli
    from navierstokes_parallel_tpu.config import Params

    cfg = tmp_path / "c.in"
    Params(i_max=12, j_max=12, T=0.1, Re=100.0, tau=0.5, epsilon=1e-4,
           max_it=300, n_print=1).to_file(str(cfg))
    a = tmp_path / "jnp_run"
    b = tmp_path / "mg_run"
    assert cli.main([str(cfg), "--final-output-prefix", str(a)]) == 0
    assert cli.main([str(cfg), "--method", "mg",
                     "--final-output-prefix", str(b)]) == 0
    for suffix in ("_u.txt", "_v.txt", "_p.txt"):
        if suffix == "_p.txt":
            # p is defined up to the Neumann nullspace constant across
            # solvers; the contract applies to velocities.
            continue
        assert nsio.compare_outputs_with_tolerance(
            str(a) + suffix, str(b) + suffix
        ), f"{suffix} outside tolerance"


def test_native_writer_byte_parity(tmp_path):
    """The native fast writer (csrc/nsp_io.c) must be byte-identical to the
    Python formatter — including near-tie values (exact product within an
    ulp of k + 0.5) and EXACT dyadic ties like 0.078125 = 5/64, where
    "%.5f" rounds half to even.  Skipped when the C toolchain is absent
    (wheel installs fall back to the Python writer)."""
    import ctypes

    lib = nsio._native_io()
    if not lib:
        pytest.skip("native IO library unavailable")

    rng = np.random.default_rng(11)
    base = (np.arange(-2000, 2000) + 0.5) / 1e5
    vals = np.concatenate([
        rng.standard_normal(20000) * np.logspace(-8, 9, 20000),
        base, base + 1e-13, base - 1e-13,
        np.arange(1, 200) / 64.0, -np.arange(1, 200) / 64.0,  # exact ties
        rng.uniform(-1e10, 1e10, 5000),
        np.array([0.0, -0.0, -1e-7, 1e-7, np.inf, -np.inf, np.nan,
                  # sign-bit-set NaN: glibc snprintf writes "-nan" but
                  # Python writes "nan" — the native writer must match Python
                  np.copysign(np.nan, -1.0),
                  1e10, -1e10, 9.999999e9, 123456789.123456]),
    ])
    n = int(np.ceil(np.sqrt(vals.size)))
    arr = np.zeros((n, n))
    arr.flat[:vals.size] = vals

    py_path, c_path = tmp_path / "py.txt", tmp_path / "c.txt"
    nsio._write_grid_py(str(py_path), arr, 0.123456, 1.0, 2.0, n, n - 2)
    rc = lib.nsp_write_grid(
        str(c_path).encode(),
        np.ascontiguousarray(arr).ctypes.data_as(
            ctypes.POINTER(ctypes.c_double)),
        n, n, n, n - 2, 0.123456, 1.0, 2.0)
    assert rc == 0
    assert py_path.read_bytes() == c_path.read_bytes()
