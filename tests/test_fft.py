"""Direct DCT spectral pressure solver (method="fft", ops/fft.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from navierstokes_parallel_tpu import solve
from navierstokes_parallel_tpu.config import Params
from navierstokes_parallel_tpu.ops import fft as fftmod
from navierstokes_parallel_tpu.ops import sor

from conftest import assert_close_reference_contract


@pytest.fixture
def params32():
    return Params(problem=1, i_max=32, j_max=32, T=0.05, Re=100.0, tau=0.5,
                  omega=1.7, epsilon=1e-4, max_it=50, dtype="float32")


def test_dct_matrix_orthonormal():
    C = fftmod._dct_matrix(24)
    np.testing.assert_allclose(C @ C.T, np.eye(24), atol=1e-6)


def test_direct_solve_inverts_laplacian(params32):
    """A p = rhs to f32 rounding for a zero-mean rhs (the residual is the
    exact quantity the reference convergence test measures)."""
    rng = np.random.default_rng(11)
    rhs_int = rng.standard_normal((32, 32)).astype(np.float32)
    rhs_int -= rhs_int.mean()

    p_int = fftmod.poisson_solve_dct(jnp.asarray(rhs_int), params32)
    p_full = jnp.zeros(params32.shape, jnp.float32).at[1:-1, 1:-1].set(p_int)
    dx2_inv = 1.0 / (params32.dx * params32.dx)
    res = sor.residual(sor.ghost_fill(p_full), jnp.asarray(rhs_int),
                       dx2_inv, dx2_inv)
    # scale: rhs ~ 1, A ~ 4/dx^2 ~ 4096 -> f32 rounding floor ~ 1e-3 abs.
    assert float(jnp.max(jnp.abs(res))) < 5e-2 * dx2_inv * np.finfo(
        np.float32).eps * 32 * 100 + 1e-2
    # relative to the operator scale the residual is tiny:
    assert float(jnp.sqrt(jnp.mean(res * res))) < 1e-2


def test_fft_solve_pressure_converges_fast(params32):
    """Through the refinement outer the contract is met in a handful of
    direct solves — not hundreds of sweeps."""
    rng = np.random.default_rng(3)
    rhs = np.zeros(params32.shape, np.float32)
    r = rng.standard_normal((32, 32)).astype(np.float32)
    rhs[1:-1, 1:-1] = r - r.mean()
    p0 = jnp.zeros(params32.shape, jnp.float32)
    result = sor.solve_pressure(p0, jnp.asarray(rhs), params32, method="fft")
    assert bool(result.converged)
    assert int(result.iterations) <= 5
    # same system solved by plain red-black must agree on the gradient
    # (pressure is defined up to a constant)
    res_rb = sor.solve_pressure(p0, jnp.asarray(rhs),
                                params32.replace(max_it=5000),
                                method="rb_sor")
    g_fft = np.diff(np.asarray(result.p)[1:-1, 1:-1], axis=0)
    g_rb = np.diff(np.asarray(res_rb.p)[1:-1, 1:-1], axis=0)
    np.testing.assert_allclose(g_fft, g_rb, atol=2e-4)


def test_fft_end_to_end_matches_rb_sor(params32):
    st_fft, stats_fft = solve(params32.replace(max_it=50),
                              pressure_method="fft")
    st_rb, _ = solve(params32.replace(max_it=5000), pressure_method="rb_sor")
    assert int(stats_fft.sor_failures) == 0
    # ~2-3 direct solves per step
    assert int(stats_fft.total_sor_iterations) <= 5 * int(stats_fft.steps)
    assert_close_reference_contract(
        np.asarray(st_fft.u[1:-1, 1:-1], dtype=np.float64),
        np.asarray(st_rb.u[1:-1, 1:-1], dtype=np.float64), tol=1e-4)
    assert_close_reference_contract(
        np.asarray(st_fft.v[1:-1, 1:-1], dtype=np.float64),
        np.asarray(st_rb.v[1:-1, 1:-1], dtype=np.float64), tol=1e-4)


def test_fft_oracle_contract():
    from navierstokes_parallel_tpu import oracle

    prm = Params(problem=1, i_max=16, j_max=16, T=0.05, Re=100.0, tau=0.5,
                 omega=1.7, epsilon=1e-4, max_it=500, dtype="float64")
    res_o = oracle.oracle_solve(prm)
    st, stats = solve(prm.replace(dtype="float32", max_it=50),
                      pressure_method="fft")
    assert int(stats.steps) == res_o.steps
    assert_close_reference_contract(
        np.asarray(st.u[1:-1, 1:-1], dtype=np.float64),
        res_o.u[1:-1, 1:-1], tol=1e-4)


def test_cli_fft_method(tmp_path, capsys):
    from navierstokes_parallel_tpu import cli

    cfg = tmp_path / "c.in"
    Params(problem=1, i_max=12, j_max=12, T=0.02, Re=100.0, tau=0.5,
           epsilon=1e-4, max_it=50, n_print=1).to_file(str(cfg))
    rc = cli.main([str(cfg), "--method", "fft", "--stats"])
    assert rc == 0
    out = capsys.readouterr()
    assert out.out.startswith("U-CENTER: ")
    assert "sor_failures=0" in out.err


def test_fft_odd_rectangular_grid():
    """The DCT basis is dense n x n for ANY n: the reference's odd default
    size style (parameters.txt 257^2) and rectangular grids need no
    power-of-2 structure."""
    prm = Params(problem=1, i_max=17, j_max=13, a=1.0, b=0.7, T=0.03,
                 Re=100.0, tau=0.5, omega=1.7, epsilon=1e-4, max_it=2000,
                 dtype="float32")
    from navierstokes_parallel_tpu.solver import solve

    s_ref, st_ref = solve(prm, pressure_method="rb_sor")
    s_fft, st_fft = solve(prm, pressure_method="fft")
    # Both must actually CONVERGE (comparing a converged direct solve to a
    # max_it-truncated SOR run would legitimately differ by ~1e-3).
    assert int(st_ref.sor_failures) == 0
    assert int(st_fft.sor_failures) == 0
    assert int(st_fft.steps) == int(st_ref.steps)
    for name in ("u", "v"):
        np.testing.assert_allclose(np.asarray(getattr(s_fft, name)),
                                   np.asarray(getattr(s_ref, name)),
                                   rtol=0.0, atol=1e-4)
