"""Direct spectral pressure solver (method="fft"): DCT-II diagonalization
of the Neumann Laplacian, executed as MXU matmuls.

The pressure-Poisson system the reference iterates on with SOR
(integration.c:129-173) is the constant-coefficient 5-point Laplacian with
homogeneous Neumann BCs on a cell-centered grid.  Its eigenvectors are the
DCT-II cosines  v_k(i) = cos(pi k (i+1/2)/n)  — they satisfy the reflective
ghost closure v(-1)=v(0), v(n)=v(n-1) exactly — with eigenvalues
lambda_k = (2 cos(pi k / n) - 2) / dx^2.  So one forward transform, a
pointwise divide, and one inverse transform solve the system DIRECTLY, to
rounding error, in O(n^3) MXU flops (the transform is a dense cosine-matrix
matmul — on TPU that is faster and far more robust than an FFT butterfly
for these sizes: 2 * 2048^3 * 4 flops ~= 1.4 ms/solve at 2048^2).

Precision: transforms run in f32 on the MXU (highest-precision matmul
mode); plugged into the SAME mixed-precision refinement outer as SOR/MG
(ops/sor.py), the f64 defect re-baseline mops up the f32 transform
rounding, so the exact reference convergence contract
L2(res) <= eps*(||p0|| + 1.5) is met in 2-3 direct solves per time step —
`iterations` counts them.

Compatibility: the Neumann problem is singular (constant nullspace); the
discrete RHS is compatible by construction (the divergence of F/G
telescopes to wall values that are identically zero, main.c:116-120), so
zeroing the k=(0,0) mode selects the minimum-norm solution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Params


@functools.lru_cache(maxsize=None)
def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II analysis matrix C (k, i): C @ C.T = I."""
    i = np.arange(n, dtype=np.float64)
    k = np.arange(n, dtype=np.float64)[:, None]
    C = np.cos(np.pi * k * (i + 0.5) / n) * np.sqrt(2.0 / n)
    C[0] *= np.sqrt(0.5)
    return C.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _eigenvalues(n: int, d2_inv: float) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    return ((2.0 * np.cos(np.pi * k / n) - 2.0) * d2_inv).astype(np.float32)


def poisson_solve_dct(rhs_int: jax.Array, params: Params) -> jax.Array:
    """Solve A p = rhs (interior (i_max, j_max), Neumann, zero-mean) in one
    shot: p = C_i^T [ (C_i rhs C_j^T) / (lam_i + lam_j) ] C_j."""
    ni, nj = params.i_max, params.j_max
    f32 = jnp.float32
    Ci = jnp.asarray(_dct_matrix(ni))
    Cj = jnp.asarray(_dct_matrix(nj))
    lam = (
        jnp.asarray(_eigenvalues(ni, 1.0 / (params.dx * params.dx)))[:, None]
        + jnp.asarray(_eigenvalues(nj, 1.0 / (params.dy * params.dy)))[None, :]
    )
    hp = jax.lax.Precision.HIGHEST
    rhat = jnp.matmul(jnp.matmul(Ci, rhs_int.astype(f32), precision=hp),
                      Cj.T, precision=hp)
    phat = rhat / jnp.where(lam == 0, 1.0, lam)
    phat = phat.at[0, 0].set(0.0)  # singular constant mode -> zero mean
    return jnp.matmul(jnp.matmul(Ci.T, phat, precision=hp), Cj,
                      precision=hp)


def inner_direct(rhs_neg_full: jax.Array, _n_sweeps, params: Params):
    """Refinement-inner hook: one direct solve of A delta = rhs_neg
    (the sweep count is irrelevant — the solve is exact to f32 rounding)."""
    delta_int = poisson_solve_dct(rhs_neg_full[1:-1, 1:-1], params)
    return jnp.zeros(params.shape, jnp.float32).at[1:-1, 1:-1].set(delta_int)
