"""Multi-slice (DCN-aware) mesh construction (parallel/topology.py —
SURVEY.md §2.4/§5's "DCN-ready by making the mesh multi-slice-aware").

The hierarchy lives entirely in the device LAYOUT: each slice's devices
form a contiguous (sx, sy) block stacked along the mesh x axis, so the
flat ("x", "y") solver contract — shardings, ppermute halo exchange,
psum reductions — is untouched and only the slice-seam x-exchanges would
ride DCN on real multi-pod hardware.  Here the (2, 2, 2) hierarchy runs
on 8 virtual CPU devices and must reproduce the single-chip solve
exactly like any other mesh.
"""

import jax
import numpy as np
import pytest

from navierstokes_parallel_tpu.config import Params
from navierstokes_parallel_tpu.grid import allocate_state
from navierstokes_parallel_tpu.parallel import sharded, topology


def _need(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def test_multislice_layout_222():
    """(2 slices) x (2x2 per slice) -> a (4, 2) mesh whose first two rows
    are slice 0's devices and last two are slice 1's, in id order (the
    virtual-CPU grouping rule); one DCN seam row between them."""
    _need(8)
    mesh = topology.make_multislice_mesh(2, (2, 2),
                                         devices=jax.devices()[:8])
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == topology.MESH_AXES
    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    assert sorted(ids[:2].ravel().tolist()) == [0, 1, 2, 3]
    assert sorted(ids[2:].ravel().tolist()) == [4, 5, 6, 7]
    assert topology.dcn_seam_rows(mesh, 2) == [1]


def test_multislice_layout_default_shape_and_errors():
    _need(8)
    devs = jax.devices()[:8]
    mesh = topology.make_multislice_mesh(4, devices=devs)  # 1x2 per slice
    assert mesh.devices.shape[0] * mesh.devices.shape[1] == 8
    assert topology.dcn_seam_rows(mesh, 4) == [0, 1, 2][: 3]
    with pytest.raises(ValueError, match="do not split"):
        topology.make_multislice_mesh(3, devices=devs)
    with pytest.raises(ValueError, match="slice_shape"):
        topology.make_multislice_mesh(2, (3, 2), devices=devs)
    with pytest.raises(ValueError, match="does not split"):
        topology.dcn_seam_rows(mesh, 3)


class _FakeDev:
    """Stub with the runtime slice_index attribute real multi-slice jobs
    expose (virtual CPU devices never have it, so this is the only way to
    CI the physical-structure validation)."""

    def __init__(self, id, slice_index):
        self.id = id
        self.slice_index = slice_index


def test_multislice_runtime_slice_index_validated():
    """When devices DO carry slice_index, the claimed (n_slices,
    slice_shape) grouping must match the physical structure — a mismatch
    would silently mix physical slices inside one mesh 'slice' block and
    make dcn_seam_rows() wrong about which exchanges ride DCN."""
    # 4 physical slices of 2 devices, but the caller claims 2 slices of 4:
    devs = [_FakeDev(i, i // 2) for i in range(8)]
    with pytest.raises(ValueError, match="slice sizes"):
        topology.make_multislice_mesh(2, (2, 2), devices=devs)
    # Unequal physical slices (3 + 5) under a claimed even split:
    devs = [_FakeDev(i, 0 if i < 3 else 1) for i in range(8)]
    with pytest.raises(ValueError, match="slice sizes"):
        topology.make_multislice_mesh(2, (2, 2), devices=devs)
    # Mixed exposure (some devices report, some do not):
    devs = [_FakeDev(i, 0 if i < 4 else None) for i in range(8)]
    with pytest.raises(ValueError, match="mixed devices"):
        topology.make_multislice_mesh(2, (2, 2), devices=devs)
    # A MATCHING runtime structure builds, slice-major regardless of the
    # interleaved input order (ids 0,2,4,6 = slice 0; 1,3,5,7 = slice 1):
    devs = [_FakeDev(i, i % 2) for i in range(8)]
    mesh_devs = topology.make_multislice_mesh(2, (2, 2), devices=devs).devices
    ids = np.vectorize(lambda d: d.id)(mesh_devs)
    assert sorted(ids[:2].ravel().tolist()) == [0, 2, 4, 6]
    assert sorted(ids[2:].ravel().tolist()) == [1, 3, 5, 7]


def test_multislice_solve_matches_single_chip():
    """The (2, 2, 2) hierarchy is numerically transparent: a sharded
    cavity solve on the multislice mesh == the single-chip solve within
    the repo-wide 1e-4 contract (17^2: pad-to-divisible on both axes)."""
    from navierstokes_parallel_tpu import solver

    _need(8)
    mesh = topology.make_multislice_mesh(2, (2, 2),
                                         devices=jax.devices()[:8])
    params = Params(problem=1, i_max=17, j_max=17, T=0.3, Re=100.0,
                    tau=0.5, omega=1.7, epsilon=1e-6, max_it=5000,
                    dtype="float32")
    state = allocate_state(params)
    ref, st1 = solver.solve(params, state)
    out, st2 = sharded.solve_sharded(params, state, mesh)
    assert int(st1.steps) == int(st2.steps)
    for name in ("u", "v", "p"):
        np.testing.assert_allclose(np.asarray(getattr(out, name)),
                                   np.asarray(getattr(ref, name)),
                                   atol=1e-4, err_msg=name)
