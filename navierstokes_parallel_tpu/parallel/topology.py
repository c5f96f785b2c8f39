"""Device-mesh topology for 2D grid sharding.

The reference has no multi-device capability at all (SURVEY.md §2.4): its
only parallelism is CUDA thread-block tiling inside one GPU.  This module is
the TPU framework's genuinely new scaling layer: a 2D `jax.sharding.Mesh`
("x", "y") over ICI onto which the staggered grid's interior is block-
sharded, the multi-chip analogue of the CUDA tile decomposition
(main.cu:407-486) with ppermute halo exchange standing in for shared-memory
halo loads.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_AXES = ("x", "y")


def _factor_pairs(n: int):
    """All (px, py) with px * py == n, ordered nearest-square first."""
    pairs = []
    for px in range(1, n + 1):
        if n % px == 0:
            pairs.append((px, n // px))
    pairs.sort(key=lambda ab: abs(ab[0] - ab[1]))
    return pairs


def choose_mesh_shape(
    n_devices: int, i_max: int, j_max: int
) -> Tuple[int, int]:
    """Pick (px, py) with px*py == n_devices that evenly divides the interior
    grid, preferring a near-square decomposition (minimum halo perimeter).
    Raises when no factorization divides evenly — callers that can handle
    padded blocks should use `choose_mesh_shape_padded` instead."""
    for px, py in _factor_pairs(n_devices):
        if i_max % px == 0 and j_max % py == 0:
            return px, py
    raise ValueError(
        f"cannot shard a {i_max}x{j_max} interior over {n_devices} devices: "
        f"no factorization divides the grid evenly"
    )


def choose_mesh_shape_padded(
    n_devices: int, i_max: int, j_max: int
) -> Tuple[int, int]:
    """Pick (px, py) with px*py == n_devices minimizing the PADDED interior
    area ceil(i/px)*px * ceil(j/py)*py, tie-broken nearest-square.  Always
    succeeds: any grid — including the reference's default 257^2
    (parameters.txt:3-4) — shards via pad-to-divisible blocks whose pad
    cells are masked out of every update and reduction (see sharded.py)."""
    best = None
    for px, py in _factor_pairs(n_devices):
        ip = -(-i_max // px) * px
        jp = -(-j_max // py) * py
        cost = (ip * jp, abs(px - py))
        if best is None or cost < best[0]:
            best = (cost, (px, py))
    return best[1]


def choose_mesh_shape_square(n_devices: int) -> Tuple[int, int]:
    """Nearest-square (px, py) with px*py == n_devices and, whenever the
    device count allows it, BOTH axes > 1.  The GSPMD backend requires
    this: XLA's SPMD partitioner miscompiles composed boundary slice
    updates on (1,N)/(N,1) meshes (see gspmd._check_mesh).  Raises for
    prime n_devices > 2 (only trivial-axis factorizations exist)."""
    for px, py in _factor_pairs(n_devices):
        if min(px, py) > 1 or n_devices == 1:
            return px, py
    raise ValueError(
        f"{n_devices} devices admit only 1x{n_devices} meshes (prime count); "
        "the gspmd backend needs both mesh axes > 1 — use a composite "
        "device count or the manual sharded backend"
    )


def local_block_dims(
    mesh_shape: Tuple[int, int], i_max: int, j_max: int
) -> Tuple[int, int]:
    """Per-shard interior block dims (li, lj) = ceil(i_max/px), ceil(j_max/py);
    the global interior is padded to (px*li, py*lj)."""
    px, py = mesh_shape
    return -(-i_max // px), -(-j_max // py)


def make_grid_mesh(
    n_devices: Optional[int] = None,
    i_max: int = 0,
    j_max: int = 0,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2D ("x", "y") mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = list(devices)[:n_devices]
    px, py = choose_mesh_shape_padded(n_devices, i_max, j_max)
    dev_array = np.asarray(devices).reshape(px, py)
    return Mesh(dev_array, MESH_AXES)


def make_multislice_mesh(
    n_slices: int,
    slice_shape: Optional[Tuple[int, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Multi-slice (DCN-aware) 2D grid mesh (SURVEY.md §2.4/§5: "DCN-ready
    by making the mesh multi-slice-aware").

    A multi-pod TPU job sees devices from `n_slices` ICI islands joined by
    the data-center network.  This constructor keeps the solver's flat
    ("x", "y") mesh contract — no sharding, halo-exchange, or collective
    code changes anywhere — and encodes the hierarchy purely in the DEVICE
    LAYOUT: each slice's devices form a contiguous (sx, sy) block and the
    slices stack along the mesh x axis, giving an (n_slices*sx, sy) mesh in
    which

      * every y-axis ppermute halo pair is intra-slice (ICI);
      * x-axis ppermute halo pairs are intra-slice EXCEPT the n_slices - 1
        seam rows between adjacent slices — the only per-step grid traffic
        that rides DCN, one halo strip per seam per exchange (and the
        deep-halo inner already amortizes that to one exchange per K
        sweeps, parallel/deep_halo.py);
      * psum/pmax reductions cross both networks but carry scalars
        (latency-, not bandwidth-bound);
      * the pencil-fft all_to_all (the one bandwidth-heavy collective,
        ops/fft.py::make_sharded_inner) transposes over single mesh axes —
        its x-axis phase would ride DCN, so spectral runs should prefer
        slicing meshes with sx large enough that mg/rb_sor families carry
        the multi-slice load (docs/parallelism.md).

    Devices are grouped by their `slice_index` attribute when the runtime
    exposes one (real multi-slice jobs), else taken in id order in
    contiguous blocks of sx*sy (virtual CPU meshes, CI).  `slice_shape`
    defaults to the nearest-square factorization of the per-slice count.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if n_slices < 1 or len(devices) % n_slices:
        raise ValueError(
            f"{len(devices)} devices do not split into {n_slices} slices")
    per_slice = len(devices) // n_slices
    if slice_shape is None:
        slice_shape = _factor_pairs(per_slice)[0]
    sx, sy = slice_shape
    if sx * sy != per_slice:
        raise ValueError(
            f"slice_shape {slice_shape} != {per_slice} devices per slice")
    # Stable hierarchy sort: slice first (runtime attribute when present),
    # then device id within the slice.  When the runtime DOES expose
    # slice_index, the claimed (n_slices, per_slice) grouping must match
    # the physical structure — otherwise the contiguous-block reshape
    # below would mix devices from different physical slices into one
    # mesh "slice", and every row dcn_seam_rows() reports as ICI-internal
    # could silently ride DCN (the exact failure this constructor exists
    # to prevent).  Virtual CPU devices have no slice_index: id order.
    slice_ids = [getattr(d, "slice_index", None) for d in devices]
    if any(i is not None for i in slice_ids):
        if any(i is None for i in slice_ids):
            raise ValueError(
                "mixed devices: some expose slice_index, some do not")
        from collections import Counter
        groups = Counter(slice_ids)
        if len(groups) != n_slices or set(groups.values()) != {per_slice}:
            raise ValueError(
                f"requested {n_slices} slices x {per_slice} devices, but "
                f"the runtime reports slice sizes "
                f"{dict(sorted(groups.items()))}")
    devices.sort(key=lambda d: (getattr(d, "slice_index", None) or 0, d.id))
    rows = [
        np.asarray(devices[s * per_slice: (s + 1) * per_slice]).reshape(
            sx, sy)
        for s in range(n_slices)
    ]
    return Mesh(np.concatenate(rows, axis=0), MESH_AXES)


def dcn_seam_rows(mesh: Mesh, n_slices: int) -> list:
    """The mesh-x indices whose NORTH halo exchange crosses a slice
    boundary on a `make_multislice_mesh(n_slices, ...)` mesh — i.e. the
    last block-row of each slice except the final one.  Diagnostic /
    test helper: everything else is ICI."""
    px = mesh.devices.shape[0]
    if px % n_slices:
        raise ValueError(f"mesh x={px} does not split into {n_slices}")
    sx = px // n_slices
    return [s * sx + sx - 1 for s in range(n_slices - 1)]


def grid_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding of an (i_max, j_max) interior block over the mesh."""
    return NamedSharding(mesh, P(*MESH_AXES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
