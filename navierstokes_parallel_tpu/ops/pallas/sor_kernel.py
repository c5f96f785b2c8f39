"""Pallas TPU kernel: K red-black SOR sweeps with the field resident in VMEM.

This is the TPU equivalent of the reference's flagship CUDA kernel
`sor_shared_memory_kernel` (src/parallel/main.cu:384-511) — but structurally
better placed: the CUDA version stages one (block+2)^2 tile into shared
memory, performs ONE half-sweep, and must round-trip through global memory
and a host sync for every half-sweep (main.cu:684-698).  Here the WHOLE grid
(correction field delta + right-hand side) stays in VMEM for K complete
red-black sweeps: HBM is touched exactly twice per K sweeps (load rhs, store
delta), and there is no sync of any kind.

The kernel computes `delta` = K red-black SOR sweeps applied to
A delta = rhs_neg starting from delta = 0 — the inner stage of the
mixed-precision refinement solver (ops/sor.py), which owns the f64 master
pressure, the defect computation, and the reference convergence rule.

Neighbor access uses circular rolls of the full padded array: the wrap-around
values land only in the ghost ring, which the interior mask excludes, and the
ghost ring itself is refreshed by the Neumann fill before every half-sweep —
so no unaligned slicing is needed anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import Params

def set_default_tile(tile_size: int) -> None:
    """CLI hook: the analogue of the reference's CUDA block-size argument
    (main.cu:987-1000) — sets the strip height of the tiled kernel (only
    used when PREFER_TILED_DMA routes >VMEM grids through it).  Rounded up
    to the 8-sublane alignment the DMA slices require.  Validated like the
    reference validates its block size (main.cu:987-1000)."""
    tile_size = int(tile_size)
    if not 1 <= tile_size <= 4096:
        raise ValueError(f"tile size must be in [1, 4096], got {tile_size}")
    global TILE_ROWS
    TILE_ROWS = max(8, -(-tile_size // 8) * 8)


def _roll(x, shift, axis):
    # STATIC python-int shifts, lowered as concatenated slices: measured
    # 14-34% faster per sweep than tpu.dynamic_rotate (pltpu.roll) on v5e
    # (0.77 vs 1.17 us/sweep at 256^2, 13.8 vs 16.0 at 1024^2).  The
    # round-1 Mosaic compile hang attributed to static shifts was specific
    # to np.int32-TYPED shifts; bare python ints are fine.  Keep shifts
    # python ints — do NOT wrap them in np/jnp scalars.
    assert isinstance(shift, int)
    return jnp.roll(x, shift, axis)


def _dynamic_roll(x, shift, axis):  # kept for reference/fallback
    # pltpu.roll requires a non-negative shift; -1 == size-1 circularly.
    # The int32 cast matters twice over: under x64 a bare int becomes an i64
    # operand which tpu.dynamic_rotate rejects, and a static np.int32 shift
    # sends Mosaic down a path that hangs compilation (observed on v5e).
    return pltpu.roll(x, jnp.asarray(shift % x.shape[axis], jnp.int32), axis)


def _make_kernel(shape, omega, dx2_inv, dy2_inv, use_pltpu_roll,
                 warm_start=False, compute_dtype=jnp.float32):
    """Build the kernel body with all solver constants baked in.  With
    warm_start the kernel takes an extra d0 input and sweeps from it
    instead of zeros (the multigrid smoother).  `compute_dtype` lets the
    whole inner stage run in bfloat16 (Params.sor_inner_dtype)."""
    ni, nj = shape  # padded (i_max+2, j_max+2)
    coef = omega / (2.0 * (dx2_inv + dy2_inv))
    roll = _roll if use_pltpu_roll else jnp.roll

    def make_masks():
        # Built inside the kernel: pallas kernels cannot capture array
        # constants.  (ii + jj) equals the reference's global (i + j) parity
        # (main.cu:490): padded index == 1-based global index.
        ii = lax.broadcasted_iota(jnp.int32, shape, 0)
        jj = lax.broadcasted_iota(jnp.int32, shape, 1)
        interior = (ii >= 1) & (ii <= ni - 2) & (jj >= 1) & (jj <= nj - 2)
        par = (ii + jj) & 1  # cheap parity; Mosaic lowers & natively
        red = interior & (par == 0)
        black = interior & (par == 1)
        # Neumann BC folded into a per-cell self-coefficient: the ghost
        # neighbor of a boundary-adjacent cell equals the cell itself (the
        # reference refills the ghost ring every half-sweep to achieve this,
        # integration.c:138-146 / main.cu:686).  The rolled ghost ring
        # contributes zero, and `self_coef * d` adds the missing neighbor(s).
        ct = compute_dtype
        self_coef = (
            ((ii == 1).astype(ct) + (ii == ni - 2).astype(ct)) * dx2_inv
            + ((jj == 1).astype(ct) + (jj == nj - 2).astype(ct)) * dy2_inv
        )
        return red, black, self_coef

    def half_sweep(d, rhs, mask, self_coef):
        nb = (
            (roll(d, 1, 0) + roll(d, -1, 0)) * dx2_inv
            + (roll(d, 1, 1) + roll(d, -1, 1)) * dy2_inv
            + d * self_coef
        )
        d_new = (1.0 - omega) * d + coef * (nb - rhs)
        return jnp.where(mask, d_new, d)

    def kernel(ns_ref, rhs_ref, *rest):
        d0_ref, out_ref = (rest if warm_start else (None, rest[0]))
        rhs = rhs_ref[:]
        red, black, self_coef = make_masks()

        def sweep(_, d):
            d = half_sweep(d, rhs, red, self_coef)
            d = half_sweep(d, rhs, black, self_coef)
            return d

        init = d0_ref[:] if warm_start else jnp.zeros_like(rhs)
        out_ref[:] = lax.fori_loop(0, ns_ref[0], sweep, init)

    return kernel


@functools.partial(jax.jit, static_argnames=("shape", "omega", "dx2_inv",
                                             "dy2_inv", "interpret"))
def _warm_sweeps_call(n_sweeps, rhs, d0, *, shape, omega, dx2_inv, dy2_inv,
                      interpret):
    kernel = _make_kernel(shape, omega, dx2_inv, dy2_inv,
                          use_pltpu_roll=not interpret, warm_start=True)
    # the warm variant carries an extra resident input (d0) -> bigger stack;
    # exact bytes (a floor-to-MiB here once under-granted what the mg level
    # gate admitted, failing compilation on e.g. 896^2)
    per_array = shape[0] * -(-shape[1] // 128) * 128 * 4
    limit = max(24 << 20, 16 * per_array)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit),
            interpret=interpret,
        )(n_sweeps, rhs, d0)


def warm_sweeps(p, rhs, n_sweeps, omega, dx2_inv, dy2_inv):
    """n_sweeps red-black sweeps from initial p (the MG smoother fast path).
    Caller guarantees the padded shape fits VMEM."""
    interpret = jax.default_backend() != "tpu"
    ns = jnp.asarray(n_sweeps, jnp.int32).reshape(1)
    return _warm_sweeps_call(
        ns, rhs.astype(jnp.float32), p.astype(jnp.float32),
        shape=p.shape, omega=float(omega), dx2_inv=float(dx2_inv),
        dy2_inv=float(dy2_inv), interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("shape", "omega", "dx2_inv",
                                             "dy2_inv", "interpret", "dtype"))
def _sweeps_call(n_sweeps, rhs_neg, *, shape, omega, dx2_inv, dy2_inv,
                 interpret, dtype="float32"):
    compute_dtype = jnp.dtype(dtype)
    kernel = _make_kernel(shape, omega, dx2_inv, dy2_inv,
                          use_pltpu_roll=not interpret,
                          compute_dtype=compute_dtype)
    # v5e has far more physical VMEM than the 16 MB scoped default; size the
    # limit to the working set (delta + rhs + roll temps), in exact bytes.
    itemsize = compute_dtype.itemsize
    limit = max(16 << 20,
                12 * shape[0] * -(-shape[1] // 128) * 128 * itemsize)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, compute_dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit),
        interpret=interpret,
    )(n_sweeps, rhs_neg)


# ---------------------------------------------------------------------------
# Tiled variant for grids that do not fit VMEM whole.
#
# The grid is cut into row strips of B interior rows plus a 2K-deep halo on
# each side (axis 0 = x = sublane dimension; columns are never split, so the
# expensive lane-dimension neighbor rolls need no halo logic).  Each strip is
# DMA'd into VMEM once and swept K times before writing back: contamination
# from the stale strip edges advances one row per half-sweep, so a 2K halo
# keeps the written B rows exact — the strips of one chunk are therefore
# INDEPENDENT (they all read the pre-chunk snapshot), unlike the reference's
# CUDA tiles which re-synchronize through global memory every half-sweep
# (main.cu:684-698).  HBM traffic: ~3 passes per K sweeps instead of the
# reference's 2 passes per half-sweep.
# ---------------------------------------------------------------------------

TILE_ROWS = 256          # B: interior rows written per strip
SWEEPS_PER_CHUNK = 8     # K: halo depth is 2K


def _make_tiled_kernel(ext_shape, tile_rows, halo, n_strips, i_max, j_max,
                       omega, dx2_inv, dy2_inv, use_pltpu_roll,
                       transport_dtype=jnp.float32):
    """Single-program kernel looping over row strips: DMA strip (B+2H, W)
    into VMEM, sweep ns times (ns <= halo/2, dynamic), DMA the central B rows
    back out.  Gridless because the axon remote-compile toolchain rejects
    gridded pallas kernels; all in-kernel integers are kept int32 (any i64
    sends the Mosaic convert lowering into infinite recursion — the kernel
    is therefore traced under jax.enable_x64(False))."""
    import numpy as np

    _, W = ext_shape
    B, H = tile_rows, halo
    coef = omega / (2.0 * (dx2_inv + dy2_inv))
    roll = _roll if use_pltpu_roll else jnp.roll
    f32 = jnp.float32
    td = transport_dtype

    def kernel(ns_ref, d_hbm, rhs_hbm, out_hbm):
        def body(d_t, rhs_t, o_t, sem_d, sem_r, sem_o):
            jj = lax.broadcasted_iota(jnp.int32, (B + 2 * H, W), 1)
            tt = lax.broadcasted_iota(jnp.int32, (B + 2 * H, W), 0)
            j_int = (jj >= 1) & (jj <= j_max)
            j_edge = ((jj == 1).astype(f32) + (jj == j_max).astype(f32)) * dy2_inv

            def strip(s, carry):
                row0 = s * np.int32(B)  # ext-layout start row of the window
                load_d = pltpu.make_async_copy(
                    d_hbm.at[pl.ds(row0, B + 2 * H)], d_t, sem_d)
                load_r = pltpu.make_async_copy(
                    rhs_hbm.at[pl.ds(row0, B + 2 * H)], rhs_t, sem_r)
                load_d.start()
                load_r.start()
                load_d.wait()
                load_r.wait()

                # Global padded-domain row of tile row t:  r = s*B + t - H
                # (ext layout stores core row r at ext row r + H).
                ii = tt + row0 - np.int32(H)
                interior = (ii >= 1) & (ii <= i_max) & j_int
                par = (ii + jj) & 1
                red = interior & (par == 0)
                black = interior & (par == 1)
                self_coef = (
                    ((ii == 1).astype(f32) + (ii == i_max).astype(f32))
                    * dx2_inv
                    + j_edge
                )

                rhs = rhs_t[:].astype(f32)

                def half(d, mask):
                    nb = (
                        (roll(d, 1, 0) + roll(d, -1, 0)) * dx2_inv
                        + (roll(d, 1, 1) + roll(d, -1, 1)) * dy2_inv
                        + d * self_coef
                    )
                    return jnp.where(
                        mask, (1.0 - omega) * d + coef * (nb - rhs), d)

                def sweep(_, d):
                    return half(half(d, red), black)

                d = lax.fori_loop(0, ns_ref[0], sweep, d_t[:].astype(f32))
                o_t[:] = d[H : H + B, :].astype(td)
                store = pltpu.make_async_copy(
                    o_t, out_hbm.at[pl.ds(row0, B)], sem_o)
                store.start()
                store.wait()
                return carry

            lax.fori_loop(np.int32(0), np.int32(n_strips), strip, np.int32(0))

        pl.run_scoped(
            body,
            pltpu.VMEM((B + 2 * H, W), td),
            pltpu.VMEM((B + 2 * H, W), td),
            pltpu.VMEM((B, W), td),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        )

    return kernel


def _make_tiled_kernel_db(ext_shape, tile_rows, halo, n_strips, i_max, j_max,
                          omega, dx2_inv, dy2_inv, use_pltpu_roll,
                          transport_dtype=jnp.float32):
    """Double-buffered strip kernel: strip s+1's HBM->VMEM loads are issued
    BEFORE strip s's sweeps run, and each strip's store drains while later
    strips compute (waited two strips behind, when its buffer is reused) —
    DMA and VPU work overlap instead of serializing as in the single-
    buffered variant.  Strips of one chunk all read the pre-chunk snapshot
    (2K-deep halos keep the written rows exact), so the prefetch has no
    read-after-write hazard by construction.  The strip loop is unrolled at
    trace time (n_strips is static), which also avoids dynamic buffer-slot
    indexing that Mosaic lowers poorly.

    `transport_dtype=bfloat16` halves the HBM traffic (the route's binding
    resource): strips travel HBM<->VMEM as bf16 and are up/down-cast around
    the f32 sweeps — the f64 refinement outer bounds the per-chunk rounding."""
    import numpy as np

    _, W = ext_shape
    B, H = tile_rows, halo
    coef = omega / (2.0 * (dx2_inv + dy2_inv))
    roll = _roll if use_pltpu_roll else jnp.roll
    f32 = jnp.float32
    td = transport_dtype

    def kernel(ns_ref, d_hbm, rhs_hbm, out_hbm):
        def body(d_t0, d_t1, r_t0, r_t1, o_t0, o_t1,
                 sd0, sd1, sr0, sr1, so0, so1):
            d_bufs, r_bufs, o_bufs = (d_t0, d_t1), (r_t0, r_t1), (o_t0, o_t1)
            sd, sr, so = (sd0, sd1), (sr0, sr1), (so0, so1)

            jj = lax.broadcasted_iota(jnp.int32, (B + 2 * H, W), 1)
            tt = lax.broadcasted_iota(jnp.int32, (B + 2 * H, W), 0)
            j_int = (jj >= 1) & (jj <= j_max)
            j_edge = ((jj == 1).astype(f32) + (jj == j_max).astype(f32)) \
                * dy2_inv

            def loads(s, slot):
                row0 = np.int32(s * B)
                ld = pltpu.make_async_copy(
                    d_hbm.at[pl.ds(row0, B + 2 * H)], d_bufs[slot], sd[slot])
                lr = pltpu.make_async_copy(
                    rhs_hbm.at[pl.ds(row0, B + 2 * H)], r_bufs[slot], sr[slot])
                return ld, lr

            def store(s, slot):
                return pltpu.make_async_copy(
                    o_bufs[slot], out_hbm.at[pl.ds(np.int32(s * B), B)],
                    so[slot])

            ld, lr = loads(0, 0)
            ld.start()
            lr.start()
            for s in range(n_strips):
                slot = s % 2
                ld, lr = loads(s, slot)  # same descriptors; wait for arrival
                ld.wait()
                lr.wait()
                if s + 1 < n_strips:
                    ld_n, lr_n = loads(s + 1, 1 - slot)
                    ld_n.start()
                    lr_n.start()

                ii = tt + np.int32(s * B - H)
                interior = (ii >= 1) & (ii <= i_max) & j_int
                par = (ii + jj) & 1
                red = interior & (par == 0)
                black = interior & (par == 1)
                self_coef = (
                    ((ii == 1).astype(f32) + (ii == i_max).astype(f32))
                    * dx2_inv + j_edge
                )
                rhs = r_bufs[slot][:].astype(f32)

                def half(d, mask):
                    nb = (
                        (roll(d, 1, 0) + roll(d, -1, 0)) * dx2_inv
                        + (roll(d, 1, 1) + roll(d, -1, 1)) * dy2_inv
                        + d * self_coef
                    )
                    return jnp.where(
                        mask, (1.0 - omega) * d + coef * (nb - rhs), d)

                def sweep(_, d):
                    return half(half(d, red), black)

                d = lax.fori_loop(0, ns_ref[0], sweep,
                                  d_bufs[slot][:].astype(f32))
                if s >= 2:
                    store(s - 2, slot).wait()  # buffer reuse fence
                o_bufs[slot][:] = d[H: H + B, :].astype(td)
                store(s, slot).start()
            for s in (n_strips - 2, n_strips - 1):
                if s >= 0:
                    store(s, s % 2).wait()

        pl.run_scoped(
            body,
            pltpu.VMEM((B + 2 * H, W), td), pltpu.VMEM((B + 2 * H, W), td),
            pltpu.VMEM((B + 2 * H, W), td), pltpu.VMEM((B + 2 * H, W), td),
            pltpu.VMEM((B, W), td), pltpu.VMEM((B, W), td),
            pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(()),
        )

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "ext_shape", "tile_rows", "halo", "i_max", "j_max",
    "omega", "dx2_inv", "dy2_inv", "interpret", "double_buffer", "transport"))
def _tiled_chunk_call(ns, d_ext, rhs_ext, *, ext_shape, tile_rows, halo,
                      i_max, j_max, omega, dx2_inv, dy2_inv, interpret,
                      double_buffer=True, transport="float32"):
    R, W = ext_shape  # R = S * tile_rows + 2 * halo
    S = (R - 2 * halo) // tile_rows
    td = jnp.dtype(transport)
    make = _make_tiled_kernel_db if double_buffer else _make_tiled_kernel
    kernel = make(ext_shape, tile_rows, halo, S,
                  i_max, j_max, omega, dx2_inv, dy2_inv,
                  use_pltpu_roll=not interpret, transport_dtype=td)
    B, H = tile_rows, halo
    n_bufs = (4 * (B + 2 * H) + 2 * B) if double_buffer \
        else (2 * (B + 2 * H) + B)
    # f32 sweep temporaries dominate the stack even with bf16 transport.
    scratch_mib = (n_bufs * W * 4 >> 20) + 1
    # XLA may place the (R-2H, W) result buffer on the VMEM stack alongside
    # the strip scratch; budget for both (observed OOM at 2048^2 otherwise).
    result_mib = ((R - 2 * halo) * W * td.itemsize >> 20) + 1
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            out_shape=jax.ShapeDtypeStruct((R - 2 * halo, W), td),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=min(
                    110, max(24, scratch_mib + result_mib + 8)) << 20,
            ),
            interpret=interpret,
        )(ns, d_ext, rhs_ext)


def vmem_bytes_required(params_or_shape, itemsize: int = 4) -> int:
    """Rough VMEM footprint: delta + rhs + one temp, tile-padded.  Accepts
    a Params or a raw (ni, nj) shape tuple (parallel/deep_halo.py passes a
    shard's extended-block shape) so the budget heuristic lives in exactly
    one place."""
    ni, nj = getattr(params_or_shape, "shape", params_or_shape)

    def pad(a, m):
        return -(-a // m) * m

    per_array = pad(ni, 8) * pad(nj, 128) * itemsize
    return 3 * per_array


def fits_in_vmem(params: Params, budget_bytes: int = 48 * 1024 * 1024,
                 itemsize: int = 4) -> bool:
    """Whole-grid kernel viability: v5e VMEM comfortably fits ~8 working
    arrays up to 1024^2 f32 (verified empirically); 2048^2 f32 does not
    compile and routes to the tiled kernel (bf16 halves the footprint)."""
    return vmem_bytes_required(params, itemsize) <= budget_bytes


def inner_sweeps_tiled(rhs_neg: jax.Array, n_sweeps, params: Params,
                       tile_rows: int = None,
                       sweeps_per_chunk: int = SWEEPS_PER_CHUNK,
                       double_buffer: bool = True) -> jax.Array:
    """K-sweep-chunked strip-tiled inner stage for large grids.  With
    Params.sor_inner_dtype = bfloat16 the strips travel HBM<->VMEM in bf16
    (half the traffic of the HBM-bound route); sweeps stay f32 in VMEM."""
    interpret = jax.default_backend() != "tpu"
    td = jnp.dtype(params.sor_inner_dtype)
    ni, nj = params.shape
    B, K = tile_rows or TILE_ROWS, sweeps_per_chunk
    H = 2 * K
    S = -(-ni // B)
    R = S * B
    # HBM->VMEM DMA slices must be 128-lane / 8-sublane (16 for bf16: packed
    # (16, 128) tiles) aligned; pad the width (junk columns are masked out of
    # every update and never read by valid cells).
    W = -(-nj // 128) * 128
    align = 8 * (4 // td.itemsize)
    assert (B + 2 * H) % align == 0 and B % align == 0, (
        f"tile_rows and tile_rows + 4*sweeps_per_chunk must be "
        f"{align}-aligned for {td} DMA slices")

    rhs_core = jnp.zeros((R, W), td).at[:ni, :nj].set(rhs_neg.astype(td))
    rhs_ext = jnp.pad(rhs_core, ((H, H), (0, 0)))

    kwargs = dict(
        ext_shape=(R + 2 * H, W), tile_rows=B, halo=H,
        i_max=params.i_max, j_max=params.j_max, omega=float(params.omega),
        dx2_inv=float(1.0 / (params.dx * params.dx)),
        dy2_inv=float(1.0 / (params.dy * params.dy)), interpret=interpret,
        double_buffer=double_buffer, transport=params.sor_inner_dtype,
    )

    n_sweeps = jnp.asarray(n_sweeps, jnp.int32)
    n_chunks = -(-n_sweeps // K)

    def chunk(c, d_core):
        ns = jnp.minimum(K, n_sweeps - c * K).astype(jnp.int32).reshape(1)
        d_ext = jnp.pad(d_core, ((H, H), (0, 0)))
        return _tiled_chunk_call(ns, d_ext, rhs_ext, **kwargs)

    d_core = lax.fori_loop(0, n_chunks, chunk, jnp.zeros((R, W), td))
    return d_core[:ni, :nj]


# >VMEM route selection.  The strip-tiled DMA kernel touches HBM ~3 passes
# per K sweeps vs the XLA roll formulation's many passes per sweep, but its
# in-kernel DMA throughput has varied wildly across tunnel sessions (round 1
# measured it 70x slower than XLA memory ops; this round the double-buffered
# kernel measures 3x FASTER than the XLA path at 2048^2: 62 vs 183 us/sweep).
# None = measure, don't guess: on the first >VMEM call for a given shape the
# two routes are raced head-to-head (jitted, latency-differenced timings)
# and the winner is cached.  Set True/False to force a route (tests do).
PREFER_TILED_DMA = None

_ROUTE_CACHE = {}

# On-disk route cache so fresh processes at 2048^2+ skip the multi-second
# race (keyed on shape, inner dtype, AND device kind — a route measured
# through the tunnel must not leak onto a directly-attached TPU).
ROUTE_CACHE_PATH = ".nsp_route_cache.json"


def _disk_route_key(params: Params) -> str:
    kind = jax.devices()[0].device_kind
    return f"{params.shape[0]}x{params.shape[1]}:{params.sor_inner_dtype}:{kind}"


def _load_disk_route_key(key: str):
    """Generic route-cache lookup (also used by ops/fft.py's DCT race)."""
    import json
    import os

    try:
        if os.path.exists(ROUTE_CACHE_PATH):
            with open(ROUTE_CACHE_PATH) as fh:
                return json.load(fh).get(key)
    except (OSError, ValueError):  # unreadable/corrupt cache: just re-race
        pass
    return None


def _store_disk_route_key(key: str, route: str) -> None:
    import json
    import os

    data = {}
    try:
        if os.path.exists(ROUTE_CACHE_PATH):
            with open(ROUTE_CACHE_PATH) as fh:
                data = json.load(fh)
    except (OSError, ValueError):
        data = {}  # corrupt/unreadable cache: overwrite with fresh data
    data[key] = route
    try:
        with open(ROUTE_CACHE_PATH, "w") as fh:
            json.dump(data, fh, indent=0)
    except OSError:  # read-only cwd etc.: cache stays in-memory
        pass


def _load_disk_route(params: Params):
    return _load_disk_route_key(_disk_route_key(params))


def _store_disk_route(params: Params, route: str) -> None:
    _store_disk_route_key(_disk_route_key(params), route)


def _pick_large_grid_route(params: Params) -> str:
    """'tiled' or 'xla' for grids that do not fit VMEM whole."""
    if PREFER_TILED_DMA is not None:
        return "tiled" if PREFER_TILED_DMA else "xla"
    key = (params.shape, params.sor_inner_dtype)
    if key in _ROUTE_CACHE:
        return _ROUTE_CACHE[key]
    if jax.default_backend() != "tpu":
        # Interpret-mode DMA is emulation; nothing to measure.
        _ROUTE_CACHE[key] = "xla"
        return "xla"
    import sys

    cached = _load_disk_route(params)
    if cached in ("tiled", "xla"):
        _ROUTE_CACHE[key] = cached
        print(f"[sor_kernel] >VMEM route for {key}: {cached} (cached)",
              file=sys.stderr)
        return cached
    import time as _time

    # Race AOT-COMPILED candidates with latency-differenced timings:
    #  * AOT (.lower().compile() on shape specs + direct Compiled calls on
    #    concrete numpy inputs) because the race usually fires while the
    #    caller is being TRACED — eager jnp ops would stage into that trace
    #    and ensure_compile_time_eval leaks concreteness into the pallas
    #    kernel bodies;
    #  * latency-differenced (time two sweep counts, divide the delta)
    #    because a single short dispatch is dominated by the tunnel's
    #    dispatch/fence latency (observed up to ~30 ms), not the work.
    import numpy as np

    rhs_spec = jax.ShapeDtypeStruct(params.shape, jnp.float32)
    n_spec = jax.ShapeDtypeStruct((), jnp.int32)
    # Candidates return one scalar so the fence (device_get — the only sync
    # that is both reliable through the tunnel and inert under an ambient
    # trace) transfers 4 bytes, not the field.
    tiled_c = jax.jit(
        lambda r, n: inner_sweeps_tiled(r, n, params)[1, 1]
    ).lower(rhs_spec, n_spec).compile()
    xla_c = jax.jit(
        lambda r, n: _roll_sweeps_xla(r, n, params)[1, 1]
    ).lower(rhs_spec, n_spec).compile()

    rhs = np.zeros(params.shape, np.float32)
    # Spread the two counts enough that the work delta (~hundreds of sweeps)
    # clearly exceeds the tunnel's multi-ms dispatch-latency jitter.
    n1, n2 = (np.int32(8 * SWEEPS_PER_CHUNK),
              np.int32(80 * SWEEPS_PER_CHUNK))

    def timings(fn):
        jax.device_get(fn(rhs, n1))  # warm both counts
        jax.device_get(fn(rhs, n2))

        def timed(n):
            best = float("inf")
            for _ in range(3):
                t0 = _time.perf_counter()
                jax.device_get(fn(rhs, n))
                best = min(best, _time.perf_counter() - t0)
            return best

        return timed(n1), timed(n2)

    def per_sweep(t1, t2):
        return (t2 - t1) / float(n2 - n1)

    tiled_t = timings(tiled_c)
    xla_t = timings(xla_c)
    t_tiled = per_sweep(*tiled_t)
    t_xla = per_sweep(*xla_t)
    race_degraded = t_tiled <= 0 or t_xla <= 0
    if race_degraded:
        # A tunnel stall during one timing makes the differenced delta
        # non-positive (observed: "tiled 0 us/sweep").  Differencing is
        # untrustworthy then — fall back to comparing the big-count raw
        # times, where the ~30 ms dispatch latency is a small fraction.
        print(f"[sor_kernel] route race differencing invalid "
              f"(tiled {t_tiled * 1e6:.0f}, xla {t_xla * 1e6:.0f} us/sweep);"
              f" comparing raw n2 times", file=sys.stderr)
        t_tiled = tiled_t[1] / float(n2)
        t_xla = xla_t[1] / float(n2)
    route = "tiled" if t_tiled < t_xla else "xla"
    _ROUTE_CACHE[key] = route
    # Persist only healthy-race results: a verdict reached during a tunnel
    # stall (differencing invalid) must not outlive this process, or every
    # future process would silently inherit a degraded-session choice.
    if not race_degraded:
        _store_disk_route(params, route)
    print(f"[sor_kernel] >VMEM route for {key}: {route} "
          f"(tiled {t_tiled * 1e6:.0f} us/sweep vs xla "
          f"{t_xla * 1e6:.0f} us/sweep)", file=sys.stderr)
    return route


def _roll_sweeps_xla(rhs_neg: jax.Array, n_sweeps, params: Params) -> jax.Array:
    """XLA fallback for grids larger than VMEM: the same roll + self-coef
    red-black formulation as the kernels, expressed as fused XLA ops (full
    HBM bandwidth, ~15 array passes per sweep).  Honors
    Params.sor_inner_dtype (bf16 halves the traffic of every pass)."""
    ni, nj = params.shape
    f32 = jnp.dtype(params.sor_inner_dtype)
    dx2_inv = jnp.asarray(1.0 / (params.dx * params.dx), f32)
    dy2_inv = jnp.asarray(1.0 / (params.dy * params.dy), f32)
    omega = jnp.asarray(params.omega, f32)
    coef = omega / (2.0 * (dx2_inv + dy2_inv))

    ii = lax.broadcasted_iota(jnp.int32, (ni, nj), 0)
    jj = lax.broadcasted_iota(jnp.int32, (ni, nj), 1)
    interior = (ii >= 1) & (ii <= ni - 2) & (jj >= 1) & (jj <= nj - 2)
    par = (ii + jj) % 2
    red = interior & (par == 0)
    black = interior & (par == 1)
    self_coef = (
        ((ii == 1).astype(f32) + (ii == ni - 2).astype(f32)) * dx2_inv
        + ((jj == 1).astype(f32) + (jj == nj - 2).astype(f32)) * dy2_inv
    )
    rhs = rhs_neg.astype(f32)

    def half(d, mask):
        nb = (
            (jnp.roll(d, 1, 0) + jnp.roll(d, -1, 0)) * dx2_inv
            + (jnp.roll(d, 1, 1) + jnp.roll(d, -1, 1)) * dy2_inv
            + d * self_coef
        )
        return jnp.where(mask, (1.0 - omega) * d + coef * (nb - rhs), d)

    def sweep(_, d):
        return half(half(d, red), black)

    return lax.fori_loop(0, jnp.asarray(n_sweeps, jnp.int32), sweep,
                         jnp.zeros((ni, nj), f32))


def inner_sweeps(rhs_neg: jax.Array, n_sweeps, params: Params) -> jax.Array:
    """Drop-in replacement for the refinement solver's inner stage: n_sweeps
    inner-dtype red-black sweeps on A delta = rhs_neg from delta = 0.
    Whole-grid-in-VMEM kernel when it fits; otherwise the strip-tiled DMA
    kernel (real hardware) or the XLA roll formulation (tunneled dev
    platform).  Params.sor_inner_dtype selects f32 (default) or bf16 sweeps.
    Route gating for bf16: the bf16 whole-grid kernel fails to COMPILE at
    1024^2 on v5e (Mosaic; 512^2 builds — docs/performance.md), so bf16
    takes the whole-grid route only up to the empirically-building size and
    the tiled/XLA routes (which carry bf16 as transport, f32 compute)
    beyond it."""
    inner_dtype = jnp.dtype(params.sor_inner_dtype)
    BF16_WHOLE_GRID_MAX_DIM = 514  # 512^2 padded: largest bf16 compile seen
    whole_grid_ok = fits_in_vmem(params) and (
        inner_dtype != jnp.bfloat16
        or max(params.shape) <= BF16_WHOLE_GRID_MAX_DIM
    )
    if not whole_grid_ok:
        if _pick_large_grid_route(params) == "tiled":
            return inner_sweeps_tiled(rhs_neg, n_sweeps, params)
        return _roll_sweeps_xla(rhs_neg, n_sweeps, params)
    if USE_COMPRESSED and params.shape[1] % 2 == 0:
        return inner_sweeps_compressed(rhs_neg, n_sweeps, params)
    interpret = jax.default_backend() != "tpu"
    ns = jnp.asarray(n_sweeps, jnp.int32).reshape(1)
    return _sweeps_call(
        ns,
        rhs_neg.astype(inner_dtype),
        shape=params.shape,
        omega=float(params.omega),
        dx2_inv=float(1.0 / (params.dx * params.dx)),
        dy2_inv=float(1.0 / (params.dy * params.dy)),
        interpret=interpret,
        dtype=params.sor_inner_dtype,
    )


# ---------------------------------------------------------------------------
# Color-compressed variant: red and black cells in separate (ni, nj/2)
# arrays.  The masked kernel computes every cell's stencil twice per sweep
# (once per color) and throws half away; here each half-sweep updates ALL
# elements of one compacted array — ~2x fewer vector ops per sweep.
#
# Index algebra (b = i & 1 is the row parity; nj even):
#   red[i, k]   = d[i, 2k + b]       black[i, k] = d[i, 2k + 1 - b]
#   red W/E neighbors  = black[i -/+ 1, k]          (pure sublane rolls!)
#   red N = black[i, k + b],   red S = black[i, k + b - 1]
#   black N = red[i, k + 1 - b], black S = red[i, k - b]
# so each half-sweep is 2 sublane rolls + 2 lane rolls + 2 row-parity
# selects on half-width data.  Compression/decompression happens in XLA
# outside the kernel (strided lane ops are cheap there, amortized over K
# sweeps).
# ---------------------------------------------------------------------------


def _compress_colors(full):
    """full (ni, nj even) -> (red, black) of shape (ni, nj//2)."""
    ni, nj = full.shape
    even_j = full[:, 0::2]
    odd_j = full[:, 1::2]
    row_odd = (jnp.arange(ni, dtype=jnp.int32) & 1).astype(bool)[:, None]
    red = jnp.where(row_odd, odd_j, even_j)
    black = jnp.where(row_odd, even_j, odd_j)
    return red, black


def _decompress_colors(red, black):
    ni, njc = red.shape
    row_odd = (jnp.arange(ni, dtype=jnp.int32) & 1).astype(bool)[:, None]
    even_j = jnp.where(row_odd, black, red)
    odd_j = jnp.where(row_odd, red, black)
    return jnp.stack([even_j, odd_j], axis=-1).reshape(ni, 2 * njc)


def _make_compressed_kernel(shape, omega, dx2_inv, dy2_inv, use_pltpu_roll):
    """Kernel over compacted color arrays; shape = full padded (ni, nj)."""
    ni, nj = shape
    njc = nj // 2
    coef = omega / (2.0 * (dx2_inv + dy2_inv))
    roll = _roll if use_pltpu_roll else jnp.roll
    f32 = jnp.float32

    def cell_meta(is_red):
        """(interior_mask, self_coef) for a compacted color array."""
        ii = lax.broadcasted_iota(jnp.int32, (ni, njc), 0)
        kk = lax.broadcasted_iota(jnp.int32, (ni, njc), 1)
        b = ii & 1
        jj = 2 * kk + (b if is_red else 1 - b)
        interior = (ii >= 1) & (ii <= ni - 2) & (jj >= 1) & (jj <= nj - 2)
        self_coef = (
            ((ii == 1).astype(f32) + (ii == ni - 2).astype(f32)) * dx2_inv
            + ((jj == 1).astype(f32) + (jj == nj - 2).astype(f32)) * dy2_inv
        )
        row_odd = b == 1
        return interior, self_coef, row_odd

    def kernel(ns_ref, rhs_r_ref, rhs_b_ref, red_ref, black_ref):
        rhs_r = rhs_r_ref[:]
        rhs_b = rhs_b_ref[:]
        int_r, sc_r, row_odd = cell_meta(True)
        int_b, sc_b, _ = cell_meta(False)

        def update(tgt, other, rhs, interior, self_coef, n_sel, s_sel):
            we = (roll(other, 1, 0) + roll(other, -1, 0)) * dx2_inv
            o_m = roll(other, 1, 1)   # k-1
            o_p = roll(other, -1, 1)  # k+1
            nth = jnp.where(n_sel, o_p, other)
            sth = jnp.where(s_sel, other, o_m)
            nb = we + (nth + sth) * dy2_inv + tgt * self_coef
            new = (1.0 - omega) * tgt + coef * (nb - rhs)
            return jnp.where(interior, new, tgt)

        def sweep(_, carry):
            red, black = carry
            # red N = black[k + b]  -> k+1 on odd rows; S = black[k + b - 1]
            red = update(red, black, rhs_r, int_r, sc_r,
                         n_sel=row_odd, s_sel=row_odd)
            # black N = red[k + 1 - b] -> k+1 on even rows; S = red[k - b]
            black = update(black, red, rhs_b, int_b, sc_b,
                           n_sel=~row_odd, s_sel=~row_odd)
            return red, black

        zero = jnp.zeros((ni, njc), f32)
        red, black = lax.fori_loop(0, ns_ref[0], sweep, (zero, zero))
        red_ref[:] = red
        black_ref[:] = black

    return kernel


@functools.partial(jax.jit, static_argnames=("shape", "omega", "dx2_inv",
                                             "dy2_inv", "interpret"))
def _compressed_sweeps_call(n_sweeps, rhs_neg, *, shape, omega, dx2_inv,
                            dy2_inv, interpret):
    ni, nj = shape
    rhs_r, rhs_b = _compress_colors(rhs_neg.astype(jnp.float32))
    kernel = _make_compressed_kernel(shape, omega, dx2_inv, dy2_inv,
                                     use_pltpu_roll=not interpret)
    limit = max(16, 12 * (ni * -(-nj // 128) * 128 * 4 >> 20)) << 20
    out = jax.ShapeDtypeStruct((ni, nj // 2), jnp.float32)
    with jax.enable_x64(False):
        red, black = pl.pallas_call(
            kernel,
            out_shape=(out, out),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit),
            interpret=interpret,
        )(n_sweeps, rhs_r, rhs_b)
    return _decompress_colors(red, black)


# MEASURED NEGATIVE RESULT (kept for the record): the compressed kernel is
# bit-exact but NOT faster on TPU (6.5 vs 6.3 us/sweep at 256^2).  Vector
# ops process whole 128-lane vregs, and ceil(nj/2/128) * 2 >= ceil(nj/128):
# halving the elements does not halve the vregs, so the masked kernel's
# "compute both colors, select one" waste is already free.  The classic
# GPU/CPU red-black compaction does not transfer to TPU's wide-vreg model.
USE_COMPRESSED = False


def inner_sweeps_compressed(rhs_neg, n_sweeps, params: Params):
    interpret = jax.default_backend() != "tpu"
    ns = jnp.asarray(n_sweeps, jnp.int32).reshape(1)
    return _compressed_sweeps_call(
        ns, rhs_neg,
        shape=params.shape,
        omega=float(params.omega),
        dx2_inv=float(1.0 / (params.dx * params.dx)),
        dy2_inv=float(1.0 / (params.dy * params.dy)),
        interpret=interpret,
    )
