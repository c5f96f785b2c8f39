"""Bisect the 2048^2 SHARDED step worker crash on the axon tunnel.

Round-4 finding (docs/performance.md "Sharded pallas_sor on the real
chip"): at 2048^2 BOTH sharded parity variants — the per-shard VMEM
pallas kernel AND the jnp deep-halo inner — crash the tunneled TPU
worker within ~2.5 min ("kernel fault", the 4096^2-mg fault family),
while the same programs run clean at 1024^2 and the single-chip 2048^2
parity run is a committed headline (232 s).  This script mirrors
scripts/repro_4096_mg.py: one subprocess per variant (the crash kills
the worker; the next process recovers), incremental JSON so a mid-bisect
outage keeps earlier outcomes.

Variants (1x1 mesh — the only real-chip mesh — unless noted):

  inner_jnp       sharded deep-halo jnp rb_sor pressure solves only, on
                  a fixed physical rhs (is the INNER the trigger?)
  inner_pallas    same with the per-shard VMEM kernel route forced
  step_jnp        full sharded time steps, jnp inner (stepper, one
                  dispatch per step)
  step_pallas     full sharded time steps, pallas inner (the round-4
                  crash configuration)
  step_half       full sharded pallas steps at 2048x1024 (size bisect)
  step_k256       step_pallas with sor_refine_every=256 (more f64 outer
                  passes per step — outer-pass involvement probe)
  step_fft        full sharded steps, pencil-fft inner (control:
                  measured crash-free 0.92 s in round 3's burst)

Usage:
  python scripts/repro_2048_sharded.py                  # all variants
  python scripts/repro_2048_sharded.py --variants step_pallas
  python scripts/repro_2048_sharded.py --worker step_jnp  # in-process
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _platform import apply_platform_override  # noqa: E402

VARIANTS = ["inner_jnp", "inner_pallas", "step_jnp", "step_pallas",
            "step_half", "step_k256", "step_fft"]


def _params(variant, n):
    from navierstokes_parallel_tpu.config import Params

    j = n // 2 if variant == "step_half" else n
    kw = {}
    if variant == "step_k256":
        kw["sor_refine_every"] = 256
    else:
        kw["sor_refine_every"] = 2048
    return Params(problem=1, i_max=n, j_max=j, a=1.0, b=1.0, T=1e9,
                  Re=1000.0, tau=1.0, omega=1.7, epsilon=1e-4,
                  max_it=20000, dtype="float32", **kw)


def _method(variant):
    if variant == "step_fft":
        return "fft"
    if "jnp" in variant:
        return "rb_sor"
    return "pallas_sor"


def run_worker(variant, n, steps):
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from navierstokes_parallel_tpu.grid import allocate_state
    from navierstokes_parallel_tpu.parallel import sharded
    from navierstokes_parallel_tpu.parallel.topology import MESH_AXES
    from navierstokes_parallel_tpu.utils.timing import device_fence

    params = _params(variant, n)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), MESH_AXES)
    state = allocate_state(params)

    if variant.startswith("inner_"):
        # Pressure solves only: run the sharded step once to get a
        # physical p/rhs pairing, then repeat ONLY the pressure stage by
        # pinning max_it-bound solves from the evolving p (each dispatch
        # is one full parity solve — the same inner program the step
        # runs, without momentum/projection/BC code in the program).
        from jax.sharding import PartitionSpec as P

        shard_map = sharded.shard_map

        from navierstokes_parallel_tpu.ops import boundary, momentum

        @jax.jit
        def make_rhs(s):
            u, v = boundary.apply_cavity_bcs(
                s.u, s.v, jnp.asarray(1.0, s.u.dtype))
            dt, gamma = momentum.adaptive_dt_gamma(u, v, params)
            F, G = momentum.compute_fg(u, v, dt, gamma, params)
            return momentum.compute_rhs(F, G, dt, params)

        rhs = np.asarray(make_rhs(state))
        li, lj = params.i_max, params.j_max

        def local(p_blk, rhs_blk):
            valid, gi, gj = sharded._valid_mask_or_none(params, li, lj)
            res = sharded._sharded_pressure_solve(
                p_blk, rhs_blk, params, _method(variant), li, lj,
                valid, gi, gj)
            return res.p, res.iterations

        spec = P(*MESH_AXES)
        fn = jax.jit(shard_map(local, mesh=mesh, in_specs=(spec, spec),
                               out_specs=(spec, P()), check_vma=False))
        dims = (1, 1, li, lj)
        p_b = sharded._put_blocks(
            sharded._scatter_blocks(state.p, *dims),
            sharded.grid_sharding(mesh))
        rhs_b = sharded._put_blocks(
            sharded._scatter_blocks(rhs, *dims),
            sharded.grid_sharding(mesh))
        for i in range(steps):
            t0 = time.perf_counter()
            p_b, iters = fn(p_b, rhs_b)
            device_fence(iters)
            print(f"step {i}: {time.perf_counter() - t0:.2f}s "
                  f"it={int(iters)}", flush=True)
        return

    stepper = sharded.ShardedStepper(params, state, mesh=mesh,
                                     pressure_method=_method(variant))
    for i in range(steps):
        t0 = time.perf_counter()
        diag = stepper.step()
        device_fence(diag.sor_res_norm)
        print(f"step {i}: {time.perf_counter() - t0:.2f}s "
              f"it={int(diag.sor_iterations)}", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", default=None, choices=VARIANTS)
    ap.add_argument("--variants", nargs="*", default=VARIANTS)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--timeout", type=int, default=2400)
    ap.add_argument("--out", default="artifacts/repro_2048_sharded.json")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    if args.worker:
        apply_platform_override()
        run_worker(args.worker, args.n, args.steps)
        return 0

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            results = json.load(fh).get("variants", {})
    for variant in args.variants:
        print(f"=== {variant} (n={args.n}, {args.steps} steps, "
              f"timeout {args.timeout}s)", flush=True)
        t0 = time.time()
        try:
            cmd = [sys.executable, os.path.abspath(__file__), "--worker",
                   variant, "--n", str(args.n), "--steps", str(args.steps)]
            if args.platform:
                cmd += ["--platform", args.platform]
            env = dict(os.environ)
            # The production guard (sharded._check_method) refuses exactly
            # the configurations this script exists to reproduce.
            env["NSP_ALLOW_SHARDED_PARITY_2048"] = "1"
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=args.timeout,
                env=env)
            rc = proc.returncode
            out = proc.stdout
            err = proc.stderr[-2000:]
        except subprocess.TimeoutExpired as e:
            rc, out, err = "timeout", (e.stdout or b"").decode(
                errors="replace") if isinstance(e.stdout, bytes) else (
                e.stdout or ""), "timeout"
        steps_done = out.count("step ")
        status = ("ok" if rc == 0 else
                  "timeout" if rc == "timeout" else f"crash rc={rc}")
        results[variant] = {
            "status": status, "steps_completed": steps_done,
            "wall_s": round(time.time() - t0, 1),
            "last_line": out.strip().splitlines()[-1] if out.strip() else "",
            "stderr_tail": err.strip().splitlines()[-3:],
        }
        print(f"    -> {status} ({steps_done}/{args.steps} steps, "
              f"{results[variant]['wall_s']}s)", flush=True)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump({"n": args.n, "steps": args.steps,
                       "variants": results}, fh, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
