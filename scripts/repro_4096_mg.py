"""Bisect the 4096^2 multigrid TIME-STEP worker crash on the axon tunnel.

Round-3 finding (CLAUDE.md): the COMBINED 4096^2 mg step program crashes
the remote TPU worker ("kernel fault") across every dispatch variant
tried, while isolated 4096^2 mg pressure solves repeat cleanly and
fft-method 4096^2 steps run fine.  This script bisects the step program
into its pieces, each run in its OWN SUBPROCESS (the crash kills the
worker; the next process recovers), and records pass/crash per variant —
the minimized-repro artifact the round-3 verdict asked for (item 5).

Variants (each does per-step single dispatches, warm jit, N repeats):

  solve           mg pressure solve on a fixed physical rhs (control —
                  measured clean in round 3)
  momentum        dt + BCs + momentum F/G/rhs, NO pressure solve
  momentum_solve  momentum-derived rhs -> mg solve, NO projection
                  (u, v never change; p evolves)
  project         full step MINUS the velocity projection update
                  (solve runs, projection computed but discarded)
  full            the complete mg time step (expected crash)
  full_half       the complete step at 4096x2048
  full_f32        full step with sor_refine_every=0 disabled f64 outer
                  (pure f32 mg — isolates the f64-emulation outer)

Driver mode runs every variant via subprocess with a timeout and writes
artifacts/repro_4096_mg.json incrementally (a mid-bisect tunnel outage
keeps earlier outcomes).

Usage:
  python scripts/repro_4096_mg.py                  # driver: all variants
  python scripts/repro_4096_mg.py --variants full solve
  python scripts/repro_4096_mg.py --worker full    # one variant, in-process
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _platform import apply_platform_override  # noqa: E402

VARIANTS = ["solve", "momentum", "momentum_solve", "project", "full",
            "full_half", "full_f32"]


def _params(variant, n):
    from navierstokes_parallel_tpu.config import Params

    j = n // 2 if variant == "full_half" else n
    kw = {}
    if variant == "full_f32":
        kw["sor_refine_every"] = 0
    return Params(problem=1, i_max=n, j_max=j, a=1.0, b=1.0, T=1e9,
                  Re=1000.0, tau=1.0, omega=1.7, epsilon=1e-4,
                  max_it=20000, dtype="float32", **kw)


def run_worker(variant, n, steps):
    import jax

    jax.config.update("jax_enable_x64", True)  # mg's f64 master
    import jax.numpy as jnp

    from navierstokes_parallel_tpu.grid import allocate_state
    from navierstokes_parallel_tpu.ops import boundary, momentum, sor
    from navierstokes_parallel_tpu.utils.timing import device_fence

    params = _params(variant, n)
    state = allocate_state(params)

    if variant == "solve":
        # Physical rhs from one momentum evaluation, then repeated solves
        # from the previous p (matches the round-3 isolated-solve runs).
        @jax.jit
        def make_rhs(s):
            u, v = boundary.apply_cavity_bcs(s.u, s.v, jnp.asarray(1.0, s.u.dtype))
            dt, gamma = momentum.adaptive_dt_gamma(u, v, params)
            F, G = momentum.compute_fg(u, v, dt, gamma, params)
            return momentum.compute_rhs(F, G, dt, params)

        rhs = make_rhs(state)

        @jax.jit
        def body(p):
            return sor.solve_pressure(p, rhs, params, method="mg").p

        carry = state.p
        for i in range(steps):
            t0 = time.perf_counter()
            carry = body(carry)
            device_fence(carry)
            print(f"step {i}: {time.perf_counter() - t0:.2f}s", flush=True)
        return

    if variant == "momentum":
        @jax.jit
        def body(s):
            u, v = s.u, s.v
            dt, gamma = momentum.adaptive_dt_gamma(u, v, params)
            lid = boundary.lid_velocity(params.problem, params.f, s.t)
            u, v = boundary.apply_cavity_bcs(u, v, lid)
            F, G = momentum.compute_fg(u, v, dt, gamma, params)
            rhs = momentum.compute_rhs(F, G, dt, params)
            # Feed rhs back into u so every dispatch does fresh work.
            return s._replace(u=u + 0.0 * rhs, v=v, t=s.t + dt)

        carry = state
        for i in range(steps):
            t0 = time.perf_counter()
            carry = body(carry)
            device_fence(carry.u)
            print(f"step {i}: {time.perf_counter() - t0:.2f}s", flush=True)
        return

    if variant in ("momentum_solve", "project", "full", "full_half",
                   "full_f32"):
        from navierstokes_parallel_tpu import solver

        if variant in ("full", "full_half", "full_f32"):
            fn = solver.make_step_fn(params, "mg")

            carry = state
            for i in range(steps):
                t0 = time.perf_counter()
                carry, diag = fn(carry)
                device_fence(carry.p)
                print(f"step {i}: {time.perf_counter() - t0:.2f}s "
                      f"it={int(diag.sor_iterations)}", flush=True)
            return

        @jax.jit
        def body(s):
            u, v = s.u, s.v
            dt, gamma = momentum.adaptive_dt_gamma(u, v, params)
            lid = boundary.lid_velocity(params.problem, params.f, s.t)
            u, v = boundary.apply_cavity_bcs(u, v, lid)
            F, G = momentum.compute_fg(u, v, dt, gamma, params)
            rhs = momentum.compute_rhs(F, G, dt, params)
            res = sor.solve_pressure(s.p, rhs, params, method="mg")
            if variant == "project":
                un, vn = momentum.project_velocities(u, v, F, G, res.p, dt,
                                                     params)
                # Computed but discarded: p evolves, velocities do not.
                un = u + 0.0 * un
                vn = v + 0.0 * vn
            else:
                un, vn = u, v
            return s._replace(u=un, v=vn, p=res.p, t=s.t + dt)

        carry = state
        for i in range(steps):
            t0 = time.perf_counter()
            carry = body(carry)
            device_fence(carry.p)
            print(f"step {i}: {time.perf_counter() - t0:.2f}s", flush=True)
        return

    raise SystemExit(f"unknown variant {variant}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", default=None, choices=VARIANTS)
    ap.add_argument("--variants", nargs="*", default=VARIANTS)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--timeout", type=int, default=1500)
    ap.add_argument("--out", default="artifacts/repro_4096_mg.json")
    ap.add_argument("--platform", default=None,
                    help="jax platform override (e.g. cpu) — the axon "
                         "pin ignores JAX_PLATFORMS")
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
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=args.timeout)
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
