"""Gradient-based flow control demo on the differentiable solver path.

Inverse problem: recover the lid speed that produced an observed cavity
flow.  A "truth" run at lid_scale = s* generates a target mid-plane u
profile; starting from s = 0.4 we descend jax.grad of the profile
mismatch THROUGH the full n-step integration (adjoint pressure solves,
rematerialized scan — navierstokes_parallel_tpu/diff.py).  Nothing in
the reference's C/CUDA could express this: the gradient traverses every
donor-cell stencil, BC application, and converged Poisson solve.

Writes artifacts/optimize_lid.csv (iter, lid_scale, loss, grad) and
prints the recovered scale.  Pure CPU by default (runs anywhere);
--platform axon runs it on the TPU.

Usage: python scripts/optimize_lid.py [--n 32] [--steps 20] [--iters 12]
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32, help="grid size")
    ap.add_argument("--steps", type=int, default=20,
                    help="time steps per evaluation")
    ap.add_argument("--iters", type=int, default=12,
                    help="gradient-descent iterations")
    ap.add_argument("--target-scale", type=float, default=1.3)
    ap.add_argument("--init-scale", type=float, default=0.4)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--out", default="artifacts/optimize_lid.csv")
    args = ap.parse_args(argv)

    import jax

    # CPU by default so the demo runs anywhere; JAX_PLATFORMS=axon is
    # pinned by the env, so only jax.config overrides it (CLAUDE.md).
    jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from navierstokes_parallel_tpu import diff
    from navierstokes_parallel_tpu.config import Params
    from navierstokes_parallel_tpu.grid import allocate_state

    params = Params(problem=1, i_max=args.n, j_max=args.n, a=1.0, b=1.0,
                    T=1.0, Re=100.0, tau=0.5, omega=1.7, epsilon=1e-7,
                    max_it=20000, dtype="float64")
    state = allocate_state(params)
    base = diff.default_controls(params)

    def midplane_u(lid_scale):
        c = base._replace(lid_scale=jnp.asarray(lid_scale, jnp.float64))
        final, _ = diff.solve_n_steps(params, state, args.steps, controls=c)
        return final.u[params.i_max // 2, 1:-1]

    target = midplane_u(args.target_scale)

    @jax.jit
    def loss_and_grad(s):
        def loss(s):
            return jnp.sum((midplane_u(s) - target) ** 2)

        return jax.value_and_grad(loss)(s)

    s = jnp.asarray(args.init_scale, jnp.float64)
    lr = 0.5
    rows = []
    for it in range(args.iters):
        val, g = loss_and_grad(s)
        rows.append((it, float(s), float(val), float(g)))
        print(f"iter {it:2d}: lid_scale={float(s):.6f} "
              f"loss={float(val):.3e} grad={float(g):+.3e}")
        # Plain GD suffices: the 1D loss is near-quadratic in lid_scale.
        s = s - lr * g
    val, g = loss_and_grad(s)
    rows.append((args.iters, float(s), float(val), float(g)))
    print(f"final  : lid_scale={float(s):.6f} loss={float(val):.3e} "
          f"(target {args.target_scale})")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["iter", "lid_scale", "loss", "grad"])
        w.writerows(rows)
    print(f"wrote {args.out}")

    err = abs(float(s) - args.target_scale)
    if err > 0.02:
        print(f"WARNING: did not recover the target scale (err {err:.3f})",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
