"""Checkpoint / resume.

The reference has none (SURVEY.md §5: its n_print output path is commented
out and there is no restart capability).  We store the full solver state —
u, v, p, t, n — as a compressed .npz; `load_checkpoint` validates the grid
shape against the active config so a checkpoint cannot silently resume onto
the wrong resolution.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import Params
from ..grid import State


def save_checkpoint(path: str, state) -> None:
    """State, ThermalState (problem 5 carries the temperature field), or a
    free-surface view (problem 6 additionally carries the marker-particle
    set as px/py/pactive)."""
    fields = dict(
        u=np.asarray(state.u),
        v=np.asarray(state.v),
        p=np.asarray(state.p),
        t=np.asarray(state.t),
        n=np.asarray(state.n),
    )
    if hasattr(state, "T"):
        fields["T"] = np.asarray(state.T)
    if hasattr(state, "pset"):
        fields["px"] = np.asarray(state.pset.x)
        fields["py"] = np.asarray(state.pset.y)
        fields["pactive"] = np.asarray(state.pset.active)
    np.savez_compressed(path, **fields)


def load_checkpoint(path: str, params: Params):
    """State, ThermalState when params.problem == 5 (the checkpoint must
    then carry the temperature field — a thermal run cannot resume from an
    isothermal checkpoint), or FreeSurfaceState when params.problem == 6
    (must carry the marker particles)."""
    with np.load(path) as data:
        u, v, p = data["u"], data["v"], data["p"]
        t, n = data["t"], data["n"]
        temp = data["T"] if "T" in data else None
        pset = ((data["px"], data["py"], data["pactive"])
                if "px" in data else None)
    if p.shape != params.shape:
        raise ValueError(
            f"checkpoint grid {p.shape} does not match config grid {params.shape}"
        )
    dtype = params.jnp_dtype
    base = State(
        u=jnp.asarray(u, dtype),
        v=jnp.asarray(v, dtype),
        p=jnp.asarray(p, dtype),
        t=jnp.asarray(t, dtype),
        n=jnp.asarray(n, jnp.int32),
    )
    if params.problem == 6:
        if pset is None:
            raise ValueError(
                f"checkpoint {path!r} has no particle set — it was written "
                "by a non-free-surface run and cannot resume problem 6")
        from ..models.freesurface import FreeSurfaceState
        from ..particles import ParticleSet

        # Particle coordinates keep the solve-time float64 (positions are
        # advected in the x64 path regardless of the field dtype).
        return FreeSurfaceState(
            state=base,
            pset=ParticleSet(x=jnp.asarray(pset[0]),
                             y=jnp.asarray(pset[1]),
                             active=jnp.asarray(pset[2], bool)),
        )
    if params.problem == 5:
        if temp is None:
            raise ValueError(
                f"checkpoint {path!r} has no temperature field — it was "
                "written by an isothermal run and cannot resume problem 5")
        from ..models.convection import ThermalState

        return ThermalState(
            u=jnp.asarray(u, dtype),
            v=jnp.asarray(v, dtype),
            p=jnp.asarray(p, dtype),
            T=jnp.asarray(temp, dtype),
            t=jnp.asarray(t, dtype),
            n=jnp.asarray(n, jnp.int32),
        )
    # The opposite mismatch of the errors above: a problem-1..4 resume
    # from a thermal / free-surface checkpoint would silently drop state
    # fields — almost certainly a config/checkpoint mix-up, so warn.
    dropped = [name for name, extra in (("T", temp), ("particles", pset))
               if extra is not None]
    if dropped:
        import sys

        print(f"warning: checkpoint {path!r} carries {'/'.join(dropped)} "
              f"that problem {params.problem} will discard — resuming as "
              "an isothermal single-phase run", file=sys.stderr)
    return base
