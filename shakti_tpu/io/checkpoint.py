"""Checkpoint / resume.

The reference writes history checkpoints for live plotting but CANNOT resume
a run (SURVEY §5: "write-only checkpoints, no resume" — reference
solvers.py:217-223).  Here a checkpoint is the full marching state plus loop
counters, so a preempted run continues bit-exactly where it stopped.
"""

from __future__ import annotations

import os
import zlib

import numpy as np

from shakti_tpu.solve.timestep import State

CHECKPOINT_FILE = "checkpoint.npz"


def mesh_fingerprint(nodes) -> int:
    """Cheap mesh identity: crc32 of the node coordinates.  Two meshes with
    the same node count but different geometry/ordering get different
    fingerprints, so a resume into the wrong results dir fails loudly
    instead of silently misassigning nodal state."""
    a = np.ascontiguousarray(np.asarray(nodes, dtype=np.float64))
    return zlib.crc32(a.tobytes()) & 0xFFFFFFFF


def save_state(results_dir: str, state: State, next_step: int, next_row: int,
               fingerprint: int | None = None, include_lag: bool = True):
    """``include_lag=False`` omits the carried-operator tuple (a
    recomputable optimization cache that dominates checkpoint volume —
    the flagship's block-ELL carry is ~69 MB vs ~0.3 MB of marching
    state, pulled through the device link and written to disk at every
    rolling checkpoint).  The run layer passes False for ROLLING (crash
    insurance) checkpoints and True for the final one, so a planned
    resume — continuing from a completed solve() — replays bit-exactly,
    while resuming from a mid-run crash checkpoint reseeds the carry
    (first resumed step rebuilds instead of reusing; converges to the
    same solution through a possibly different iteration path)."""
    path = os.path.join(results_dir, CHECKPOINT_FILE)
    tmp = path + ".tmp.npz"
    extra = {}
    if fingerprint is not None:
        extra["mesh_crc"] = np.uint32(fingerprint)
    if state.lag_op is not None and include_lag:
        # persist the carried-operator tuple so a resumed run replays the
        # SAME iteration path as an uninterrupted one (bit-exact resume
        # under cfg.lag_operator; reseeding with zero_lag forces a rebuild
        # on the first resumed step, diverging the stall-floor iterates)
        ok, age, vals, a_diag, A_inv, floor, fage = state.lag_op
        extra.update(lag_ok=np.asarray(ok), lag_age=np.asarray(age),
                     lag_vals=np.asarray(vals), lag_adiag=np.asarray(a_diag),
                     lag_floor=np.asarray(floor),
                     lag_floor_age=np.asarray(fage))
        if A_inv is not None:
            extra["lag_Ainv"] = np.asarray(A_inv)
    np.savez(tmp,
             N=np.asarray(state.N), b=np.asarray(state.b),
             q=np.asarray(state.q), melt=np.asarray(state.melt),
             N_prev=np.asarray(state.N_prev if state.N_prev is not None
                               else state.N),
             n_nodes=np.int64(np.asarray(state.N).shape[-1]),
             next_step=np.int64(next_step), next_row=np.int64(next_row),
             **extra)
    os.replace(tmp, path)


def load_state(results_dir: str, dtype=None, fingerprint: int | None = None):
    """Returns (state, next_step, next_row) or None if no checkpoint.

    When ``fingerprint`` is given (from :func:`mesh_fingerprint` of the
    current mesh) and the checkpoint recorded one, a mismatch raises — shape
    agreement alone is not enough to prove the state belongs to this mesh.
    """
    import jax.numpy as jnp
    path = os.path.join(results_dir, CHECKPOINT_FILE)
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        if (fingerprint is not None and "mesh_crc" in z.files
                and int(z["mesh_crc"]) != int(fingerprint)):
            raise ValueError(
                f"checkpoint in '{results_dir}' was written for a different "
                f"mesh (fingerprint {int(z['mesh_crc']):#010x} != current "
                f"{int(fingerprint):#010x}); refusing to resume")
        f = (lambda a: jnp.asarray(a, dtype=dtype)) if dtype else jnp.asarray
        np_prev = z["N_prev"] if "N_prev" in z.files else z["N"]
        lag_op = None
        if "lag_vals" in z.files and "lag_floor_age" in z.files:
            # carried-operator tuple: restore with exact dtypes (bool flag,
            # int32 ages, state-dtype values).  Checkpoints from before the
            # carried-floor / floor-age extensions lack these keys and are
            # reseeded by the run layer (shape/structure mismatch).
            lag_op = (jnp.asarray(bool(z["lag_ok"])),
                      jnp.asarray(z["lag_age"], jnp.int32),
                      f(z["lag_vals"]), f(z["lag_adiag"]),
                      f(z["lag_Ainv"]) if "lag_Ainv" in z.files else None,
                      f(z["lag_floor"]),
                      jnp.asarray(z["lag_floor_age"], jnp.int32))
        state = State(N=f(z["N"]), b=f(z["b"]), q=f(z["q"]), melt=f(z["melt"]),
                      N_prev=f(np_prev), lag_op=lag_op)
        return state, int(z["next_step"]), int(z["next_row"])
