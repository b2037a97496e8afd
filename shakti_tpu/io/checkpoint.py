"""Checkpoint / resume.

The reference writes history checkpoints for live plotting but CANNOT resume
a run (SURVEY §5: "write-only checkpoints, no resume" — reference
solvers.py:217-223).  Here a checkpoint is the full marching state plus loop
counters, so a preempted run continues bit-exactly where it stopped.
"""

from __future__ import annotations

import os

import numpy as np

from shakti_tpu.solve.timestep import State

CHECKPOINT_FILE = "checkpoint.npz"


def save_state(results_dir: str, state: State, next_step: int, next_row: int):
    path = os.path.join(results_dir, CHECKPOINT_FILE)
    tmp = path + ".tmp.npz"
    np.savez(tmp,
             N=np.asarray(state.N), b=np.asarray(state.b),
             q=np.asarray(state.q), melt=np.asarray(state.melt),
             N_prev=np.asarray(state.N_prev if state.N_prev is not None
                               else state.N),
             next_step=np.int64(next_step), next_row=np.int64(next_row))
    os.replace(tmp, path)


def load_state(results_dir: str, dtype=None):
    """Returns (state, next_step, next_row) or None if no checkpoint."""
    import jax.numpy as jnp
    path = os.path.join(results_dir, CHECKPOINT_FILE)
    if not os.path.exists(path):
        return None
    z = np.load(path)
    f = (lambda a: jnp.asarray(a, dtype=dtype)) if dtype else jnp.asarray
    np_prev = z["N_prev"] if "N_prev" in z.files else z["N"]
    state = State(N=f(z["N"]), b=f(z["b"]), q=f(z["q"]), melt=f(z["melt"]),
                  N_prev=f(np_prev))
    return state, int(z["next_step"]), int(z["next_row"])
