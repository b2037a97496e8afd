"""Node-sharded SPMD runner: the scalable multi-chip execution path.

Builds on parallel/halo.py: nodes live in P contiguous RCB-localized
chunks, each device holds its owned+ghost view, and the unmodified step
function (solve/timestep.py) runs inside `shard_map` — assembly completes
via halo accumulate (two padded all_to_all per assembly) and Newton/Krylov
reductions via ghost-masked psum'd dots.  Communication is O(partition
boundary) per exchange, vs O(n_nodes) psum in the replicated-node scheme
(parallel/shard.py) — this is the weak-scaling path to 10M+ dof pod runs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from shakti_tpu.mesh.mesh import Mesh
from shakti_tpu.parallel import halo as H
from shakti_tpu.parallel.shard import make_device_mesh, shard_map
from shakti_tpu.solve.timestep import State, StaticFields, make_step_fn, run_window


def build_distributed(md, jmesh, axis: str = "x"):
    """Partition a frozen model into per-device arrays + halo plan.

    Returns (payload, plan, cfg) where payload is a dict of stacked arrays
    (leading axis P*·, shard_map-ready) and plan the host-side halo plan.
    """
    # capture the USER's coarse_block before freeze(): freeze resolves the
    # None 'auto' sentinel to a global-mesh-sized block (api/model.py),
    # which would make the sentinel test below dead at production scale
    user_blk = md.solver.coarse_block
    mesh, static, state, cfg = md.freeze()
    Pn = jmesh.shape[axis]
    n = mesh.n_nodes
    cells_np = np.asarray(mesh.cells)
    plan = H.build_halo(n, cells_np, Pn)
    # per-shard additive two-level preconditioner (precond.py
    # make_local_two_level) when the user kept the two_level default.
    # coarse_block None is the 'auto' sentinel: size the LOCAL aggregates
    # so each shard's dense coarse problem has a few hundred to ~1k dofs;
    # an explicit int is taken literally.  The lagged-operator carry is
    # not supported on the halo path (per-shard operator rebuilds are
    # cheap relative to the all_to_all traffic anyway).
    blk = user_blk
    if blk is None:
        blk = 8
        while plan["L"] // blk > 1024:
            blk *= 2
    cfg = dataclasses.replace(cfg, coarse_block=blk, lag_operator=False)
    # global coarse aggregates (precond.make_global_two_level): GLOBAL
    # solver-order node id // gblk, localized per shard; one psum'd
    # Galerkin coarse operator replaces the per-shard block-diagonal ones
    gblk = 8
    while n // gblk > 1024:
        gblk *= 2
    coarse_m = -(-n // gblk)
    agg_global = (np.arange(n, dtype=np.int64) // gblk).astype(np.int32)
    dtype = np.asarray(mesh.area).dtype

    cell_ids = plan["cell_ids"]                       # (P, cmax)
    loc = lambda f: H.localize_nodal(plan, np.asarray(f))

    # per-shard scalar-ELL operator structure on the local numbering
    # (Krylov matvecs become local gather-only + one halo accumulate,
    # instead of cell gather + element matvec + scatter per iteration)
    from shakti_tpu.fem.ell import build_ell_map
    L = plan["L"]
    ell_parts = [build_ell_map(plan["local_cells"][p], L)
                 for p in range(Pn)]
    K = max(c.shape[1] for c, _, _ in ell_parts)
    ell_cols = np.empty((Pn, L, K), dtype=np.int32)
    ell_map = np.empty((Pn, plan["local_cells"].shape[1] * 9), dtype=np.int32)
    ell_diag = np.empty((Pn, L), dtype=np.int32)
    for p, (cols, smap, dslot) in enumerate(ell_parts):
        Kp = cols.shape[1]
        ell_cols[p] = np.concatenate(
            [cols, np.broadcast_to(np.arange(L, dtype=np.int32)[:, None],
                                   (L, K - Kp))], axis=1) if Kp < K else cols
        # re-stride flat slots from row-stride Kp to row-stride K
        ell_map[p] = (smap // Kp) * K + smap % Kp
        ell_diag[p] = dslot

    payload = {
        # cell data, (P*cmax, ...)
        "cells": plan["local_cells"].reshape(-1, 3).astype(np.int32),
        "area": (np.asarray(mesh.area)[cell_ids]
                 * plan["cell_valid"]).reshape(-1).astype(dtype),
        "grads": np.asarray(mesh.grads)[cell_ids].reshape(-1, 3, 2),
        "valid": plan["cell_valid"].reshape(-1).astype(dtype),
        "gb0": np.asarray(static.gb0)[cell_ids].reshape(-1, 2),
        # nodal data, (P*L, ...)
        "nodes": loc(mesh.nodes).reshape(-1, 2),
        "node_area": loc(mesh.node_area).reshape(-1),
        "z_b": loc(static.z_b).reshape(-1),
        "z_s": loc(static.z_s).reshape(-1),
        "G": loc(static.G).reshape(-1),
        "inputs": loc(static.inputs).reshape(-1),
        "storage": loc(static.storage).reshape(-1),
        "dirichlet": loc(np.asarray(static.dirichlet)).reshape(-1),
        "N0": loc(state.N).reshape(-1),
        "Nprev0": loc(state.N_prev if state.N_prev is not None
                      else state.N).reshape(-1),
        "b0": loc(state.b).reshape(-1),
        "q0": loc(state.q).reshape(-1, 2),
        "melt0": loc(state.melt).reshape(-1),
        # per-shard ELL operator, (P*L, K) / (P*9cmax,) / (P*L,)
        "ell_cols": ell_cols.reshape(-1, K),
        "ell_map": ell_map.reshape(-1),
        "ell_diag": ell_diag.reshape(-1),
        "coarse_agg": loc(agg_global).reshape(-1).astype(np.int32),
        # halo plan, (P*P, H) / (P*L,)
        "send_idx": plan["send_idx"].reshape(-1, plan["send_idx"].shape[-1]),
        "send_valid": plan["send_valid"].reshape(-1, plan["send_valid"].shape[-1]),
        "recv_slot": plan["recv_slot"].reshape(-1, plan["recv_slot"].shape[-1]),
        "owned_mask": plan["owned_mask"].reshape(-1).astype(dtype),
        # scalars
        "N_bdry": np.asarray(static.N_bdry),
        "b_min": np.asarray(static.b_min),
    }
    plan["coarse_m"] = coarse_m
    return payload, plan, cfg


def make_distributed_runner(md, jmesh=None, axis: str = "x"):
    """(runner, state0_stacked, plan): runner(state, dts) -> (state, diags)
    with state arrays stacked (P*L, ...) and diags replicated."""
    jmesh = jmesh or make_device_mesh()
    payload, plan, cfg = build_distributed(md, jmesh, axis)
    params = md.params

    pl = P(axis)
    rep = P()
    cell_keys = ("cells", "area", "grads", "valid", "gb0")
    nodal_keys = ("nodes", "node_area", "z_b", "z_s", "G", "inputs",
                  "storage", "dirichlet")
    halo_keys = ("send_idx", "send_valid", "recv_slot", "owned_mask")
    scalar_keys = ("N_bdry", "b_min")

    coarse_m = plan["coarse_m"]

    def body(cells, area, grads, valid, gb0,
             nodes, node_area, z_b, z_s, G, inputs, storage, dirichlet,
             ell_cols_l, ell_map_l, ell_diag_l, coarse_agg_l,
             send_idx, send_valid, recv_slot, owned_mask,
             N_bdry, b_min, state, dts):
        halo = H.Halo(send_idx=send_idx, send_valid=send_valid,
                      recv_slot=recv_slot, owned_mask=owned_mask, axis=axis)
        lmesh = Mesh(nodes=nodes, cells=cells, area=area, grads=grads,
                     node_area=node_area, cell_valid=valid, halo=halo,
                     ell_cols=ell_cols_l, ell_map=ell_map_l,
                     ell_diag_slot=ell_diag_l,
                     coarse_agg=coarse_agg_l, coarse_m=coarse_m)
        lstatic = StaticFields(z_b=z_b, z_s=z_s, G=G, inputs=inputs,
                               storage=storage, gb0=gb0,
                               dirichlet=dirichlet.astype(bool),
                               N_bdry=N_bdry, b_min=b_min)
        step = make_step_fn(lmesh, lstatic, params, cfg)
        return run_window(step, state, dts)

    sharded = shard_map(
        body, mesh=jmesh,
        in_specs=(pl,) * 5 + (pl,) * 8 + (pl,) * 4 + (pl,) * 4
                 + (rep, rep, pl, rep),
        out_specs=(pl, rep),
    )

    ar = lambda k, dt=None: jnp.asarray(payload[k], dtype=dt)
    dtype = md.dtype
    state0 = State(N=ar("N0", dtype), b=ar("b0", dtype),
                   q=ar("q0", dtype), melt=ar("melt0", dtype),
                   N_prev=ar("Nprev0", dtype))
    args = ([ar(k) if k == "cells" else ar(k, dtype) for k in ("cells",)]
            + [ar("area", dtype), ar("grads", dtype), ar("valid", dtype),
               ar("gb0", dtype)]
            + [ar("nodes", dtype), ar("node_area", dtype), ar("z_b", dtype),
               ar("z_s", dtype), ar("G", dtype), ar("inputs", dtype),
               ar("storage", dtype), ar("dirichlet", dtype)]
            + [jnp.asarray(payload["ell_cols"]),
               jnp.asarray(payload["ell_map"]),
               jnp.asarray(payload["ell_diag"]),
               jnp.asarray(payload["coarse_agg"])]
            + [jnp.asarray(payload["send_idx"]),
               jnp.asarray(payload["send_valid"]),
               jnp.asarray(payload["recv_slot"]), ar("owned_mask", dtype)]
            + [ar("N_bdry", dtype), ar("b_min", dtype)])

    @jax.jit
    def runner(state, dts):
        return sharded(*args, state, dts)

    return runner, state0, plan


def gather_state(plan, state_stacked: State) -> State:
    """Stacked (P*L, ...) state -> global solver-order arrays."""
    Pn, L = plan["P"], plan["L"]
    g = lambda a: jnp.asarray(
        H.globalize_nodal(plan, np.asarray(a).reshape((Pn, L) + a.shape[1:])))
    return State(N=g(state_stacked.N), b=g(state_stacked.b),
                 q=g(state_stacked.q), melt=g(state_stacked.melt),
                 N_prev=g(state_stacked.N_prev))
