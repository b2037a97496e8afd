"""Multi-host (pod) launch support.

The reference scales out with `mpirun -np N python main.py <setup>`
(reference source/main.py + README): MPI ranks each own a mesh partition
via DOLFINx/PETSc.  The jax-native equivalent is one PROCESS PER HOST
(not per chip), each seeing its local chips, joined into one global
device mesh by `jax.distributed.initialize()`; the node-sharded SPMD
runner (parallel/dist.py) then shards over ALL global devices exactly as
it does over local ones — shard_map/psum/all_to_all are
topology-agnostic.

Launch on a pod slice (e.g. v5e-16, 4 hosts):

    # on every host (GCE TPU VMs: use --worker=all):
    python -m shakti_tpu setup_cooke2 --dist --multihost

Coordinator/process-id discovery is automatic on Cloud TPU (metadata
server); elsewhere set the standard variables:

    JAX_COORDINATOR_ADDRESS=host0:8476
    JAX_NUM_PROCESSES=4
    JAX_PROCESS_ID=<0..3>

IO note: the run layer writes results from every process; on shared
filesystems keep ``results_name`` per-process or let only process 0 write
(`init_multihost` returns ``is_primary`` for exactly this).  This module
is exercised here only in its single-process degenerate form — the
environment has one host — but contains no code path that depends on
host count beyond jax.distributed itself.
"""

from __future__ import annotations

import os


def init_multihost():
    """Initialize jax.distributed from the environment (idempotent).

    Returns (num_processes, process_id, is_primary).  Single-process
    callers (no coordinator configured, not on Cloud TPU) get (1, 0, True)
    without touching jax.distributed.
    """
    import jax

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    on_cloud_tpu = os.path.exists("/dev/accel0") or bool(
        os.environ.get("TPU_WORKER_HOSTNAMES"))
    if coord or on_cloud_tpu:
        # Cloud TPU pods discover coordinator/process-id from the metadata
        # server with NO env vars set — that is the standard launch, so the
        # gate must not require JAX_NUM_PROCESSES.  A single-host TPU VM
        # (or a host with stale TPU_* vars) may fail discovery; degrade to
        # the single-process view rather than crashing the launcher.
        try:
            jax.distributed.initialize()  # env/metadata-driven
        except RuntimeError as e:
            if "already initialized" not in str(e).lower():
                import warnings
                warnings.warn(
                    f"jax.distributed.initialize() failed ({e}); "
                    "continuing single-process")
                return 1, 0, True
        return (jax.process_count(), jax.process_index(),
                jax.process_index() == 0)
    return 1, 0, True
