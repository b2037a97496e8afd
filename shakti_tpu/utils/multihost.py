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

IO note: the run layer (api/run.py) funnels all file IO through process 0
(`is_primary`) — directory creation, history memmaps, log.csv, checkpoints
and run_meta.json are primary-only, matching the reference's rank-0 gather
funnel (reference solvers.py:86-102,205-215).  Checkpoint RESUME reads
happen on every process and therefore assume a shared filesystem (the
reference makes the same assumption for its results dir).  Exercised for
real by tests/test_multihost.py: two coordinated CPU processes x 4 virtual
devices each must reproduce the single-process 8-device run.
"""

from __future__ import annotations

import os


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None):
    """Initialize jax.distributed (idempotent).

    With explicit arguments (tests, bespoke launchers) they are passed
    straight to ``jax.distributed.initialize``; otherwise coordinator and
    process id come from the environment / Cloud TPU metadata.  Returns
    (num_processes, process_id, is_primary).  Single-process callers (no
    coordinator configured, not on Cloud TPU) get (1, 0, True) without
    touching jax.distributed.
    """
    import jax

    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return (jax.process_count(), jax.process_index(),
                jax.process_index() == 0)

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


def to_host(x):
    """Full global numpy value of ``x``, identical on EVERY process.

    Single-process (or fully-addressable) arrays are a plain
    device->host pull; fully-replicated global arrays read the local
    copy; sharded global arrays go through ONE allgather collective —
    so under multi-process execution every process must reach this call
    (the SPMD host loop in api/run.py does).  This is the jax-native
    equivalent of the reference's comm.gather IO funnel
    (reference solvers.py:205-215), except the gathered value lands on
    all ranks and only process 0 writes it (api/run.py primary gating).
    """
    import jax
    import numpy as np

    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x)
    if x.sharding.is_fully_replicated:
        return np.asarray(x.addressable_data(0))
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
