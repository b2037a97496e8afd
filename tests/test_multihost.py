"""Multi-process (multi-host) execution, end to end (VERDICT r3 item 1).

The reference's production entry is `mpirun -np 8` with a rank-0 IO
funnel (reference main.py:7-21, solvers.py:86-102,205-215).  The
jax-native twin is N coordinated processes joined by jax.distributed
into one global device mesh, with api/run.py funnelling all file IO
through process 0.  These tests REALLY run 2 OS processes (4 virtual
CPU devices each, gloo collectives) and require their joint results to
match the single-process 8-device run.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import setups.setup_slab as slab

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "_mp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_process(rdir, timeout=900):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port), rdir],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    return outs


def test_two_process_run_matches_single_process(tmp_path):
    from shakti_tpu.api.run import solve

    # single-process 8-device reference run of the IDENTICAL setup
    import dataclasses
    md = slab.initialize(nx=10, ny=10, days=2.0, nt_per_day=4,
                         results_name=str(tmp_path / "single"))
    md.solver = dataclasses.replace(md.solver, precond="jacobi")
    md.distributed = True
    solve(md, progress=False)

    rdir = str(tmp_path / "mp")
    outs = _run_two_process(rdir)
    assert "[proc 0] ok" in outs[0] + outs[1]
    assert "[proc 1] ok" in outs[0] + outs[1]

    # the primary-funnelled results must equal the single-process run
    # to tolerance (same 8-way partition, different process topology;
    # gloo reductions may round differently than in-process ones)
    for k in ("N", "b", "qx", "qy", "t", "nodes_x", "nodes_y"):
        a = np.load(os.path.join(str(tmp_path / "single"), k + ".npy"))
        b = np.load(os.path.join(rdir, k + ".npy"))
        np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-12, err_msg=k)

    # full reference-compatible protocol from the primary only
    files = set(os.listdir(rdir))
    for f in ("N.npy", "b.npy", "qx.npy", "qy.npy", "t.npy", "log.csv",
              "checkpoint.npz", "run_meta.json"):
        assert f in files, f
    # no per-process duplicates (e.g. rank-suffixed dirs/files)
    assert not [f for f in files if "proc" in f or "rank" in f], files


def test_two_process_preexisting_dir_aborts_both(tmp_path):
    """The pre-existing-results-dir abort must be COORDINATED (the
    reference bcasts an error code, solvers.py:91-102): both processes
    exit nonzero instead of the secondary hanging at its first
    collective."""
    rdir = str(tmp_path / "mp")
    os.makedirs(rdir)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port), rdir],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in (0, 1)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode != 0, "worker should abort on existing dir"
        assert "already exists" in out, out[-2000:]
