"""Weak-scaling sweep of the distributed solver (VERDICT r2 item 2 axis).

Runs scripts/dist_scale.py at a ladder of problem sizes on the 8-device
virtual CPU mesh (cold start, identical configuration) and assembles the
per-size results into scripts/WEAK_SCALING.json plus a markdown table on
stdout.  The metric that must stay flat is CG iterations per step — the
algorithmic weak-scaling property of the multilevel preconditioner
(solve/mg.py); wall seconds on the single shared CPU core are NOT a
throughput claim (see dist_scale.py docstring).

    python scripts/weak_scaling.py [--sizes 2.5e5,1e6,4e6,1e7] [--steps 3]
    python scripts/weak_scaling.py --from-artifacts   # assemble from
        # previously recorded scripts/dist_scale_{250k,1M,4M,10M}.json
        # (each leg is hours on this single shared CPU core, so legs are
        # usually run individually and assembled after the fact)

Each size runs in a fresh subprocess (own XLA flags / device mesh).
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2.5e5,1e6,4e6,1e7")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--from-artifacts", action="store_true",
                    help="assemble WEAK_SCALING.json from existing "
                         "scripts/dist_scale_<tag>.json legs instead of "
                         "re-running them")
    args = ap.parse_args()
    sizes = [float(s) for s in args.sizes.split(",")]

    rows = []
    if args.from_artifacts:
        for dof in sizes:
            tag = (f"{dof / 1e6:g}M" if dof >= 1e6 else f"{dof / 1e3:g}k")
            path = os.path.join(ROOT, "scripts", f"dist_scale_{tag}.json")
            with open(path) as f:
                rows.append(json.load(f))
        return finish(rows, args)
    for dof in sizes:
        t0 = time.time()
        cmd = [sys.executable, os.path.join(ROOT, "scripts", "dist_scale.py"),
               "--dof", str(dof), "--steps", str(args.steps),
               "--devices", str(args.devices)]
        print(f"# {' '.join(cmd)}", file=sys.stderr, flush=True)
        p = subprocess.run(cmd, capture_output=True, text=True)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if p.returncode != 0 or not line:
            print(p.stdout + p.stderr, file=sys.stderr)
            raise SystemExit(f"dist_scale failed at dof={dof}")
        r = json.loads(line[-1])
        r["sweep_wall_s"] = round(time.time() - t0, 1)
        rows.append(r)
        print(f"# done {dof:g}: cg={r['cg_iters']}", file=sys.stderr,
              flush=True)
    finish(rows, args)


def finish(rows, args):
    out = {"metric": "weak_scaling_cg", "devices": args.devices,
           "steps": args.steps, "rows": rows}
    path = os.path.join(ROOT, "scripts", "WEAK_SCALING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)

    print("| n_nodes | L/device | newton/step | CG/step | per-device temp |")
    print("|---|---|---|---|---|")
    for r in rows:
        cg = "/".join(str(c) for c in r["cg_iters"])
        nw = "/".join(str(c) for c in r["newton_iters"])
        gb = r["per_device_memory"].get("temp_size_in_bytes", 0) / 1e9
        print(f"| {r['n_nodes']:,} | {r['L_per_device']:,} | {nw} "
              f"| {cg} | {gb:.2f} GB |")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
