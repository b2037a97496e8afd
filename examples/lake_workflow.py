"""End-to-end workflow example: mesh -> run -> post-process -> figures.

The library-script equivalent of the reference's notebook pipeline
(create_mesh.ipynb -> example.ipynb -> solution-plots.ipynb): build a
synthetic lake catchment, run a short transient, then derive the
solution-plots quantities (lake level, filling rate, far-field check) and
render map frames.

    python examples/lake_workflow.py [outdir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(outdir="results/example_lake"):
    import setups.setup_lake as setup_lake
    from shakti_tpu import post
    from shakti_tpu.api.run import solve

    # ---- run (reference example.ipynb) ----
    md = setup_lake.initialize(nx=24, ny=24, days=30.0, nt_per_day=4,
                               results_name=outdir)
    md.seasonal_inputs = (0.8, 3.154e7, 0.0)     # mild annual melt cycle
    out = solve(md)
    print(f"\nran {out['steps']} steps in {out['wall_time']:.1f} s")

    # ---- post-processing (reference solution-plots.ipynb) ----
    res = post.load_results(outdir)
    lake_mask = md.lake_bdry > 0.5
    lvl = post.lake_level(res["N"], lake_mask)
    rate = post.filling_rate(res["t"], res["N"], lake_mask)
    gap = post.mean_gap(res["b"])
    qmax = post.max_flux(res["qx"], res["qy"], exclude_mask=lake_mask)
    far = (md.x > 0.8 * md.x.max())
    ratio = post.far_field_ratio(res["N"], far, md.N_bdry)
    print(f"lake level change: {lvl[-1] * 1e3:+.2f} mm "
          f"({rate * 3.154e7:+.3f} m/yr)")
    print(f"mean gap: {gap[-1] * 1e3:.3f} mm; peak off-lake |q|: {qmax[-1]:.3g} m^2/s")
    print(f"far-field N / N_bdry: {ratio:.3f}")

    # ---- figures ----
    frames_dir = os.path.join(outdir, "frames")
    post.render_frames(res, frames_dir, lake_outline=md.outline,
                       every=max(1, res["t"].size // 4))
    n_frames = len(os.listdir(frames_dir))
    print(f"rendered {n_frames} frames into {frames_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
