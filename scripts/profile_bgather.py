"""Hypothesis check for MXU block-gather (one-hot selection matmul) vs
XLA per-element gathers, on the bench mesh, in-scan, on TPU.

profile_fine.py's calibration showed in-program kernel launches are cheap
and the step cost tracks GATHER ELEMENT COUNT (XLA TPU serializes
fine-grained gathers, CLAUDE.md ~7 ns/element).  This measures, honestly
(every variant feeds its result back into the scan carry so nothing is
loop-invariant-hoisted):

  * g_elem:   f[cells] element gather, (n,3) -> (c,3,3)
  * g_onehot: the same via block-gather + one-hot bf16 matmul
  * s_inc:    incidence-map scatter-free accumulation (n,KI) gather
  * s_onehot: the same via one-hot-transpose matmul
  * probe_3col / probe_2col: honest assemble_residual_multi timings
  * cg_m2 / cg_m6: honest fixed-iteration PCG timings (carry-fed rhs)

Writes scripts/PROFILE_bgather.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shakti_tpu.utils.backend import ensure_backend

ensure_backend()


def build_maps(cells_np, n, B=128, K=None):
    """Host build of the one-hot block-gather structure (numpy).

    Returns (order, nbr (NB,K), off (NB,K,B) int32 in [-1, B)), residual
    (rows, nodes) for entries outside the K most-common node blocks."""
    corner_node = cells_np.reshape(-1)
    nr = corner_node.shape[0]
    NB = -(-nr // B)
    pad = np.pad(corner_node, (0, NB * B - nr), constant_values=-1)
    rows_blocks = pad.reshape(NB, B)
    nbrs, offs, res_rows, res_nodes = [], [], [], []
    kmax = 0
    per_block = []
    for nb in range(NB):
        row = rows_blocks[nb]
        valid = row >= 0
        blocks, counts = np.unique(row[valid] // B, return_counts=True)
        per_block.append((blocks, counts))
        kmax = max(kmax, len(blocks))
    if K is None:
        K = min(kmax, 6)
    for nb in range(NB):
        row = rows_blocks[nb]
        valid = row >= 0
        blocks, counts = per_block[nb]
        keep = blocks[np.argsort(-counts)[:K]]
        bmap = {b: k for k, b in enumerate(keep)}
        nbr = np.zeros(K, dtype=np.int32)
        nbr[:len(keep)] = keep
        off = -np.ones((K, B), dtype=np.int32)
        for oc in range(B):
            g = row[oc]
            if g < 0:
                continue
            gb, go = g // B, g % B
            if gb in bmap:
                off[bmap[gb], oc] = go
            else:
                res_rows.append(nb * B + oc)
                res_nodes.append(g)
        nbrs.append(nbr)
        offs.append(off)
    return (np.stack(nbrs), np.stack(offs),
            np.asarray(res_rows, dtype=np.int32),
            np.asarray(res_nodes, dtype=np.int32), K, kmax)


def build_scatter_maps(cells_np, n, B=128, K=None):
    """Transpose side: node-block rows accumulating from corner blocks.
    off[nb, k, oc] = target node offset for corner slot oc of corner block
    nbrT[nb, k] (or -1)."""
    corner_node = cells_np.reshape(-1)
    nr = corner_node.shape[0]
    NBc = -(-nr // B)
    NBn = -(-n // B)
    pad = np.pad(corner_node, (0, NBc * B - nr), constant_values=-1)
    # group corner slots by destination node block
    nbrs, offs, res_rows, res_nodes = [], [], [], []
    cb_of = np.arange(NBc * B) // B
    kmax = 0
    per_block = []
    for nb in range(NBn):
        mask = (pad >= 0) & (pad // B == nb)
        cbs, counts = np.unique(cb_of[mask], return_counts=True)
        per_block.append((mask, cbs, counts))
        kmax = max(kmax, len(cbs))
    if K is None:
        K = min(kmax, 16)
    for nb in range(NBn):
        mask, cbs, counts = per_block[nb]
        keep = cbs[np.argsort(-counts)[:K]]
        bmap = {b: k for k, b in enumerate(keep)}
        nbrT = np.zeros(K, dtype=np.int32)
        nbrT[:len(keep)] = keep
        off = -np.ones((K, B), dtype=np.int32)
        slots = np.where(mask)[0]
        for r in slots:
            gb, oc = cb_of[r], r % B
            go = pad[r] % B
            if gb in bmap:
                off[bmap[gb], oc] = go
            else:
                res_rows.append(r)
                res_nodes.append(pad[r])
        nbrs.append(nbrT)
        offs.append(off)
    return (np.stack(nbrs), np.stack(offs),
            np.asarray(res_rows, dtype=np.int32),
            np.asarray(res_nodes, dtype=np.int32), K, kmax)


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    if (dev.platform != "tpu"
            and os.environ.get("SHAKTI_PROFILE_ALLOW_CPU", "0") != "1"):
        print(f"# device is {dev.platform}, not tpu — bailing", file=sys.stderr)
        return 3
    jax.block_until_ready(jnp.ones(8).sum())

    from bench import build_bench_model
    from shakti_tpu.fem import ops
    from shakti_tpu.physics import residual as res
    from shakti_tpu.solve import krylov
    from shakti_tpu.solve.precond import two_level_from_inverse
    from shakti_tpu.solve.timestep import (make_step_fn, run_window,
                                           timestep_sizes)

    md = build_bench_model()
    mesh, static, state0, cfg = md.freeze()
    p = md.params
    dts = timestep_sizes(md.timesteps, dtype=md.dtype)
    W = 24
    dtype = md.dtype

    step_full = make_step_fn(mesh, static, p, cfg)
    warm = jax.jit(lambda s, d: run_window(step_full, s, d))
    state = state0
    for w in range(4):
        state, diag = warm(state, dts[w * W:(w + 1) * W])
    jax.block_until_ready(state.N)
    dt = float(dts[4 * W])
    sq = res.static_quad_fields(mesh, static, cfg.quad_degree,
                                mesh.nodes.dtype)
    pre = jax.jit(lambda s: res.precompute_step(
        mesh, s.N, s.b, s.q, s.melt, static, dt, p, cfg.quad_degree,
        sq=sq))(state)
    jax.block_until_ready(pre.Tq)
    _, _, vals, a_diag, A_inv, floor_b = state.lag_op
    dirichlet = static.dirichlet

    n = int(mesh.n_nodes)
    cells_np = np.asarray(mesh.cells)
    c = cells_np.shape[0]
    B = 128

    # sort cells by min node for block locality (semantically free here:
    # we compare gathers, not assembled sums)
    order = np.argsort(cells_np.min(axis=1), kind="stable")
    cs = cells_np[order]
    nbr, off, r_rows, r_nodes, K, kmax = build_maps(cs, n, B)
    nbrT, offT, rT_rows, rT_nodes, KT, kTmax = build_scatter_maps(cs, n, B)
    NBc = nbr.shape[0]
    NBn = nbrT.shape[0]
    print(f"# gather: K={K} (max {kmax}), residual {r_rows.size} "
          f"of {3 * c}; scatter: K={KT} (max {kTmax}), residual "
          f"{rT_rows.size}", file=sys.stderr, flush=True)

    jnbr = jnp.asarray(nbr)
    joff = jnp.asarray(off)
    jrr = jnp.asarray(r_rows)
    jrn = jnp.asarray(r_nodes)
    jnbrT = jnp.asarray(nbrT)
    joffT = jnp.asarray(offT)
    jrrT = jnp.asarray(rT_rows)
    jrnT = jnp.asarray(rT_nodes)
    jcells_s = jnp.asarray(cs)
    n_pad = NBn * B

    def onehot_from(off_arr):
        # (NB, K, B_src, B_dst): row o_dst selects source off[nb,k,o_dst]
        iota = jnp.arange(B, dtype=jnp.int32)
        return (off_arr[:, :, None, :] == iota[None, None, :, None]
                ).astype(jnp.bfloat16)

    def bgather(f):
        """(n, C) -> (c, 3, C) via one-hot matmul + residual gather."""
        C = f.shape[1]
        oh = onehot_from(joff)                        # (NBc, K, B, B)
        fp = jnp.pad(f, ((0, n_pad - n), (0, 0)))
        fb = fp.reshape(NBn, B, C)[jnbr]              # (NBc, K, B, C)
        y = jnp.einsum("bkon,bknc->boc", oh, fb,
                       precision=jax.lax.Precision.HIGHEST)
        y = y.reshape(NBc * B, C)
        if r_rows.size:
            y = y.at[jrr].set(f[jrn])
        return y[: 3 * c].reshape(c, 3, C)

    def bscatter(contrib):
        """(c, 3, C) -> (n, C) accumulation via one-hot-transpose matmul."""
        C = contrib.shape[2]
        oh = onehot_from(joffT)                       # (NBn, KT, B, B)
        flat = contrib.reshape(3 * c, C)
        fp = jnp.pad(flat, ((0, NBc * B - 3 * c), (0, 0)))
        fb = fp.reshape(NBc, B, C)[jnbrT]             # (NBn, KT, B, C)
        z = jnp.einsum("bkon,bknc->boc", oh, fb,
                       precision=jax.lax.Precision.HIGHEST)
        z = z.reshape(n_pad, C)
        if rT_rows.size:
            z = z.at[jrnT].add(fp[jrrT])
        return z[:n]

    def timeit(runner, *args, reps=6):
        out = runner(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = runner(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / (reps * W) * 1e3

    results = {"gather_K": K, "gather_kmax": kmax,
               "gather_residual": int(r_rows.size),
               "scatter_K": KT, "scatter_kmax": kTmax,
               "scatter_residual": int(rT_rows.size)}

    def record(name, ms, note=""):
        results[name] = round(ms, 4)
        print(f"{name:18s} {ms:8.4f} ms/step  {note}", file=sys.stderr,
              flush=True)

    st3 = jnp.stack([state.N, state.b, state.melt], axis=1)    # (n, 3)

    def scan_of(body):
        return jax.jit(lambda x, ds: jax.lax.scan(body, x, ds))

    # honest carry feedback: x <- x + tiny * f(x)
    def g_elem(x, d):
        y = x[jcells_s]                                        # (c, 3, C)
        fb = jnp.mean(y, axis=(0, 1)) * 1e-20
        return x + fb[None, :] * d, ()

    def g_onehot(x, d):
        y = bgather(x)
        fb = jnp.mean(y, axis=(0, 1)) * 1e-20
        return x + fb[None, :] * d, ()

    record("g_elem_3col", timeit(scan_of(g_elem), st3, dts[:W]))
    record("g_onehot_3col", timeit(scan_of(g_onehot), st3, dts[:W]))

    # scatter comparison: inc-map accumulation vs one-hot transpose
    contrib0 = jax.jit(lambda x: x[jcells_s] * 0.5)(st3)

    def s_inc(ct, d):
        z = ops.scatter_add_cells(mesh, ct)
        fb = jnp.mean(z, axis=0) * 1e-20
        return ct + fb[None, None, :] * d, ()

    def s_onehot(ct, d):
        z = bscatter(ct)
        fb = jnp.mean(z, axis=0) * 1e-20
        return ct + fb[None, None, :] * d, ()

    record("s_inc_3col", timeit(scan_of(s_inc), contrib0, dts[:W]))
    record("s_onehot_3col", timeit(scan_of(s_onehot), contrib0, dts[:W]))

    # correctness check (f32): block path vs element path
    ge = jax.jit(lambda x: x[jcells_s])(st3)
    go = jax.jit(bgather)(st3)
    gerr = float(jnp.max(jnp.abs(ge - go)) / (jnp.max(jnp.abs(ge)) + 1e-30))
    se = jax.jit(lambda ct: jax.ops.segment_sum(
        ct.reshape(-1, 3), jcells_s.reshape(-1), num_segments=n))(contrib0)
    so = jax.jit(bscatter)(contrib0)
    serr = float(jnp.max(jnp.abs(se - so)) / (jnp.max(jnp.abs(se)) + 1e-30))
    results["gather_relerr"] = gerr
    results["scatter_relerr"] = serr
    print(f"# correctness: gather rel {gerr:.2e}, scatter rel {serr:.2e}",
          file=sys.stderr, flush=True)

    # ---------------- honest probe / CG timings ----------------
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    sign = jnp.where(jnp.arange(n) % 2 == 0, 1.0, -1.0).astype(dtype)

    def probe(k):
        def body(N, d):
            colsrc = [N, 2 * N - state.N_prev,
                      N + eps * jnp.abs(N) * sign][:k]
            cols = res.assemble_residual_multi(
                jnp.stack(colsrc, axis=1), pre, mesh, p)
            return N + jnp.mean(cols) * 1e-30, ()
        return scan_of(body)

    record("probe_1col", timeit(probe(1), state.N, dts[:W]))
    record("probe_2col", timeit(probe(2), state.N, dts[:W]))
    record("probe_3col", timeit(probe(3), state.N, dts[:W]))

    matvec0 = res.operator_from_values(vals, mesh, dirichlet)
    extra = jnp.where(dirichlet, 0.0,
                      jnp.maximum(0.0, cfg.diag_floor_rel
                                  * jnp.max(jnp.abs(a_diag)) - a_diag))
    matvec = lambda x: matvec0(x) + extra * x
    minv = two_level_from_inverse(A_inv, a_diag + extra, dirichlet,
                                  cfg.coarse_block, mesh.n_nodes)
    rhs0 = jax.jit(lambda s: jnp.where(
        dirichlet, 0.0, res.assemble_residual(s.N, pre, mesh, p)))(state)

    def cg_fixed(m):
        def body(r, d):
            x, _ = krylov.pcg(matvec, r, minv, rtol=0.0, atol=0.0, maxiter=m)
            return r + x * 1e-30, ()
        return scan_of(body)

    cg2 = timeit(cg_fixed(2), rhs0, dts[:W])
    cg6 = timeit(cg_fixed(6), rhs0, dts[:W])
    record("cg_m2", cg2)
    record("cg_m6", cg6)
    record("cg_per_iter", (cg6 - cg2) / 4.0, "(slope)")

    out = {"device": f"{dev.platform}:{dev.device_kind}", "n_nodes": n,
           "results": results}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "PROFILE_bgather.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"profile": path}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
