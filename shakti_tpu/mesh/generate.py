"""Host-side mesh generators (numpy).

The reference delegates meshing to gmsh/pygmsh notebooks
(reference notebooks/create_mesh.ipynb) and ships no generator of its own.
For the framework's built-in experiment setups and tests we provide
deterministic structured-triangulation generators; real-geometry `.msh`
meshes are read by shakti_tpu.mesh.msh_io.
"""

from __future__ import annotations

import numpy as np


def rectangle_mesh(nx: int, ny: int, lx: float, ly: float,
                   x0: float = 0.0, y0: float = 0.0,
                   diagonal: str = "alternating",
                   jitter: float = 0.0, seed: int = 0):
    """Triangulated rectangle [x0, x0+lx] x [y0, y0+ly] with (nx+1)*(ny+1) nodes.

    diagonal:
      - 'right': all diagonals in the same direction (like DOLFINx
        create_rectangle default)
      - 'alternating': union-jack-ish pattern, milder anisotropy
    jitter: optional fraction of h by which *interior* nodes are perturbed
    (deterministic, for exercising unstructured code paths in tests/bench).
    """
    xs = np.linspace(x0, x0 + lx, nx + 1)
    ys = np.linspace(y0, y0 + ly, ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    nodes = np.column_stack([X.ravel(), Y.ravel()])

    if jitter > 0.0:
        rng = np.random.default_rng(seed)
        hx, hy = lx / nx, ly / ny
        interior = ((nodes[:, 0] > xs[0]) & (nodes[:, 0] < xs[-1])
                    & (nodes[:, 1] > ys[0]) & (nodes[:, 1] < ys[-1]))
        pert = rng.uniform(-1.0, 1.0, size=nodes.shape)
        nodes[interior] += jitter * pert[interior] * np.array([hx, hy])

    def nid(i, j):
        return j * (nx + 1) + i

    cells = []
    for j in range(ny):
        for i in range(nx):
            a, b = nid(i, j), nid(i + 1, j)
            c, d = nid(i + 1, j + 1), nid(i, j + 1)
            flip = (diagonal == "alternating") and ((i + j) % 2 == 1)
            if flip:
                cells.append([a, b, d])
                cells.append([b, c, d])
            else:
                cells.append([a, b, c])
                cells.append([a, c, d])
    return nodes, np.asarray(cells, dtype=np.int32)


def disk_mesh(n_rings: int, radius: float = 1.0, center=(0.0, 0.0)):
    """Crude structured disk triangulation (rings of nodes around a center).

    Used by synthetic lake tests; not a production mesher.
    """
    nodes = [np.array(center, dtype=float)]
    ring_start = [0]
    for r in range(1, n_rings + 1):
        k = 6 * r
        ring_start.append(len(nodes))
        th = np.linspace(0, 2 * np.pi, k, endpoint=False)
        rad = radius * r / n_rings
        for t in th:
            nodes.append(np.array([center[0] + rad * np.cos(t),
                                   center[1] + rad * np.sin(t)]))
    nodes = np.asarray(nodes)

    cells = []
    for r in range(1, n_rings + 1):
        k_out = 6 * r
        k_in = 6 * (r - 1) if r > 1 else 1
        out0 = ring_start[r]
        in0 = ring_start[r - 1]
        if r == 1:
            for i in range(k_out):
                cells.append([0, out0 + i, out0 + (i + 1) % k_out])
            continue
        # stitch ring r-1 (k_in nodes) to ring r (k_out nodes)
        ii, oo = 0, 0
        for _ in range(k_in + k_out):
            a_in = in0 + (ii % k_in)
            a_out = out0 + (oo % k_out)
            # advance whichever ring is 'behind' in angle
            ang_in_next = 2 * np.pi * ((ii + 1) % k_in) / k_in + (2 * np.pi) * ((ii + 1) // k_in)
            ang_out_next = 2 * np.pi * ((oo + 1) % k_out) / k_out + (2 * np.pi) * ((oo + 1) // k_out)
            ang_in_next = 2 * np.pi * (ii + 1) / k_in
            ang_out_next = 2 * np.pi * (oo + 1) / k_out
            if ang_out_next <= ang_in_next:
                b_out = out0 + ((oo + 1) % k_out)
                cells.append([a_in, a_out, b_out])
                oo += 1
            else:
                b_in = in0 + ((ii + 1) % k_in)
                cells.append([a_in, a_out, b_in])
                ii += 1
    return nodes, np.asarray(cells, dtype=np.int32)
