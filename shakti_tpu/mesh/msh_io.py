"""Minimal gmsh `.msh` reader/writer (pure Python, host-side).

Replaces `dolfinx.io.gmshio.read_from_msh` as used by the reference to load
its production meshes (reference setups/setup_cooke2.py:19; meshes produced
offline by notebooks/create_mesh.ipynb via pygmsh).  Supports the MSH 4.1
and legacy 2.2 ASCII formats, extracting 2-D triangle meshes: returns
(nodes (n, 2) float64, cells (c, 3) int32) with nodes renumbered densely in
file order.  Partitioning/distribution is NOT done here — the TPU build
partitions explicitly (shakti_tpu.parallel.partition), not inside the
reader like DOLFINx does.
"""

from __future__ import annotations

import numpy as np


def read_msh(path: str):
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0

    def section(name):
        nonlocal i
        while i < len(lines) and lines[i].strip() != f"${name}":
            i += 1
        if i >= len(lines):
            return False
        i += 1
        return True

    # format version
    i = 0
    if not section("MeshFormat"):
        raise ValueError(f"{path}: not a gmsh .msh file (no $MeshFormat)")
    version = float(lines[i].split()[0])
    if lines[i].split()[1] != "0":
        raise ValueError(f"{path}: binary .msh not supported (ASCII only)")

    if version >= 4.0:
        nodes, tags = _read_nodes_v4(lines)
        cells_raw = _read_elements_v4(lines)
    else:
        nodes, tags = _read_nodes_v2(lines)
        cells_raw = _read_elements_v2(lines)

    # renumber: gmsh node tags are arbitrary
    remap = {t: k for k, t in enumerate(tags)}
    cells = np.asarray([[remap[a], remap[b], remap[c]] for a, b, c in cells_raw],
                       dtype=np.int32)
    if cells.size == 0:
        raise ValueError(f"{path}: no triangle elements found")
    return np.asarray(nodes, dtype=np.float64)[:, :2], cells


def _find(lines, name):
    for k, ln in enumerate(lines):
        if ln.strip() == f"${name}":
            return k + 1
    raise ValueError(f"missing ${name} section")


def _read_nodes_v4(lines):
    k = _find(lines, "Nodes")
    n_blocks, n_nodes, *_ = (int(v) for v in lines[k].split())
    k += 1
    tags, coords = [], []
    for _ in range(n_blocks):
        _, _, _, n_in_block = (int(v) for v in lines[k].split())
        k += 1
        btags = [int(lines[k + j]) for j in range(n_in_block)]
        k += n_in_block
        for j in range(n_in_block):
            xyz = [float(v) for v in lines[k + j].split()]
            coords.append(xyz[:3])
        k += n_in_block
        tags.extend(btags)
    return coords, tags


def _read_elements_v4(lines):
    k = _find(lines, "Elements")
    n_blocks, *_ = (int(v) for v in lines[k].split())
    k += 1
    tris = []
    for _ in range(n_blocks):
        _, _, etype, n_in_block = (int(v) for v in lines[k].split())
        k += 1
        if etype == 2:  # 3-node triangle
            for j in range(n_in_block):
                parts = lines[k + j].split()
                tris.append((int(parts[1]), int(parts[2]), int(parts[3])))
        k += n_in_block
    return tris


def _read_nodes_v2(lines):
    k = _find(lines, "Nodes")
    n = int(lines[k])
    tags, coords = [], []
    for j in range(n):
        parts = lines[k + 1 + j].split()
        tags.append(int(parts[0]))
        coords.append([float(parts[1]), float(parts[2]), float(parts[3])])
    return coords, tags


def _read_elements_v2(lines):
    k = _find(lines, "Elements")
    n = int(lines[k])
    tris = []
    for j in range(n):
        parts = [int(v) for v in lines[k + 1 + j].split()]
        etype, ntags = parts[1], parts[2]
        if etype == 2:
            tris.append(tuple(parts[3 + ntags: 6 + ntags]))
    return tris


def write_msh(path: str, nodes: np.ndarray, cells: np.ndarray):
    """Write a minimal MSH 4.1 ASCII file (single entity block).  Mainly for
    tests and for exporting generated meshes to gmsh-compatible tools."""
    nodes = np.asarray(nodes, dtype=np.float64)
    cells = np.asarray(cells, dtype=np.int64)
    n, c = nodes.shape[0], cells.shape[0]
    with open(path, "w") as f:
        f.write("$MeshFormat\n4.1 0 8\n$EndMeshFormat\n")
        f.write(f"$Nodes\n1 {n} 1 {n}\n")
        f.write(f"2 1 0 {n}\n")
        for k in range(n):
            f.write(f"{k + 1}\n")
        for k in range(n):
            f.write(f"{nodes[k, 0]:.17g} {nodes[k, 1]:.17g} 0\n")
        f.write("$EndNodes\n")
        f.write(f"$Elements\n1 {c} 1 {c}\n")
        f.write(f"2 1 2 {c}\n")
        for k in range(c):
            f.write(f"{k + 1} {cells[k, 0] + 1} {cells[k, 1] + 1} {cells[k, 2] + 1}\n")
        f.write("$EndElements\n")
