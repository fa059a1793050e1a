"""Table-free NumPy marching-cubes oracle (test-only).

Classic table-based MC (the reference's ``mcubes.marching_cubes``,
utils.py:172-182) and this implementation place vertices at the SAME
edge-interpolation points; they can differ only in how ambiguous cells are
triangulated.  Here each cell's isosurface patches are built from first
principles: marching-squares segments on the 6 faces, stitched into closed
loops, fan-triangulated.  The per-face segment rule depends only on the
face's corner values, so adjacent cells agree and the mesh is watertight.

Used by tests/test_meshing_mc.py to bound the metric deviation of the
production marching-tetrahedra extractor (native/libmesh.cpp) against an
MC-family mesh on identical grids.
"""

from __future__ import annotations

import itertools

import numpy as np

# cell corners as (dx, dy, dz) bit patterns
_CORNERS = [(x, y, z) for x in (0, 1) for y in (0, 1) for z in (0, 1)]
_CIDX = {c: i for i, c in enumerate(_CORNERS)}

# 12 cell edges as corner-index pairs (differ in exactly one axis)
_EDGES = []
for a, b in itertools.combinations(range(8), 2):
    diff = [i for i in range(3) if _CORNERS[a][i] != _CORNERS[b][i]]
    if len(diff) == 1:
        _EDGES.append((a, b))
_EIDX = {e: i for i, e in enumerate(_EDGES)}

# 6 faces: (axis, side) -> 4 corner indices in cyclic order
_FACES = []
for axis in range(3):
    for side in (0, 1):
        corners = [c for c in _CORNERS if c[axis] == side]
        # cyclic order around the face: sort by angle in the face plane
        oa = [i for i in range(3) if i != axis]
        cyc = [corners[j] for j in (0, 1, 3, 2)]  # (0,0),(0,1),(1,1),(1,0)
        _FACES.append([_CIDX[c] for c in cyc])


def _face_segments(vals, corners):
    """Marching squares on one face: corner values + cyclic corner ids ->
    list of (edge_a, edge_b) cell-edge pairs (each edge given as a sorted
    corner-index pair).  inside := value < 0.  Ambiguous case: keep the
    inside corners disconnected (a fixed, face-value-only rule, so the
    neighboring cell makes the same choice)."""
    inside = [vals[c] < 0 for c in corners]
    n = sum(inside)
    if n == 0 or n == 4:
        return []
    edges = [tuple(sorted((corners[i], corners[(i + 1) % 4])))
             for i in range(4)]
    if n == 1 or n == 3:
        lone = inside.index(True) if n == 1 else inside.index(False)
        return [(edges[(lone - 1) % 4], edges[lone])]
    # n == 2
    if inside[0] == inside[1]:  # adjacent pair (01 vs 23)
        return [(edges[1], edges[3])]
    if inside[1] == inside[2]:  # adjacent pair (12 vs 30)
        return [(edges[0], edges[2])]
    # diagonal: separate the two inside corners
    a = inside.index(True)  # 0 or 1; diagonal partner is a+2
    return [(edges[(a - 1) % 4], edges[a]),
            (edges[(a + 1) % 4], edges[(a + 2) % 4])]


def marching_cubes_numpy(grid: np.ndarray, iso: float = 0.0):
    """Extract the ``grid == iso`` surface.  Returns (vertices (V,3) float64
    grid-coordinates, triangles (T,3) int).  Matches the call convention of
    ``native.marching_cubes`` (and mcubes): vertex order (x, y, z) indexing
    grid[x, y, z]."""
    g = np.asarray(grid, np.float64) - iso
    nx, ny, nz = g.shape
    # active cells: any sign change among the 8 corners
    sgn = g < 0
    c = sgn[:-1, :-1, :-1]
    anyin = c.copy()
    allin = c.copy()
    for dx, dy, dz in _CORNERS[1:]:
        s = sgn[dx:nx - 1 + dx, dy:ny - 1 + dy, dz:nz - 1 + dz]
        anyin |= s
        allin &= s
    active = np.argwhere(anyin & ~allin)

    verts = []
    vert_id = {}
    tris = []

    def edge_vertex(i, j, k, ca, cb):
        a, b = _CORNERS[ca], _CORNERS[cb]
        pa = (i + a[0], j + a[1], k + a[2])
        pb = (i + b[0], j + b[1], k + b[2])
        key = (min(pa, pb), max(pa, pb))
        vid = vert_id.get(key)
        if vid is not None:
            return vid
        va, vb = g[pa], g[pb]
        t = va / (va - vb)
        p = np.asarray(pa, np.float64) + t * (
            np.asarray(pb, np.float64) - np.asarray(pa, np.float64))
        vert_id[key] = len(verts)
        verts.append(p)
        return len(verts) - 1

    for i, j, k in active:
        vals = [g[i + c[0], j + c[1], k + c[2]] for c in _CORNERS]
        segs = []
        for face in _FACES:
            segs += _face_segments(vals, face)
        if not segs:
            continue
        # stitch segments into closed loops (each cut edge has exactly two
        # incident face segments)
        adj = {}
        for ea, eb in segs:
            adj.setdefault(ea, []).append(eb)
            adj.setdefault(eb, []).append(ea)
        seen = set()
        for start in adj:
            if start in seen:
                continue
            loop = [start]
            seen.add(start)
            cur, prev = start, None
            while True:
                nxts = [e for e in adj[cur] if e != prev]
                nxt = nxts[0] if nxts else None
                if nxt is None or nxt == start or nxt in seen:
                    break
                loop.append(nxt)
                seen.add(nxt)
                prev, cur = cur, nxt
            if len(loop) < 3:
                continue
            vids = [edge_vertex(i, j, k, *e) for e in loop]
            for t in range(1, len(vids) - 1):
                tris.append((vids[0], vids[t], vids[t + 1]))

    if not verts:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    return np.asarray(verts), np.asarray(tris, np.int64)
