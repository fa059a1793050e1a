"""Minimal first-party triangle-mesh type + IO + sampling.

Replaces the reference's trimesh usage (utils.py:158-250, eval_util.py:23-51):
loading OBJ/PLY (with multi-geometry flattening), exporting OBJ/PLY, uniform
area-weighted surface sampling, bounds/transforms.  NumPy-only.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


class Mesh:
    """Triangle mesh: vertices (V, 3) float64, faces (F, 3) int64."""

    def __init__(self, vertices, faces):
        self.vertices = np.asarray(vertices, np.float64).reshape(-1, 3)
        self.faces = np.asarray(faces, np.int64).reshape(-1, 3)

    # -- trimesh-compatible surface ------------------------------------------------
    @property
    def bounds(self) -> np.ndarray:
        if len(self.vertices) == 0:
            return np.zeros((2, 3))
        return np.stack([self.vertices.min(0), self.vertices.max(0)])

    def copy(self) -> 'Mesh':
        return Mesh(self.vertices.copy(), self.faces.copy())

    def apply_translation(self, t) -> 'Mesh':
        self.vertices = self.vertices + np.asarray(t, np.float64)
        return self

    def apply_scale(self, s: float) -> 'Mesh':
        self.vertices = self.vertices * float(s)
        return self

    def apply_transform(self, m: np.ndarray) -> 'Mesh':
        """4x4 homogeneous transform (trimesh convention)."""
        m = np.asarray(m, np.float64)
        v = self.vertices @ m[:3, :3].T + m[:3, 3]
        self.vertices = v
        return self

    @property
    def face_areas(self) -> np.ndarray:
        t = self.vertices[self.faces]
        return 0.5 * np.linalg.norm(
            np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0]), axis=1)

    @property
    def area(self) -> float:
        return float(self.face_areas.sum())

    @property
    def face_normals(self) -> np.ndarray:
        t = self.vertices[self.faces]
        n = np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0])
        ln = np.linalg.norm(n, axis=1, keepdims=True)
        return n / np.maximum(ln, 1e-30)

    def sample(self, count: int, return_index: bool = False,
               rng: Optional[np.random.RandomState] = None):
        """Uniform area-weighted surface sampling (trimesh.sample parity)."""
        rng = rng or np.random
        areas = self.face_areas
        total = areas.sum()
        if total <= 0 or len(self.faces) == 0:
            pts = np.zeros((count, 3))
            idx = np.zeros(count, np.int64)
            return (pts, idx) if return_index else pts
        face_idx = rng.choice(len(self.faces), size=count, p=areas / total)
        t = self.vertices[self.faces[face_idx]]
        # uniform barycentric via sqrt trick
        r1 = np.sqrt(rng.uniform(size=(count, 1)))
        r2 = rng.uniform(size=(count, 1))
        pts = (1 - r1) * t[:, 0] + r1 * (1 - r2) * t[:, 1] + r1 * r2 * t[:, 2]
        return (pts, face_idx) if return_index else pts

    def export(self, path: str) -> str:
        if path.endswith('.obj'):
            write_obj(path, self.vertices, self.faces)
        elif path.endswith('.ply'):
            write_ply(path, self.vertices, self.faces)
        else:
            raise ValueError(f'Unsupported mesh format: {path}')
        return path

    @property
    def triangles(self) -> np.ndarray:
        return self.vertices[self.faces]

    def __repr__(self):
        return f'Mesh(V={len(self.vertices)}, F={len(self.faces)})'


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------

def load_obj(path: str) -> Mesh:
    verts, faces = [], []
    with open(path, 'r', errors='replace') as f:
        for line in f:
            if line.startswith('v '):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith('f '):
                idx = []
                for tok in line.split()[1:]:
                    s = tok.split('/')[0]
                    i = int(s)
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                # fan-triangulate polygons
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return Mesh(np.asarray(verts, np.float64),
                np.asarray(faces, np.int64) if faces else np.zeros((0, 3), np.int64))


def load_ply(path: str) -> Mesh:
    with open(path, 'rb') as f:
        header = []
        while True:
            line = f.readline().decode('ascii', errors='replace').strip()
            header.append(line)
            if line == 'end_header':
                break
        fmt = next(l.split()[1] for l in header if l.startswith('format'))
        n_verts = n_faces = 0
        vert_props = []
        cur = None
        for l in header:
            if l.startswith('element vertex'):
                n_verts = int(l.split()[2])
                cur = 'v'
            elif l.startswith('element face'):
                n_faces = int(l.split()[2])
                cur = 'f'
            elif l.startswith('property') and cur == 'v':
                vert_props.append(l.split()[1:])
        if fmt == 'ascii':
            verts = []
            for _ in range(n_verts):
                vals = f.readline().split()
                verts.append([float(vals[0]), float(vals[1]), float(vals[2])])
            faces = []
            for _ in range(n_faces):
                vals = f.readline().split()
                cnt = int(vals[0])
                idx = [int(v) for v in vals[1:1 + cnt]]
                for k in range(1, cnt - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
            return Mesh(verts, faces or np.zeros((0, 3), np.int64))
        # binary little/big endian
        endian = '<' if 'little' in fmt else '>'
        type_map = {'float': 'f4', 'float32': 'f4', 'double': 'f8',
                    'float64': 'f8', 'uchar': 'u1', 'uint8': 'u1',
                    'char': 'i1', 'int8': 'i1', 'short': 'i2', 'ushort': 'u2',
                    'int': 'i4', 'int32': 'i4', 'uint': 'u4', 'uint32': 'u4'}
        vdt = np.dtype([(f'p{i}', endian + type_map[p[0]])
                        for i, p in enumerate(vert_props)])
        vdata = np.frombuffer(f.read(vdt.itemsize * n_verts), dtype=vdt)
        verts = np.stack([vdata['p0'], vdata['p1'], vdata['p2']], 1).astype(np.float64)
        faces = []
        for _ in range(n_faces):
            cnt = np.frombuffer(f.read(1), dtype=endian + 'u1')[0]
            idx = np.frombuffer(f.read(4 * cnt), dtype=endian + 'i4')
            for k in range(1, cnt - 1):
                faces.append([idx[0], idx[k], idx[k + 1]])
        return Mesh(verts, faces or np.zeros((0, 3), np.int64))


def load_mesh(path: str) -> Mesh:
    """Load OBJ or PLY (reference utils.load_mesh flattens scenes; our OBJ
    parser already merges all geometry into one vertex/face soup)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == '.obj':
        return load_obj(path)
    if ext == '.ply':
        return load_ply(path)
    raise ValueError(f'Unsupported mesh format: {path}')


# ---------------------------------------------------------------------------
# Writers (reference: utils.py:222-250)
# ---------------------------------------------------------------------------

def write_obj(fname: str, vertices, triangles) -> None:
    vertices = np.asarray(vertices)
    triangles = np.asarray(triangles) if len(triangles) else np.zeros((0, 3), int)
    with open(fname, 'w') as f:
        for v in vertices:
            f.write(f'v {v[0]} {v[1]} {v[2]}\n')
        for t in triangles:
            f.write(f'f {int(t[0]) + 1} {int(t[1]) + 1} {int(t[2]) + 1}\n')


def write_ply(fname: str, vertices, triangles) -> None:
    vertices = np.asarray(vertices)
    triangles = np.asarray(triangles) if len(triangles) else np.zeros((0, 3), int)
    with open(fname, 'w') as f:
        f.write('ply\nformat ascii 1.0\n')
        f.write(f'element vertex {len(vertices)}\n')
        f.write('property float x\nproperty float y\nproperty float z\n')
        f.write(f'element face {len(triangles)}\n')
        f.write('property list uchar int vertex_index\nend_header\n')
        for v in vertices:
            f.write(f'{v[0]} {v[1]} {v[2]}\n')
        for t in triangles:
            f.write(f'3 {int(t[0])} {int(t[1])} {int(t[2])}\n')


# ---------------------------------------------------------------------------
# Analytic test meshes
# ---------------------------------------------------------------------------

def make_box(center=(0, 0, 0), extents=(1, 1, 1)) -> Mesh:
    c = np.asarray(center, float)
    e = np.asarray(extents, float) / 2.0
    corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                        for sz in (-1, 1)], float)
    verts = c + corners * e
    # 12 triangles with outward winding
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1), (2, 3, 7, 6),
             (0, 2, 6, 4), (1, 5, 7, 3)]
    faces = []
    for q in quads:
        faces.append([q[0], q[1], q[2]])
        faces.append([q[0], q[2], q[3]])
    return Mesh(verts, faces)


def make_icosphere(subdivisions: int = 3, radius: float = 1.0) -> Mesh:
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                      [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                      [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], float)
    verts /= np.linalg.norm(verts[0])
    faces = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                      [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                      [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                      [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                     np.int64)
    for _ in range(subdivisions):
        cache = {}
        verts = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key in cache:
                return cache[key]
            m = (np.asarray(verts[a]) + np.asarray(verts[b])) / 2.0
            m = m / np.linalg.norm(m)
            cache[key] = len(verts)
            verts.append(m)
            return cache[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        faces = np.asarray(new_faces, np.int64)
        verts = np.asarray(verts)
    return Mesh(np.asarray(verts) * radius, faces)
