"""Assimp-style JSON mesh parser -> flat triangle soup.

Reproduces the reference parser's semantics
(ref tri/meshDataVersion1.js:12-78):
  * per-node column-major modelMatrix applied to positions (gl-matrix mat4)
  * normal matrix = inverse-transpose of the upper 3x3 applied to normals
  * indexed or unindexed meshes; 3 vertices/triangle flat output
  * per-triangle material index; materials carry diffuseReflectance rgba
  * bounds computed over transformed positions

Output is numpy SoA (positions (T,3,3), normals (T,3,3), mat ids (T,)).
"""
from __future__ import annotations

import dataclasses
import json

import numpy as np


@dataclasses.dataclass
class MeshData:
    n_triangles: int
    positions: np.ndarray      # (T, 3, 3) float32
    normals: np.ndarray        # (T, 3, 3) float32
    material_indices: np.ndarray  # (T,) int32
    materials: np.ndarray      # (M, 4) float32 diffuse rgba
    tcoords: np.ndarray | None # (T, 3, 2) or None
    bounds_min: np.ndarray
    bounds_max: np.ndarray


def _mat4(col_major16) -> np.ndarray:
    """gl-matrix column-major 16-vector -> (4,4) row-major numpy matrix."""
    return np.asarray(col_major16, np.float64).reshape(4, 4).T


def _normal_matrix(m4: np.ndarray) -> np.ndarray:
    """inverse-transpose of the upper-left 3x3 (ref mat3.normalFromMat4)."""
    a = m4[:3, :3]
    try:
        return np.linalg.inv(a).T
    except np.linalg.LinAlgError:
        return np.eye(3)


def parse_mesh_json(text: str) -> MeshData:
    model = json.loads(text)
    positions, normals, tcoords, mat_ids = [], [], [], []
    has_tc = True

    nodes = model.get("nodes")
    n_nodes = len(nodes) if nodes else 1
    for k in range(n_nodes):
        if nodes:
            m4 = _mat4(nodes[k]["modelMatrix"])
            mesh_indices = nodes[k]["meshIndices"]
        else:
            m4 = np.eye(4)
            mesh_indices = list(range(len(model["meshes"])))
        n3 = _normal_matrix(m4)
        for index in mesh_indices:
            mesh = model["meshes"][index]
            mat_index = mesh.get("materialIndex", 0)
            vp = np.asarray(mesh["vertexPositions"], np.float64).reshape(-1, 3)
            vn = np.asarray(mesh["vertexNormals"], np.float64).reshape(-1, 3)
            tcs = mesh.get("vertexTexCoordinates")
            tc = (np.asarray(tcs[0], np.float64).reshape(-1, 2)
                  if tcs and len(tcs) > 0 and tcs[0] else None)
            idx = mesh.get("indices")
            if idx is not None:
                idx = np.asarray(idx, np.int64)
            else:
                idx = np.arange(vp.shape[0])
            tri_idx = idx.reshape(-1, 3)

            # transform
            vp_t = vp @ m4[:3, :3].T + m4[:3, 3]
            vn_t = vn @ n3.T

            positions.append(vp_t[tri_idx])    # (t, 3, 3)
            normals.append(vn_t[tri_idx])
            mat_ids.append(np.full(tri_idx.shape[0], mat_index, np.int32))
            if tc is not None:
                tcoords.append(tc[tri_idx])
            else:
                has_tc = False

    if positions:
        p = np.concatenate(positions).astype(np.float32)
        n = np.concatenate(normals).astype(np.float32)
        mi = np.concatenate(mat_ids)
    else:
        p = np.zeros((0, 3, 3), np.float32)
        n = np.zeros((0, 3, 3), np.float32)
        mi = np.zeros((0,), np.int32)

    materials = []
    for m in model.get("materials", []):
        materials.append(m["diffuseReflectance"])
    materials = (np.asarray(materials, np.float32).reshape(-1, 4)
                 if materials else np.ones((1, 4), np.float32))

    if p.size:
        lo = p.reshape(-1, 3).min(0)
        hi = p.reshape(-1, 3).max(0)
    else:
        lo = np.full(3, np.inf, np.float32)
        hi = np.full(3, -np.inf, np.float32)

    return MeshData(n_triangles=p.shape[0], positions=p, normals=n,
                    material_indices=mi, materials=materials,
                    tcoords=(np.concatenate(tcoords).astype(np.float32)
                             if (has_tc and tcoords) else None),
                    bounds_min=lo, bounds_max=hi)


def load_mesh_json(path: str) -> MeshData:
    with open(path, "r") as f:
        return parse_mesh_json(f.read())


# -- mesh-instance transforms (ref Mesh.normalize/scale/translate,
#    Assign10-Path_Tracing/code.js:112-170) --------------------------------

def normalize_unit_cube(md: MeshData) -> MeshData:
    """Center at origin and scale so the longest axis spans 1 (ref
    Mesh.normalize code.js:112-137 — scales by 1/maxdim about the center)."""
    center = 0.5 * (md.bounds_min + md.bounds_max)
    dims = md.bounds_max - md.bounds_min
    s = 1.0 / max(float(dims.max()), 1e-30)
    p = (md.positions - center) * s
    return dataclasses.replace(
        md, positions=p.astype(np.float32),
        bounds_min=((md.bounds_min - center) * s).astype(np.float32),
        bounds_max=((md.bounds_max - center) * s).astype(np.float32))


def scale(md: MeshData, sx, sy, sz) -> MeshData:
    s = np.asarray([sx, sy, sz], np.float32)
    return dataclasses.replace(
        md, positions=(md.positions * s).astype(np.float32),
        bounds_min=(md.bounds_min * s).astype(np.float32),
        bounds_max=(md.bounds_max * s).astype(np.float32))


def translate(md: MeshData, tx, ty, tz) -> MeshData:
    t = np.asarray([tx, ty, tz], np.float32)
    return dataclasses.replace(
        md, positions=(md.positions + t).astype(np.float32),
        bounds_min=(md.bounds_min + t).astype(np.float32),
        bounds_max=(md.bounds_max + t).astype(np.float32))
