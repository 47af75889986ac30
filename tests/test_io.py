"""Ingest parsers vs the reference's data files (read-only from
/root/reference; skipped if absent)."""
import os

import numpy as np
import pytest

from raytracing_tpu.io.mesh_json import (
    load_mesh_json, normalize_unit_cube, parse_mesh_json, scale, translate,
)
from raytracing_tpu.io.pdb import parse_pdb, load_pdb
from raytracing_tpu.io.png import tonemap_u8, write_png
from raytracing_tpu.io.scene_xml import load_scene

REF = os.environ.get("RT_REFERENCE_DIR", "/root/reference")
needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference not mounted")


def test_pdb_synthetic():
    text = """\
ATOM      1  C1  LIG A   1       1.000   2.000   3.000  1.00  0.00           C
ATOM      2  O1  LIG A   1      -1.000   0.000   0.500  1.00  0.00           O
HETATM    3  H1  LIG A   1       0.000   0.000   0.000  1.00  0.00           H
"""
    mol = parse_pdb(text)
    assert mol.size == 3
    np.testing.assert_allclose(mol.centers[0], [1, 2, 3])
    # vdW radii: C=1.7, O=1.52, H=1.2 (Bondi; ref pdbParserV1.js:7-9)
    np.testing.assert_allclose(mol.radii, [1.7, 1.52, 1.2])
    # CPK colors: C grey, O red-ish
    assert mol.colors.shape[1] == 4
    assert mol.colors[mol.color_ids[1]][0] == 0xCC / 255
    # bounds grown by radius
    np.testing.assert_allclose(mol.bounds_min,
                               np.min(mol.centers - mol.radii[:, None], 0))


def test_pdb_conect_bonds():
    text = """\
ATOM      1  C1  LIG A   1       0.000   0.000   0.000  1.00  0.00           C
ATOM      2  C2  LIG A   1       1.500   0.000   0.000  1.00  0.00           C
ATOM      3  O1  LIG A   1       3.000   0.000   0.000  1.00  0.00           O
CONECT    1    2
CONECT    2    1    3
"""
    mol = parse_pdb(text)
    assert (0, 1) in mol.bonds and (1, 2) in mol.bonds


def test_pdb_element_fallback_from_atom_name():
    # element columns blank -> fall back to atom-name field (ref js:30-32)
    text = "ATOM      1  N   LIG A   1       0.000   0.000   0.000\n"
    mol = parse_pdb(text)
    assert mol.size == 1
    np.testing.assert_allclose(mol.radii, [1.55])  # N


@needs_ref
def test_pdb_reference_molecules():
    mol = load_pdb(f"{REF}/Assign02-Multi_Sphere_Ray_Tracing/mol/c60.pdb")
    assert mol.size == 60                      # buckyball: 60 carbons
    assert len(np.unique(mol.color_ids)) == 1  # all C
    np.testing.assert_allclose(mol.radii, 1.7)
    big = load_pdb(f"{REF}/Assign02-Multi_Sphere_Ray_Tracing/mol/hemog.pdb")
    assert big.size > 1000                     # SURVEY: hemog ~1249 atoms


def test_mesh_json_synthetic():
    doc = """{
      "meshes": [{
        "materialIndex": 0,
        "vertexPositions": [0,0,0, 1,0,0, 0,1,0, 1,1,0],
        "vertexNormals":   [0,0,1, 0,0,1, 0,0,1, 0,0,1],
        "indices": [0,1,2, 2,1,3]
      }],
      "materials": [{"diffuseReflectance": [0.5, 0.6, 0.7, 1.0]}]
    }"""
    md = parse_mesh_json(doc)
    assert md.n_triangles == 2
    assert md.positions.shape == (2, 3, 3)
    np.testing.assert_allclose(md.materials[0], [0.5, 0.6, 0.7, 1.0])
    np.testing.assert_allclose(md.bounds_min, [0, 0, 0])
    np.testing.assert_allclose(md.bounds_max, [1, 1, 0])

    n = normalize_unit_cube(md)
    assert np.isclose(max(n.bounds_max - n.bounds_min), 1.0)
    s = scale(n, 2.0, 2.0, 2.0)
    assert np.isclose(max(s.bounds_max - s.bounds_min), 2.0)
    t = translate(s, 1.0, 0.0, 0.0)
    np.testing.assert_allclose(t.bounds_min + t.bounds_max,
                               s.bounds_min + s.bounds_max + [2, 0, 0],
                               atol=1e-6)


@needs_ref
def test_mesh_json_reference_meshes():
    tea = load_mesh_json(f"{REF}/Assign10-Path_Tracing/tri/teapot.json")
    assert tea.n_triangles == 992              # SURVEY: teapot 992 tris
    boxes = load_mesh_json(f"{REF}/Assign10-Path_Tracing/tri/boxes.json")
    assert boxes.n_triangles == 20             # SURVEY: boxes 20 tris
    # normals sane
    nn = np.linalg.norm(tea.normals.reshape(-1, 3), axis=-1)
    assert (nn > 1e-3).mean() > 0.99


@needs_ref
def test_scene_xml_cornell_teapot():
    scene = load_scene(
        f"{REF}/Assign10-Path_Tracing/scenes/cornell_teapot.xml", 64, 48)
    assert scene.lights.count == 1
    np.testing.assert_allclose(np.asarray(scene.lights.position[0]),
                               [0, 0.75, 0])
    assert scene.materials.shape[0] == 8       # 8 named materials
    assert scene.spheres.count == 1            # one blue sphere
    assert scene.triangles.count == 10         # 5 walls x 2
    assert len(scene.meshes) == 2              # teapot + boxes
    assert scene.meshes[0].nslabs == 10
    assert scene.meshes[1].nslabs == 5
    assert scene.meshes[0].tris.count == 992
    assert float(scene.focal_length) == 2.0
    assert np.isclose(float(scene.lens_radius), 0.005)
    # meshes normalized+scaled+translated into the box (the boxes mesh
    # legitimately pokes below the floor: normalize keeps aspect, translate
    # -0.7 puts its bottom at y ~ -1.12, hidden by the floor plane)
    for m in scene.meshes:
        assert (np.asarray(m.bounds_min) >= -1.2).all()
        assert (np.asarray(m.bounds_max) <= 1.2).all()
    # teapot is unit-normalized * 0.7: longest axis spans exactly 0.7
    tspan = np.asarray(scene.meshes[0].bounds_max) - \
        np.asarray(scene.meshes[0].bounds_min)
    assert np.isclose(tspan.max(), 0.7, atol=1e-3)


@needs_ref
def test_scene_xml_assign08_point_lights():
    scene = load_scene(
        f"{REF}/Assign08-Shadow_Tracing/scenes/cornell.xml", 32, 24)
    assert scene.lights.count >= 1
    assert float(scene.lights.radius[0]) == 0.0   # point light -> radius 0


def test_png_roundtrip(tmp_path):
    img = (np.linspace(0, 1, 12 * 8 * 3).reshape(8, 12, 3))
    path = str(tmp_path / "t.png")
    write_png(path, img)
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data and b"IEND" in data


def test_tonemap():
    acc = np.full((4, 3), 0.5)
    u8 = tonemap_u8(acc, divisor=1.0, exposure=1.8)
    assert u8.dtype == np.uint8
    assert (u8 == int(0.9 * 255)).all()
    # clamps
    u8 = tonemap_u8(np.full((4, 3), 10.0), divisor=1.0)
    assert (u8 == 255).all()
