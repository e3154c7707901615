"""Mesh core unit tests: generators, topology, geometry, marking."""

import numpy as np
import pytest

from fenicssolver_tpu.core import (
    AutoSubDomain,
    BoxMesh,
    IntervalMesh,
    MeshFunction,
    Point,
    RectangleMesh,
    UnitCubeMesh,
    UnitSquareMesh,
    near,
)


def test_generator_volumes():
    assert abs(UnitSquareMesh(5, 7).cell_volumes().sum() - 1.0) < 1e-12
    assert abs(UnitCubeMesh(3, 4, 5).cell_volumes().sum() - 1.0) < 1e-12
    m = RectangleMesh(Point(1, 2), Point(4, 6), 5, 5)
    assert abs(m.cell_volumes().sum() - 12.0) < 1e-12
    m = BoxMesh(Point(0, 0, 0), Point(2, 3, 4), 2, 2, 2)
    assert abs(m.cell_volumes().sum() - 24.0) < 1e-12
    m = UnitSquareMesh(4, 4, diagonal="crossed")
    assert abs(m.cell_volumes().sum() - 1.0) < 1e-12
    m = IntervalMesh(10, 0.0, 2.0)
    assert abs(m.cell_volumes().sum() - 2.0) < 1e-12


def test_euler_characteristic_2d():
    m = UnitSquareMesh(6, 5)
    # V - E + F = 1 for a disk
    assert m.num_vertices() - m.num_edges() + m.num_cells() == 1


def test_exterior_facets_and_normals():
    m = UnitSquareMesh(4, 4)
    ext = m.exterior_facets()
    assert len(ext) == 16  # 4 edges per side
    n = m.facet_normals()[ext]
    mids = m.midpoints("facet")[ext]
    # outward: normal points away from the unit-square center
    outward = np.einsum("fg,fg->f", n, mids - 0.5)
    assert (outward > 0).all()
    # boundary facet area total = perimeter
    assert abs(m.facet_areas()[ext].sum() - 4.0) < 1e-12


def test_boundary_area_3d():
    m = UnitCubeMesh(3, 3, 3)
    ext = m.exterior_facets()
    assert abs(m.facet_areas()[ext].sum() - 6.0) < 1e-12


def test_marking_and_meshfunction():
    m = UnitSquareMesh(6, 6)
    mf = MeshFunction("size_t", m, m.tdim - 1)
    mf.set_all(0)
    AutoSubDomain(lambda x: near(x[0], 0.0)).mark(mf, 7)
    ids = mf.where_equal(7)
    assert len(ids) == 6
    assert np.allclose(m.midpoints("facet")[ids][:, 0], 0.0)
    cf = MeshFunction("size_t", m, m.tdim)
    AutoSubDomain(lambda x: x[0] <= 0.5 + 1e-12).mark(cf, 3)
    assert (m.midpoints("cell")[cf.where_equal(3)][:, 0] < 0.5).all()


def test_circumradius_equilateral():
    coords = np.array([[0, 0], [1, 0], [0.5, np.sqrt(3) / 2]])
    cells = np.array([[0, 1, 2]])
    from fenicssolver_tpu.core.mesh import Mesh

    m = Mesh(coords, cells)
    assert abs(m.cell_circumradius()[0] - 1 / np.sqrt(3)) < 1e-12


def test_ale_move_invalidates_geometry():
    m = UnitSquareMesh(3, 3)
    v0 = m.cell_volumes().sum()
    disp = np.zeros_like(m.coords)
    disp[:, 0] = 0.5 * m.coords[:, 0]  # stretch x by 1.5
    m.move(disp)
    assert abs(m.cell_volumes().sum() - 1.5 * v0) < 1e-12


def test_meshgen_helpers():
    from fenicssolver_tpu.core.meshgen import elbow_mesh, rectangle_with_hole

    m = rectangle_with_hole((0, 0), (2.2, 0.41), (0.2, 0.2), 0.05, 16)
    assert m.num_cells() > 100
    # hole carved: no cell midpoint inside the cylinder
    d = np.linalg.norm(m.midpoints("cell") - [0.2, 0.2], axis=1)
    assert d.min() > 0.045
    area = m.cell_volumes().sum()
    assert abs(area - (2.2 * 0.41 - np.pi * 0.05**2)) < 0.01
    e = elbow_mesh(10)
    assert abs(e.cell_volumes().sum() - 7.0) < 0.05  # 1x4 + 3x1 duct area
