"""Lattice invariants (SURVEY.md §4.1)."""
import numpy as np
import pytest

from ekpnp.lattice import get_lattice


@pytest.mark.parametrize("name", ["D3Q27", "D3Q19", "D3Q7"])
def test_weight_sum(name):
    lat = get_lattice(name)
    assert lat.weight_sum() == pytest.approx(1.0, abs=1e-15)


@pytest.mark.parametrize("name", ["D3Q27", "D3Q19", "D3Q7"])
def test_first_moment_zero(name):
    lat = get_lattice(name)
    np.testing.assert_allclose(lat.first_moment(), 0.0, atol=1e-15)


@pytest.mark.parametrize("name", ["D3Q27", "D3Q19", "D3Q7"])
def test_second_moment_isotropy(name):
    # sum_i w_i e_ia e_ib = cs_lat^2 delta_ab (1/3 full, 1/4 for D3Q7)
    lat = get_lattice(name)
    np.testing.assert_allclose(
        lat.second_moment(), np.eye(3) * lat.cs2_lat, atol=1e-15
    )
    assert lat.cs2_lat == pytest.approx(0.25 if name == "D3Q7" else 1.0 / 3.0)


@pytest.mark.parametrize("name", ["D3Q27", "D3Q19", "D3Q7"])
def test_opposites(name):
    lat = get_lattice(name)
    assert lat.OPP[0] == 0
    for d in range(lat.Q):
        np.testing.assert_array_equal(lat.E[lat.OPP[d]], -lat.E[d])
        assert lat.W[lat.OPP[d]] == lat.W[d]


def test_d3q27_reference_ordering():
    """Direction ordering must match the reference streaming stencil
    (LBM.cu:1983-2008) — spot-check the entries the moment sums rely on
    (LBM.cu:639-644)."""
    lat = get_lattice("D3Q27")
    plus_x = {1, 7, 9, 13, 15, 19, 21, 23, 26}
    plus_y = {3, 7, 11, 14, 17, 19, 21, 24, 25}
    plus_z = {5, 9, 11, 16, 18, 19, 22, 23, 25}
    assert {d for d in range(27) if lat.E[d, 0] == 1} == plus_x
    assert {d for d in range(27) if lat.E[d, 1] == 1} == plus_y
    assert {d for d in range(27) if lat.E[d, 2] == 1} == plus_z


def test_d3q27_weights_match_reference():
    lat = get_lattice("D3Q27")
    assert lat.W[0] == pytest.approx(8.0 / 27.0)
    assert all(lat.W[i] == pytest.approx(2.0 / 27.0) for i in range(1, 7))
    assert all(lat.W[i] == pytest.approx(1.0 / 54.0) for i in range(7, 19))
    assert all(lat.W[i] == pytest.approx(1.0 / 216.0) for i in range(19, 27))
