"""Native C++ I/O layer (native/ekio.cpp via ekpnp.io.native).

Checks byte-exact parity with the pure-Python formatters that mirror the
reference's stdio formats (tecplot body LBM.cu:2555-2562, data_end table
LBM.cu:2613-2624), and the fast parser against np.loadtxt.
"""
import numpy as np
import pytest

from ekpnp.io import native  # hard import: a native build break must FAIL,
# not skip — the ctypes loader auto-builds from source (make -C native,
# seconds), and the runtime fallback to pure Python would otherwise
# silently mask the break (round-4 verdict item 9; .so is untracked now)


def test_native_library_loaded():
    """The runtime fast paths (tecplot.py, checkpoint.py) must actually be
    running on the native library, not the silent Python fallback."""
    assert native._lib is not None
    import os

    assert os.path.exists(native._SO)


def test_tecplot_format_parity():
    rng = np.random.default_rng(42)
    n = 2000
    scales = 10.0 ** rng.integers(-8, 8, size=n)
    cols = [rng.standard_normal(n) * scales for _ in range(14)]
    cols[0][:3] = [0.0, -0.0, 1e-300]
    body = native.format_tecplot(cols)
    rows = body.split("\n")
    data = np.stack(cols, axis=1)
    for i in range(n):
        ref = (
            "%g %g %g %g %g %g %g %g %10.6f %10.6f %10.6f %10.6f %10.6f %10.6f"
            % tuple(data[i])
        )
        assert rows[i] == ref, f"row {i}"
    assert rows[n] == ""  # trailing newline


def test_table_format_and_parse_roundtrip():
    rng = np.random.default_rng(7)
    cols = [rng.standard_normal(300) * s for s in [1, 1e-3, 1e3] * 4]
    body = native.format_table(cols)
    tab = np.stack(cols, axis=1)
    assert body.split("\n")[5] == " ".join(f"{v:10.6f}" for v in tab[5])
    parsed = native.parse_table(body, 300, 12)
    np.testing.assert_allclose(parsed, np.round(tab, 6), atol=1e-9)
    ref = np.loadtxt(body.splitlines())
    np.testing.assert_array_equal(parsed, ref)


def test_parse_count_mismatch_raises():
    with pytest.raises(ValueError):
        native.parse_table("1.0 2.0\n3.0\n", 2, 2)


def test_checkpoint_ascii_uses_native(tmp_path):
    """End-to-end: reference-layout checkpoint writes+reads through the
    native path and restores bit-identical macroscopic fields (to the
    10^-6 ASCII rounding the reference itself has)."""
    from ekpnp import preset
    from ekpnp.init import initialize
    from ekpnp.io.checkpoint import load_reference_ascii, save_reference_ascii

    cfg = preset("reference", nx=8, ny=8, nz=9)
    from ekpnp.ops.poisson import efield

    state, macro = initialize(cfg)
    phi, E = state.phi, efield(cfg, state.phi)
    p = tmp_path / "data_end.dat"
    save_reference_ascii(str(p), cfg, macro, phi, E, t=1.5e-9)
    st = load_reference_ascii(str(p), cfg)
    # populations were re-equilibrated; zeroth moments restore the macros
    rho = np.asarray(st.f.sum(axis=0))
    charge = np.asarray(st.h.sum(axis=0))
    from ekpnp.diagnostics import wall_extrapolate

    rho_ref = np.asarray(wall_extrapolate(macro.rho))
    ch_ref = np.asarray(wall_extrapolate(macro.charge))
    np.testing.assert_allclose(rho[1:-1], rho_ref[1:-1], atol=2e-6)
    np.testing.assert_allclose(charge[1:-1], ch_ref[1:-1], atol=2e-6)
    np.testing.assert_allclose(np.asarray(st.phi), np.asarray(phi), atol=2e-6)


def test_full_checkpoint_bit_exact_resume(tmp_path):
    """Lossless extension beyond the reference (SURVEY.md §2.4 D5): a
    save_full_npz/load_full_npz round trip must continue the run
    bit-identically — run(6) == run(3) -> save -> load -> run(3)."""
    import jax
    import jax.numpy as jnp

    from ekpnp import preset
    from ekpnp.init import initialize
    from ekpnp.io import checkpoint as ckpt
    from ekpnp.step import step

    cfg = preset("reference", nx=8, ny=8, nz=9)
    state, _ = initialize(cfg)

    ref = state
    for _ in range(6):
        ref, _ = step(cfg, ref)

    mid = state
    for _ in range(3):
        mid, _ = step(cfg, mid)
    path = str(tmp_path / "state_end.npz")
    ckpt.save_full_npz(path, cfg, mid)
    assert ckpt.is_full_checkpoint(path)
    assert not ckpt.is_full_checkpoint(path.replace(".npz", ".dat"))
    resumed = ckpt.load_full_npz(path, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(mid), jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for _ in range(3):
        resumed, _ = step(cfg, resumed)

    for name in ("f", "h", "hn", "g", "phi"):
        a, b = getattr(ref, name), getattr(resumed, name)
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"field {name} diverged"
        )
    assert float(ref.t) == float(resumed.t)


def test_full_checkpoint_rejects_mismatched_config(tmp_path):
    from ekpnp import preset
    from ekpnp.init import initialize
    from ekpnp.io import checkpoint as ckpt

    cfg = preset("reference", nx=8, ny=8, nz=9)
    state, _ = initialize(cfg)
    path = str(tmp_path / "s.npz")
    ckpt.save_full_npz(path, cfg, state)

    with pytest.raises(ValueError, match="grid"):
        ckpt.load_full_npz(path, preset("reference", nx=16, ny=8, nz=9))
    with pytest.raises(ValueError, match="lattice"):
        ckpt.load_full_npz(
            path, preset("reference", nx=8, ny=8, nz=9, scalar_lattice="D3Q7")
        )


def test_vtk_roundtrip(tmp_path):
    """VTK snapshot carries exactly the tecplot columns (same wall
    extrapolation), x-fastest point order, big-endian doubles."""
    from ekpnp import preset
    from ekpnp.init import initialize
    from ekpnp.io.tecplot import _gather_columns
    from ekpnp.io.vtk import read_vtk, write_vtk
    from ekpnp.ops.collide import compute_macro
    from ekpnp.ops.poisson import efield

    cfg = preset("reference", nx=8, ny=4, nz=9)
    state, macro = initialize(cfg)
    E = efield(cfg, state.phi)
    path = str(tmp_path / "f.vtk")
    write_vtk(path, cfg, macro, state.phi, E, 1.25e-8)
    got = read_vtk(path)
    cols = _gather_columns(cfg, macro, state.phi, E)

    np.testing.assert_array_equal(got["velocity"], np.stack(cols[3:6], axis=1))
    np.testing.assert_array_equal(got["p"], cols[6])
    np.testing.assert_array_equal(got["charge"], cols[7])
    np.testing.assert_array_equal(got["neg_charge"], cols[8])
    np.testing.assert_array_equal(got["phi"], cols[9])
    np.testing.assert_array_equal(got["E"], np.stack(cols[10:13], axis=1))
    np.testing.assert_array_equal(got["Temperature"], cols[13])

    header = open(path, "rb").read(400).split(b"\n")
    assert b"DIMENSIONS 8 4 9" in header
    assert any(line.startswith(b"SPACING") for line in header)
