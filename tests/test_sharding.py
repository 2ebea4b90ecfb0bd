"""Distributed tests on the virtual 8-device CPU mesh (SURVEY.md §4.4).

Single-chip vs N-chip equality: identical initial state stepped on one
device and on a slab/pencil mesh must agree to f64 roundoff (reduction
order may differ inside collectives)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ekpnp import preset
from ekpnp.init import initialize
from ekpnp.parallel import mesh as pmesh
from ekpnp.step import step


@pytest.mark.parametrize("pencil", [False, True])
def test_single_vs_multichip_equality(eight_devices, pencil):
    cfg = preset("reference", nx=16, ny=8, nz=17, fft_method="matmul")
    state, _ = initialize(cfg)

    # single device, 3 steps (same spectral backend as the sharded run)
    s1 = state
    for _ in range(3):
        s1, m1 = step(cfg, s1)

    # 8 virtual devices, same program
    m = pmesh.make_mesh(eight_devices, pencil=pencil)
    sharded = pmesh.shard_state(cfg, m, state)
    step_fn = pmesh.make_sharded_step(cfg, m)
    s8 = sharded
    for _ in range(3):
        s8, m8 = step_fn(s8)

    tols = dict(atol=1e-14, rtol=1e-12)
    for a, b, name in [
        (s1.f, s8.f, "f"),
        (s1.h, s8.h, "h"),
        (s1.hn, s8.hn, "hn"),
        (s1.g, s8.g, "g"),
        (s1.phi, s8.phi, "phi"),
    ]:
        np.testing.assert_allclose(
            np.asarray(a),
            np.asarray(b),
            err_msg=name,
            **tols,
        )


def test_sharded_multi_step_runs(eight_devices):
    cfg = preset("reference", nx=16, ny=8, nz=17)
    state, _ = initialize(cfg)
    m = pmesh.make_mesh(eight_devices)
    sharded = pmesh.shard_state(cfg, m, state)
    run = pmesh.make_sharded_multi_step(cfg, m, 5)
    out = run(sharded)
    assert np.isfinite(np.asarray(out.f)).all()


def test_indivisible_mesh_rejected(eight_devices):
    cfg = preset("reference", nx=16, ny=12, nz=17)
    m = pmesh.make_mesh(eight_devices)
    state, _ = initialize(cfg)
    with pytest.raises(ValueError, match="not divisible"):
        pmesh.shard_state(cfg, m, state)


def test_halo_shardmap_matches_single_pallas(eight_devices):
    """The multi-chip fast path (fused Pallas kernel per y-shard +
    ppermute halo blocks, parallel/halo.py) must reproduce the
    single-device fused step to f64 roundoff."""
    from ekpnp.parallel import halo as phalo
    from ekpnp.pallas.step import step_pallas

    cfg = preset(
        "reference", nx=16, ny=32, nz=9, fft_method="matmul", use_pallas=True
    )
    state, _ = initialize(cfg)

    s1 = state
    for _ in range(2):
        s1, _ = step_pallas(cfg, s1, interpret=True)

    m = pmesh.make_mesh(eight_devices[:4], pencil=False)
    assert phalo.supports_halo_step(cfg, m)
    s4 = pmesh.shard_state(cfg, m, state)
    for _ in range(2):
        s4 = phalo.step_halo(cfg, s4, m, interpret=True)

    for name in ("f", "h", "hn", "g", "phi"):
        a, b = getattr(s1, name), getattr(s4, name)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-11, atol=1e-13, err_msg=name
        )


def test_halo_shardmap_injection_bc(eight_devices):
    """The charge-injection Dirichlet BC (reference LBM.cu:2231-2292)
    through the shard_map halo path equals the single-device fused step —
    the wall anti-bounce-back happens per shard inside emit_wall."""
    from ekpnp.parallel import halo as phalo
    from ekpnp.pallas.step import step_pallas

    cfg = preset("reference", nx=16, ny=32, nz=9, fft_method="matmul",
                 use_pallas=True, charge_bc="injection")
    state, _ = initialize(cfg)
    s1 = state
    for _ in range(2):
        s1, _ = step_pallas(cfg, s1, interpret=True)
    m = pmesh.make_mesh(eight_devices[:4], pencil=False)
    s4 = pmesh.shard_state(cfg, m, state)
    for _ in range(2):
        s4 = phalo.step_halo(cfg, s4, m, interpret=True)
    for name in ("f", "h", "hn", "phi"):
        np.testing.assert_allclose(
            np.asarray(getattr(s1, name)), np.asarray(getattr(s4, name)),
            rtol=1e-11, atol=1e-13, err_msg=name)


def test_halo_shardmap_d3q7_scalars(eight_devices):
    """Mixed per-field lattices (D3Q27 fluid + D3Q7 scalars) through the
    shard_map halo path: the exchanged halo blocks have per-field
    direction counts."""
    from ekpnp.parallel import halo as phalo
    from ekpnp.pallas.step import step_pallas

    cfg = preset("reference", nx=16, ny=32, nz=9, fft_method="matmul",
                 use_pallas=True, scalar_lattice="D3Q7")
    state, _ = initialize(cfg)
    assert state.h.shape[0] == 7 and state.f.shape[0] == 27
    s1 = state
    for _ in range(2):
        s1, _ = step_pallas(cfg, s1, interpret=True)

    m = pmesh.make_mesh(eight_devices[:4], pencil=False)
    s4 = pmesh.shard_state(cfg, m, state)
    for _ in range(2):
        s4 = phalo.step_halo(cfg, s4, m, interpret=True)
    for name in ("f", "h", "hn", "g", "phi"):
        np.testing.assert_allclose(
            np.asarray(getattr(s1, name)), np.asarray(getattr(s4, name)),
            rtol=1e-11, atol=1e-13, err_msg=name)


def test_halo_shardmap_single_species(eight_devices):
    """Single-species + fluid-only field layouts through the shard_map
    halo path (inactive fields are absent from the exchanged pytree)."""
    from ekpnp.parallel import halo as phalo
    from ekpnp.pallas.step import step_pallas

    cfg = preset("ek-channel", nx=16, ny=16, nz=9, fft_method="matmul",
                 use_pallas=True)
    state, _ = initialize(cfg)
    s1, _ = step_pallas(cfg, state, interpret=True)

    m = pmesh.make_mesh(eight_devices[:2], pencil=False)
    s2 = pmesh.shard_state(cfg, m, state)
    s2 = phalo.step_halo(cfg, s2, m, interpret=True)
    for name in ("f", "h", "phi"):
        np.testing.assert_allclose(
            np.asarray(getattr(s1, name)), np.asarray(getattr(s2, name)),
            rtol=1e-11, atol=1e-13, err_msg=name)
    assert s1.hn is None and s2.hn is None


def test_pencil_shardmap_matches_single_pallas(eight_devices):
    """The pencil fast path (fused Pallas kernel in its shard_x form per
    ("y", "x") shard + ppermute x-halo tiles, parallel/halo.py) must
    reproduce the single-device fused step to f64 roundoff — including
    the diagonal-corner streams (ey, ex both nonzero) that cross shard
    corners, exercised over 2 steps."""
    from ekpnp.parallel import halo as phalo
    from ekpnp.pallas.step import step_pallas

    cfg = preset(
        "reference", nx=32, ny=16, nz=9, fft_method="matmul", use_pallas=True
    )
    state, _ = initialize(cfg)

    s1 = state
    for _ in range(2):
        s1, _ = step_pallas(cfg, s1, interpret=True)

    m = pmesh.make_mesh(eight_devices, pencil=True)  # ("y", "x") = (2, 4)
    assert phalo.supports_halo_step(cfg, m, interpret=True)
    s8 = pmesh.shard_state(cfg, m, state)
    # through the production multi-step chunk (jit + scan + donation +
    # stable shardings), not just the single-step entry
    run = phalo.make_halo_multi_step(cfg, m, 2, interpret=True)
    s8 = run(s8)

    for name in ("f", "h", "hn", "g", "phi"):
        a, b = getattr(s1, name), getattr(s8, name)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-11, atol=1e-13, err_msg=name
        )


def test_pencil_shardmap_d3q7_injection(eight_devices):
    """Pencil fast path with mixed lattices (D3Q27 fluid + D3Q7 scalars)
    and the charge-injection Dirichlet BC on a (2, 2) mesh."""
    from ekpnp.parallel import halo as phalo
    from ekpnp.pallas.step import step_pallas

    cfg = preset("reference", nx=16, ny=16, nz=9, fft_method="matmul",
                 use_pallas=True, scalar_lattice="D3Q7",
                 charge_bc="injection")
    state, _ = initialize(cfg)
    s1 = state
    for _ in range(2):
        s1, _ = step_pallas(cfg, s1, interpret=True)

    m = pmesh.make_mesh(eight_devices[:4], pencil=True)  # (2, 2)
    s4 = pmesh.shard_state(cfg, m, state)
    for _ in range(2):
        s4 = phalo.step_halo(cfg, s4, m, interpret=True)
    for name in ("f", "h", "hn", "g", "phi"):
        np.testing.assert_allclose(
            np.asarray(getattr(s1, name)), np.asarray(getattr(s4, name)),
            rtol=1e-11, atol=1e-13, err_msg=name)


@pytest.mark.parametrize("pencil", [False, True])
def test_overlapped_chunk_bit_exact_vs_serial(eight_devices, pencil):
    """Halo-comm/compute overlap (SURVEY.md:305, round-5): the
    one-step-lookahead pipeline — each step's population-halo ppermutes
    issued right after its kernel so XLA can hide them under the spectral
    solve — moves the same rows through the same ppermutes as the serial
    exchange-then-kernel form, so overlap=True must be BIT-exact vs
    overlap=False, on slab and pencil meshes."""
    from ekpnp.parallel import halo as phalo

    cfg = preset("reference", nx=16, ny=32, nz=9, fft_method="matmul",
                 use_pallas=True, scalar_lattice="D3Q7")
    state, _ = initialize(cfg)
    m = pmesh.make_mesh(eight_devices[:4], pencil=pencil)

    def fresh():
        c = jax.tree_util.tree_map(lambda x: jnp.array(x), state,
                                   is_leaf=lambda x: x is None)
        return pmesh.shard_state(cfg, m, c)

    a = phalo.make_halo_multi_step(cfg, m, 3, interpret=True,
                                   overlap=False)(fresh())
    b = phalo.make_halo_multi_step(cfg, m, 3, interpret=True,
                                   overlap=True)(fresh())
    for name in ("f", "h", "hn", "g", "phi"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=name)


def test_sharded_checkpoint_mesh_elastic(eight_devices, tmp_path):
    """A per-shard checkpoint saved on one mesh layout restores bit-exactly
    onto a DIFFERENT layout (io/checkpoint.py load_sharded stitches each
    requested block from the overlapping saved pieces): 4-way slab ->
    (2,2) pencil -> single device."""
    from ekpnp.io.checkpoint import load_sharded, save_sharded

    cfg = preset("reference", nx=16, ny=8, nz=9, fft_method="matmul")
    state, _ = initialize(cfg)
    m4 = pmesh.make_mesh(eight_devices[:4], pencil=False)
    s4 = pmesh.shard_state(cfg, m4, state)
    ck = str(tmp_path / "elastic.ckpt")
    save_sharded(ck, cfg, s4)

    ref = {n: np.asarray(getattr(state, n)) for n in
           ("f", "h", "hn", "g", "phi")}
    for target in (pmesh.make_mesh(eight_devices[:4], pencil=True),
                   pmesh.make_mesh(eight_devices[:1])):
        back = load_sharded(ck, cfg, target)
        for name, want in ref.items():
            got = np.asarray(getattr(back, name))
            assert np.array_equal(got, want), \
                f"{name} not bit-exact restoring onto {dict(target.shape)}"
        assert float(back.t) == float(state.t)


def test_halo_multi_step_hx_chunk_matches_single(eight_devices):
    """The sharded multi-step chunk with x-Hartley-encoded phi carry
    (make_halo_multi_step routing through step_halo phi_hx=True: encode
    once, x-stage-free steps, decode once) must equal the single-device
    fused step sequence."""
    from ekpnp.parallel import halo as phalo
    from ekpnp.pallas.step import _phi_hx_capable, step_pallas

    cfg = preset("reference", nx=16, ny=32, nz=9, fft_method="matmul",
                 use_pallas=True, scalar_lattice="D3Q7")
    assert _phi_hx_capable(cfg, interpret=True)
    state, _ = initialize(cfg)

    s1 = state
    for _ in range(3):
        s1, _ = step_pallas(cfg, s1, interpret=True)

    m = pmesh.make_mesh(eight_devices[:4], pencil=False)
    s4 = pmesh.shard_state(cfg, m, state)
    run = phalo.make_halo_multi_step(cfg, m, 3, interpret=True)
    s4 = run(s4)

    for name in ("f", "h", "hn", "g", "phi"):
        a, b = getattr(s1, name), getattr(s4, name)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-11, atol=1e-13, err_msg=name
        )
