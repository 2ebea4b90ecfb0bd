"""Checkpoint / restore.

Reference semantics (save_data_end / read_data, LBM.cu:2567-2671 +
main.cu:158-175): only macroscopic fields are checkpointed; populations are
re-derived via equilibrium on restore — restart is deliberately lossy.

Two formats:
  - .npz (default): compact binary of the macroscopic fields + time; the
    native restore path.
  - data_end.dat ASCII: byte-layout-compatible with the reference's
    12-column dump, for cross-restoring between the CUDA solver and this
    framework in either direction.
"""
from __future__ import annotations

import os

import numpy as np

from ..config import Config
from ..diagnostics import wall_extrapolate
from ..init import state_from_macro
from ..state import Macro, State

_FIELDS = ["rho", "ux", "uy", "uz", "charge", "chargen", "phi", "Ex", "Ey", "Ez", "temp"]


def save_npz(path: str, cfg: Config, macro: Macro, phi, E, t: float) -> None:
    g = cfg.grid
    shape = g.shape
    zeros = np.zeros(shape)

    def get(a):
        return np.asarray(a, np.float64) if a is not None else zeros

    np.savez_compressed(
        path,
        t=np.float64(t),
        rho=get(macro.rho),
        ux=get(macro.u[0]),
        uy=get(macro.u[1]),
        uz=get(macro.u[2]),
        charge=get(macro.charge),
        chargen=get(macro.chargen),
        phi=get(phi),
        Ex=get(E[0]) if E is not None else zeros,
        Ey=get(E[1]) if E is not None else zeros,
        Ez=get(E[2]) if E is not None else zeros,
        temp=get(macro.temp),
        grid=np.array([g.nx, g.ny, g.nz]),
    )


def load_npz(path: str, cfg: Config) -> State:
    import jax.numpy as jnp

    with np.load(path) as d:
        g = cfg.grid
        if tuple(d["grid"]) != (g.nx, g.ny, g.nz):
            raise ValueError(
                f"checkpoint grid {tuple(d['grid'])} != config grid {(g.nx, g.ny, g.nz)}"
            )
        dtype = jnp.dtype(cfg.run.dtype)
        arr = lambda k: jnp.asarray(d[k], dtype)
        u = jnp.stack([arr("ux"), arr("uy"), arr("uz")])
        E = jnp.stack([arr("Ex"), arr("Ey"), arr("Ez")])
        ek = cfg.physics.enable_ek
        th = cfg.physics.enable_thermal
        macro = Macro(
            rho=arr("rho"),
            u=u,
            charge=arr("charge") if ek else None,
            chargen=arr("chargen") if ek else None,
            temp=arr("temp") if th else None,
        )
        return state_from_macro(
            cfg,
            macro,
            arr("phi") if ek else None,
            E if ek else None,
            float(d["t"]),
        )


def save_full_npz(path: str, cfg: Config, state: State) -> None:
    """Exact (lossless) checkpoint: every population array + phi + t.

    Extension beyond the reference (SURVEY.md §2.4 D5): the reference only
    checkpoints macroscopic fields and re-equilibrates on restore
    (LBM.cu:2567-2671, main.cu:158-175), discarding the non-equilibrium
    parts.  This format preserves the full state so a resumed run continues
    bit-identically.  Arrays keep their native dtype.
    """
    g = cfg.grid
    payload = {
        "t": np.asarray(state.t),
        "f_pop": np.asarray(state.f),
        "grid": np.array([g.nx, g.ny, g.nz]),
        "lattice_q": np.array([cfg.lattice.Q, cfg.scalar_lat.Q]),
    }
    for name in ("h", "hn", "g", "phi"):
        a = getattr(state, name)
        if a is not None:
            payload[name + "_pop" if name != "phi" else "phi"] = np.asarray(a)
    np.savez_compressed(path, **payload)


def is_full_checkpoint(path: str) -> bool:
    """True if `path` is a lossless full-state checkpoint (save_full_npz)."""
    if not path.endswith(".npz"):
        return False
    try:
        with np.load(path) as d:
            return "f_pop" in d.files
    except Exception:
        return False


def load_full_npz(path: str, cfg: Config) -> State:
    """Restore a lossless checkpoint bit-exactly (no re-equilibration)."""
    import jax.numpy as jnp

    with np.load(path) as d:
        g = cfg.grid
        if tuple(d["grid"]) != (g.nx, g.ny, g.nz):
            raise ValueError(
                f"checkpoint grid {tuple(d['grid'])} != config grid {(g.nx, g.ny, g.nz)}"
            )
        if tuple(d["lattice_q"]) != (cfg.lattice.Q, cfg.scalar_lat.Q):
            raise ValueError(
                f"checkpoint lattices Q={tuple(d['lattice_q'])} != config "
                f"Q={(cfg.lattice.Q, cfg.scalar_lat.Q)}"
            )
        dtype = jnp.dtype(cfg.run.dtype)

        def arr(k):
            if k not in d.files:
                return None
            a = d[k]
            if a.dtype != dtype:
                raise ValueError(
                    f"checkpoint field {k} is {a.dtype}, config wants {dtype}; "
                    "a lossless restore requires matching precision"
                )
            return jnp.asarray(a)

        return State(
            f=arr("f_pop"),
            h=arr("h_pop"),
            hn=arr("hn_pop"),
            g=arr("g_pop"),
            phi=arr("phi"),
            t=jnp.asarray(d["t"], dtype),
        )


def save_sharded(dirpath: str, cfg: Config, state: State) -> None:
    """Lossless per-shard checkpoint for sharded / multi-host runs
    (round-4; reference-semantics analogue of save_data_end LBM.cu:2567-2671
    at BASELINE config-5 scale).  Unlike save_full_npz — whose np.asarray
    is an implicit full gather onto one host — every process writes ONLY
    its addressable shards to its own file `shard_<pid>.npz`, keyed by the
    shard's global start offsets, so no array is ever materialized
    globally.  Process 0 writes `meta.json` (grid, lattices, dtype, t,
    process count).  Restore with load_sharded under ANY mesh layout
    (mesh-elastic stitching); a resumed run continues bit-identically."""
    import json

    import jax

    os.makedirs(dirpath, exist_ok=True)
    pid = jax.process_index()
    payload = {}

    def put(name, arr):
        if arr is None:
            return
        for s in arr.addressable_shards:
            if s.replica_id != 0:
                continue  # replicated copies: one writer per shard is enough
            off = [sl.start or 0 for sl in s.index]
            payload[f"{name}@{'_'.join(map(str, off))}"] = np.asarray(s.data)

    for name in ("f", "h", "hn", "g", "phi"):
        put(name, getattr(state, name))
    np.savez_compressed(os.path.join(dirpath, f"shard_{pid}.npz"), **payload)
    if pid == 0:
        g = cfg.grid
        meta = {
            "grid": [g.nx, g.ny, g.nz],
            "lattice_q": [cfg.lattice.Q, cfg.scalar_lat.Q],
            "dtype": str(np.dtype(cfg.run.dtype)),
            "t": float(np.asarray(state.t)),
            "nprocs": jax.process_count(),
        }
        with open(os.path.join(dirpath, "meta.json"), "w") as f:
            json.dump(meta, f)


def is_sharded_checkpoint(path: str) -> bool:
    return os.path.isdir(path) and \
        os.path.exists(os.path.join(path, "meta.json"))


def load_sharded(dirpath: str, cfg: Config, mesh) -> State:
    """Restore a per-shard checkpoint onto `mesh` without a global gather:
    each process materializes only ITS addressable shards, assembled from
    the saved shard files by global offset.  MESH-ELASTIC: the restore
    mesh need not match the saving mesh — a shard saved on a 4-way slab
    restores onto a 2-way slab, a pencil, or a single device (each
    requested local block is stitched from the saved pieces that overlap
    it; only the overlapping bytes are read).  Bit-exact inverse of
    save_sharded.

    Multi-host note: every process globs ALL shard_*.npz files, so a
    cross-layout restore (local blocks crossing the saving process's
    boundaries) requires the checkpoint directory on a SHARED filesystem
    (or pre-copied to every host).  Same-layout restores only ever read
    pieces this process saved, so they work host-local too."""
    import glob
    import json

    import jax
    import jax.numpy as jnp

    from ..parallel.mesh import state_shardings

    with open(os.path.join(dirpath, "meta.json")) as f:
        meta = json.load(f)
    g = cfg.grid
    if tuple(meta["grid"]) != (g.nx, g.ny, g.nz):
        raise ValueError(
            f"checkpoint grid {tuple(meta['grid'])} != config grid "
            f"{(g.nx, g.ny, g.nz)}")
    if tuple(meta["lattice_q"]) != (cfg.lattice.Q, cfg.scalar_lat.Q):
        raise ValueError(
            f"checkpoint lattices Q={tuple(meta['lattice_q'])} != config "
            f"Q={(cfg.lattice.Q, cfg.scalar_lat.Q)}")
    dtype = jnp.dtype(cfg.run.dtype)
    if np.dtype(meta["dtype"]) != dtype:
        raise ValueError(
            f"checkpoint dtype {meta['dtype']} != config {dtype}; a "
            "lossless restore requires matching precision")

    files = [np.load(p) for p in
             sorted(glob.glob(os.path.join(dirpath, "shard_*.npz")))]
    # name -> [(offsets, file, key)]; shapes come lazily from the npz
    pieces = {}
    for fl in files:
        for key in fl.files:
            name, off_s = key.split("@")
            off = tuple(int(v) for v in off_s.split("_"))
            pieces.setdefault(name, []).append((off, fl, key))

    shardings = state_shardings(cfg, mesh)

    def lift(name, sharding):
        shape = {
            "f": (cfg.lattice.Q,) + g.shape,
            "h": (cfg.scalar_lat.Q,) + g.shape,
            "hn": (cfg.scalar_lat.Q,) + g.shape,
            "g": (cfg.scalar_lat.Q,) + g.shape,
            "phi": g.shape,
        }[name]
        if name not in pieces:
            raise ValueError(f"field {name} not present in {dirpath}")

        def cb(idx):
            lo = [sl.start or 0 for sl in idx]
            hi = [sl.stop if sl.stop is not None else s
                  for sl, s in zip(idx, shape)]
            want = tuple(h - l for l, h in zip(lo, hi))
            out = None
            for off, fl, key in pieces[name]:
                data = fl[key]
                # overlap of the saved piece [off, off+shape) with [lo, hi)
                a = [max(l, o) for l, o in zip(lo, off)]
                b = [min(h, o + s) for h, o, s in zip(hi, off, data.shape)]
                if any(x >= y for x, y in zip(a, b)):
                    continue
                if tuple(off) == tuple(lo) and data.shape == want:
                    return data  # exact-match fast path (same mesh layout)
                if out is None:
                    out = np.empty(want, data.dtype)
                    filled = np.zeros(want, bool)
                dst = tuple(slice(x - l, y - l)
                            for x, y, l in zip(a, b, lo))
                src = tuple(slice(x - o, y - o)
                            for x, y, o in zip(a, b, off))
                out[dst] = data[src]
                filled[dst] = True
            if out is None or not filled.all():
                raise ValueError(
                    f"checkpoint {dirpath} does not cover the requested "
                    f"{name} block [{lo}, {hi}) — missing shard files?")
            return out

        return jax.make_array_from_callback(shape, sharding, cb)

    ek = cfg.physics.enable_ek
    th = cfg.physics.enable_thermal
    two = cfg.physics.two_species
    return State(
        f=lift("f", shardings.f),
        h=lift("h", shardings.h) if ek else None,
        hn=lift("hn", shardings.hn) if ek and two else None,
        g=lift("g", shardings.g) if th else None,
        phi=lift("phi", shardings.phi) if ek else None,
        t=jnp.asarray(meta["t"], dtype),
    )


def save_reference_ascii(path: str, cfg: Config, macro: Macro, phi, E, t: float) -> None:
    """data_end.dat in the reference's exact 12-column ASCII layout
    (LBM.cu:2613-2624), including the wall extrapolation it applies first
    (LBM.cu:2596-2612)."""
    import jax.numpy as jnp

    g = cfg.grid
    shape = g.shape
    zeros = np.zeros(shape)

    def get(a):
        return np.asarray(a, np.float64) if a is not None else zeros

    rho = np.asarray(wall_extrapolate(jnp.asarray(get(macro.rho))))
    u = np.asarray(wall_extrapolate(jnp.asarray(get(macro.u))))
    charge = np.asarray(wall_extrapolate(jnp.asarray(get(macro.charge))))
    chargen = np.asarray(wall_extrapolate(jnp.asarray(get(macro.chargen))))
    phi_a, temp = get(phi), get(macro.temp)
    E_a = get(E) if E is not None else np.zeros((3,) + shape)

    cols = np.stack(
        [
            np.full(g.num_nodes, t),
            u[0].ravel(), u[1].ravel(), u[2].ravel(), rho.ravel(),
            charge.ravel(), chargen.ravel(), phi_a.ravel(),
            E_a[0].ravel(), E_a[1].ravel(), E_a[2].ravel(), temp.ravel(),
        ],
        axis=1,
    )
    try:
        from . import native

        body = native.format_table(cols)
    except Exception:
        body = "".join(
            " ".join(f"{v:10.6f}" for v in row) + "\n" for row in cols
        )
    with open(path, "w") as f:
        f.write(body)


def load_reference_ascii(path: str, cfg: Config) -> State:
    """Restore from the reference's data_end.dat (read_data, LBM.cu:2629-2671)."""
    import jax.numpy as jnp

    g = cfg.grid
    try:
        from . import native

        with open(path) as f:
            data = native.parse_table(f.read(), g.num_nodes, 12)
    except ValueError:
        raise
    except Exception:
        data = np.loadtxt(path)
    if data.shape != (g.num_nodes, 12):
        raise ValueError(f"expected {(g.num_nodes, 12)} table, got {data.shape}")
    t = float(data[0, 0])
    dtype = jnp.dtype(cfg.run.dtype)

    def field(i):
        return jnp.asarray(data[:, i].reshape(g.shape), dtype)

    u = jnp.stack([field(1), field(2), field(3)])
    E = jnp.stack([field(8), field(9), field(10)])
    ek = cfg.physics.enable_ek
    macro = Macro(
        rho=field(4),
        u=u,
        charge=field(5) if ek else None,
        chargen=field(6) if ek else None,
        temp=field(11) if cfg.physics.enable_thermal else None,
    )
    return state_from_macro(cfg, macro, field(7) if ek else None, E if ek else None, t)
