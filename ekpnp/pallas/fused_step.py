"""Fused collide-stream Pallas TPU kernel — the roofline path.

One kernel performs, per timestep, what the reference does in four separate
global-memory passes (gpu_collide_save + gpu_boundary + gpu_stream +
gpu_bc_charge, LBM.cu:465-481): the state is read from HBM once and the
fully-streamed next state written once (~2 passes vs the reference's 4).

Design — a sequential z-pipeline over y-strips, grid = (NY/TY, NZ+1):

  step s < NZ   DMA-in one contiguous window [y0-8, y0+TY+8) of every
                population plane (+E) — halo rows live inside the window,
                so interior strips need a single DMA per field (edge strips
                add one wrap DMA);
                collide once (moments -> force -> u -> feq -> TRT + Guo)
                and store the post-collision plane in a 3-slot rotating
                VMEM buffer.  At s==1 both planes 1 and 0 are collided:
                the z=0 wall node's velocity extrapolation needs plane 1's
                moments (reference LBM.cu:663-801).  Bounce-back replaces
                the wall planes' fluid slot right after collision
                (reference gpu_boundary semantics: reflected *pre-collision*
                populations, LBM.cu:1848-1961).
  step s >= 2   emit output plane e = s-1, fully streamed: the z-shift is
                slot selection (e - ez[d]), the y-shift a static row offset
                into the halo, the x-shift a lane roll.  Interior emits are
                double-buffered and asynchronous (waited two steps later);
                wall-plane emits — ion no-flux and temperature
                anti-bounce-back as whole-plane slot reflections (reference
                gpu_bc_charge, LBM.cu:2095-2416) and the fluid's periodic
                z-wrap (reference LBM.cu:1970-1975) — use a dedicated
                synchronous buffer.

The kernel also emits the Poisson RHS -convertCtoCharge (c+ - c-) / eps
per plane, computed from the pre-collision ion moments it already takes for
the Coulomb force — the spectral solve's first matmul consumes it directly,
so neither a separate moment pass nor an RHS-build pass ever touches HBM.

Alignment rules learned from Mosaic: every DMA ref slice must start at a
sublane-tile-aligned row when NX spans more than one lane tile, so all
windows start at multiples of 8 and all row selection happens in value
space.  Requires NY % 8 == 0 and TY % 8 == 0.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config

HALO = 8  # aligned halo block height; row 7 is y0-1, row TY+8 is y0+TY


def _padded_nx(nx: int, pad_to: int) -> int:
    """x extent the kernel arrays actually carry: nx rounded up to the next
    pad_to multiple (the lane-tile width; no-op when already a multiple)."""
    if not pad_to:
        return nx
    return ((nx + pad_to - 1) // pad_to) * pad_to


def _pick_ty(cfg, qs, nxp=None, vmem_budget=64 * 1024 * 1024):
    """Largest strip height TY (multiple of 8) dividing NY that fits VMEM.

    Wider strips amortize the 16 halo rows each window DMA re-reads:
    input amplification is (TY+16)/TY (TY=64 reads 25% extra, TY=128
    12.5%; both start offsets AND lengths of DMA slices must be 8-row
    aligned, so the halo cannot shrink below 8+8 — see the dead-end note
    at HI_POP).  Budget mirrors the scratch list in build_fused_step (2-slot
    input windows, 3 post-collision slots, double-buffered emit) and
    leaves the other half of VMEM for Mosaic's register spill arena: the
    4-field collide at TY=128 spills ~62 MB of vector registers, so the
    coupled kernel lands on TY=64 — measured faster than any spilling
    TY=128 variant.  `qs` is the per-field direction count (the scalar
    fields may run a smaller lattice than the fluid); `nxp` the padded
    x width the kernel arrays carry (defaults to grid nx).

    Round-3 measured dead end — lifting the all-D3Q27 parity config to
    TY=128 (256^3 v5e, f32, vs 637.1 MLUPS at this TY=64 pick):
      whole-plane collide, per-field emit   VMEM 139.2M > 128M (no run)
      cchunk=32 whole-field emit            VMEM 142.2M > 128M (no run)
      cchunk=64 + emit_group=8  (ES=2)      473.0 MLUPS  (-26%)
      cchunk=64 + emit_group=27 (ES=2)      524.4 MLUPS  (-18%)
      cchunk=96 + emit_group=27 (ES=2)      518.8 MLUPS  (-19%)
      emit_group=27 at TY=64 (control)      633.9 MLUPS  (par: the
        grouped emit itself is free — the TY=128 loss is the chunked
        collide + VMEM-starved DMA scheduling at 125M/128M occupancy)
    Model ceiling at TY=128 = (TY amplification win) x (measured ~91%
    HBM utilization) ~= 674 MLUPS — below the 88%-of-roofline bar even
    before the measured chunking cost, so TY=64 whole-plane remains the
    parity production point.  SURVEY 7.3's two-pass field split (f+g /
    h+hn) is strictly dominated on paper: pass-2 re-reads both ion
    windows and the passes exchange u/q planes, +28% HBM traffic ->
    <=72% of roofline at perfect utilization.

    The same machinery was probed on the D3Q7 headline at TY=256 (JY=1,
    wrap-only halo, amplification 1.0625 vs 1.125): chunking now makes it
    COMPILE (round 1's Mosaic crash gone) but
      cchunk=128, per-field emit       1189.2 MLUPS  (chunk cost ~11%)
      cchunk=128, emit_group=27 ES=3   1027.5 MLUPS
    vs ~1332 at whole-plane TY=128 (1365-1369 with phi_hx) — the ~5%
    amplification win cannot pay the ~11% chunk cost, so TY=128
    whole-plane stays the headline production point too.

    Round-5 parity accounting (scripts/tpu_parity_accounting.py, the
    where-do-the-missing-points-go deliverable; 256^3 f32 all-D3Q27
    TY=64, hartley_x on / phi_hx off, v5e, spreads 0.7-3.2%):
      roofline step (1040 B/node)       21.39 ms
      measured step                     26.187 ms = 81.7% of roofline
      kernel alone (no solve)           25.157 ms = 96.1% of the step
      solve alone (rhs_hx)               1.904 ms (vs 2.178 full solve)
      scan absorbs 0.874 ms (46%) of the solve behind kernel dispatch
      kernel amplified-byte floor       20.17 ms (981 B/node: 540 read
                                        x1.25 windows + 432 write + 9
                                        phi/rhs)
      -> kernel HBM utilization on bytes it ACTUALLY moves: 80.2%;
         at 100% BW the step would be 21.20 ms = 100.9% of roofline.
    So the entire gap to the roofline bar is kernel DMA-pipeline
    inefficiency — per-plane windows of (TY+16) rows with only TY rows
    of compute to hide them, per-strip pipeline restarts, synchronous
    wall-plane emits — NOT emit-buffer or f_pin/wall_buf traffic, and
    NOT the solve (96.1%/3.9% split).  The headline config shows the
    same ~80-82% raw kernel BW; it reads 94.4% of ITS roofline only
    because the fixed 176 B/node scalar+solve allowance is a 31% slack
    of the D3Q7 denominator vs 17% of the parity one.  Every widening
    lever was measured dead above (TY=128 chunked variants -18..-26%),
    so TY=64 whole-plane at 643.9 MLUPS stands as the parity production
    point with this table as its accounting."""
    g = cfg.grid
    nx = nxp or g.nx
    for ty in (128, 64, 32, 16, 8):
        if g.ny % ty:
            continue
        need = 0
        for q in qs:
            win = q * (ty + 16) * nx * 4      # one input window slot
            plane = q * (ty + 2) * nx * 4     # one post-collision slot
            emit = q * ty * nx * 4            # one emit buffer
            need += 2 * win + 3 * plane + 2 * emit
        plane_f = qs[0] * (ty + 2) * nx * 4
        emit_f = qs[0] * ty * nx * 4
        need += 2 * plane_f + emit_f          # f_pin, wall buf, phi/rhs slack
        if need < vmem_budget:
            return ty
    return None


def fused_supported(cfg: Config) -> bool:
    """True when this configuration can run the fused kernel (shape and
    lattice constraints below; compiled-mode TPU also needs float32).

    NX is unrestricted: widths that are not whole 128-lane tiles (the
    reference's own 50x8x51 grid, LBM.h:32-36, and BASELINE configs 1-3)
    are zero-cost-padded to the next tile and the periodic x-wrap handled
    by a masked two-roll select (see build_fused_step)."""
    g = cfg.grid
    if g.nz < 4 or g.ny % 8:
        return False
    if cfg.physics.charge_bc not in ("noflux", "injection", "zerograd-top"):
        return False  # unknown BCs run the jnp oracle path
    for l in {cfg.lattice, cfg.scalar_lat}:
        if not all(int(l.OPP[i]) == i + 1 for i in range(1, l.Q, 2)):
            return False
    return _auto_qs_ty(cfg, _padded_nx(g.nx, 128))[1] is not None


def _auto_qs_ty(cfg: Config, nxp: int):
    """(per-field direction counts, auto-picked TY) for this config."""
    nspec = (2 if cfg.physics.two_species else 1) if cfg.physics.enable_ek else 0
    nf = 1 + nspec + (1 if cfg.physics.enable_thermal else 0)
    qs = [cfg.lattice.Q] + [cfg.scalar_lat.Q] * (nf - 1)
    return qs, _pick_ty(cfg, qs, nxp)


def phi_hx_profitable(cfg: Config, interpret: bool = False) -> bool:
    """Whether carrying phi x-Hartley-encoded across multi-step chunks
    (pallas/step.py phi_hx) pays for this config.  The in-kernel decode
    matmul runs synchronously right after each phi window's DMA wait —
    ON the plane pipeline's critical path — so it only pays on wide
    strips where the per-plane step is long enough to hide it.  Measured
    on v5e at 256^3: TY=128 (D3Q7 scalars) the full fusion gains +2.7%
    end-to-end (1368.7 vs 1332.9 MLUPS); at the TY=64 the all-D3Q27
    parity config is VMEM-forced onto, adding the decode LOSES 7%
    (601.6 vs 647.3 MLUPS with the async RHS emission alone — which wins
    at every width and is always on, build_fused_step hartley_x).
    Rule: wide strips only (TY >= 128)."""
    g = cfg.grid
    _, ty = _auto_qs_ty(cfg, _padded_nx(g.nx, 0 if interpret else 128))
    return ty is not None and ty >= 128


def auto_cchunk(cfg: Config, ty_override: int = 0) -> int:
    """Default collide-segment height (build_fused_step cchunk) for this
    config at this strip height.  Whole-plane collide (0) wins wherever
    its temporaries fit VMEM — chunking exists to unlock strip heights
    the whole-plane collide spills at: any TY above the conservative
    whole-plane pick runs the collide in 64-row segments (v5e-measured:
    the all-D3Q27 parity config at TY=128, see _pick_ty's spill note)."""
    if not ty_override:
        return 0
    g = cfg.grid
    qs, ty = _auto_qs_ty(cfg, _padded_nx(g.nx, 128))
    return 64 if (ty is not None and ty_override > ty) else 0


def fused_recommended(cfg: Config) -> bool:
    """fused_supported AND the grid is large enough for the kernel to win.

    The z-pipeline pays a fixed cost per (strip, plane) step, so on very
    small planes the jnp-oracle path is competitive: measured on v5e f32,
    the canonical 50x8x51 runs 7.7 MLUPS fused vs 8.4 oracle (both
    latency-bound at 20k nodes), while 64^3 runs 252 vs 104 and 256^3
    1344 vs 113.  Plane area ny * padded-nx >= 8192 lanes separates the
    two regimes (64^3 with nx padded to 128 sits exactly at the
    threshold and wins 2.4x).  The CLI auto-enables on this; an explicit
    --set use_pallas=... always overrides."""
    if not fused_supported(cfg):
        return False
    return cfg.grid.ny * _padded_nx(cfg.grid.nx, 128) >= 8192


def build_fused_step(cfg: Config, dtype=jnp.float32, interpret: bool = False,
                     ty_override: int = 0, halo: bool = False,
                     pad_x: Optional[int] = None,
                     hartley_x: Optional[bool] = None,
                     phi_hx: bool = False,
                     cchunk: int = 0,
                     emit_group: int = 0,
                     emit_slots: int = 2,
                     shard_x: bool = False,
                     pc_w: int = 128):
    """Returns fn(f, h, hn, g, phi) -> (f1, h1, hn1, g1, rhs).

    E = -grad(phi) is computed in-kernel from a 4-slot phi plane-window
    pipeline (efield_planes) — the potential crosses HBM once instead of
    three E components, and the XLA-side efield pass disappears.

    halo=True is the multi-chip per-shard form (parallel/halo.py): the
    grid is this shard's local y-range and the periodic y-wrap window
    pieces read from explicit halo-block inputs — the 8-row-aligned blocks
    adjacent to the shard, exchanged over ICI with ppermute — instead of
    wrapping locally.  fn then takes (f, h, hn, g, phi, lo..., hi...,
    phi_lo, phi_hi) where lo/hi are per-field (27, NZ, 8, NX) blocks.

    hartley_x: emit the Poisson RHS planes already x-Hartley-transformed —
    each (TY, NX) RHS tile is multiplied by the (NX, NX) cas matrix on the
    MXU before its async store.  The kernel is HBM-bound with the MXU
    otherwise idle, so the transform rides for free where the standalone
    x-stage of the spectral solve costs ~0.5 ms at 256^3 (measured,
    scripts/tpu_poisson_probe.py); the solve then starts from
    dst_z -> hartley_y and applies only the single inverse x-stage
    (ops/poisson.py rhs_hx=True).  Transform order is interchangeable —
    the separable stages commute exactly.  None = auto: on whenever the
    solve consumes it (EK on, matmul/DST spectral path) and the x axis is
    unpadded (the cas matmul needs logical lanes only).  The returned
    `apply` carries the resolved flag as `apply.hartley_x` so callers pass
    the matching rhs_hx to the solve.

    phi_hx: the incoming `phi` argument is psi_hx — the x-Hartley-encoded
    potential the psi_hx solve emits (ops/poisson.py poisson_psi_hx_from
    _rhs; phi = H_x(psi) + lifting) — and each phi window plane is decoded
    in-kernel right after its DMA wait: one (rows, NX) x (NX, NX) MXU
    matmul plus the scalar lifting value for that z.  Together with
    hartley_x this removes BOTH x-stages from the serial spectral solve;
    the multi-step scan loops encode once and decode once per compiled
    chunk (pallas/step.py).  Requires hartley_x.

    cchunk: collide in row segments of this many rows instead of whole
    (TY+2)-row planes.  The collide is pointwise per node (the only
    cross-row read, the Ey stencil, comes straight from the phi window),
    so segmentation changes nothing numerically — but it bounds the live
    vector-register set to O(cchunk * NX), which is what forces the
    all-D3Q27 parity configuration down to TY=64: at TY=128 the 4-field
    whole-plane collide spills ~62 MB of temporaries into VMEM it does
    not have.  Chunking trades that spill for re-running the (cheap,
    VPU-side) moment/force prologue per segment; HBM traffic is
    untouched.  0 = whole-plane (the measured-best choice where it fits).

    emit_group: emit the interior planes in direction groups of this many
    rows through ONE (2, emit_group, TY, NX) buffer shared by all fields,
    instead of the per-field (2, q, TY, NX) double buffers.  The per-field
    buffers cost 2 x sum(q) x TY x NX floats (27 MB at the all-D3Q27
    parity TY=128) purely to let every DMA complete two plane steps later;
    the shared group buffer costs ~2 MB and each group's copy is waited
    right before its slot is refilled — the copies still overlap the
    following groups' compute, so the pipeline bubble is one group DMA at
    most.  The static fill schedule is identical every plane step, so the
    wait descriptors (which must match the issuing copy's shape) are
    resolved at trace time.  0 = whole-field double buffers (measured
    fastest wherever VMEM allows).

    shard_x: the pencil multi-chip form (parallel/halo.py, ("y", "x")
    meshes): the grid is this shard's local (y, x) range.  The kernel
    stays FULLY LOCAL in x — streaming uses the ordinary periodic lane
    roll, and the one wrong column per roll direction (lane 0 for ex=+1,
    lane NXL-1 for ex=-1) is fixed OUTSIDE the kernel by ppermuting the
    kernel's own wrap columns around the mesh "x" ring: the locally
    wrapped out[d, z, y, 0] IS post[d, z-ez, y-ey, NXL-1], exactly the
    value the right x-neighbor needs at its lane 0 (parallel/halo.py
    _fix_x_columns).  A round-4 measured dead end rejected the
    re-collided-halo-lane alternative (x-halo tiles widening the kernel
    to NXL+128 lanes): lane-tile granularity makes any per-field x-halo
    input cost a full 128-lane read+write pass, measured 154-196 MLUPS
    at 128^3 vs 774 for the plain kernel at the same local shape — the
    column-fix design adds only column traffic.  The single pre-kernel
    x-halo the kernel DOES take is the packed phi-column array `pcol`
    (NZ, NYl, pc_w): lane 0 = phi(x=-1) (left neighbor's last column),
    lane 1 = phi(x=NXL) (right neighbor's first) — the centered Ex
    stencil's two off-shard reads, patched into the two edge lanes with
    one masked select per plane (efield_planes); pcol_lo/pcol_hi are its
    8-row y-halo blocks (depth 1), so corner rows carry the diagonal
    shard's values.  fn takes (..., pcol, pcol_lo, pcol_hi).  Requires
    halo=True; forces hartley_x/phi_hx off (the cas matmul needs the
    full x extent on one chip).  The reference has no analogue — its
    single GPU wraps x through global memory (LBM.cu:1970-1975); this is
    the TPU pencil decomposition SURVEY.md:161-163 commits to.

    Analytic dead end — recovering the x-Hartley RHS fusion on pencil
    shards by emitting PARTIAL sums (round-5; each shard computes
    local_rows @ cas[x0:x1, :] on its local columns, then a
    reduce_scatter over the x ring completes the sum): the partial
    product is FULL-NX wide on every shard, so vs the current post-solve
    GSPMD x-stage (all_to_all repartition, vol x (k-1)/k^2 per chip) it
    multiplies BOTH the emission HBM bytes (x k: each of k shards writes
    an NX-wide partial instead of its NX/k slice) and the ICI bytes
    (x k: reduce_scatter moves vol x (k-1)/k).  At k = 2 that is ~2 x
    26 MB extra HBM + 33 MB extra ICI per step at 256^3 to save a
    ~0.14 ms x-stage — strictly dominated, not built.  The pencil tax
    therefore keeps the serial x-stage (measured 8.6% total at 256^3,
    scripts/tpu_pencil_256_probe.py).

    pad_x: lane-tile padding of the x axis.  Mosaic requires whole
    128-lane tiles for the window DMAs and lane rolls (every NX < 128
    failed remote compile round 1), so grids like the reference's own
    50x8x51 (LBM.h:32-36) are padded: fn still takes and returns arrays
    at the logical NX — `apply` pads inputs (periodic continuation) and
    slices outputs — while the kernel carries NXP = next multiple of
    pad_x lanes and implements the periodic x-wrap as a masked two-roll
    select on the one lane each roll direction pulls from the pad region
    (roll_x below).  None = pad to 128 when compiling and NX % 128 != 0,
    nothing in interpret mode; an explicit int pads to that multiple
    (testing knob: interpret-mode equality tests exercise the masked-wrap
    path with small pads)."""
    lat = cfg.lattice
    lat_s = cfg.scalar_lat    # scalar-transport lattice (ions, temperature)
    Q = lat.Q
    for l in {lat, lat_s}:
        if not all(int(l.OPP[i]) == i + 1 for i in range(1, l.Q, 2)):
            raise ValueError("fused kernel needs the (odd, even) opposite-"
                             "pair direction ordering (D3Q27/D3Q19/D3Q7, "
                             "lattice.py)")
    g = cfg.grid
    p = cfg.physics
    NZ, NY, NXL = g.shape        # NXL: logical x extent
    if shard_x:
        if not halo:
            raise ValueError("shard_x requires halo=True (the pencil path "
                             "always runs under shard_map)")
        if phi_hx or hartley_x:
            raise ValueError("shard_x cannot fuse the x-Hartley stages: the "
                             "cas matmul needs the full x extent on one chip")
        hartley_x = False
        if pc_w < 2:
            raise ValueError("pc_w must hold the 2 phi halo columns")
        if not interpret and pc_w % 128:
            raise ValueError("compiled shard_x needs pc_w to be a whole "
                             "128-lane tile")
    if pad_x is None:
        pad_x = 0 if interpret else 128
    NX = _padded_nx(NXL, pad_x)  # NX: padded width the kernel arrays carry
    if NZ < 4:
        raise ValueError("fused kernel needs NZ >= 4")
    if NY % 8:
        raise ValueError("fused kernel requires NY % 8 == 0")

    ek = p.enable_ek
    if ek and p.charge_bc not in ("noflux", "injection", "zerograd-top"):
        raise ValueError(f"fused kernel supports charge_bc noflux|injection|"
                         f"zerograd-top, not {p.charge_bc!r} (use the jnp "
                         f"oracle path)")
    thermal = p.enable_thermal
    joule = p.joule if (p.enable_ek and p.enable_thermal) else 0.0
    # field layout: 0 = fluid, then the ion species (1 or 2 of them), then
    # temperature last.  Single-species (two_species=False): no hn field,
    # its moment is identically zero.
    nspec = (2 if p.two_species else 1) if ek else 0
    nf = 1 + nspec + (1 if thermal else 0)
    # zerograd-top charge BC: ion plane NZ-1 post is the ghost copy of
    # NZ-2 (see streamed_dir / emit_wall; reference LBM.cu:1929-1958)
    ZG = ek and p.charge_bc == "zerograd-top"

    # per-field lattice: field 0 is the fluid, all others scalar transport
    field_lats = [lat] + [lat_s] * (nf - 1)
    QS = [l.Q for l in field_lats]
    QMAX = max(QS)

    TY = ty_override or _pick_ty(cfg, QS, NX)
    if TY is None or NY % TY or TY % 8:
        raise ValueError("no valid y-strip size (needs TY % 8 == 0 dividing NY)")

    if hartley_x is None:
        if phi_hx:
            hartley_x = True
        else:
            import os

            # EKPNP_HXRHS=0/1 overrides the auto choice (A/B probe knob).
            # The RHS emission rides an async store AFTER collide, off the
            # critical path — measured a win at every strip width (256^3
            # v5e: all-D3Q27 parity at TY=64 647.3 vs 638.0 MLUPS; part
            # of the D3Q7 TY=128 +2.7%).  Only the phi_hx DECODE (which
            # sits on the window DMA-wait critical path) is gated on wide
            # strips — see phi_hx_profitable.
            env = os.environ.get("EKPNP_HXRHS")
            hartley_x = (bool(int(env)) if env is not None
                         else bool(ek) and NX == NXL
                         and cfg.run.fft_method != "fft")
            hartley_x = hartley_x and bool(ek) and NX == NXL
    if hartley_x and (not ek or NX != NXL):
        raise ValueError("hartley_x RHS emission needs EK on and an "
                         "unpadded x axis (NX % lane tile == 0)")
    if phi_hx and not hartley_x:
        raise ValueError("phi_hx ingestion requires hartley_x emission "
                         "(they share the resident cas matrix)")
    R = TY + 2           # logical rows [y0-1, y0+TY]
    # DMA window rows: [y0-8, y0+TY+8).  Only 1 row above the strip is ever
    # read for populations (ld_pop's highest row is TY+8) and 2 for phi
    # (the centered Ey stencil), so trimming the upper halo to 1-2 rows was
    # probed as a ~5% input-traffic saving — but Mosaic requires DMA slice
    # LENGTHS, not just start offsets, to be 8-row aligned ("Slice shape
    # along dimension 2 must be aligned to tiling (8), but is 129",
    # measured on v5e at 256^3), so the symmetric 8-row halo window is the
    # minimum and round 1's 16-halo-row amplification (TY+16)/TY stands.
    HI_POP = 8
    HI_PHI = 8
    WROWS = TY + HALO + HI_POP
    WROWS_PHI = TY + HALO + HI_PHI
    JY = NY // TY
    chunked = 0 < cchunk < R
    EG = emit_group
    if EG:
        # static fill schedule: (field, first dir, group length) — the
        # same every plane step, so wait descriptors resolve at trace time
        FILLS = [(k, d0, min(EG, QS[k] - d0))
                 for k in range(nf) for d0 in range(0, QS[k], EG)]
        FN = len(FILLS)
        # emit_slots deep rotation: each slot's copy is waited ESL fills
        # after issue, so larger ES buys DMA slack (ES covering a whole
        # plane's fills ~ the old per-field double buffer) at ESL x the
        # buffer cost
        ESL = min(emit_slots, FN)
    # collide row segments [r0, r0+n) of the R-row plane; multiples of 8
    # so window reads stay in today's alignment class (offset 7 mod 8) and
    # slot/cmom stores stay 8-row aligned — only the tail is odd
    if chunked and cchunk % 8:
        raise ValueError("cchunk must be a multiple of 8")
    SEGS = ([(r0, min(cchunk, R - r0)) for r0 in range(0, R, cchunk)]
            if chunked else [(0, R)])

    # ---- static lattice/physics constants -------------------------------
    ES = [[tuple(int(v) for v in l.E[d]) for d in range(l.Q)]
          for l in field_lats]
    WS = [[float(w) for w in l.W] for l in field_lats]
    OPPS = [[int(o) for o in l.OPP] for l in field_lats]
    PAIRS_K = [[(i, i + 1) for i in range(1, l.Q, 2)] for l in field_lats]
    E_ = ES[0]          # fluid aliases (wall BCs, fluid force, moments)
    W_ = WS[0]
    OPP = OPPS[0]
    # f_pin holds only the ez = -1 fluid directions: the pinned pre-stream
    # lower-wall plane is read exclusively as the z-wrap override source at
    # the upper-wall emit (emit_wall), which streams downward dirs only
    PIN_DIRS = [d for d in range(Q) if E_[d][2] == -1]
    PIN_IDX = {d: i for i, d in enumerate(PIN_DIRS)}
    dt = p.dt(g.dx)
    cs2 = cfg.cs2
    cfl = p.cfl
    om = cfg.omegas()
    inv_cfl = 1.0 / cfl
    inv_cs2 = 1.0 / cs2
    t_scale = inv_cs2 * inv_cfl
    inv_cs2_k = [1.0 / cfg.cs2] + [1.0 / cfg.cs2_s] * (nf - 1)
    t_scale_k = [ic * inv_cfl for ic in inv_cs2_k]
    kappa = p.convert_c_to_charge
    buoy = p.rho0 * p.Ra * p.nu * p.D
    mw_coef = 2.0 * p.rho0 * p.uw * inv_cs2 * inv_cfl
    compat_multis = p.compat_ref_multis  # reference LBM.cu:1904 quirk
    dtype = jnp.dtype(dtype)
    cst = dtype.type

    om_p = {
        "f": (om["omega_plus"] * dt, om["omega_minus"] * dt),
        "h": (om["omega_c_plus"] * dt, om["omega_c_minus"] * dt),
        "hn": (om["omega_cn_plus"] * dt, om["omega_cn_minus"] * dt),
        "g": (om["omega_T_plus"] * dt, om["omega_T_minus"] * dt),
    }
    s_plus = 1.0 - 0.5 * dt * om["omega_plus"]
    s_minus = 1.0 - 0.5 * dt * om["omega_minus"]

    n_in = nf + (1 if ek else 0)
    if halo:
        n_in += 2 * nf + (2 if ek else 0)
    pcol = shard_x and ek     # packed phi-column x-halo (pcol, lo, hi)
    if pcol:
        n_in += 3
    # Mosaic's in-kernel dot lowers only DEFAULT (bf16) or HIGHEST (fp32
    # contract); HIGHEST here is >= the 3-pass HIGH the standalone x-stage
    # uses, and the matmul rides the otherwise-idle MXU either way
    hx_prec = jax.lax.Precision.HIGHEST

    def kernel(*refs):
        idx = 0
        in_pop = refs[idx : idx + nf]; idx += nf
        in_phi = refs[idx] if ek else None; idx += 1 if ek else 0
        if halo:
            in_lo = refs[idx : idx + nf]; idx += nf
            in_hi = refs[idx : idx + nf]; idx += nf
            in_phi_lo = refs[idx] if ek else None; idx += 1 if ek else 0
            in_phi_hi = refs[idx] if ek else None; idx += 1 if ek else 0
        if pcol:
            in_pcol = refs[idx]; idx += 1
            in_pcol_lo = refs[idx]; idx += 1
            in_pcol_hi = refs[idx]; idx += 1
        in_hx = refs[idx] if hartley_x else None; idx += 1 if hartley_x else 0
        out_pop = refs[idx : idx + nf]; idx += nf
        out_rhs = refs[idx] if ek else None; idx += 1 if ek else 0
        buf_in = refs[idx : idx + nf]; idx += nf
        buf_phi = refs[idx] if ek else None; idx += 1 if ek else 0
        buf_pcol = refs[idx] if pcol else None; idx += 1 if pcol else 0
        slot_pop = refs[idx : idx + nf]; idx += nf
        f_pin = refs[idx]; idx += 1                      # (9, R, NX)
        if EG:
            emit_grp = refs[idx]; idx += 1               # (ES, EG, TY, NX)
        else:
            emit_pop = refs[idx : idx + nf]; idx += nf   # (2, 27, TY, NX)
        wall_buf = refs[idx]; idx += 1                   # (27, TY, NX)
        rhsb = refs[idx] if ek else None; idx += 1 if ek else 0
        cmom_buf = refs[idx] if (ek and chunked) else None
        idx += 1 if (ek and chunked) else 0              # (nspec, R, NX)
        sem_in = refs[idx]; idx += 1                     # (2, nf, 3)
        sem_phi = refs[idx] if ek else None; idx += 1 if ek else 0  # (4, 3)
        sem_pcol = refs[idx] if pcol else None; idx += 1 if pcol else 0
        sem_emit = refs[idx]; idx += 1                   # (nf, 2)
        sem_wall = refs[idx]; idx += 1                   # (2,)
        sem_cmom = refs[idx] if ek else None; idx += 1 if ek else 0

        j = pl.program_id(0)
        s = pl.program_id(1)
        y0 = pl.multiple_of(j * TY, 8)

        # ------------------------------------------------ input DMA
        def _pieces(case, hi_n):
            """(src_kind, src_row, window_row, n) pieces assembling the
            [y0-8, y0+TY+hi_n) window.  "lo"/"hi" are the periodic wrap
            blocks: rows [NY-8, NY) / [0, hi_n) of the full array locally,
            or the neighbor shards' edge blocks (halo inputs) multi-chip.
            Every piece's window_row stays a multiple of 8 (the DMA start
            alignment rule); only the trailing piece's LENGTH is odd."""
            ym = pl.multiple_of(y0 - HALO, 8)
            if case == "single":      # JY == 1: wraps both ends
                return [("lo", 0, 0, HALO), ("main", 0, HALO, TY),
                        ("hi", 0, TY + HALO, hi_n)]
            if case == "interior":
                return [("main", ym, 0, TY + HALO + hi_n)]
            if case == "first":
                return [("lo", 0, 0, HALO), ("main", 0, HALO, TY + hi_n)]
            return [("main", ym, 0, TY + HALO), ("hi", 0, TY + HALO, hi_n)]

        def _pop_src(kind, k, plane, sa, n):
            if kind == "main":
                return in_pop[k].at[:, plane, pl.ds(sa, n), :]
            if halo:
                arr = in_lo[k] if kind == "lo" else in_hi[k]
                return arr.at[:, plane, pl.ds(0, n), :]
            sa = NY - HALO if kind == "lo" else 0
            return in_pop[k].at[:, plane, pl.ds(sa, n), :]

        def _phi_src(kind, plane, sa, n):
            if kind == "main":
                return in_phi.at[plane, pl.ds(sa, n), :]
            if halo:
                arr = in_phi_lo if kind == "lo" else in_phi_hi
                return arr.at[plane, pl.ds(0, n), :]
            sa = NY - HALO if kind == "lo" else 0
            return in_phi.at[plane, pl.ds(sa, n), :]

        def _case_copies(case, plane, slot):
            out = []
            for k in range(nf):
                for i, (kind, sa, da, n) in enumerate(_pieces(case, HI_POP)):
                    out.append(pltpu.make_async_copy(
                        _pop_src(kind, k, plane, sa, n),
                        buf_in[k].at[slot, :, pl.ds(da, n), :],
                        sem_in.at[slot, k, i]))
            return out

        def _pcol_src(kind, plane, sa, n):
            if kind == "main":
                return in_pcol.at[plane, pl.ds(sa, n), :]
            arr = in_pcol_lo if kind == "lo" else in_pcol_hi
            return arr.at[plane, pl.ds(0, n), :]

        def _phi_copies(case, plane, slot):
            out = [pltpu.make_async_copy(
                       _phi_src(kind, plane, sa, n),
                       buf_phi.at[slot, pl.ds(da, n), :], sem_phi.at[slot, i])
                   for i, (kind, sa, da, n) in enumerate(_pieces(case, HI_PHI))]
            if pcol:
                # the packed phi-column x-halo rides the same window/slot
                # schedule as phi (its Ex-patch rows match phi's stencil rows)
                out += [pltpu.make_async_copy(
                            _pcol_src(kind, plane, sa, n),
                            buf_pcol.at[slot, pl.ds(da, n), :],
                            sem_pcol.at[slot, i])
                        for i, (kind, sa, da, n)
                        in enumerate(_pieces(case, HI_PHI))]
            return out

        def _in_do(plane, action):
            slot = jax.lax.rem(jnp.int32(plane), jnp.int32(2))
            if JY == 1:
                for c in _case_copies("single", plane, slot):
                    action(c)
                return

            @pl.when(j == 0)
            def _():
                for c in _case_copies("first", plane, slot):
                    action(c)

            @pl.when(j == JY - 1)
            def _():
                for c in _case_copies("last", plane, slot):
                    action(c)

            @pl.when((j > 0) & (j < JY - 1))
            def _():
                for c in _case_copies("interior", plane, slot):
                    action(c)

        def start_in(plane):
            _in_do(plane, lambda c: c.start())

        def wait_in(plane):
            _in_do(plane, lambda c: c.wait())

        def _phi_do(plane, action):
            slot = jax.lax.rem(jnp.int32(plane), jnp.int32(4))
            if JY == 1:
                for c in _phi_copies("single", plane, slot):
                    action(c)
                return

            @pl.when(j == 0)
            def _():
                for c in _phi_copies("first", plane, slot):
                    action(c)

            @pl.when(j == JY - 1)
            def _():
                for c in _phi_copies("last", plane, slot):
                    action(c)

            @pl.when((j > 0) & (j < JY - 1))
            def _():
                for c in _phi_copies("interior", plane, slot):
                    action(c)

        def start_phi(plane):
            if ek:
                _phi_do(plane, lambda c: c.start())

        def wait_phi(plane):
            if ek:
                _phi_do(plane, lambda c: c.wait())
                if phi_hx:
                    xform_phi(plane)

        def xform_phi(plane):
            """Decode one freshly-DMA'd psi_hx window plane into real phi
            in place: buf = buf @ H + lifting(z) — the inverse x-Hartley
            stage of the spectral solve, riding the idle MXU (phi_hx).
            Every downstream read (efield_planes) then sees real phi."""
            if isinstance(plane, int):
                slot = plane % 4
                lift = cst(p.voltage
                           + (p.voltage2 - p.voltage) * plane / (NZ - 1))
            else:
                slot = jax.lax.rem(jnp.int32(plane), jnp.int32(4))
                lift = (cst((p.voltage2 - p.voltage) / (NZ - 1))
                        * jax.lax.convert_element_type(plane, dtype)
                        + cst(p.voltage))
            buf_phi[slot] = jax.lax.dot(
                buf_phi[slot], in_hx[...], precision=hx_prec,
                preferred_element_type=dtype) + lift

        # ------------------------------------------------ collide
        # All collide stages stream direction-by-direction straight from the
        # input window refs and store straight into slot_pop: at no point is
        # a field\'s full 27-direction set live in VMEM.  (The earlier
        # all-fields-live formulation needed ~41 MB of compiler temporaries
        # at TY=128 — over VMEM together with the DMA windows.)
        def ld_pop(k, in_slot, d, r0=0, nrow=R):
            """Plane rows [y0-1+r0, y0-1+r0+nrow) = window rows
            [7+r0, 7+r0+nrow) — the whole [y0-1, y0+TY] plane by default,
            one collide segment of it when chunked."""
            return buf_in[k][in_slot, d,
                             HALO - 1 + r0 : HALO - 1 + r0 + nrow, :]

        def efield_planes(plane_s, r0=0, nrow=R):
            """E = -grad(phi) on the collide rows, from the 4-slot phi
            window pipeline (reference gpu_efield + gpu_bc,
            poisson.cu:28-69): centered differences, periodic in x (lane
            roll) and y (window halo rows carry the wrap), and the one-sided
            Ez copy at the plates (Ez[0] = Ez[1] = (phi0 - phi2)/2dz,
            Ez[NZ-1] = Ez[NZ-2] = (phi[NZ-3] - phi[NZ-1])/2dz)."""
            if isinstance(plane_s, int):
                pm = max(plane_s - 1, 0)
                pp = 2 if plane_s == 0 else plane_s + 1
                sm, s0, sp = pm % 4, plane_s % 4, pp % 4
            else:
                four = jnp.int32(4)
                pm = jnp.where(plane_s == NZ - 1, NZ - 3, plane_s - 1)
                pp = jnp.where(plane_s == NZ - 1, NZ - 1, plane_s + 1)
                sm = jax.lax.rem(jnp.int32(pm), four)
                s0 = jax.lax.rem(jnp.int32(plane_s), four)
                sp = jax.lax.rem(jnp.int32(pp), four)
            a = HALO - 1 + r0
            phic = buf_phi[s0, a : a + nrow, :]
            # roll_x handles the padded-lane periodic wrap (pad_x)
            if pcol:
                # pencil shards: the centered Ex stencil's two off-shard
                # reads come from the packed column window — lane 0 is
                # phi(x=-1), lane 1 phi(x=NXL) (parallel/halo.py) — patched
                # into the edge lanes with one masked lane-broadcast select
                pc = buf_pcol[s0, a : a + nrow, :]
                iota = jax.lax.broadcasted_iota(jnp.int32, phic.shape, 1)
                left = jnp.where(iota == 0, pc[:, 0:1], roll_x(phic, 1))
                right = jnp.where(iota == NXL - 1, pc[:, 1:2],
                                  roll_x(phic, -1))
                Ex = (left - right) * cst(0.5 / g.dx)
            else:
                Ex = (roll_x(phic, 1) - roll_x(phic, -1)) * cst(0.5 / g.dx)
            Ey = (buf_phi[s0, a - 1 : a - 1 + nrow, :]
                  - buf_phi[s0, a + 1 : a + 1 + nrow, :]) * cst(0.5 / g.dy)
            Ez = (buf_phi[sm, a : a + nrow, :]
                  - buf_phi[sp, a : a + nrow, :]) * cst(0.5 / g.dz)
            return Ex, Ey, Ez

        def field_moment0(k, in_slot, r0=0, nrow=R):
            acc = ld_pop(k, in_slot, 0, r0, nrow)
            for d in range(1, QS[k]):
                acc = acc + ld_pop(k, in_slot, d, r0, nrow)
            return acc

        def fluid_moments(in_slot, r0=0, nrow=R):
            """rho and the three raw momenta in one accumulator pass."""
            rho = ld_pop(0, in_slot, 0, r0, nrow)
            mom = [None, None, None]
            for d in range(1, Q):
                v = ld_pop(0, in_slot, d, r0, nrow)
                rho = rho + v
                for a in range(3):
                    e = E_[d][a]
                    if e == 0:
                        continue
                    t = v if e > 0 else -v
                    mom[a] = t if mom[a] is None else mom[a] + t
            return rho, mom[0], mom[1], mom[2]

        def edot(ei, ax, ay, az):
            """(e_i . a) from per-axis arrays, sign-folded adds only."""
            acc = None
            for e, comp in zip(ei, (ax, ay, az)):
                if e == 0:
                    continue
                term = comp if e > 0 else -comp
                acc = term if acc is None else acc + term
            return acc

        def trt_store(k, in_slot, slot, m, vx, vy, vz, op_dt, om_dt,
                      fluid_force=None, iso_src=None, r0=0, nrow=R):
            """TRT collision in even/odd pair space, one pair at a time,
            stored into slot_pop as soon as computed.

            Equilibrium pair parts (the reference\'s fep/fem, LBM.cu:1204-1259):
              e_i + e_j = 2 w_i m (omusq + t_i^2 / 2)
              e_i - e_j = 2 w_i m t_i ,   t_i = (e_i . v)/(cs^2 CFL)
            Update: out_i = p_i - op(fp - ep) - om(fm - em) [+ dt src_i],
            halves folded into the constants.  fluid_force = (ux,uy,uz,
            fx,fy,fz) adds the Guo TRT source (LBM.cu:1107-1145,1660-1689).
            iso_src adds the isotropic volumetric source dt w_i iso_src to
            every direction (the Joule-heating term of the thermal field).

            All lattice constants are field k's: the scalar fields may run
            a smaller lattice (D3Q7) with its own weights and sound speed.
            """
            def st(d, val):
                if nrow == R:
                    slot_pop[k][slot, d] = val
                else:
                    slot_pop[k][slot, d, r0 : r0 + nrow] = val

            Ek, Wk = ES[k], WS[k]
            ics2_k = inv_cs2_k[k]
            tsc_k = t_scale_k[k]
            if iso_src is not None:
                iso_by_w = {}

                def iso_of(w):
                    if w not in iso_by_w:
                        iso_by_w[w] = cst(dt * w) * iso_src
                    return iso_by_w[w]
            omusq = 1.0 - cst(0.5 * ics2_k) * (vx * vx + vy * vy + vz * vz)
            tx, ty_, tz = vx * cst(tsc_k), vy * cst(tsc_k), vz * cst(tsc_k)
            cop = cst(0.5 * op_dt)
            com = cst(0.5 * om_dt)
            # 2 w m per weight class (ws: dirs 1-6, wa: 7-18, wd: 19-26)
            w2m = {}
            for i, _ in PAIRS_K[k]:
                wkey = Wk[i]
                if wkey not in w2m:
                    w2m[wkey] = cst(2.0 * wkey) * m
            if fluid_force is not None:
                ux_, uy_, uz_, fx_, fy_, fz_ = fluid_force
                udotF = ux_ * fx_ + uy_ * fy_ + uz_ * fz_
                ca = cst(0.5 * dt * s_plus * 2.0 * ics2_k)
                cb = cst(0.5 * dt * s_minus * 2.0 * ics2_k * inv_cfl)
                ck = cst(inv_cfl * inv_cfl * ics2_k)

            # rest direction: even only
            p0 = ld_pop(k, in_slot, 0, r0, nrow)
            e0 = cst(Wk[0]) * m * omusq
            o0 = p0 - cst(op_dt) * (p0 - e0)
            if fluid_force is not None:
                o0 = o0 + cst(dt * s_plus * Wk[0] * ics2_k) * (-udotF)
            if iso_src is not None:
                o0 = o0 + iso_of(Wk[0])
            st(0, o0)

            for i, jd in PAIRS_K[k]:
                pi = ld_pop(k, in_slot, i, r0, nrow)
                pj = ld_pop(k, in_slot, jd, r0, nrow)
                t = edot(Ek[i], tx, ty_, tz)
                coeff = w2m[Wk[i]]
                ep2 = coeff * (omusq + 0.5 * (t * t))
                em2 = coeff * t
                a = cop * ((pi + pj) - ep2)
                b = com * ((pi - pj) - em2)
                oi = pi - (a + b)
                oj = pj - (a - b)
                if fluid_force is not None:
                    w = cst(Wk[i])
                    eF = edot(Ek[i], fx_, fy_, fz_)
                    eu = edot(Ek[i], ux_, uy_, uz_)
                    A = (ca * w) * (eu * eF * ck - udotF)
                    B = (cb * w) * eF
                    oi = oi + (A + B)
                    oj = oj + (A - B)
                if iso_src is not None:
                    iso = iso_of(Wk[i])
                    oi = oi + iso
                    oj = oj + iso
                st(i, oi)
                st(jd, oj)

        def reflect_store(k, in_slot, slot, with_wall_term):
            """Bounce-back of the raw input populations straight into
            slot_pop (reference gpu_boundary, LBM.cu:1848-1961)."""
            slot_pop[k][slot, 0] = ld_pop(k, in_slot, 0)
            for d in range(1, Q):
                v = ld_pop(k, in_slot, OPP[d])
                mw_ex = E_[d][0] + (1 if compat_multis and d == 3 else 0)
                if with_wall_term and mw_ex != 0 and mw_coef != 0.0:
                    v = v + cst(mw_coef * W_[d] * mw_ex)
                slot_pop[k][slot, d] = v

        def collide_plane(plane_s, slot, u_override=None, numer_out=None,
                          is_lower_wall=False, is_upper_wall=False):
            if isinstance(plane_s, int):
                in_slot = plane_s % 2
            else:
                in_slot = jax.lax.rem(jnp.int32(plane_s), jnp.int32(2))
            wall = is_lower_wall or is_upper_wall
            if wall:
                reflect_store(0, in_slot, slot, with_wall_term=is_upper_wall)
            rhs_c = [None, None]  # unchunked: full-plane ion moments
            for si, (r0, nrow) in enumerate(SEGS):
                _collide_seg(plane_s, slot, in_slot, si, r0, nrow,
                             u_override, numer_out, wall, rhs_c)
            if ek:
                _emit_rhs(plane_s, rhs_c)

        def _collide_seg(plane_s, slot, in_slot, si, r0, nrow,
                         u_override, numer_out, wall, rhs_c):
            rho, mxr, myr, mzr = fluid_moments(in_slot, r0, nrow)
            inv_rho = 1.0 / rho
            if ek:
                c = field_moment0(1, in_slot, r0, nrow)
                cn = field_moment0(2, in_slot, r0, nrow) if nspec == 2 else None
                if chunked:
                    # stage the ion moments for the rhs emission after the
                    # segment loop (the emission slices rows [1, TY+1))
                    cmom_buf[0, r0 : r0 + nrow] = c
                    if nspec == 2:
                        cmom_buf[1, r0 : r0 + nrow] = cn
                else:
                    rhs_c[0], rhs_c[1] = c, cn
            if thermal:
                T = field_moment0(nf - 1, in_slot, r0, nrow)

            # body force (LBM.cu:632-637)
            if ek:
                Ex, Ey, Ez = efield_planes(plane_s, r0, nrow)
                q = cst(kappa) * ((c - cn) if nspec == 2 else c)
                fx = q * (Ex + cst(p.ext_field)) + cst(p.exf)
                fy = q * Ey
                fz = q * Ez
            else:
                zero = jnp.zeros_like(rho)
                fx = zero + cst(p.exf)
                fy = zero
                fz = zero
            if thermal:
                fz = fz + cst(buoy) * T

            # velocity with half-force correction (LBM.cu:639-644)
            nx_ = mxr * cst(inv_cfl) + cst(0.5 * dt) * fx
            ny_ = myr * cst(inv_cfl) + cst(0.5 * dt) * fy
            nz_ = mzr * cst(inv_cfl) + cst(0.5 * dt) * fz
            if numer_out is not None:
                numer_out.append((nx_, ny_, nz_))
            if u_override is not None:
                ux, uy, uz = u_override(inv_rho, si)
            else:
                ux, uy, uz = nx_ * inv_rho, ny_ * inv_rho, nz_ * inv_rho

            if not wall:
                trt_store(0, in_slot, slot, rho, ux, uy, uz, *om_p["f"],
                          fluid_force=(ux, uy, uz, fx, fy, fz),
                          r0=r0, nrow=nrow)

            if ek:
                trt_store(1, in_slot, slot, c, ux + cst(p.K) * Ex,
                          uy + cst(p.K) * Ey, uz + cst(p.K) * Ez,
                          *om_p["h"], r0=r0, nrow=nrow)
                if nspec == 2:
                    trt_store(2, in_slot, slot, cn, ux + cst(p.Kn) * Ex,
                              uy + cst(p.Kn) * Ey, uz + cst(p.Kn) * Ez,
                              *om_p["hn"], r0=r0, nrow=nrow)
            if thermal:
                # Joule-heating extension (BASELINE config 4): volumetric
                # source joule (c+ + c-) |E|^2 into the temperature field,
                # matching the jnp oracle (ops/collide.py); 0 = reference
                # parity (the reference has buoyancy only, LBM.cu:632-637).
                Ssrc = None
                if joule != 0.0:
                    csum = (c + cn) if nspec == 2 else c
                    Ssrc = (cst(joule) * csum) * (Ex * Ex + Ey * Ey + Ez * Ez)
                trt_store(nf - 1, in_slot, slot, T, ux, uy, uz, *om_p["g"],
                          iso_src=Ssrc, r0=r0, nrow=nrow)

        def _emit_rhs(plane_s, rhs_c):
            # Poisson RHS out: -convertCtoCharge (c+ - c-)/eps from the
            # pre-collision moments (odd_extension interior rows,
            # poisson.cu:118-137) — the spectral solve consumes it with no
            # RHS-build pass.  Only the NZ-2 interior planes are emitted
            # (out index plane_s - 1): the DST-I path never reads the wall
            # rows, and emitting them forced a 67 MB interior-slice copy on
            # the XLA side.  Double-buffered async: a synchronous wait here
            # would queue behind the in-flight window/emit DMAs and
            # serialize every plane step (measured ~7 ms/step at 256^3).
            if ek:
                def rhs_tile():
                    if chunked:
                        c_ = cmom_buf[0, 1 : TY + 1]
                        cn_ = cmom_buf[1, 1 : TY + 1] if nspec == 2 else None
                    else:
                        c_ = rhs_c[0][1 : TY + 1]
                        cn_ = rhs_c[1][1 : TY + 1] if nspec == 2 else None
                    val = ((cn_ - c_) if nspec == 2 else -c_) \
                        * cst(kappa / p.eps)
                    if hartley_x:
                        # forward x-Hartley on the otherwise-idle MXU (the
                        # cas matrix is symmetric: val @ H == H applied
                        # along x); see the hartley_x docstring note
                        val = jax.lax.dot(val, in_hx[...],
                                          precision=hx_prec,
                                          preferred_element_type=dtype)
                    return val

                cb = jax.lax.rem(jnp.int32(plane_s), jnp.int32(2))
                if isinstance(plane_s, int):
                    # startup planes (s==1): plane 1 issues the first copy,
                    # plane 0 is a wall row — nothing emitted, no waits
                    if plane_s == 1:
                        rhsb[cb] = rhs_tile()
                        pltpu.make_async_copy(
                            rhsb.at[cb], out_rhs.at[0, pl.ds(y0, TY), :],
                            sem_cmom.at[cb]).start()
                else:
                    @pl.when(plane_s >= 3)
                    def _():
                        # same-parity copy issued at plane_s-2 -> out plane_s-3
                        pltpu.make_async_copy(
                            rhsb.at[cb],
                            out_rhs.at[plane_s - 3, pl.ds(y0, TY), :],
                            sem_cmom.at[cb]).wait()

                    @pl.when(plane_s <= NZ - 2)
                    def _():
                        rhsb[cb] = rhs_tile()
                        pltpu.make_async_copy(
                            rhsb.at[cb],
                            out_rhs.at[plane_s - 1, pl.ds(y0, TY), :],
                            sem_cmom.at[cb]).start()

        # ------------------------------------------------ emit
        def roll_x(val, ex):
            """Periodic x-shift: out[x] = val[(x - ex) mod NXL] on the
            logical lanes [0, NXL).  On a padded array (NXL < NX) the plain
            lane roll pulls exactly one logical lane from the pad region
            (x = 0 for ex = +1, x = NXL-1 for ex = -1); a second roll lands
            the true periodic source on that lane and a one-lane select
            patches it.  Valid lanes never read pad lanes, so pad garbage
            stays confined to the pad and is sliced off in `apply`."""
            if ex == 0:
                return val
            rolled = pltpu.roll(val, ex % NX, axis=1)
            if NXL == NX:
                return rolled
            if ex == 1:
                fix = pltpu.roll(val, (NX - NXL + 1) % NX, axis=1)
                lane = 0
            elif ex == -1:
                fix = pltpu.roll(val, (NXL - 1) % NX, axis=1)
                lane = NXL - 1
            else:
                raise ValueError("lattice velocities are unit in x")
            iota = jax.lax.broadcasted_iota(jnp.int32, val.shape, 1)
            return jnp.where(iota == lane, fix, rolled)

        def streamed_dir(k, d, e):
            ex, ey, ez = ES[k][d]
            src_slot = jax.lax.rem(jnp.int32(e - ez + 3 * NZ), jnp.int32(3))
            if ZG and 1 <= k <= nspec:
                # zerograd-top ghost plane (reference LBM.cu:1929-1958):
                # the ion post-collision plane NZ-1 is pre-stream-copied
                # from NZ-2, so any ion read of plane NZ-1 sources slot
                # (NZ-2)%3 instead.  Interior emits hit this only at
                # e = NZ-2, ez = -1 (wrap reads of "plane NZ" land at the
                # lower plate, which emit_wall overwrites with noflux).
                src_slot = jnp.where(jnp.int32(e - ez) == NZ - 1,
                                     jnp.int32((NZ - 2) % 3), src_slot)
            full = slot_pop[k][src_slot, d]
            val = jax.lax.slice_in_dim(full, 1 - ey, 1 - ey + TY, axis=0)
            return roll_x(val, ex)

        def interior_emit_copy(k, b, e):
            return pltpu.make_async_copy(
                emit_pop[k].at[b], out_pop[k].at[:, e, pl.ds(y0, TY), :],
                sem_emit.at[k, b])

        def grp_copy(fill_i, e_expr):
            k, d0, gl = FILLS[fill_i]
            return pltpu.make_async_copy(
                emit_grp.at[fill_i % ESL, pl.ds(0, gl)],
                out_pop[k].at[pl.ds(d0, gl), e_expr, pl.ds(y0, TY), :],
                sem_emit.at[fill_i % ESL])

        def emit_interior(step):
            """Emit plane e = step-1.  Whole-field double-buffer mode:
            async, drained two steps later.  Grouped mode (EG): each slot's
            previous copy is waited right before refill — the wait
            descriptor (same shape as the issuing copy) comes from the
            static fill schedule; the first two fills of the z-sweep
            (step == 2) have nothing to wait on."""
            e = step - 1
            if EG:
                for i, (k, d0, gl) in enumerate(FILLS):
                    if i >= ESL:
                        grp_copy(i - ESL, e).wait()
                    else:
                        # previous plane's last fill on this slot
                        j = FN - 1 - ((FN - 1 - i) % ESL)

                        @pl.when(step > 2)
                        def _(j=j):
                            grp_copy(j, e - 1).wait()
                    for t in range(gl):
                        emit_grp[i % ESL, t] = streamed_dir(k, d0 + t, e)
                    grp_copy(i, e).start()
                return
            b = jax.lax.rem(jnp.int32(step), jnp.int32(2))

            # drain the DMA issued from this parity two steps ago
            @pl.when(step >= 4)
            def _():
                for k in range(nf):
                    interior_emit_copy(k, b, step - 3).wait()

            for k in range(nf):
                for d in range(QS[k]):
                    emit_pop[k][b, d] = streamed_dir(k, d, e)
                interior_emit_copy(k, b, e).start()

        def drain_interior(step):
            """Wait any interior emit issued at `step` (if it was one)."""
            if step < 2 or step > NZ - 1:
                return
            if EG:
                # only the z-sweep's last ESL fills can still be in flight
                # (each slot's copy is waited before the slot is refilled)
                if step == NZ - 1:
                    for i in range(max(0, FN - ESL), FN):
                        grp_copy(i, NZ - 2).wait()
                return
            b = step % 2
            for k in range(nf):
                interior_emit_copy(k, b, step - 1).wait()

        def wall_dma(k, e, dirs=None):
            if dirs is None:
                # only the first QS[k] rows of wall_buf are field k's dirs
                cp_ = pltpu.make_async_copy(
                    wall_buf.at[pl.ds(0, QS[k])],
                    out_pop[k].at[:, e, pl.ds(y0, TY), :],
                    sem_wall.at[0])
                cp_.start(); cp_.wait()
            else:
                for d in dirs:
                    cp_ = pltpu.make_async_copy(
                        wall_buf.at[d], out_pop[k].at[d, e, pl.ds(y0, TY), :],
                        sem_wall.at[0])
                    cp_.start(); cp_.wait()

        def emit_wall(e, slot_e, f_src_for_down=False, f_dirs=None):
            """Wall-plane emit (reference gpu_bc_charge semantics):
            fluid streams (f_src_for_down=True overrides the z-wrap source
            for ez=-1 with the pinned pre-stream lower-wall plane f_pin),
            ions reflect, temperature anti-bounces."""
            dirs = list(range(Q)) if f_dirs is None else f_dirs
            for d in dirs:
                ez = E_[d][2]
                if ez == -1 and f_src_for_down:
                    full = f_pin[PIN_IDX[d]]
                    val = roll_x(
                        jax.lax.slice_in_dim(full, 1 - E_[d][1], 1 - E_[d][1] + TY, axis=0),
                        E_[d][0])
                else:
                    val = streamed_dir(0, d, e)
                wall_buf[d] = val
            wall_dma(0, e, None if f_dirs is None else dirs)

            if ek:
                # noflux: reflected post-collision opposites (d=0 maps to
                # itself = the streamed rest, Yoshida LBM.cu:2102-2218);
                # injection: anti-bounce-back to the plate charge level
                # (the reference's commented ETHD regime, LBM.cu:2231-2292);
                # zerograd-top upper plate: every direction streams from
                # the ghost plane (= plane NZ-2's post values at
                # (y-ey, x-ex), reference LBM.cu:1929-1958) — ez=+1 dirs
                # reach it by ordinary streaming, ez<=0 via the pre-stream
                # plane copy the ghost encodes
                inj = p.charge_bc == "injection"
                cws = ((p.charge0, p.charge0n) if e == 0
                       else (p.charge1, p.charge1n))
                for k in range(1, 1 + nspec):
                    if ZG and e != 0:
                        for d in range(QS[k]):
                            ex_, ey_, _ez = ES[k][d]
                            full = slot_pop[k][(NZ - 2) % 3, d]
                            v = jax.lax.slice_in_dim(
                                full, 1 - ey_, 1 - ey_ + TY, axis=0)
                            wall_buf[d] = roll_x(v, ex_)
                        wall_dma(k, e)
                        continue
                    for d in range(QS[k]):
                        full = slot_pop[k][slot_e, OPPS[k][d]]
                        v = jax.lax.slice_in_dim(full, 1, 1 + TY, axis=0)
                        if inj:
                            v = -v + cst(2.0 * cws[k - 1] * WS[k][d])
                        wall_buf[d] = v
                    wall_dma(k, e)
            if thermal:
                k = nf - 1
                tw = 2.0 * p.TH if e == 0 else 0.0
                for d in range(QS[k]):
                    full = slot_pop[k][slot_e, OPPS[k][d]]
                    v = -jax.lax.slice_in_dim(full, 1, 1 + TY, axis=0)
                    if tw != 0.0:
                        v = v + cst(tw * WS[k][d])
                    wall_buf[d] = v
                wall_dma(k, e)

        # ------------------------------------------------ pipeline
        @pl.when(s == 0)
        def _():
            start_in(0)
            start_in(1)
            start_phi(0)
            start_phi(1)
            start_phi(2)
            wait_in(0)

        @pl.when(s == 1)
        def _():
            wait_in(1)
            wait_phi(0)
            wait_phi(1)
            wait_phi(2)
            numer1 = []
            collide_plane(1, 1, numer_out=numer1)

            def wall_u(inv_rho0, si):
                nx1, ny1, nz1 = numer1[si]
                return (-nx1 * inv_rho0, -ny1 * inv_rho0, -nz1 * inv_rho0)

            collide_plane(0, 0, u_override=wall_u, is_lower_wall=True)
            start_in(2)
            start_phi(3)
            for i, d in enumerate(PIN_DIRS):
                f_pin[i] = slot_pop[0][0, d]

        @pl.when((s >= 2) & (s < NZ))
        def _():
            wait_in(s)

            @pl.when(s + 1 < NZ)
            def _():
                wait_phi(s + 1)
                start_in(s + 1)

            @pl.when(s + 2 < NZ)
            def _():
                start_phi(s + 2)

            collide_plane(s, jax.lax.rem(s, jnp.int32(3)))

        @pl.when(s == NZ - 1)
        def _():
            # upper-wall fluid: bounce-back of the raw input populations
            reflect_store(0, jax.lax.rem(s, jnp.int32(2)),
                          jax.lax.rem(s, jnp.int32(3)), with_wall_term=True)

        @pl.when((s >= 2) & (s <= NZ - 1))
        def _():
            emit_interior(s)

        @pl.when(s == 2)
        def _():
            emit_wall(0, slot_e=0,
                      f_dirs=[d for d in range(Q) if E_[d][2] <= 0])

        @pl.when(s == NZ)
        def _():
            drain_interior(NZ - 1)
            drain_interior(NZ - 2)
            if ek:
                # plane NZ-2's copy (-> out NZ-3) is the only one that can
                # still be in flight: plane NZ-1 issues none, and NZ-3's was
                # waited at collide_plane(NZ-1)
                plane = NZ - 2
                pltpu.make_async_copy(
                    rhsb.at[plane % 2],
                    out_rhs.at[plane - 1, pl.ds(y0, TY), :],
                    sem_cmom.at[plane % 2]).wait()
            emit_wall(NZ - 1, slot_e=(NZ - 1) % 3, f_src_for_down=True)
            slot_top = (NZ - 1) % 3
            up_dirs = [d for d in range(Q) if E_[d][2] == 1]
            for d in up_dirs:
                full = slot_pop[0][slot_top, d]
                val = jax.lax.slice_in_dim(full, 1 - E_[d][1], 1 - E_[d][1] + TY, axis=0)
                wall_buf[d] = roll_x(val, E_[d][0])
            wall_dma(0, 0, up_dirs)

    # ------------------------------------------------------------------
    in_specs = [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_in)]
    if hartley_x:
        # constant block index -> the pipeline keeps the cas matrix resident
        # in VMEM across every (strip, plane) step; no per-step refetch
        in_specs.append(pl.BlockSpec((NX, NX), lambda j, s: (0, 0)))
    out_shapes = [jax.ShapeDtypeStruct((q, NZ, NY, NX), dtype) for q in QS]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY) for _ in range(nf)]
    if ek:
        # interior Poisson-RHS planes only (z = 1 .. NZ-2)
        out_shapes.append(jax.ShapeDtypeStruct((NZ - 2, NY, NX), dtype))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))

    scratch = []
    for q in QS:
        scratch.append(pltpu.VMEM((2, q, WROWS, NX), dtype))   # input windows
    if ek:
        scratch.append(pltpu.VMEM((4, WROWS_PHI, NX), dtype))  # phi windows
    if pcol:
        scratch.append(pltpu.VMEM((4, WROWS_PHI, pc_w), dtype))  # pcol windows
    for q in QS:
        scratch.append(pltpu.VMEM((3, q, R, NX), dtype))       # post slots
    scratch.append(pltpu.VMEM((len(PIN_DIRS), R, NX), dtype))  # f_pin
    if EG:
        scratch.append(pltpu.VMEM((ESL, EG, TY, NX), dtype))   # shared emit
    else:
        for q in QS:
            scratch.append(pltpu.VMEM((2, q, TY, NX), dtype))  # emit dbl-buf
    scratch.append(pltpu.VMEM((QMAX, TY, NX), dtype))          # wall buf
    if ek:
        scratch.append(pltpu.VMEM((2, TY, NX), dtype))         # rhs dbl-buf
        if chunked:
            scratch.append(pltpu.VMEM((nspec, R, NX), dtype))  # cmom staging
    scratch.append(pltpu.SemaphoreType.DMA((2, nf, 3)))        # sem_in
    if ek:
        scratch.append(pltpu.SemaphoreType.DMA((4, 3)))        # sem_phi
    if pcol:
        scratch.append(pltpu.SemaphoreType.DMA((4, 3)))        # sem_pcol
    scratch.append(pltpu.SemaphoreType.DMA((ESL,) if EG else (nf, 2)))  # sem_emit
    scratch.append(pltpu.SemaphoreType.DMA((2,)))              # sem_wall
    if ek:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))          # sem_cmom

    fused = pl.pallas_call(
        kernel,
        grid=(JY, NZ + 1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def _pad(a):
        """Periodic-continuation pad of the lane axis to NX (finite values
        everywhere; the kernel never reads pad lanes into logical lanes)."""
        if a is None or NX == NXL:
            return a
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, NX - NXL)],
                       mode="wrap")

    def _trim(a):
        return a if (a is None or NX == NXL) else a[..., :NXL]

    def apply(f, h=None, hn=None, g_=None, phi=None,
              lo=None, hi=None, phi_lo=None, phi_hi=None,
              pcol_=None, pcol_lo=None, pcol_hi=None):
        args = [f]
        if ek:
            args += [h, hn] if nspec == 2 else [h]
        if thermal:
            args.append(g_)
        if ek:
            args.append(phi)
        if halo:
            args += list(lo) + list(hi)
            if ek:
                args += [phi_lo, phi_hi]
        args = [_pad(a) for a in args]
        if pcol:
            # packed phi-column x-halo: already one lane tile wide, never
            # padded (only lanes 0-1 are read)
            args += [pcol_, pcol_lo, pcol_hi]
        if hartley_x:
            from ..parallel.fft import _hartley_matrix

            args.append(jnp.asarray(
                _hartley_matrix(NXL, dtype == jnp.float64), dtype))
        outs = [_trim(o) for o in fused(*args)]
        f1 = outs.pop(0)
        h1 = outs.pop(0) if ek else None
        hn1 = outs.pop(0) if ek and nspec == 2 else None
        g1 = outs.pop(0) if thermal else None
        rhs = outs.pop(0) if ek else None
        return f1, h1, hn1, g1, rhs

    apply.hartley_x = hartley_x
    return apply
