"""Fused collide-stream Pallas TPU kernel — the roofline path.

One kernel performs, per timestep, what the reference does in four separate
global-memory passes (gpu_collide_save + gpu_boundary + gpu_stream +
gpu_bc_charge, LBM.cu:465-481): the state is read from HBM once and the
fully-streamed next state written once (~2 passes vs the reference's 4).

Design — a sequential z-pipeline over y-strips, grid = (NY/TY, NZ+1):

  step s < NZ   DMA-in plane-strip s of every population (+E), with one
                wrap-aware halo row on each side in y;
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
                into the halo, the x-shift a lane roll.  Ion no-flux and
                temperature anti-bounce-back walls are whole-plane slot
                reflections at emit time (reference gpu_bc_charge,
                LBM.cu:2095-2416).  The fluid's periodic z-wrap planes
                (pulled across z=0/NZ-1 exactly as the reference's modular
                streaming does, LBM.cu:1970-1975) are emitted at the final
                step from a pinned copy of post-collision plane 0.

The kernel also emits the pre-collision ion moments (c+, c-) per plane —
the Poisson solve consumes them directly, so no separate moment pass ever
touches HBM.

f32 (and bf16-storage later); the jnp path remains the f64 oracle.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config


def _pick_ty(cfg, nfields: int, vmem_budget=28 * 1024 * 1024):
    """Largest strip height TY dividing NY whose working set fits VMEM."""
    g = cfg.grid
    for ty in (64, 32, 16, 8, 4, 2, 1):
        if g.ny % ty:
            continue
        r = ty + 2
        plane = 27 * r * g.nx * 4
        # 3 in slots + 3 post slots + pin per field, emit bufs, E bufs
        need = nfields * plane * (3 + 3 + 1 + 1) + 3 * 3 * r * g.nx * 4
        if need < vmem_budget:
            return ty
    return None


def build_fused_step(cfg: Config, dtype=jnp.float32, interpret: bool = False, ty_override: int = 0):
    """Returns fn(f, h, hn, g, E) -> (f1, h1, hn1, g1, c, cn).

    h/hn/g/E/c/cn are None when the corresponding physics is disabled.
    """
    lat = cfg.lattice
    if lat.Q != 27:
        raise ValueError("fused kernel supports D3Q27 only")
    g = cfg.grid
    p = cfg.physics
    NZ, NY, NX = g.shape
    if NZ < 4:
        raise ValueError("fused kernel needs NZ >= 4")

    ek = p.enable_ek
    thermal = p.enable_thermal
    fields = ["f"] + (["h", "hn"] if ek else []) + (["g"] if thermal else [])
    nf = len(fields)

    if NY % 8:
        raise ValueError("fused kernel requires NY % 8 == 0 (halo block fetch)")
    TY = ty_override or _pick_ty(cfg, nf)
    if TY is None or NY % TY:
        raise ValueError("no y-strip size fits VMEM")
    R = TY + 2
    JY = NY // TY

    # ---- static lattice/physics constants -------------------------------
    E_ = [tuple(int(v) for v in lat.E[d]) for d in range(27)]
    W_ = [float(w) for w in lat.W]
    OPP = [int(o) for o in lat.OPP]
    dt = p.dt(g.dx)
    cs2 = cfg.cs_square() if hasattr(cfg, "cs_square") else cfg.cs2
    cfl = p.cfl
    om = p.omegas(g.dx)
    inv_cfl = 1.0 / cfl
    inv_cs2 = 1.0 / cs2
    t_scale = inv_cs2 * inv_cfl            # (e . v) prefactor in feq
    kappa = p.convert_c_to_charge
    buoy = p.rho0 * p.Ra * p.nu * p.D
    mw_coef = 2.0 * p.rho0 * p.uw * inv_cs2 * inv_cfl  # moving-wall term
    dtype = jnp.dtype(dtype)
    cst = dtype.type

    om_p = {  # (omega_plus*dt, omega_minus*dt) per field
        "f": (om["omega_plus"] * dt, om["omega_minus"] * dt),
        "h": (om["omega_c_plus"] * dt, om["omega_c_minus"] * dt),
        "hn": (om["omega_cn_plus"] * dt, om["omega_cn_minus"] * dt),
        "g": (om["omega_T_plus"] * dt, om["omega_T_minus"] * dt),
    }
    s_plus = 1.0 - 0.5 * dt * om["omega_plus"]
    s_minus = 1.0 - 0.5 * dt * om["omega_minus"]

    n_in = nf + (1 if ek else 0)  # population fields + E

    def kernel(*refs):
        # ref order: inputs [pops x nf, (E)], outputs [pops x nf, (c, cn)],
        # scratch: in_bufs x nf, (e_buf), slots x nf, f_pin, emit x nf,
        # (cmom), sem_in, sem_out
        idx = 0
        in_pop = refs[idx : idx + nf]; idx += nf
        in_E = refs[idx] if ek else None; idx += 1 if ek else 0
        out_pop = refs[idx : idx + nf]; idx += nf
        out_c = refs[idx] if ek else None; idx += 1 if ek else 0
        out_cn = refs[idx] if ek else None; idx += 1 if ek else 0
        buf_main = refs[idx : idx + nf]; idx += nf
        buf_halo = refs[idx : idx + nf]; idx += nf
        bufE_main = refs[idx] if ek else None; idx += 1 if ek else 0
        bufE_halo = refs[idx] if ek else None; idx += 1 if ek else 0
        slot_pop = refs[idx : idx + nf]; idx += nf
        f_pin = refs[idx]; idx += 1
        emit_pop = refs[idx : idx + nf]; idx += nf
        cmom = refs[idx] if ek else None; idx += 1 if ek else 0
        sem_in = refs[idx]; idx += 1
        sem_out = refs[idx]; idx += 1

        j = pl.program_id(0)
        s = pl.program_id(1)
        y0 = j * TY
        ytop = jax.lax.rem(y0 + (NY - 1), jnp.int32(NY))
        ybot = jax.lax.rem(y0 + TY, jnp.int32(NY))
        ytop_blk = (ytop // 8) * 8
        ybot_blk = (ybot // 8) * 8
        ytop_sub = ytop - ytop_blk
        ybot_sub = ybot - ybot_blk

        def halo_rows(halo):
            """Select the top/bottom halo rows from the (16, NX) block value.

            With TY % 8 == 0 (every compiled TPU config) the in-block row of
            y0-1 is statically 7 and of y0+TY statically 0; the dynamic path
            (interpret-mode odd strip sizes) uses dynamic_slice."""
            if TY % 8 == 0:
                return halo[7:8, :], halo[8:9, :]
            top = jax.lax.dynamic_slice_in_dim(halo, ytop_sub, 1, 0)
            bot = jax.lax.dynamic_slice_in_dim(halo, 8 + ybot_sub, 1, 0)
            return top, bot

        # ------------------------------------------------ DMA helpers
        def in_copies(plane, slot):
            """Async copies loading plane-strip `plane` into buffer `slot`.

            Main strip and the two wrap-aware y-halo rows go to separate
            buffers so every DMA destination slice starts at sublane offset
            0 (Mosaic requires tile-aligned ref slices when NX spans more
            than one lane tile)."""
            cps = []
            # halo rows fetched as aligned 8-row blocks (Mosaic rejects
            # sub-tile sublane slices when NX spans multiple lane tiles);
            # the single needed row is selected in value space at load time
            for k in range(nf):
                src = in_pop[k]
                cps.append(pltpu.make_async_copy(
                    src.at[:, plane, pl.ds(y0, TY), :],
                    buf_main[k].at[slot], sem_in.at[slot, k, 0]))
                cps.append(pltpu.make_async_copy(
                    src.at[:, plane, pl.ds(ytop_blk, 8), :],
                    buf_halo[k].at[slot, :, pl.ds(0, 8), :], sem_in.at[slot, k, 1]))
                cps.append(pltpu.make_async_copy(
                    src.at[:, plane, pl.ds(ybot_blk, 8), :],
                    buf_halo[k].at[slot, :, pl.ds(8, 8), :], sem_in.at[slot, k, 2]))
            if ek:
                cps.append(pltpu.make_async_copy(
                    in_E.at[:, plane, pl.ds(y0, TY), :],
                    bufE_main.at[slot], sem_in.at[slot, nf, 0]))
                cps.append(pltpu.make_async_copy(
                    in_E.at[:, plane, pl.ds(ytop_blk, 8), :],
                    bufE_halo.at[slot, :, pl.ds(0, 8), :], sem_in.at[slot, nf, 1]))
                cps.append(pltpu.make_async_copy(
                    in_E.at[:, plane, pl.ds(ybot_blk, 8), :],
                    bufE_halo.at[slot, :, pl.ds(8, 8), :], sem_in.at[slot, nf, 2]))
            return cps

        def start_in(plane):
            for c in in_copies(plane, jax.lax.rem(jnp.int32(plane), jnp.int32(3))):
                c.start()

        def wait_in(plane):
            for c in in_copies(plane, jax.lax.rem(jnp.int32(plane), jnp.int32(3))):
                c.wait()

        # ------------------------------------------------ collide
        def load_pops(k, slot):
            """(R, NX) logical rows [y0-1, y0+TY] per direction, assembled
            as values: halo_top + main + halo_bot."""
            out = []
            for d in range(27):
                halo = buf_halo[k][slot, d]          # (16, NX) value
                top, bot = halo_rows(halo)
                main = buf_main[k][slot, d]
                out.append(jnp.concatenate([top, main, bot], axis=0))
            return out

        def load_E(slot):
            out = []
            for comp in range(3):
                halo = bufE_halo[slot, comp]
                top, bot = halo_rows(halo)
                main = bufE_main[slot, comp]
                out.append(jnp.concatenate([top, main, bot], axis=0))
            return out

        def moments_of(pops):
            m = pops[0]
            for d in range(1, 27):
                m = m + pops[d]
            return m

        def raw_mom(pops, comp):
            acc = None
            for d in range(1, 27):
                e = E_[d][comp]
                if e == 0:
                    continue
                term = pops[d] if e > 0 else -pops[d]
                acc = term if acc is None else acc + term
            return acc

        def feq_list(m, vx, vy, vz):
            omusq = 1.0 - cst(0.5 * inv_cs2) * (vx * vx + vy * vy + vz * vz)
            tx, ty_, tz = vx * cst(t_scale), vy * cst(t_scale), vz * cst(t_scale)
            out = []
            for d in range(27):
                ex, ey, ez = E_[d]
                t = None
                for e, comp in ((ex, tx), (ey, ty_), (ez, tz)):
                    if e == 0:
                        continue
                    term = comp if e > 0 else -comp
                    t = term if t is None else t + term
                if t is None:
                    out.append(cst(W_[d]) * m * omusq)
                else:
                    out.append(cst(W_[d]) * m * (omusq + t * (1.0 + 0.5 * t)))
            return out

        def guo_list(ux, uy, uz, fx, fy, fz):
            udotF = ux * fx + uy * fy + uz * fz
            out = []
            for d in range(27):
                ex, ey, ez = E_[d]

                def sgn_sum(e, a, b, c):
                    acc = None
                    for ei, v in ((e[0], a), (e[1], b), (e[2], c)):
                        if ei == 0:
                            continue
                        term = v if ei > 0 else -v
                        acc = term if acc is None else acc + term
                    return acc

                eF = sgn_sum((ex, ey, ez), fx, fy, fz)
                eu = sgn_sum((ex, ey, ez), ux, uy, uz)
                if eF is None:
                    core = -udotF
                else:
                    core = eF * cst(inv_cfl) - udotF + eu * eF * cst(
                        inv_cfl * inv_cfl * inv_cs2
                    )
                out.append(cst(W_[d] * inv_cs2) * core)
            return out

        def trt(pops, eq, op_dt, om_dt, src=None):
            out = [None] * 27
            if src is None:
                out[0] = pops[0] - cst(op_dt) * (pops[0] - eq[0])
            else:
                out[0] = pops[0] - cst(op_dt) * (pops[0] - eq[0]) + cst(dt) * src[0]
            for i in range(1, 27, 2):
                jdx = i + 1
                pp = 0.5 * (pops[i] + pops[jdx])
                pm = 0.5 * (pops[i] - pops[jdx])
                ep = 0.5 * (eq[i] + eq[jdx])
                em = 0.5 * (eq[i] - eq[jdx])
                cp = cst(op_dt) * (pp - ep)
                cm = cst(om_dt) * (pm - em)
                out[i] = pops[i] - (cp + cm)
                out[jdx] = pops[jdx] - (cp - cm)
                if src is not None:
                    sp_ = 0.5 * (src[i] + src[jdx])
                    sm_ = 0.5 * (src[i] - src[jdx])
                    out[i] = out[i] + cst(dt) * (cst(s_plus) * sp_ + cst(s_minus) * sm_)
                    out[jdx] = out[jdx] + cst(dt) * (cst(s_plus) * sp_ - cst(s_minus) * sm_)
            return out

        def store_slot(k, slot, vals):
            for d in range(27):
                slot_pop[k][slot, d] = vals[d]

        def reflect_raw(pops, with_wall_term):
            """Full-way bounce-back of *pre-collision* populations."""
            out = [None] * 27
            out[0] = pops[0]
            for d in range(1, 27):
                v = pops[OPP[d]]
                if with_wall_term and E_[d][0] != 0 and mw_coef != 0.0:
                    term = cst(mw_coef * W_[d] * E_[d][0])
                    v = v + term
                out[d] = v
            return out

        def collide_plane(plane_s, slot, u_override=None, numer_out=None,
                          is_lower_wall=False, is_upper_wall=False):
            """Collide the plane in input buffer `slot`; store post-collision
            populations into the rotating slots.  Returns (numer, rho)."""
            fpops = load_pops(0, slot)
            rho = moments_of(fpops)
            inv_rho = 1.0 / rho
            if ek:
                hpops = load_pops(1, slot)
                hnpops = load_pops(2, slot)
                c = moments_of(hpops)
                cn = moments_of(hnpops)
            if thermal:
                gpops = load_pops(nf - 1, slot)
                T = moments_of(gpops)

            # body force (LBM.cu:632-637)
            if ek:
                Ex, Ey, Ez = load_E(slot)
                q = cst(kappa) * (c - cn)
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
            nx_ = raw_mom(fpops, 0) * cst(inv_cfl) + cst(0.5 * dt) * fx
            ny_ = raw_mom(fpops, 1) * cst(inv_cfl) + cst(0.5 * dt) * fy
            nz_ = raw_mom(fpops, 2) * cst(inv_cfl) + cst(0.5 * dt) * fz
            if numer_out is not None:
                numer_out.extend([nx_, ny_, nz_])
            if u_override is not None:
                ux, uy, uz = u_override(inv_rho)
            else:
                ux, uy, uz = nx_ * inv_rho, ny_ * inv_rho, nz_ * inv_rho

            # emit pre-collision ion moments for the Poisson solve
            if ek:
                cmom[0] = c[1 : TY + 1]
                cmom[1] = cn[1 : TY + 1]
                cp1 = pltpu.make_async_copy(
                    cmom.at[0], out_c.at[plane_s, pl.ds(y0, TY), :], sem_out.at[1])
                cp2 = pltpu.make_async_copy(
                    cmom.at[1], out_cn.at[plane_s, pl.ds(y0, TY), :], sem_out.at[2])
                cp1.start(); cp2.start(); cp1.wait(); cp2.wait()

            # fluid TRT + Guo source
            if is_lower_wall or is_upper_wall:
                f2 = reflect_raw(fpops, with_wall_term=is_upper_wall)
            else:
                feq_f = feq_list(rho, ux, uy, uz)
                src = guo_list(ux, uy, uz, fx, fy, fz)
                f2 = trt(fpops, feq_f, *om_p["f"], src)
            store_slot(0, slot, f2)

            if ek:
                uxc = ux + cst(p.K) * Ex
                uyc = uy + cst(p.K) * Ey
                uzc = uz + cst(p.K) * Ez
                h2 = trt(hpops, feq_list(c, uxc, uyc, uzc), *om_p["h"])
                store_slot(1, slot, h2)
                uxn = ux + cst(p.Kn) * Ex
                uyn = uy + cst(p.Kn) * Ey
                uzn = uz + cst(p.Kn) * Ez
                hn2 = trt(hnpops, feq_list(cn, uxn, uyn, uzn), *om_p["hn"])
                store_slot(2, slot, hn2)
            if thermal:
                g2 = trt(gpops, feq_list(T, ux, uy, uz), *om_p["g"])
                store_slot(nf - 1, slot, g2)

        # ------------------------------------------------ emit helpers
        def roll_x(val, ex):
            if ex == 0:
                return val
            # pltpu.roll requires a non-negative shift; -1 == NX-1 circularly
            return pltpu.roll(val, ex % NX, axis=1)

        def streamed_dir(k, d, e_slot_of):
            """Streamed output rows for direction d of field k: src slot per
            e_slot_of(d), y-shift as a value slice into the halo, x roll."""
            ex, ey, ez = E_[d]
            src_slot = e_slot_of(d)
            full = slot_pop[k][src_slot, d]          # (R, NX) value
            val = jax.lax.slice_in_dim(full, 1 - ey, 1 - ey + TY, axis=0)
            return roll_x(val, ex)

        def emit_interior(e):
            """Full streamed emit of plane e (1 <= e <= NZ-1 interior rule).
            Slots hold planes e-1, e, e+1."""

            def e_slot(d):
                return jax.lax.rem(jnp.int32(e - E_[d][2] + 3 * NZ), jnp.int32(3))

            for k in range(nf):
                for d in range(27):
                    emit_pop[k][d] = streamed_dir(k, d, e_slot)
                cp = pltpu.make_async_copy(
                    emit_pop[k].at[:], out_pop[k].at[:, e, pl.ds(y0, TY), :],
                    sem_out.at[0])
                cp.start()
                cp.wait()

        def emit_wall(e, slot_e, f_src_for_down=None, f_dirs=None):
            """Wall-plane emit: fluid streams (f_src_for_down overrides the
            z-wrap source for ez=-1 dirs), ions reflect, temperature
            anti-bounces (reference gpu_bc_charge)."""

            def e_slot(d):
                return jax.lax.rem(jnp.int32(e - E_[d][2] + 3 * NZ), jnp.int32(3))

            # fluid
            dirs = range(27) if f_dirs is None else f_dirs
            for d in dirs:
                ez = E_[d][2]
                if ez == -1 and f_src_for_down is not None:
                    # periodic z-wrap source plane
                    full = f_src_for_down[d]
                    val = roll_x(
                        jax.lax.slice_in_dim(full, 1 - E_[d][1], 1 - E_[d][1] + TY, axis=0),
                        E_[d][0])
                else:
                    val = streamed_dir(0, d, e_slot)
                emit_pop[0][d] = val
            if f_dirs is None:
                cp = pltpu.make_async_copy(
                    emit_pop[0].at[:], out_pop[0].at[:, e, pl.ds(y0, TY), :],
                    sem_out.at[0])
                cp.start(); cp.wait()
            else:
                for d in dirs:
                    cp = pltpu.make_async_copy(
                        emit_pop[0].at[d], out_pop[0].at[d, e, pl.ds(y0, TY), :],
                        sem_out.at[0])
                    cp.start(); cp.wait()

            # ions: h1[d] = h2[OPP[d]] at the same node (no shift)
            if ek:
                for k in (1, 2):
                    for d in range(27):
                        full = slot_pop[k][slot_e, OPP[d]]
                        emit_pop[k][d] = jax.lax.slice_in_dim(full, 1, 1 + TY, axis=0)
                    cp = pltpu.make_async_copy(
                        emit_pop[k].at[:], out_pop[k].at[:, e, pl.ds(y0, TY), :],
                        sem_out.at[0])
                    cp.start(); cp.wait()
            # temperature anti-bounce-back: -g2[OPP] (+ 2 TH w at z=0)
            if thermal:
                k = nf - 1
                tw = 2.0 * p.TH if e == 0 else 0.0
                for d in range(27):
                    full = slot_pop[k][slot_e, OPP[d]]
                    v = -jax.lax.slice_in_dim(full, 1, 1 + TY, axis=0)
                    if tw != 0.0:
                        v = v + cst(tw * W_[d])
                    emit_pop[k][d] = v
                cp = pltpu.make_async_copy(
                    emit_pop[k].at[:], out_pop[k].at[:, e, pl.ds(y0, TY), :],
                    sem_out.at[0])
                cp.start(); cp.wait()

        # ------------------------------------------------ pipeline
        @pl.when(s == 0)
        def _():
            start_in(0)
            start_in(1)
            wait_in(0)

        @pl.when(s == 1)
        def _():
            wait_in(1)
            start_in(2)
            # collide plane 1 first: its numer feeds the z=0 wall velocity
            numer1 = []
            collide_plane(1, 1, numer_out=numer1,
                          is_upper_wall=(NZ - 1 == 1))
            nx1, ny1, nz1 = numer1

            def wall_u(inv_rho0):
                return (-nx1 * inv_rho0, -ny1 * inv_rho0, -nz1 * inv_rho0)

            collide_plane(0, 0, u_override=wall_u, is_lower_wall=True)
            # pin post-collision plane 0 of the fluid for the final z-wrap
            for d in range(27):
                f_pin[d] = slot_pop[0][0, d]

        @pl.when((s >= 2) & (s < NZ))
        def _():
            wait_in(s)

            @pl.when(s + 1 < NZ)
            def _():
                start_in(s + 1)

            collide_plane(s, jax.lax.rem(s, jnp.int32(3)))

        # upper-wall replacement after generic collide of plane NZ-1
        @pl.when(s == NZ - 1)
        def _():
            # redo fluid slot with bounce-back of raw input populations
            slot = jax.lax.rem(s, jnp.int32(3))
            fpops = load_pops(0, slot)
            f2 = reflect_raw(fpops, with_wall_term=True)
            store_slot(0, slot, f2)

        # interior emits: plane e = s-1 for 2 <= s <= NZ-1 -> planes 1..NZ-2
        @pl.when((s >= 2) & (s <= NZ - 1) & (s - 1 >= 1) & (s - 1 <= NZ - 2))
        def _():
            emit_interior(s - 1)

        # plane 0 emit (except fluid up-dirs) once slots 0,1 are ready
        @pl.when(s == 2)
        def _():
            emit_wall(0, slot_e=0,
                      f_dirs=[d for d in range(27) if E_[d][2] <= 0])

        # final step: plane NZ-1 emit + fluid up-dirs of plane 0
        @pl.when(s == NZ)
        def _():
            emit_wall(NZ - 1, slot_e=(NZ - 1) % 3, f_src_for_down=f_pin)
            # fluid ez=+1 dirs of plane 0 pull from post-collision plane NZ-1
            slot_top = (NZ - 1) % 3
            for d in range(27):
                if E_[d][2] != 1:
                    continue
                full = slot_pop[0][slot_top, d]
                val = jax.lax.slice_in_dim(full, 1 - E_[d][1], 1 - E_[d][1] + TY, axis=0)
                emit_pop[0][d] = roll_x(val, E_[d][0])
                cp = pltpu.make_async_copy(
                    emit_pop[0].at[d], out_pop[0].at[d, 0, pl.ds(y0, TY), :],
                    sem_out.at[0])
                cp.start(); cp.wait()

    # ------------------------------------------------------------------
    # pallas_call assembly
    # ------------------------------------------------------------------
    pop_shape = (27, NZ, NY, NX)
    scalar_shape = (NZ, NY, NX)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_in)]
    out_shapes = [jax.ShapeDtypeStruct(pop_shape, dtype) for _ in range(nf)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY) for _ in range(nf)]
    if ek:
        out_shapes += [jax.ShapeDtypeStruct(scalar_shape, dtype)] * 2
        out_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 2

    scratch = []
    for _ in range(nf):
        scratch.append(pltpu.VMEM((3, 27, TY, NX), dtype))  # in main bufs
    for _ in range(nf):
        scratch.append(pltpu.VMEM((3, 27, 16, NX), dtype))  # in halo blocks
    if ek:
        scratch.append(pltpu.VMEM((3, 3, TY, NX), dtype))   # E main
        scratch.append(pltpu.VMEM((3, 3, 16, NX), dtype))   # E halo blocks
    for _ in range(nf):
        scratch.append(pltpu.VMEM((3, 27, R, NX), dtype))  # slots
    scratch.append(pltpu.VMEM((27, R, NX), dtype))         # f_pin
    for _ in range(nf):
        scratch.append(pltpu.VMEM((27, TY, NX), dtype))    # emit bufs
    if ek:
        scratch.append(pltpu.VMEM((2, TY, NX), dtype))     # cmom
    scratch.append(pltpu.SemaphoreType.DMA((3, n_in, 3)))  # sem_in
    scratch.append(pltpu.SemaphoreType.DMA((4,)))          # sem_out

    fused = pl.pallas_call(
        kernel,
        grid=(JY, NZ + 1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # v5e has 128 MiB of VMEM; the default 16 MiB scoped limit is
            # far below what the plane pipeline wants at large NX
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def apply(f, h=None, hn=None, g_=None, E=None):
        args = [f]
        if ek:
            args += [h, hn]
        if thermal:
            args.append(g_)
        if ek:
            args.append(E)
        outs = fused(*args)
        outs = list(outs)
        f1 = outs.pop(0)
        h1 = outs.pop(0) if ek else None
        hn1 = outs.pop(0) if ek else None
        g1 = outs.pop(0) if thermal else None
        c = outs.pop(0) if ek else None
        cn = outs.pop(0) if ek else None
        return f1, h1, hn1, g1, c, cn

    return apply
