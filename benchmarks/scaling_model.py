#!/usr/bin/env python3
"""Analytic scaling-traffic model for the slab ('y',) production
decomposition — round-3 revision (verdict item 5).  Two fixes over the
round-2 record:

1. The Poisson solve's all-to-all repartitions are included: the psi_hx
   solve does 4 per step (2 per hartley_y stage x 2 stages,
   parallel/fft.py), each moving vol x (n-1)/n^2 bytes per chip — at
   256^3 and n = 2..8 this is 29-67 MB/chip/step, LARGER than the
   26.3 MB halo term the round-2 model counted alone.
2. The per-chip compute rate uses the MEASURED small-TY cliff
   (scripts/tpu_ty_probe.py, v5e 256^3 f32 D3Q7): the (TY+16)/TY window
   amplification plus per-strip pipeline restarts cost far more than the
   amplification alone — the round-2 claim "slab covers up to ny/8
   chips" ignored this.

Model: single-chip per-node time anchored at the measured MLUPS(TY); the
n-chip step time adds the ICI terms serially (worst case, no overlap):
    t_n = nodes_local / MLUPS(TY(n)) + (halo + a2a) / ICI_BW
    strong_eff(n) = t_1 / (n * t_n)
Weak scaling (BASELINE metric, constant ny_local per chip) keeps
TY = 128 so the cliff never applies; only the ICI terms grow.

Prints the SCALING_r03.json document when run.
"""
import json

# measured on v5e 256^3 f32 D3Q7 scalars (scripts/tpu_ty_probe.py, round
# 3; TY=128 from the round-2/3 production bench).  The fall below the
# pure (TY+16)/TY amplification is per-strip pipeline restart overhead.
MEASURED_TY_MLUPS = {128: 1368.7, 64: 1292.0, 32: 1128.6, 16: 854.5,
                     8: 597.9}

ICI_BW = 186e9   # v5e: ~1.6 Tbps aggregate ICI per chip / ~186 GB/s
                 # usable per direction-pair on the 2D torus ring


def mlups_at_ty(ty):
    keys = sorted(MEASURED_TY_MLUPS)
    ty = max(min(ty, keys[-1]), keys[0])
    if ty in MEASURED_TY_MLUPS:
        return MEASURED_TY_MLUPS[ty]
    lo = max(k for k in keys if k <= ty)
    hi = min(k for k in keys if k >= ty)
    f = (ty - lo) / (hi - lo)
    return MEASURED_TY_MLUPS[lo] * (1 - f) + MEASURED_TY_MLUPS[hi] * f


def strong(nz, ny, nx, n, qs=(27, 7, 7, 7)):
    """Fixed global grid sharded over n chips."""
    dsize = 4
    ny_local = ny // n
    ty = min(128, ny_local)
    nodes_local = nz * ny_local * nx
    vol = (nz - 2) * ny * nx * dsize
    halo = (2 * sum(qs) * nz * nx + 4 * nz * nx) * dsize if n > 1 else 0
    a2a = 4 * vol * (n - 1) / (n * n) if n > 1 else 0.0
    t_compute = nodes_local / (mlups_at_ty(ty) * 1e6)
    t_ici = (halo + a2a) / ICI_BW
    t1 = nz * ny * nx / (mlups_at_ty(min(128, ny)) * 1e6)
    return dict(n=n, ny_local=ny_local, ty=ty,
                halo_mb=round(halo / 1e6, 2),
                poisson_a2a_mb=round(a2a / 1e6, 2),
                t_compute_ms=round(t_compute * 1e3, 3),
                t_ici_ms=round(t_ici * 1e3, 3),
                per_chip_mlups=round(nodes_local / (t_compute + t_ici) / 1e6, 1),
                strong_efficiency=round(t1 / (n * (t_compute + t_ici)), 4))


def weak(nz, ny_local, nx, n, qs=(27, 7, 7, 7)):
    """Constant ny_local per chip; global ny = n * ny_local."""
    dsize = 4
    ty = min(128, ny_local)
    nodes_local = nz * ny_local * nx
    vol = (nz - 2) * (ny_local * n) * nx * dsize
    halo = (2 * sum(qs) * nz * nx + 4 * nz * nx) * dsize if n > 1 else 0
    a2a = 4 * vol * (n - 1) / (n * n) if n > 1 else 0.0
    t_compute = nodes_local / (mlups_at_ty(ty) * 1e6)
    t_ici = (halo + a2a) / ICI_BW
    return dict(n=n, ny_local=ny_local,
                halo_mb=round(halo / 1e6, 2),
                poisson_a2a_mb=round(a2a / 1e6, 2),
                weak_efficiency=round(t_compute / (t_compute + t_ici), 4))


def main():
    doc = {
        "round": 3,
        "measured_ty_cliff_mlups": MEASURED_TY_MLUPS,
        "strong_256^3": [strong(257, 256, 256, n) for n in (1, 2, 4, 8, 16, 32)],
        "weak_ny128_per_chip": [weak(257, 128, 256, n) for n in (1, 2, 4, 8, 16, 32)],
        "weak_pod_preset_512x256xN": [strong(257, 256, 512, n) for n in (1, 2, 4, 8)],
    }
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
