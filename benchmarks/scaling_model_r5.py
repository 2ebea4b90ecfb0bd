#!/usr/bin/env python3
"""Round-5 scaling model: overlapped ICI terms (SURVEY.md:305, round-4
verdict item 1).

The production multi-step chunk now runs the one-step-lookahead halo
pipeline (parallel/halo.py): each step's population-halo ppermutes issue
right after its kernel, so XLA can hide them under the spectral solve's
compute.  Model change vs SCALING_r04 (whose t_ici charged everything
serially):

    t_ici_serial     = (pop_halo + phi_halo + a2a) / ICI_BW
    t_ici_overlapped = (phi_halo + a2a) / ICI_BW
                       + max(0, pop_halo / ICI_BW - t_solve_local)

where t_solve_local is the per-chip share of the measured production
Poisson solve (2.12 ms at 256^3 single chip, BENCH_r04 poisson_ms,
scaled by local volume fraction) — the compute window the population
ppermutes can hide under.  What CANNOT overlap, and why:

  - the solve's own all-to-all repartitions (a2a): data-dependent
    stages inside the solve, nothing concurrent to hide them under
    within the step's serial phi chain (kernel_n -> rhs -> solve_n ->
    phi -> kernel_{n+1});
  - the 2-row phi halo + the pencil pcol: derived from the solve
    OUTPUT, exchanged at kernel time (<= 4% of per-step ICI bytes);
  - hiding the a2a under the NEXT kernel would need a one-step phi lag
    (different physics than the reference's within-step solve,
    main.cu:198) or plane-streaming kernel inputs (a monolithic custom
    call needs complete inputs) — both rejected.

Anchors: measured local-shape MLUPS from SCALING_r04 (real-chip, 40+
window pipelines), ICI 186 GB/s, measured restructure cost of the
overlap itself: +1.2% on a 1x1 mesh where comm is free
(scripts/tpu_overlap_probe.py, 128^3) — folded into t_compute.

Run: python benchmarks/scaling_model_r5.py > SCALING_r05.json
"""
import json

# real-chip measured full coupled MLUPS at the LOCAL shard shape
# (SCALING_r04 measured_local_shapes_mlups; v5e f32 D3Q7 scalars)
LOCAL = {
    (257, 256, 256): 1379.9, (257, 128, 256): 1394.9,
    (257, 64, 256): 1322.8, (257, 32, 256): 1118.6,
    (257, 16, 256): 786.1, (257, 256, 128): 1383.5,
    (257, 64, 128): 1183.5, (257, 32, 128): 855.4,
    (257, 32, 512): 1089.7, (257, 16, 512): 833.4,
}
ICI_BW = 186e9          # v5e usable per direction-pair
POISSON_MS_256 = 2.124  # BENCH_r04 production psi_hx solve, single chip
OVERLAP_COST = 1.012    # measured 1x1-mesh restructure cost (tpu_overlap_probe)
PENCIL_TAX = 1.154      # measured 128^3 upper bound (8.6% at 256^3)
SLAB_TAX = 1.027        # measured slab shard_map tax at 128^3 (3.8% at 256^3)


def row(nz, ny, nx, n, ny_n, nx_n, qs=(27, 7, 7, 7), label=""):
    dsize = 4
    ny_l, nx_l = ny // ny_n, nx // nx_n
    pencil = nx_n > 1
    nodes_l = nz * ny_l * nx_l
    mlups_l = LOCAL[(nz, ny_l, nx_l)]
    tax = 1.0 if n == 1 else \
        (PENCIL_TAX if pencil else SLAB_TAX) * OVERLAP_COST
    t_comp = nodes_l / (mlups_l * 1e6) * tax
    vol = (nz - 2) * ny * nx * dsize
    if n == 1:
        pop_halo = phi_halo = a2a = 0.0
    else:
        pop_halo = 2 * sum(qs) * nz * nx_l * dsize
        phi_halo = 4 * nz * nx_l * dsize
        if pencil:  # x wrap-column repairs + pcol (ex!=0 dirs, both sides)
            xdirs = 9 + 3 * 2  # D3Q27 fluid 9 per sign; D3Q7 scalars 1 each
            pop_halo += 2 * xdirs * nz * ny_l * dsize
            phi_halo += 4 * nz * ny_l * dsize
        a2a = 4 * vol * (n - 1) / (n * n)
    t_solve_l = POISSON_MS_256 * 1e-3 * ((nz - 2) * ny * nx) / (255 * 256 * 256) / n
    t_ici_ser = (pop_halo + phi_halo + a2a) / ICI_BW
    t_ici_ovl = (phi_halo + a2a) / ICI_BW + \
        max(0.0, pop_halo / ICI_BW - t_solve_l)
    t1 = nz * ny * nx / (LOCAL[(nz, min(ny, 256), min(nx, 256))] * 1e6)
    mk = lambda t_ici: dict(
        per_chip_mlups=round(nodes_l / (t_comp + t_ici) / 1e6, 1),
        strong_efficiency=round(t1 / (n * (t_comp + t_ici)), 4))
    return dict(
        n=n, decomposition=label or (
            f"pencil ({ny_n},{nx_n}) ny_local={ny_l} nx_local={nx_l}"
            if pencil else f"slab ny_local={ny_l}"),
        local_shape_mlups=mlups_l,
        t_compute_ms=round(t_comp * 1e3, 3),
        t_solve_local_ms=round(t_solve_l * 1e3, 3),
        pop_halo_mb=round(pop_halo / 1e6, 2),
        t_ici_serial_ms=round(t_ici_ser * 1e3, 3),
        t_ici_overlapped_ms=round(t_ici_ovl * 1e3, 3),
        pop_halo_hidden=bool(pop_halo / ICI_BW <= t_solve_l),
        serial=mk(t_ici_ser), overlapped=mk(t_ici_ovl),
    )


def main():
    strong = [row(257, 256, 256, n, n, 1) for n in (1, 2, 4, 8, 16)]
    pod = [row(257, 256, 512, 8, 8, 1),
           row(257, 256, 512, 8, 4, 2),
           row(257, 256, 512, 16, 16, 1),
           row(257, 256, 512, 16, 8, 2)]
    doc = {
        "round": 5,
        "note": ("Overlapped-ICI scaling model: the production chunk's "
                 "one-step-lookahead halo pipeline (parallel/halo.py) hides "
                 "the population-halo ppermutes under the spectral solve's "
                 "per-chip compute.  Anchors: r4 measured local-shape MLUPS "
                 "(real chip), measured +1.2% restructure cost on a 1x1 "
                 "mesh (scripts/tpu_overlap_probe.py, bit-exact), measured "
                 "kernel-variant taxes (slab 2.7-3.8%, pencil 8.6-15.4%) "
                 "now folded into t_compute (the r4 slab rows omitted "
                 "them).  Still a model: one chip here."),
        "what_overlaps": ("pop halos (1 row x every population field, the "
                          "bulk of halo bytes) hide under the solve; the "
                          "solve's own all-to-alls + the 2-row phi halo "
                          "stay serial (data-dependent) — see "
                          "benchmarks/scaling_model_r5.py docstring for "
                          "the rejected alternatives"),
        "model_strong_256^3": strong,
        "model_pod_512x256x256": pod,
        "conclusions": [],
    }
    s = {r["n"]: r for r in strong}
    doc["conclusions"] = [
        "256^3 slab strong efficiency (overlapped vs serial): "
        + ", ".join(
            f"n={n}: {s[n]['overlapped']['strong_efficiency']:.1%} vs "
            f"{s[n]['serial']['strong_efficiency']:.1%}"
            for n in (2, 4, 8, 16)),
        "The population halo is fully hidden at every n where the solve "
        "share exceeds the halo time (pop_halo_hidden flags); the residual "
        "ICI is the solve's own all-to-alls, untouchable without a "
        "one-step phi lag (different physics) — so the remaining "
        "strong-scaling loss is the TY strip cliff, not comm.",
        "Pod preset (512x256x256): pencil (4,2) overlapped models "
        f"{pod[1]['overlapped']['strong_efficiency']:.1%} vs slab "
        f"{pod[0]['overlapped']['strong_efficiency']:.1%} at n=8; "
        f"(8,2) {pod[3]['overlapped']['strong_efficiency']:.1%} vs slab "
        f"{pod[2]['overlapped']['strong_efficiency']:.1%} at n=16.",
        "These rows now INCLUDE the measured shard_map taxes and the "
        "+1.2% overlap restructure cost in t_compute, so they are "
        "absolute per-chip projections (the r4 slab rows were plain-path "
        "rates).",
        "Why n=8 slab models 72%, not the 80% the round-4 verdict hoped "
        "for: the overlap removes the full population-halo term (0.136 ms "
        "of the 0.30 ms r4 t_ici), but the larger residual is the solve's "
        "own all-to-alls (0.157 ms at n=8) which no halo restructure can "
        "touch, and these rows additionally charge the measured ~4% "
        "shard_map tax the r4 rows omitted.  Like-for-like (r4 "
        "accounting, no tax), overlapped n=8 slab is 74.6% vs the r4 "
        "70.0% serial.",
    ]
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
