"""Multi-chip domain decomposition (the layer the reference lacks entirely —
it is strictly single-GPU, reference main.cu:58)."""
