"""Pallas TPU kernels — the performance path for the hot ops."""
