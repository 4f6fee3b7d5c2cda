"""Pallas TPU kernels for the hot ops (batched dense solves)."""
