"""Pallas TPU kernels for hot MORL ops (populated as profiles demand)."""
