"""Pallas TPU kernels for the hot path (state step, rendering)."""
