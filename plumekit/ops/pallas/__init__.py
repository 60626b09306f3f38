"""Pallas TPU kernels for the classical ops layer."""
