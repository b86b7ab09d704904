"""Pallas TPU kernels for the point-cloud hot ops."""
