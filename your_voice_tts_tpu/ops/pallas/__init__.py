"""Pallas TPU kernels for the hot paths XLA can't schedule optimally."""
