"""Compute ops: DSP transforms, filterbank constants, Pallas kernels."""
