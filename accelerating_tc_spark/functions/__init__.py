"""Vectorized numpy/Arrow kernels used inside pandas UDFs."""
