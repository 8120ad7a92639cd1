"""Pallas TPU kernels for the hot ops (same signatures as tngp.ops).

Populated as profiling identifies where XLA falls short of the HBM roofline;
the pure-jnp ops remain the golden reference and fallback.
"""
