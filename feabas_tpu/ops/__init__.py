"""Device-plane kernels (JAX/XLA/Pallas).

Everything here is jit-friendly: static shapes, no data-dependent Python
control flow. Host wrappers in the domain modules choose shape buckets.
"""
