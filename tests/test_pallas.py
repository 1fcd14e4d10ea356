"""Pallas kernels: interpreter-mode parity with the XLA filter path."""

import numpy as np
import pytest


def test_dog_pallas_matches_xla(rng):
    import jax.numpy as jnp
    from feabas_tpu.ops.pallas_kernels import dog_filter
    from feabas_tpu.ops.filters import masked_dog_filter
    stack = rng.integers(0, 255, (4, 64, 128)).astype(np.uint8)
    got = np.asarray(dog_filter(jnp.asarray(stack), sigma=2.5, interpret=True))
    want = np.asarray(masked_dog_filter(stack.astype(np.float32), 2.5))
    assert got.shape == want.shape and got.dtype == np.float32
    assert np.allclose(got, want, atol=1e-3), np.abs(got - want).max()


def test_dog_pallas_uint8_cast(rng):
    import jax.numpy as jnp
    from feabas_tpu.ops.pallas_kernels import dog_filter
    stack = rng.integers(0, 255, (2, 32, 128)).astype(np.uint8)
    a = np.asarray(dog_filter(jnp.asarray(stack), sigma=2.0, interpret=True))
    b = np.asarray(dog_filter(jnp.asarray(stack.astype(np.float32)),
                              sigma=2.0, interpret=True))
    assert np.allclose(a, b, atol=1e-4)
