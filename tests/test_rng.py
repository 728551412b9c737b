"""Sampler tests: uniformity, stratification, decorrelation.

The reference has no unit tests (SURVEY.md §4); these guard the Sobol'/
Owen machinery that every estimator depends on."""

import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.utils import rng


def test_reverse_bits():
    x = jnp.asarray([0x1, 0x80000000, 0xDEADBEEF], jnp.uint32)
    r = rng.reverse_bits_u32(x)
    assert int(r[0]) == 0x80000000
    assert int(r[1]) == 1
    assert int(rng.reverse_bits_u32(r)[2]) == 0xDEADBEEF


def test_sobol_first_points():
    # Dim 0 is the van der Corput sequence: 0, 1/2, 1/4, 3/4 ...
    idx = jnp.arange(4, dtype=jnp.uint32)
    x = np.asarray(rng.u32_to_unit_float(rng.sobol_u32(idx, 0)))
    np.testing.assert_allclose(x, [0.0, 0.5, 0.25, 0.75], atol=1e-6)


def test_sobol_stratification():
    """First 2^m Owen-scrambled Sobol' points are stratified in 1D: exactly
    one point per 1/2^m interval, in every dimension."""
    n = 256
    idx = jnp.arange(n, dtype=jnp.uint32)
    for dim in range(4):
        x = np.asarray(rng.ld_sample(idx, jnp.uint32(12345), dim))
        counts = np.bincount((x * n).astype(int), minlength=n)
        assert (counts == 1).all(), f"dim {dim} not stratified"


def test_sobol_2d_stratification():
    """Owen-scrambled (0,2)-sequence: any 16x16 grid over 256 points has one
    point per cell for consecutive dims (0,1)."""
    n = 256
    idx = jnp.arange(n, dtype=jnp.uint32)
    x = np.asarray(rng.ld_sample(idx, jnp.uint32(777), 0))
    y = np.asarray(rng.ld_sample(idx, jnp.uint32(777), 1))
    cells = (x * 16).astype(int) * 16 + (y * 16).astype(int)
    assert len(np.unique(cells)) == n


def test_uniform_range_and_mean():
    seeds = jnp.arange(100000, dtype=jnp.uint32)
    u = np.asarray(rng.uniform_sample(seeds, jnp.uint32(3)))
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1 / 12) < 0.01


def test_decorrelation_across_seeds():
    idx = jnp.arange(4096, dtype=jnp.uint32)
    a = np.asarray(rng.ld_sample(idx, jnp.uint32(1), 0))
    b = np.asarray(rng.ld_sample(idx, jnp.uint32(2), 0))
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) < 0.05
