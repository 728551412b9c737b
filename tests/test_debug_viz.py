"""Debug visualization tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from rtxpt_tpu.render import debug_viz


def test_all_modes_produce_images():
    h = w = 8
    bufs = dict(
        albedo=jnp.full((h, w, 3), 0.5),
        normal=jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (h, w, 1)),
        depth=jnp.linspace(0, 2, h * w).reshape(h, w),
        motion=jnp.zeros((h, w, 2)),
        emission=jnp.zeros((h, w, 3)),
        plane_valid=[jnp.ones((h, w), bool), jnp.zeros((h, w), bool)],
        plane_thp=[jnp.full((h, w, 3), 0.8), jnp.zeros((h, w, 3))],
        history_len=jnp.full((h, w), 16.0),
        variance=jnp.full((h, w), 0.01),
        ao=jnp.full((h, w), 0.7),
    )
    for mode in debug_viz.MODES:
        img = np.asarray(debug_viz.visualize(mode, **bufs))
        assert img.shape == (h, w, 3), mode
        assert np.isfinite(img).all(), mode
        assert (img >= 0).all() and (img <= 1).all(), mode


def test_unknown_mode_raises():
    with pytest.raises(ValueError):
        debug_viz.visualize("nope")
