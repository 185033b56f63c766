"""Sliding-window inference: coverage, overlap averaging, SR scaling."""

import jax
import jax.numpy as jnp
import numpy as np

from adm_tpu.core.slide import grid_starts, slide_sample


def test_grid_covers_image():
    starts = grid_starts(100, 32, 24)
    assert starts[0] == 0
    assert starts[-1] + 32 == 100
    covered = np.zeros(100, bool)
    for s in starts:
        covered[s : s + 32] = True
    assert covered.all()


def test_identity_crop_reconstruction(rng):
    """If the per-crop sampler returns its input, overlap-averaging must
    reproduce the input exactly."""
    cond = jax.random.uniform(rng, (2, 40, 56, 3))

    def sample_crop(c, key):
        return c

    out = slide_sample(sample_crop, cond, (16, 16), (12, 12),
                       jax.random.PRNGKey(0), out_channels=3)
    np.testing.assert_allclose(out, np.asarray(cond), atol=1e-6)


def test_flip_test_symmetric():
    """Flip-test with a flip-equivariant sampler changes nothing."""
    cond = jnp.tile(jnp.arange(8.0).reshape(1, 1, 8, 1), (1, 8, 1, 3))

    def sample_crop(c, key):
        return c

    a = slide_sample(sample_crop, cond, (8, 8), (8, 8), jax.random.PRNGKey(0),
                     out_channels=3, flip_test=True)
    np.testing.assert_allclose(a, np.asarray(cond), atol=1e-6)


def test_sr_out_scale():
    """SR mode: output is out_scale x the cond resolution
    (reference slide_sample_sr, sample_cond_ldm.py:285-332)."""
    cond = jnp.ones((1, 16, 16, 3))

    def sample_crop(c, key):
        return jnp.ones((c.shape[0], c.shape[1] * 4, c.shape[2] * 4, 3))

    out = slide_sample(sample_crop, cond, (8, 8), (8, 8), jax.random.PRNGKey(0),
                       out_channels=3, out_scale=4)
    assert out.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(out, 1.0, atol=1e-6)
