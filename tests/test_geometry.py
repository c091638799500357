import jax.numpy as jnp
import numpy as np
import pytest

from particlesmc_tpu.core import geometry as G


def test_fold_back():
    box = jnp.asarray([10.0, 10.0])
    x = jnp.asarray([-0.5, 10.5])
    np.testing.assert_allclose(np.asarray(G.fold_back(x, box)), [9.5, 0.5])


def test_min_image():
    box = jnp.asarray(10.0)
    assert float(G.min_image(jnp.asarray(6.0), box)) == -4.0
    assert float(G.min_image(jnp.asarray(-6.0), box)) == 4.0
    assert float(G.min_image(jnp.asarray(4.0), box)) == 4.0


def test_dist2_periodic():
    box = jnp.asarray([10.0, 10.0])
    xi = jnp.asarray([0.5, 0.5])
    xj = jnp.asarray([9.5, 9.5])
    assert float(G.dist2(xi, xj, box)) == pytest.approx(2.0)


def test_volume_sphere():
    import math

    assert G.volume_sphere(2.0, 2) == pytest.approx(math.pi * 4)
    assert G.volume_sphere(1.0, 3) == pytest.approx(4 / 3 * math.pi)
    assert G.volume_sphere(1.5, 1) == 3.0
