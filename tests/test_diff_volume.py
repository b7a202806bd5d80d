"""Differentiable volume rendering: reverse-mode through the bounded-trip
tracking loops matches finite differences (SURVEY.md §7 step 9 extended to
media: gradients w.r.t. sigma, Le, and the density grid)."""

import jax
import jax.numpy as jnp
import numpy as np

from xraytracer_tpu.camera import PinholeCamera
from xraytracer_tpu.integrators import make_volume_integrator
from xraytracer_tpu.renderer import CAMERA_SITE, pixel_grid
from xraytracer_tpu.sampling import path_keys, uniform2
from xraytracer_tpu.scene.builder import SceneBuilder, scene_statics
from xraytracer_tpu.math import from_rows

W, H = 8, 6


def _hetero_scene():
    b = SceneBuilder()
    grid = np.full((4, 4, 4), 0.6, np.float32)
    grid[1:3, 1:3, 1:3] = 1.0
    b.set_density_grid(grid, (-1, -1, -1), (1, 1, 1))
    b.add_heterogeneous_medium(0.0, (0.2, 0.2, 0.2), (0.4, 0.4, 0.4))
    b.add_quad_light((0.5, 1.6, 0.5), (-0.5, 1.6, 0.5), (0.5, 1.6, -0.5),
                     (8.0, 8.0, 8.0))
    return b.build()


def _radiance_fn(tables, nee):
    statics = scene_statics(tables)
    c2w = from_rows(1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 4.0, 1)
    cam = PinholeCamera.make(W / H, c2w=c2w, fov_deg=50.0)
    pixel_ids, pixel_xy = pixel_grid(W, H)
    wh = jnp.asarray([float(W), float(H)])

    def f(params):
        scene = tables._replace(**params)
        integ = make_volume_integrator(
            scene, statics, max_depth=3, nee=nee, max_steps=24,
            differentiable=True,
        )
        keys = path_keys(0, pixel_ids, 0)
        u = uniform2(keys, CAMERA_SITE)
        rays = cam.sample_rays((pixel_xy + u) / wh)
        return jnp.mean(integ(rays, keys))

    return jax.jit(f)


def _check_fd(f, params, key, idx, eps, rtol=0.08, atol=2e-4):
    g = jax.jit(jax.grad(f))(params)[key]
    for i in idx:
        dp = jnp.zeros_like(params[key])
        dp = dp.reshape(-1).at[i].set(eps).reshape(params[key].shape)
        fd = (float(f({**params, key: params[key] + dp}))
              - float(f({**params, key: params[key] - dp}))) / (2 * eps)
        ad = float(np.asarray(g).reshape(-1)[i])
        assert np.isfinite(ad)
        assert abs(fd - ad) <= max(atol, rtol * abs(fd)), (key, i, fd, ad)


def test_sigma_s_gradient_matches_fd():
    tables = _hetero_scene()
    f = _radiance_fn(tables, nee=False)
    params = {"med_sigma_s": tables.med_sigma_s}
    _check_fd(f, params, "med_sigma_s", [0, 1], eps=5e-3)


def test_density_grid_gradient_nonzero_and_fd():
    tables = _hetero_scene()
    f = _radiance_fn(tables, nee=True)
    params = {"grid_density": tables.grid_density}
    g = jax.jit(jax.grad(f))(params)["grid_density"]
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0
    # finite-difference a center voxel (index 21 = (1,1,1) in 4x4x4)
    _check_fd(f, params, "grid_density", [21], eps=2e-2, rtol=0.1)


def test_le_gradient_through_volume_nee():
    tables = _hetero_scene()
    f = _radiance_fn(tables, nee=True)
    params = {"al_le": tables.al_le}
    _check_fd(f, params, "al_le", [0], eps=5e-2)
