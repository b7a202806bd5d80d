"""Analytic volume-gradient kernel vs. wavefront autodiff (round 5).

The fused heterogeneous value_and_grad
(het_megakernel.try_make_fused_het_value_and_grad) computes ∂loss/∂
{grid_density, al_le} in a forward-speed REPLAY pass (suffix-weighted
per-event log-derivative scatter — media_pallas analytic-gradient
section). It must reproduce jax.grad of the wavefront estimator with the
SAME grad-sampling variant (RR off + uniform channel pick,
``make_volume_integrator(differentiable=True, score_terms=True,
grad_sampling=True)``) on a bf16-exact grid, up to f32 summation order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xraytracer_tpu.camera import PinholeCamera
from xraytracer_tpu.integrators import make_volume_integrator
from xraytracer_tpu.integrators.het_megakernel import (
    try_make_fused_het_path_integrator,
    try_make_fused_het_value_and_grad,
)
from xraytracer_tpu.math import from_rows
from xraytracer_tpu.media_pallas import round_bf16
from xraytracer_tpu.renderer import CAMERA_SITE, pixel_grid
from xraytracer_tpu.sampling import path_keys, uniform2
from xraytracer_tpu.scene.builder import scene_statics
from xraytracer_tpu.scene.presets import build_volume_scene

W, H = 16, 12
DEPTH = 3
MAX_STEPS = 32


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    g = np.zeros((16, 16, 16), np.float32)
    g[3:13, 3:13, 3:13] = rng.uniform(0.3, 1.0, (10, 10, 10)).astype(
        np.float32
    )
    g = round_bf16(g)
    tables = build_volume_scene(
        res=g.shape, density=g,
        absorption=(0.02, 0.03, 0.04), scattering=(0.10, 0.08, 0.06),
        le=25.0, light_center=(0.0, 400.0, 0.0),
    ).build()
    statics = scene_statics(tables)
    c2w = from_rows(1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0, 0,
                    0, 60.0, 520.0, 1)
    cam = PinholeCamera.make(W / H, c2w=c2w, fov_deg=60.0)
    pixel_ids, pixel_xy = pixel_grid(W, H)
    keys = path_keys(0, pixel_ids, 0)
    u = uniform2(keys, CAMERA_SITE)
    rays = cam.sample_rays(
        (pixel_xy + u) / jnp.asarray([float(W), float(H)])
    )
    return tables, statics, cam, pixel_ids, pixel_xy, rays, keys, g


def _wavefront_img(tables, statics, rays, keys, params):
    scene = tables._replace(**params)
    integ = make_volume_integrator(
        scene, statics, DEPTH, nee=True, max_steps=MAX_STEPS,
        differentiable=True, score_terms=True, grad_sampling=True,
        fused="off",
    )
    return integ(rays, keys)


def test_grad_sampling_forward_parity(setup):
    """The fused grad-sampling forward (RR off, uniform pick) matches the
    wavefront grad-sampling forward — the value both sides of the
    gradient parity differentiate."""
    tables, statics, cam, ids, pxy, rays, keys, g = setup
    ref = _wavefront_img(tables, statics, rays, keys, {})
    fwd = try_make_fused_het_path_integrator(
        tables, statics, DEPTH, nee=True, max_steps=MAX_STEPS,
        interpret=True, force=True, grad_sampling=True,
    )
    assert fwd is not None
    got = fwd(rays, keys)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )
    assert float(jnp.mean(ref)) > 1e-4      # scene actually lit


def test_analytic_grad_matches_autodiff(setup):
    tables, statics, cam, ids, pxy, rays, keys, g = setup
    params = {
        "grid_density": jnp.asarray(g),
        "al_le": jnp.asarray(tables.al_le),
    }
    # a target that makes every residual channel nonzero
    target = _wavefront_img(tables, statics, rays, keys, {}) * 0.7 + 0.01

    def loss_fn(p):
        img = _wavefront_img(tables, statics, rays, keys, p)
        return jnp.mean((img - target) ** 2)

    ref_loss, ref_g = jax.value_and_grad(loss_fn)(params)

    step = try_make_fused_het_value_and_grad(
        tables, statics, cam, W, H, DEPTH, nee=True, max_steps=MAX_STEPS,
        seed=0, interpret=True, force=True,
    )
    assert step is not None
    loss, grads = step(params, ids, pxy, target, 0)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    rg = np.asarray(ref_g["grid_density"])
    ag = np.asarray(grads["grid_density"])
    assert np.abs(rg).max() > 0.0           # gradient is alive
    scale = np.abs(rg).max()
    np.testing.assert_allclose(ag, rg, rtol=5e-3, atol=5e-4 * scale)
    np.testing.assert_allclose(
        np.asarray(grads["al_le"]), np.asarray(ref_g["al_le"]),
        rtol=5e-3, atol=1e-8,
    )


def test_step_pair_matches_autodiff_product_loss(setup):
    """The two-sample product-loss step (``step_pair``: the descent
    estimator fit_volume uses — E[(a-t)(b-t)] over independent renders)
    must match jax.grad of the same loss built from two wavefront
    grad-sampling renders."""
    tables, statics, cam, ids, pxy, rays, keys, g = setup
    target = _wavefront_img(tables, statics, rays, keys, {}) * 0.6 + 0.02

    from xraytracer_tpu.renderer import CAMERA_SITE
    from xraytracer_tpu.sampling import path_keys, uniform2

    wh = jnp.asarray([float(W), float(H)])

    def render(p, seed, s):
        k = path_keys(seed, ids, s)
        u = uniform2(k, CAMERA_SITE)
        r = cam.sample_rays((pxy + u) / wh)
        return _wavefront_img(tables, statics, r, k, p)

    s_a, s_b = 4, 5

    def loss_fn(p):
        a = render(p, 0, s_a)
        b = render(p, 7919, s_b)
        return jnp.mean((a - target) * (b - target))

    params = {"grid_density": jnp.asarray(g)}
    ref_loss, ref_g = jax.value_and_grad(loss_fn)(params)

    step = try_make_fused_het_value_and_grad(
        tables, statics, cam, W, H, DEPTH, nee=True, max_steps=MAX_STEPS,
        seed=0, interpret=True, force=True,
    )
    loss, grads = step.step_pair(params, ids, pxy, target, s_a, s_b)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    rg = np.asarray(ref_g["grid_density"])
    scale = np.abs(rg).max()
    assert scale > 0
    np.testing.assert_allclose(
        np.asarray(grads["grid_density"]), rg, rtol=5e-3,
        atol=5e-4 * scale,
    )
