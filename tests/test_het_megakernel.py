"""Fused heterogeneous volume megakernel vs. the XLA wavefront integrator.

Interpret-mode, bf16-exact grid (see tests/test_het_kernel.py): the fused
whole-path kernel consumes the identical PCG draws as integrators/volume.py
(with the fused tracking kernels pinned off via fused="off"), so radiance
must agree up to f32 reduce-order rounding along each path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from xraytracer_tpu.geometry import Rays
from xraytracer_tpu.integrators import make_volume_integrator
from xraytracer_tpu.integrators.het_megakernel import (
    _eligible_het,
    try_make_fused_het_path_integrator,
)
from xraytracer_tpu.media_pallas import round_bf16
from xraytracer_tpu.sampling import path_keys
from xraytracer_tpu.scene.builder import scene_statics
from xraytracer_tpu.scene.presets import build_volume_scene, procedural_cloud

N = 4096
MAX_STEPS = 96
MAX_DEPTH = 6


@pytest.fixture(scope="module")
def scene():
    density = round_bf16(procedural_cloud(res=(24, 20, 16), seed=3))
    tables = build_volume_scene(
        density=density, scattering=(0.08, 0.07, 0.06),
        absorption=(0.02, 0.02, 0.02), le=25.0,
    ).build()
    return tables, scene_statics(tables)


@pytest.fixture(scope="module")
def wavefront():
    rng = np.random.default_rng(21)
    o = np.tile(np.float32([[0.0, 70.0, 550.0]]), (N, 1))
    o += rng.normal(scale=30.0, size=(N, 3)).astype(np.float32)
    target = rng.normal(scale=120.0, size=(N, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    keys = path_keys(5, jnp.arange(N, dtype=jnp.int32), 0)
    return Rays(o=jnp.asarray(o), d=jnp.asarray(d)), keys


def test_eligibility(scene):
    tables, statics = scene
    assert _eligible_het(tables, statics, MAX_DEPTH) is not None


@pytest.mark.parametrize("nee", [False, True])
def test_fused_het_path_parity(scene, wavefront, nee):
    tables, statics = scene
    rays, keys = wavefront
    ref_fn = make_volume_integrator(
        tables, statics, MAX_DEPTH, nee=nee, max_steps=MAX_STEPS,
        fused="off",
    )
    ref = np.asarray(ref_fn(rays, keys))
    fused = try_make_fused_het_path_integrator(
        tables, statics, MAX_DEPTH, nee=nee, max_steps=MAX_STEPS,
        interpret=True, force=True,
    )
    assert fused is not None
    got = np.asarray(fused(rays, keys))
    assert np.isfinite(got).all()
    # per-lane radiance parity (identical draws; rounding-order only)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
    # sanity: the light contributes (without NEE only the rare forward
    # paths that terminate on the small sphere carry radiance)
    lit_frac = (ref.sum(axis=1) > 0).mean()
    assert ref.max() > 1.0
    assert lit_frac > (0.05 if nee else 0.0)


def test_persistent_spp_kernel_bitwise_equal(scene):
    """The persistent-lane merged spp+path loop
    (megakernel._mega_spp_persistent_kernel) vs the per-sample spp kernel:
    every draw is a pure function of (pixel, sample, site) and each lane
    accumulates its own samples in ascending order, so lane scheduling
    changes nothing beyond compiler FMA-contraction (the two programs
    compile separately; XLA may contract a*b+c differently — 1-ulp scale,
    see the vol A/B test). Reject counts are integer-exact."""
    from xraytracer_tpu.camera import PinholeCamera
    from xraytracer_tpu.integrators.het_megakernel import (
        try_make_fused_het_spp_render,
    )
    from xraytracer_tpu.math import from_rows

    tables, statics = scene
    W, H = 16, 8
    c2w = from_rows(1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0, 0,
                    0, 70.0, 550.0, 1)
    cam = PinholeCamera.make(W / H, c2w=c2w, fov_deg=60.0)
    common = dict(max_depth=4, nee=True, max_steps=24, interpret=True,
                  force=True)
    per_sample = try_make_fused_het_spp_render(
        tables, statics, cam, W, H, 0, persistent=False, **common)
    persistent = try_make_fused_het_spp_render(
        tables, statics, cam, W, H, 0, persistent=True, **common)
    ra, na = per_sample(0, 3)
    rb, nb = persistent(0, 3)
    np.testing.assert_allclose(
        np.asarray(ra), np.asarray(rb), rtol=1e-6, atol=1e-7
    )
    assert int(na) == int(nb)
    assert float(np.abs(np.asarray(ra)).sum()) > 0.0


def test_fused_het_many_lights_parity():
    """Round-5 item 8: the fused het path now accepts up to 16 sphere
    lights (was 2) — NEE stays ONE uniform-picked shadow/transmittance
    pass per bounce (the reference's strategy, Src/integrator.h:586-602),
    so per-spp cost is ~flat in light count. Draw-parity vs the wavefront
    on an 8-light cloud."""
    from xraytracer_tpu.scene.builder import SceneBuilder

    density = round_bf16(procedural_cloud(res=(24, 20, 16), seed=4))
    b = SceneBuilder()
    bmin = np.array([-165.0, -110.0, -160.0], np.float32)
    bmax = np.array([165.0, 110.0, 160.0], np.float32)
    b.set_density_grid(density, bmin, bmax)
    b.add_heterogeneous_medium(0.0, (0.02, 0.02, 0.02),
                               (0.08, 0.07, 0.06))
    rng = np.random.default_rng(9)
    for i in range(8):
        c = rng.uniform(-1.0, 1.0, 3) * np.array([300.0, 80.0, 300.0])
        c[1] += 330.0
        b.add_sphere_light(tuple(c), 40.0,
                           (5.0 + 3.0 * i, 20.0 - 2.0 * i, 8.0))
    tables = b.build()
    statics = scene_statics(tables)
    assert _eligible_het(tables, statics, MAX_DEPTH) is not None

    rng2 = np.random.default_rng(22)
    n = 2048
    o = np.tile(np.float32([[0.0, 70.0, 550.0]]), (n, 1))
    o += rng2.normal(scale=30.0, size=(n, 3)).astype(np.float32)
    target = rng2.normal(scale=120.0, size=(n, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Rays(o=jnp.asarray(o), d=jnp.asarray(d))
    keys = path_keys(5, jnp.arange(n, dtype=jnp.int32), 0)

    ref_fn = make_volume_integrator(
        tables, statics, MAX_DEPTH, nee=True, max_steps=MAX_STEPS,
        fused="off",
    )
    ref = ref_fn(rays, keys)
    fi = try_make_fused_het_path_integrator(
        tables, statics, MAX_DEPTH, nee=True, max_steps=MAX_STEPS,
        interpret=True, force=True,
    )
    assert fi is not None
    got = fi(rays, keys)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5
    )
    assert float(jnp.mean(ref)) > 1e-3


def test_cloud_128_fused_eligible():
    """Round-5 item 2 gate: the reference-scale 128^3 procedural cloud
    (standing in for wdas_cloud_quarter, Src/grid.h:71-77 /
    Src/examples/volume.cpp:46) is eligible for the FULLY-FUSED megakernel
    — the active-brick table keeps it within the VMEM bound where the old
    dense limit was 64^3. (Hardware ms/spp recorded in BASELINE.md; the
    sampled-field parity at this scale is gated by
    tests/test_het_kernel.py::test_sparse_128_grid_eligible_and_matches_xla.)"""
    density = round_bf16(procedural_cloud(res=(128, 128, 128)))
    tables = build_volume_scene(res=density.shape, density=density).build()
    statics = scene_statics(tables)
    el = _eligible_het(tables, statics, 6)
    assert el is not None
    pack = el[0]
    assert pack["bricks"].shape[0] > 1024     # genuinely the big-table path
