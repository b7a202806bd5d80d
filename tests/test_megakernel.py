"""Fused single-kernel path integrator (integrators/megakernel.py) parity.

The megakernel runs the WHOLE path integral (nearest sweep, record
extraction, Lambert shading, NEE shadow sweep, RR, resampling, in-kernel
PCG) in one Pallas call and consumes the identical RNG stream as the
composable wavefront path — so at matched seeds its image must match the
XLA wavefront integrator lane for lane.  Run with ``interpret=True`` on the
CPU backend so CI gates the production TPU hot path (VERDICT round-1
item 3 / ADVICE item 3 extended to the fused path).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from xraytracer_tpu.geometry import Rays
from xraytracer_tpu.integrators.megakernel import (
    try_make_fused_path_integrator,
)
from xraytracer_tpu.integrators.surface import make_path_integrator
from xraytracer_tpu.sampling import path_keys
from xraytracer_tpu.scene.builder import scene_statics
from xraytracer_tpu.scene.presets import build_cornell_box


def _cornell():
    tables = build_cornell_box().build()
    return tables, scene_statics(tables)


def _camera_rays(tables, statics, n, seed=0):
    """Random rays from a point near the Cornell camera toward the box."""
    rng = np.random.default_rng(seed)
    o = np.tile(np.array([278.0, 273.0, -600.0], np.float32), (n, 1))
    d = np.stack(
        [
            rng.uniform(-0.45, 0.45, n),
            rng.uniform(-0.45, 0.45, n),
            np.ones(n),
        ],
        axis=-1,
    ).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    keys = path_keys(7, jnp.arange(n, dtype=jnp.uint32), 0)
    return Rays(o=jnp.asarray(o), d=jnp.asarray(d)), keys


@pytest.mark.parametrize("nee,cosine", [(True, False), (True, True),
                                        (False, False)])
def test_fused_matches_wavefront(nee, cosine):
    """Identical radiance (same RNG stream) as the composable wavefront GI
    at depth 3 on the Cornell box, across NEE/BSDF-only and both hemisphere
    samplers."""
    tables, statics = _cornell()
    fused = try_make_fused_path_integrator(
        tables, statics, max_depth=3, nee=nee, cosine_sampling=cosine,
        interpret=True, force=True,
    )
    assert fused is not None, "Cornell box must be megakernel-eligible"
    wave = make_path_integrator(
        tables, statics, max_depth=3, nee=nee, cosine_sampling=cosine,
        fused="never",
    )
    rays, keys = _camera_rays(tables, statics, 1024)
    img_f = np.asarray(fused(rays, keys))
    img_w = np.asarray(wave(rays, keys))
    assert np.isfinite(img_f).all()
    # identical sampling decisions -> only float-formulation noise remains
    np.testing.assert_allclose(img_f, img_w, rtol=2e-3, atol=2e-3)
    assert img_f.mean() > 1e-3  # scene actually lit


def test_fused_multi_tile_and_padding():
    """Ray counts above one 4096-ray tile with a ragged remainder: padding
    lanes must not leak into real outputs."""
    tables, statics = _cornell()
    fused = try_make_fused_path_integrator(
        tables, statics, max_depth=2, nee=True, interpret=True, force=True,
    )
    n = 4096 + 513
    rays, keys = _camera_rays(tables, statics, n, seed=5)
    img = np.asarray(fused(rays, keys))
    assert img.shape == (n, 3)
    wave = make_path_integrator(tables, statics, max_depth=2, nee=True,
                                fused="never")
    np.testing.assert_allclose(img, np.asarray(wave(rays, keys)),
                               rtol=2e-3, atol=2e-3)


def test_fused_eligibility_gates():
    """Ineligible scenes (spheres present, non-Lambert materials) return
    None so the wavefront fallback engages."""
    from xraytracer_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    b.add_sphere(center=(0, 0, 0), radius=1.0)
    t = b.build()
    assert try_make_fused_path_integrator(
        t, scene_statics(t), max_depth=3, force=True
    ) is None

    tables, statics = _cornell()
    assert try_make_fused_path_integrator(
        tables, statics, max_depth=9, force=True
    ) is None  # depth guard


def test_fused_spp_render_matches_renderer():
    """The whole-render kernel (in-kernel spp loop + camera generation +
    rejection + accumulation) reproduces the XLA per-sample renderer's
    accumulated image at matched (seed, pixel, sample) RNG streams,
    including a resumed chunk (s0 > 0)."""
    from xraytracer_tpu.camera import PinholeCamera
    from xraytracer_tpu.integrators.megakernel import (
        try_make_fused_spp_render,
    )
    from xraytracer_tpu.renderer import WavefrontRenderer
    from xraytracer_tpu.scene.presets import cornell_camera

    tables, statics = _cornell()
    w, h = 64, 48
    camera = PinholeCamera.make(w / h, **cornell_camera())
    fused = try_make_fused_spp_render(
        tables, statics, camera, w, h, seed=3, max_depth=2, nee=True,
        interpret=True, force=True,
    )
    assert fused is not None
    wave = make_path_integrator(tables, statics, max_depth=2, nee=True,
                                fused="never")
    renderer = WavefrontRenderer(tables, camera, wave, w, h, seed=3)
    ref = renderer.render(3)

    rad01, rej01 = fused(0, 2)
    rad2, rej2 = fused(2, 1)          # resumed chunk must continue the stream
    img = np.asarray(rad01 + rad2).reshape(h, w, 3) / 3.0
    np.testing.assert_allclose(img, ref.image, rtol=2e-3, atol=2e-3)
    assert int(rej01) + int(rej2) == ref.n_rejected
    assert img.mean() > 1e-3


def test_fused_spp_render_morton_bitwise():
    """Z-order lane traversal in the fused spp kernel (tile = compact pixel
    block, for in-kernel chunk culling) reassembles to the bitwise-same
    image as raster order: per-pixel RNG streams depend only on pixel id."""
    from xraytracer_tpu.camera import PinholeCamera
    from xraytracer_tpu.integrators.megakernel import (
        try_make_fused_spp_render,
    )
    from xraytracer_tpu.scene.presets import cornell_camera

    tables, statics = _cornell()
    w, h = 64, 48
    camera = PinholeCamera.make(w / h, **cornell_camera())
    kw = dict(max_depth=2, nee=True, interpret=True, force=True)
    raster = try_make_fused_spp_render(
        tables, statics, camera, w, h, seed=3, **kw
    )
    morton = try_make_fused_spp_render(
        tables, statics, camera, w, h, seed=3, pixel_order="morton", **kw
    )
    rad_r, rej_r = raster(0, 2)
    rad_m, rej_m = morton(0, 2)
    n = w * h
    out = np.empty((n, 3), np.float32)
    out[np.asarray(morton.pixel_ids)] = np.asarray(rad_m)[:n]
    np.testing.assert_array_equal(out, np.asarray(rad_r)[:n])
    assert int(rej_r) == int(rej_m)


def test_fused_spp_render_sharded_bitwise():
    """The shard_map-wrapped fused render (the multi-chip ParallelRenderer
    analogue for the megakernels) is bitwise-identical to the single-device
    fused kernel: every pixel is computed exactly once with the same
    (seed, pixel, sample) stream, only the tile partitioning changes."""
    import jax
    from jax.sharding import Mesh

    from xraytracer_tpu.camera import PinholeCamera
    from xraytracer_tpu.integrators.megakernel import (
        try_make_fused_spp_render,
    )
    from xraytracer_tpu.scene.presets import cornell_camera

    tables, statics = _cornell()
    w, h = 64, 48
    camera = PinholeCamera.make(w / h, **cornell_camera())
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("d",))
    kw = dict(max_depth=2, nee=True, interpret=True, force=True)
    single = try_make_fused_spp_render(
        tables, statics, camera, w, h, seed=3, **kw
    )
    shard = try_make_fused_spp_render(
        tables, statics, camera, w, h, seed=3, mesh=mesh, **kw
    )
    assert shard.sharded and shard.n_pad % (4 * 4096) == 0
    rad1, rej1 = single(0, 2)
    rad2, rej2 = shard(0, 2)
    n = w * h
    np.testing.assert_array_equal(np.asarray(rad2)[:n], np.asarray(rad1))
    assert int(rej1) == int(rej2)


def test_renderer_sharded_fused_end_to_end():
    """WavefrontRenderer + pixel sharding engages the sharded fused kernel
    (via integrate.fused_spec) and reproduces the unsharded XLA wavefront
    image; checkpoint state stays in unpadded pixel coordinates."""
    import jax
    from jax.sharding import Mesh

    from xraytracer_tpu.camera import PinholeCamera
    from xraytracer_tpu.renderer import WavefrontRenderer, pixel_sharding
    from xraytracer_tpu.scene.presets import cornell_camera

    tables, statics = _cornell()
    w, h = 64, 48
    camera = PinholeCamera.make(w / h, **cornell_camera())
    wave = make_path_integrator(tables, statics, max_depth=2, nee=True,
                                fused="never")
    ref = WavefrontRenderer(tables, camera, wave, w, h, seed=3).render(3)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("d",))
    fused_int = make_path_integrator(tables, statics, max_depth=2, nee=True,
                                     fused="never")
    # CPU runs can't pass the TPU-platform gate; inject the spec the fused
    # integrator would carry, with interpret+force (same _mk pass-through)
    fused_int.fused_spec = dict(
        scene=tables, statics=statics, max_depth=2, nee=True,
        le_depth0_only=True, cosine_sampling=False,
        interpret=True, force=True,
    )
    r = WavefrontRenderer(
        tables, camera, fused_int, w, h, seed=3,
        sharding=pixel_sharding(mesh),
    )
    # accumulator padding must align with the kernel's sharded row padding
    assert (r.n_pix + r._pad) % (4 * 4096) == 0
    out = r.render(3)
    np.testing.assert_allclose(out.image, ref.image, rtol=2e-3, atol=2e-3)
    assert out.n_rejected == ref.n_rejected


@pytest.mark.parametrize("nee", [False, True])
def test_fused_volume_matches_wavefront(nee):
    """The fused homogeneous volume kernel (vol_megakernel.py) reproduces
    the XLA wavefront volume integrator on the vpt preset scene at matched
    RNG streams (same sites: RR, medium 16+k, floating NEE layout)."""
    from xraytracer_tpu.integrators.vol_megakernel import (
        try_make_fused_volume_integrator,
    )
    from xraytracer_tpu.integrators.volume import make_volume_integrator
    from xraytracer_tpu.scene.presets import build_vpt_scene

    tables = build_vpt_scene().build()
    statics = scene_statics(tables)
    fused = try_make_fused_volume_integrator(
        tables, statics, max_depth=4, nee=nee, interpret=True, force=True,
    )
    assert fused is not None, "vpt scene must be volume-megakernel-eligible"
    wave = make_volume_integrator(tables, statics, max_depth=4, nee=nee,
                                  fused="never")
    n = 1024
    rng = np.random.default_rng(11)
    o = np.tile(np.array([0.0, 0.0, 5.0], np.float32), (n, 1))
    d = np.stack([rng.uniform(-0.3, 0.3, n), rng.uniform(-0.3, 0.3, n),
                  -np.ones(n)], axis=-1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays(o=jnp.asarray(o), d=jnp.asarray(d))
    keys = path_keys(5, jnp.arange(n, dtype=jnp.uint32), 0)
    img_f = np.asarray(fused(rays, keys))
    img_w = np.asarray(wave(rays, keys))
    assert np.isfinite(img_f).all()
    np.testing.assert_allclose(img_f, img_w, rtol=2e-3, atol=2e-3)
    assert img_f.mean() > 1e-4


def test_fused_volume_spp_render_matches_renderer():
    """Whole-render volume kernel (in-kernel spp loop) vs the XLA
    per-sample renderer on a small vpt render."""
    from xraytracer_tpu.camera import PinholeCamera
    from xraytracer_tpu.integrators.vol_megakernel import (
        try_make_fused_volume_spp_render,
    )
    from xraytracer_tpu.integrators.volume import make_volume_integrator
    from xraytracer_tpu.renderer import WavefrontRenderer
    from xraytracer_tpu.scene.presets import preset_vpt

    tables, cam_kwargs, _cfg = preset_vpt()
    statics = scene_statics(tables)
    w, h = 32, 32
    camera = PinholeCamera.make(w / h, **cam_kwargs)
    fused = try_make_fused_volume_spp_render(
        tables, statics, camera, w, h, seed=2, max_depth=3, nee=True,
        interpret=True, force=True,
    )
    assert fused is not None
    wave = make_volume_integrator(tables, statics, max_depth=3, nee=True,
                                  fused="never")
    renderer = WavefrontRenderer(tables, camera, wave, w, h, seed=2)
    ref = renderer.render(2)
    rad, rej = fused(0, 2)
    img = np.asarray(rad).reshape(h, w, 3) / 2.0
    np.testing.assert_allclose(img, ref.image, rtol=2e-3, atol=2e-3)
    assert int(rej) == ref.n_rejected


def test_fused_volume_spp_render_sharded_bitwise():
    """The sharded volume megakernel (empty table tuple through the shared
    make_spp_render plumbing) matches the single-device kernel bitwise."""
    import jax
    from jax.sharding import Mesh

    from xraytracer_tpu.camera import PinholeCamera
    from xraytracer_tpu.integrators.vol_megakernel import (
        try_make_fused_volume_spp_render,
    )
    from xraytracer_tpu.scene.builder import scene_statics
    from xraytracer_tpu.scene.presets import preset_vpt

    tables, cam_kwargs, _cfg = preset_vpt()
    statics = scene_statics(tables)
    w, h = 32, 32
    camera = PinholeCamera.make(w / h, **cam_kwargs)
    kw = dict(max_depth=2, nee=True, interpret=True, force=True)
    single = try_make_fused_volume_spp_render(
        tables, statics, camera, w, h, seed=2, **kw
    )
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("d",))
    shard = try_make_fused_volume_spp_render(
        tables, statics, camera, w, h, seed=2, mesh=mesh, **kw
    )
    rad1, rej1 = single(0, 1)
    rad2, rej2 = shard(0, 1)
    n = w * h
    np.testing.assert_array_equal(np.asarray(rad2)[:n], np.asarray(rad1))
    assert int(rej1) == int(rej2)


def test_occluded_bool_kernel_matches_xla():
    """geometry.pallas_kernels.occluded_triangles_pallas (the in-kernel
    t_max compare) agrees with the XLA anyhit + epilogue compare."""
    from xraytracer_tpu.geometry.intersect import intersect_triangles
    from xraytracer_tpu.geometry.pallas_kernels import (
        occluded_triangles_pallas,
    )

    rng = np.random.default_rng(3)
    t_total = 64
    v0 = rng.uniform(-4, 4, (t_total, 3)).astype(np.float32)
    e1 = rng.uniform(-1.5, 1.5, (t_total, 3)).astype(np.float32)
    e2 = rng.uniform(-1.5, 1.5, (t_total, 3)).astype(np.float32)
    valid = np.ones((t_total,), bool)
    valid[-3:] = False
    n = 1024
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays(o=jnp.asarray(o), d=jnp.asarray(d))
    t_max = jnp.asarray(rng.uniform(0.5, 8.0, n).astype(np.float32))
    args = (jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
            jnp.asarray(valid))
    tt, _, _, _ = intersect_triangles(rays, *args)
    expected = np.asarray(tt) < np.asarray(t_max)
    got = np.asarray(
        occluded_triangles_pallas(rays, *args, t_max, interpret=True)
    )
    np.testing.assert_array_equal(got, expected)


def test_fused_volume_persistent_bitwise():
    """Persistent-lane merged spp+path loop vs the per-sample spp kernel
    (megakernel._mega_spp_persistent_kernel): identical draws and
    per-lane accumulation order, so results agree to within compiler
    FMA-contraction differences (the two programs compile separately;
    XLA may contract a*b+c in one and not the other — observed 1-ulp on
    ~4% of pixels). The reject count is integer and must match exactly."""
    from xraytracer_tpu.camera import PinholeCamera
    from xraytracer_tpu.integrators.vol_megakernel import (
        try_make_fused_volume_spp_render,
    )
    from xraytracer_tpu.scene.presets import preset_vpt

    tables, cam_kwargs, _cfg = preset_vpt()
    statics = scene_statics(tables)
    w, h = 32, 32
    camera = PinholeCamera.make(w / h, **cam_kwargs)
    kw = dict(max_depth=4, nee=True, interpret=True, force=True)
    per_sample = try_make_fused_volume_spp_render(
        tables, statics, camera, w, h, seed=2, persistent=False, **kw
    )
    persistent = try_make_fused_volume_spp_render(
        tables, statics, camera, w, h, seed=2, persistent=True, **kw
    )
    ra, na = per_sample(0, 3)
    rb, nb = persistent(0, 3)
    np.testing.assert_allclose(
        np.asarray(ra), np.asarray(rb), rtol=1e-6, atol=1e-7
    )
    assert int(na) == int(nb)
    assert float(np.abs(np.asarray(ra)).sum()) > 0.0


def _many_light_scene(n_side=8):
    """Cornell-like room with an n_side^2 grid of small ceiling quad lights
    of skewed powers — the many-light workload (beyond the reference's
    uniform pick over <= 2 lights, Src/scene.cpp:182-188)."""
    from xraytracer_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    white = b.add_lambert((0.7, 0.7, 0.7))
    quads = []
    # floor / back wall / ceiling slab (two tris each)
    for v0, v1, v2, v3 in (
        ((0, 0, 0), (556, 0, 0), (556, 0, 559), (0, 0, 559)),
        ((0, 0, 559), (556, 0, 559), (556, 548, 559), (0, 548, 559)),
        ((0, 548, 0), (556, 548, 0), (556, 548, 559), (0, 548, 559)),
    ):
        quads.append(
            np.asarray([[v0, v1, v2], [v0, v2, v3]], np.float32)
        )
    b.add_mesh(np.concatenate(quads, axis=0), material=white)
    rng = np.random.default_rng(11)
    for i in range(n_side):
        for j in range(n_side):
            x0 = 40.0 + i * 60.0
            z0 = 40.0 + j * 60.0
            power = float(rng.uniform(0.5, 40.0))
            b.add_quad_light(
                (x0, 547.0, z0), (x0 + 30.0, 547.0, z0),
                (x0, 547.0, z0 + 30.0), (power,) * 3,
            )
    tables = b.build()
    return tables, scene_statics(tables)


@pytest.mark.parametrize("nee_mode", ["one", "power"])
def test_fused_many_lights_matches_wavefront(nee_mode):
    """64-light NEE through the fused kernel's single-sweep one/power
    selection matches the wavefront integrator draw for draw."""
    tables, statics = _many_light_scene()
    assert statics["n_area_lights"] == 64
    rays, keys = _camera_rays(tables, statics, 4096)
    ref_fn = make_path_integrator(
        tables, statics, max_depth=2, nee=True, cosine_sampling=True,
        nee_mode=nee_mode, fused="off", sort_rays=False,
    )
    ref = np.asarray(ref_fn(rays, keys))
    fused = try_make_fused_path_integrator(
        tables, statics, max_depth=2, nee=True, cosine_sampling=True,
        nee_mode=nee_mode, interpret=True, force=True,
    )
    assert fused is not None
    got = np.asarray(fused(rays, keys))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
    # lights actually contribute
    assert ref.max() > 0.1


def test_fused_surface_persistent_bitwise():
    """Persistent-lane surface spp kernel (per-lane depth, dynamic RNG
    sites — megakernel._make_surface_iteration) vs the per-sample kernel:
    same draws, same per-lane accumulation order (measured bitwise-equal
    in interpret mode; tolerance covers compiler FMA contraction like the
    volume A/Bs)."""
    from xraytracer_tpu.camera import PinholeCamera
    from xraytracer_tpu.integrators.megakernel import (
        try_make_fused_spp_render,
    )
    from xraytracer_tpu.scene.presets import cornell_camera

    tables, statics = _cornell()
    w, h = 64, 48
    camera = PinholeCamera.make(w / h, **cornell_camera())
    kw = dict(max_depth=3, nee=True, cosine_sampling=True, interpret=True,
              force=True)
    per_sample = try_make_fused_spp_render(
        tables, statics, camera, w, h, seed=3, persistent=False, **kw)
    persistent = try_make_fused_spp_render(
        tables, statics, camera, w, h, seed=3, persistent=True, **kw)
    ra, na = per_sample(0, 3)
    rb, nb = persistent(0, 3)
    np.testing.assert_allclose(
        np.asarray(ra), np.asarray(rb), rtol=1e-6, atol=1e-7
    )
    assert int(na) == int(nb)
    assert float(np.abs(np.asarray(ra)).sum()) > 0.0
