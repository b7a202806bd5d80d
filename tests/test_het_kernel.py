"""Fused heterogeneous-tracking kernels vs. the XLA tracking loops.

Interpret-mode parity for media_pallas (round-1 VERDICT items 4/5): with a
bf16-exact density grid, the fused delta-tracking sampler and the fused
ratio-tracking transmittance consume the identical PCG draws as the XLA
paths in media.py, so positions/weights/events must agree to f32
summation-order rounding (the trilinear reduce orders differ; everything
else is bitwise).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from xraytracer_tpu.geometry import Rays
from xraytracer_tpu.media import sample_medium, segment_transmittance
from xraytracer_tpu.media_pallas import (
    het_pack,
    round_bf16,
    try_make_fused_het_sampler,
    try_make_fused_het_transmittance,
)
from xraytracer_tpu.sampling import path_keys
from xraytracer_tpu.scene.builder import scene_statics
from xraytracer_tpu.scene.presets import build_volume_scene, procedural_cloud

N = 4096
MAX_STEPS = 96


@pytest.fixture(scope="module")
def scene():
    # bf16-exact grid: the fused kernel's density field == the XLA field
    density = round_bf16(procedural_cloud(res=(24, 20, 16), seed=3))
    tables = build_volume_scene(
        density=density, scattering=(0.9, 0.7, 0.5), absorption=(0.3, 0.2, 0.1)
    ).build()
    return tables


@pytest.fixture(scope="module")
def wavefront(scene):
    rng = np.random.default_rng(11)
    # rays from a shell aiming roughly at the grid center (world extent
    # ~[-165,165]x[-110,110]x[-160,160]); a few lanes deliberately miss
    o = rng.normal(size=(N, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 500.0
    target = rng.normal(scale=80.0, size=(N, 3)).astype(np.float32)
    target[: N // 8] += 2000.0          # these lanes miss the grid
    d = target - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    rays = Rays(o=jnp.asarray(o), d=jnp.asarray(d))
    t0 = jnp.asarray(rng.uniform(200.0, 320.0, N).astype(np.float32))
    t1 = t0 + jnp.asarray(rng.uniform(0.0, 400.0, N).astype(np.float32))
    tp = jnp.asarray(rng.uniform(0.2, 1.0, (N, 3)).astype(np.float32))
    keys = path_keys(7, jnp.arange(N, dtype=jnp.int32), 0)
    # ~1/16 lanes masked non-heterogeneous (pass-through parity)
    het_mask = jnp.asarray(rng.uniform(size=N) > 0.0625)
    return rays, t0, t1, tp, keys, het_mask


def test_pack_eligibility(scene):
    pack = het_pack(scene)
    assert pack is not None
    assert pack["bricks"].shape[1] == 768
    nb = pack["nb"]
    assert nb == (3, 3, 2)


def test_sample_parity(scene, wavefront):
    rays, t0, t1, tp, keys, het_mask = wavefront
    site = 16
    med_idx = jnp.where(het_mask, 0, -1)
    ref = sample_medium(
        scene, med_idx, rays, t0, t1, tp, keys, site,
        max_steps=MAX_STEPS, has_heterogeneous=True, has_homogeneous=False,
    )
    het_fn = try_make_fused_het_sampler(
        scene, MAX_STEPS, interpret=True, force=True
    )
    assert het_fn is not None
    got = sample_medium(
        scene, med_idx, rays, t0, t1, tp, keys, site,
        max_steps=MAX_STEPS, has_heterogeneous=True, has_homogeneous=False,
        het_fn=het_fn,
    )
    # discrete events must agree exactly (same draws, same compares up to
    # the trilinear reduce order; a flip would move a whole path)
    np.testing.assert_array_equal(
        np.asarray(ref.scattered), np.asarray(got.scattered)
    )
    np.testing.assert_allclose(
        np.asarray(ref.pos), np.asarray(got.pos), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ref.weight), np.asarray(got.weight), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ref.dir), np.asarray(got.dir), rtol=1e-5, atol=1e-6
    )
    # sanity: a healthy mix of scatter/escape among het lanes
    scat = np.asarray(ref.scattered & het_mask)
    assert 0.02 < scat.mean() < 0.98


def test_transmittance_parity(scene, wavefront):
    rays, t0, t1, _tp, keys, het_mask = wavefront
    site = 8192 + 16
    med_idx = jnp.where(het_mask, 0, -1)
    p1 = rays.at(t0)
    p2 = rays.at(t1)
    ref = segment_transmittance(
        scene, med_idx, p1, p2, keys, site, max_steps=MAX_STEPS
    )
    het_tr_fn = try_make_fused_het_transmittance(
        scene, MAX_STEPS, interpret=True, force=True
    )
    assert het_tr_fn is not None
    got = segment_transmittance(
        scene, med_idx, p1, p2, keys, site, max_steps=MAX_STEPS,
        het_tr_fn=het_tr_fn,
    )
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), rtol=1e-4, atol=1e-6
    )
    r = np.asarray(ref)[np.asarray(het_mask)]
    assert (r > 0).any() and (r < 1).any()


def test_large_grid_falls_back():
    """Grids whose ACTIVE brick count exceeds MAX_BRICKS are ineligible
    (XLA path keeps serving them). A dense 112^3 grid = 14^3 = 2744 active
    bricks > 2560."""
    big = build_volume_scene(
        density=np.ones((112, 112, 112), np.float32)
    ).build()
    assert het_pack(big) is None
    assert try_make_fused_het_sampler(big, 64, force=True) is None


def test_sparse_128_grid_eligible_and_matches_xla():
    """Round-5 active-brick table: a sparse 128^3 cloud (reference-scale —
    the old dense bound was 64^3, Src/grid.h:71-77 loads far larger VDBs)
    is fused-eligible, and the rank-remapped extraction matches the XLA
    trilinear lookup on a bf16-exact grid, including points in EMPTY
    (dropped) bricks and outside the grid."""
    rng = np.random.default_rng(5)
    g = np.zeros((128, 128, 128), np.float32)
    # a few dense blobs covering well under the 2048-active-brick cap
    for _ in range(6):
        c = rng.integers(16, 112, 3)
        r = int(rng.integers(8, 20))
        sl = tuple(slice(int(cc - r), int(cc + r)) for cc in c)
        g[sl] = rng.uniform(0.2, 1.0, tuple(2 * r for _ in c)).astype(
            np.float32
        )
    g = round_bf16(g)
    tables = build_volume_scene(density=g).build()
    pack = het_pack(tables)
    assert pack is not None
    n_rows = int(pack["bricks"].shape[0])
    assert 64 < n_rows <= 2568, n_rows      # genuinely sparse, under cap

    from xraytracer_tpu.media import density_lookup
    from xraytracer_tpu.media_pallas import (
        RAY_LANES, RAY_ROWS, _density_rows, _payload_coords,
    )
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax

    c = dict(pack["consts"])
    c["nb"] = pack["nb"]
    npts = RAY_ROWS * RAY_LANES
    gmin = np.asarray(tables.grid_min, np.float32)
    gmax = np.asarray(tables.grid_max, np.float32)
    pts = rng.uniform(
        gmin - 10.0, gmax + 10.0, (npts, 3)
    ).astype(np.float32)

    def kernel(px_ref, py_ref, pz_ref, bricks_ref, ids_ref, out_ref):
        out_ref[...] = _density_rows(
            (px_ref[...], py_ref[...], pz_ref[...]), bricks_ref, ids_ref,
            _payload_coords(), c,
        )

    plane = lambda v: jnp.asarray(v).reshape(RAY_ROWS, RAY_LANES)
    got = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((RAY_ROWS, RAY_LANES), jnp.float32),
        interpret=True,
    )(plane(pts[:, 0]), plane(pts[:, 1]), plane(pts[:, 2]),
      pack["bricks"], pack["ids"])
    ref = density_lookup(tables, jnp.asarray(pts))
    # f32 summation-order tolerance: the kernel sums the weighted
    # 768-payload, the XLA path sums 8 corners (module docstring)
    np.testing.assert_allclose(
        np.asarray(got).reshape(-1), np.asarray(ref), rtol=5e-4, atol=1e-5
    )
    # the sparse path exercised both zero and nonzero lookups
    r = np.asarray(ref)
    assert (r == 0).any() and (r > 0).any()
