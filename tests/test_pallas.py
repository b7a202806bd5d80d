"""Pallas kernel coverage via ``interpret=True`` (round-1 VERDICT item 4 /
ADVICE item 3): the fused sweep, the in-kernel winner-record extraction, the
anyhit key-quantized t, chunk/padding edges, and multi-tile ray counts are
checked against the reference-classic ``intersect_triangles`` on the virtual
CPU backend — so CI gates the code path production actually runs on TPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from xraytracer_tpu.geometry import Rays
from xraytracer_tpu.geometry.intersect import intersect_triangles
from xraytracer_tpu.geometry.pallas_kernels import (
    RAY_TILE,
    intersect_triangles_pallas,
    intersect_triangles_pallas_anyhit,
    intersect_triangles_pallas_rec,
)


def _random_tris(t_total, seed=0, scale=4.0):
    """Well-separated random triangles in a box (near-coincident t values,
    which legitimately tie-break differently — see PARITY.md "nearest-hit
    tie-break" — are astronomically unlikely at this scale)."""
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-scale, scale, (t_total, 3)).astype(np.float32)
    e1 = rng.uniform(-1.5, 1.5, (t_total, 3)).astype(np.float32)
    e2 = rng.uniform(-1.5, 1.5, (t_total, 3)).astype(np.float32)
    valid = np.ones((t_total,), bool)
    # a few padding rows, like the builder emits
    if t_total >= 32:
        valid[-3:] = False
    return jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(valid)


def _random_rays(n, seed=1, scale=6.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-scale, scale, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Rays(o=jnp.asarray(o), d=jnp.asarray(d))


@pytest.mark.parametrize("t_total", [32, 64, 96, 128, 256])
def test_fused_sweep_matches_classic(t_total):
    """Nearest-hit (t, idx, u, v) parity across table sizes covering
    single-chunk (<=128) and multi-chunk (256) layouts."""
    v0, e1, e2, valid = _random_tris(t_total, seed=t_total)
    rays = _random_rays(513)
    ct, ci, cu, cv = intersect_triangles(rays, v0, e1, e2, valid)
    pt, pi, pu, pv = intersect_triangles_pallas(
        rays, v0, e1, e2, valid, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ci), np.asarray(pi))
    hit = np.asarray(ci) >= 0
    # formulation-level float noise: the fused kernel evaluates the expanded
    # bilinear triple products, the classic path the factored form (measured
    # max abs diff ~5e-6 over random scenes; relative blows up only where
    # u/v ~ 0)
    np.testing.assert_allclose(
        np.asarray(pt)[hit], np.asarray(ct)[hit], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pu)[hit], np.asarray(cu)[hit], rtol=2e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pv)[hit], np.asarray(cv)[hit], rtol=2e-3, atol=1e-5
    )
    assert hit.sum() > min(t_total, 50) // 2  # comparison exercised hits


def test_multi_tile_ray_counts():
    """Ray counts above one 4096-ray tile, including a ragged remainder that
    forces padding lanes; padding lanes must not leak into real outputs."""
    v0, e1, e2, valid = _random_tris(64, seed=7)
    n = RAY_TILE * 2 + 37
    rays = _random_rays(n, seed=8)
    ct, ci, cu, cv = intersect_triangles(rays, v0, e1, e2, valid)
    pt, pi, pu, pv = intersect_triangles_pallas(
        rays, v0, e1, e2, valid, interpret=True
    )
    assert pt.shape == (n,)
    np.testing.assert_array_equal(np.asarray(ci), np.asarray(pi))
    hit = np.asarray(ci) >= 0
    np.testing.assert_allclose(
        np.asarray(pt)[hit], np.asarray(ct)[hit], rtol=1e-4, atol=1e-5
    )


def test_record_kernel_matches_gather():
    """The in-kernel one-hot winner-record extraction equals the HBM
    tri_rec gather the XLA path performs."""
    from xraytracer_tpu.scene.presets import build_cornell_box

    tables = build_cornell_box().build()
    rays = _random_rays(777, seed=3, scale=300.0)
    # aim the random origins at the box so plenty of lanes hit
    o = jnp.abs(rays.o) % 500.0
    d = rays.d
    rays = Rays(o=o, d=d)
    tt, ti, tu, tv, rec = intersect_triangles_pallas_rec(
        rays, tables, interpret=True
    )
    ref_rec = np.asarray(tables.tri_rec)[np.maximum(np.asarray(ti), 0)]
    ref_rec[np.asarray(ti) < 0] = 0.0
    np.testing.assert_allclose(np.asarray(rec), ref_rec, rtol=1e-5, atol=1e-6)
    # and the (t, idx, u, v) quartet agrees with the classic sweep
    ct, ci, cu, cv = intersect_triangles(
        rays, tables.tri_v0, tables.tri_e1, tables.tri_e2,
        tables.tri_obj >= 0,
    )
    # rays grazing wall seams produce genuine near-ties (t within the 2^-17
    # key quantization) where the two backends legitimately pick different
    # coincident-edge triangles (PARITY.md "nearest-hit tie-break") — accept
    # an idx mismatch only when the t values are within that band
    ci_n, ti_n = np.asarray(ci), np.asarray(ti)
    mismatch = ci_n != ti_n
    hit = ci_n >= 0
    assert hit.sum() > 100
    tt_n, ct_n = np.asarray(tt), np.asarray(ct)
    if mismatch.any():
        rel = np.abs(tt_n[mismatch] - ct_n[mismatch]) / np.maximum(
            ct_n[mismatch], 1e-9
        )
        assert mismatch.sum() <= 8 and rel.max() < 2.0 ** -15, (
            mismatch.sum(), rel.max()
        )
    agree = hit & ~mismatch
    np.testing.assert_allclose(
        tt_n[agree], ct_n[agree], rtol=1e-4, atol=1e-4
    )


def test_anyhit_t_quantization():
    """The anyhit sweep returns t decoded from the packed key: within 2^-16
    relative of the exact winner t (documented at the decode site), and hit
    discovery (idx >= 0) must agree exactly with the classic sweep."""
    v0, e1, e2, valid = _random_tris(96, seed=11)
    rays = _random_rays(1024, seed=12)
    ct, ci, _, _ = intersect_triangles(rays, v0, e1, e2, valid)
    at, ai, au, av = intersect_triangles_pallas_anyhit(
        rays, v0, e1, e2, valid, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ci) >= 0, np.asarray(ai) >= 0)
    hit = np.asarray(ci) >= 0
    assert hit.sum() > 100
    rel = np.abs(np.asarray(at)[hit] - np.asarray(ct)[hit]) / np.asarray(ct)[hit]
    assert rel.max() <= 2.0 ** -16 + 1e-7, rel.max()
    # u/v are not extracted on the anyhit path
    np.testing.assert_array_equal(np.asarray(au), 0.0)
    np.testing.assert_array_equal(np.asarray(av), 0.0)


def test_tie_break_quantization_documented_behavior():
    """Two coincident triangles: the packed-key min picks the lower
    (chunk, row) — the documented divergence. The classic argmin also picks
    the first index here, so both return idx 0; the REAL divergence risk is
    near-ties within ~2^-17 relative t, constructed explicitly below."""
    v0 = np.zeros((32, 3), np.float32)
    e1 = np.zeros((32, 3), np.float32)
    e2 = np.zeros((32, 3), np.float32)
    # triangle 0 and 1: same XY footprint, t = 1.0 and 1.0 * (1 + 2^-20)
    for row, z in ((0, -1.0), (1, -(1.0 + 2.0 ** -20))):
        v0[row] = (-1.0, -1.0, z)
        e1[row] = (4.0, 0.0, 0.0)
        e2[row] = (0.0, 4.0, 0.0)
    valid = np.zeros((32,), bool)
    valid[:2] = True
    rays = Rays(
        o=jnp.asarray([[0.0, 0.0, 0.0]]), d=jnp.asarray([[0.0, 0.0, -1.0]])
    )
    args = (jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(valid))
    ct, ci, _, _ = intersect_triangles(rays, *args)
    pt, pi, _, _ = intersect_triangles_pallas(rays, *args, interpret=True)
    # classic picks the true nearest (row 0 at t=1.0); the packed key cannot
    # distinguish t values closer than 2^-17 relative, so it tie-breaks by
    # row order — which is ALSO row 0. Both agree here by construction...
    assert int(ci[0]) == 0 and int(pi[0]) == 0
    # ...but swap the rows so the nearer triangle has the HIGHER row: the
    # classic sweep still returns the true nearest (now row 1), while the
    # packed key returns row 0 — the documented tie-break divergence.
    v0[[0, 1]] = v0[[1, 0]]
    args = (jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(valid))
    ct2, ci2, _, _ = intersect_triangles(rays, *args)
    pt2, pi2, _, _ = intersect_triangles_pallas(rays, *args, interpret=True)
    assert int(ci2[0]) == 1           # true nearest
    assert int(pi2[0]) == 0           # tie-break by row (documented)
    # and the returned t is still within the quantization band of the truth
    assert abs(float(pt2[0]) - float(ct2[0])) / float(ct2[0]) < 2.0 ** -16


def test_multigroup_streamed_sweep():
    """Tables beyond CHUNK_GROUP chunks stream through the (tiles, groups)
    grid: winner state persists in output refs + key scratch across group
    steps, and the chunk-AABB culling (with empty-padded tail chunks) must
    stay bitwise-neutral. 8960 tris = 70 chunks = 2 groups."""
    t_total = 70 * 128
    v0, e1, e2, valid = _random_tris(t_total, seed=9, scale=12.0)
    rays = _random_rays(700, seed=4, scale=16.0)
    ct, ci, cu, cv = intersect_triangles(rays, v0, e1, e2, valid)
    pt, pi, pu, pv = intersect_triangles_pallas(
        rays, v0, e1, e2, valid, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ci), np.asarray(pi))
    hit = np.asarray(ci) >= 0
    assert hit.any()
    np.testing.assert_allclose(
        np.asarray(ct)[hit], np.asarray(pt)[hit], rtol=1e-5, atol=1e-5
    )
    # record variant on the same ray set via a built scene is covered by
    # test_record_kernel_matches_gather; here gate the anyhit flavor too
    bt, bi, _, _ = intersect_triangles_pallas_anyhit(
        rays, v0, e1, e2, valid, interpret=True
    )
    np.testing.assert_array_equal(hit, np.asarray(bi) >= 0)


def test_multigroup_occluded_worklist_tmax_prune():
    """The boolean occlusion sweep's worklist pre-pass also prunes groups
    entirely beyond each ray's t_max segment (shadow rays). Multigroup
    table + per-ray t_max + clustered geometry so pruning really engages;
    must agree exactly with the XLA sweep's t-compare."""
    from xraytracer_tpu.geometry.pallas_kernels import (
        occluded_triangles_pallas,
    )

    rng = np.random.default_rng(21)
    t_total = 70 * 128          # 70 chunks = 5 groups of 16
    # two tight clusters far apart: groups around x=0 and x=+200
    half = t_total // 2
    v0 = rng.uniform(-4, 4, (t_total, 3)).astype(np.float32)
    v0[half:, 0] += 200.0
    e1 = rng.uniform(-1.0, 1.0, (t_total, 3)).astype(np.float32)
    e2 = rng.uniform(-1.0, 1.0, (t_total, 3)).astype(np.float32)
    valid = np.ones((t_total,), bool)
    valid[-5:] = False
    n = 900
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # half the rays get a t_max too short to ever reach the far cluster
    t_max = np.where(
        np.arange(n) % 2 == 0, 5.0, 500.0
    ).astype(np.float32)
    rays = Rays(o=jnp.asarray(o), d=jnp.asarray(d))
    args = (jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
            jnp.asarray(valid))
    tt, _, _, _ = intersect_triangles(rays, *args)
    expected = np.asarray(tt) < t_max
    got = np.asarray(
        occluded_triangles_pallas(
            rays, *args, jnp.asarray(t_max), interpret=True
        )
    )
    np.testing.assert_array_equal(got, expected)
    assert expected.any() and not expected.all()


def test_multigroup_worklist_ragged_tiles_clustered():
    """Worklist pre-pass with clustered geometry AND a ragged multi-tile ray
    count: per-tile group lists differ (rays aimed at one cluster prune the
    other's groups), padded lanes are zero-filled and must not leak. Parity
    with the classic sweep stays exact on winner indices."""
    rng = np.random.default_rng(22)
    t_total = 70 * 128
    half = t_total // 2
    v0 = rng.uniform(-4, 4, (t_total, 3)).astype(np.float32)
    v0[half:, 0] += 200.0
    e1 = rng.uniform(-1.5, 1.5, (t_total, 3)).astype(np.float32)
    e2 = rng.uniform(-1.5, 1.5, (t_total, 3)).astype(np.float32)
    valid = np.ones((t_total,), bool)
    n = RAY_TILE + 613          # 2 tiles, second mostly padding
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    # first tile aims at the near cluster, remainder at the far one
    o[RAY_TILE:, 0] += 200.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays(o=jnp.asarray(o), d=jnp.asarray(d))
    args = (jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
            jnp.asarray(valid))
    ct, ci, cu, cv = intersect_triangles(rays, *args)
    pt, pi, pu, pv = intersect_triangles_pallas(rays, *args, interpret=True)
    assert pt.shape == (n,)
    np.testing.assert_array_equal(np.asarray(ci), np.asarray(pi))
    hit = np.asarray(ci) >= 0
    assert hit.sum() > 200
    # rays of BOTH clusters found hits (both worklist variants exercised)
    assert hit[:RAY_TILE].any() and hit[RAY_TILE:].any()
    # looser than the small-scene tests: the ~100-unit centered coordinates
    # of the two-cluster layout amplify the expanded-bilinear formulation
    # noise (winner INDICES above still match exactly)
    np.testing.assert_allclose(
        np.asarray(ct)[hit], np.asarray(pt)[hit], rtol=2e-3, atol=1e-4
    )
