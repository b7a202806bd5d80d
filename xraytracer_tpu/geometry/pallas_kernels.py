"""Fused Pallas TPU kernel for the triangle-intersection sweep.

Why: the XLA path (``intersect_triangles_mm``) materializes the
(N_rays, 4*T) product tensor in HBM and the ~15-op hit-test epilogue
re-streams it each pass — ~19 ms for 456k rays x 128 triangles, pure
memory-bound. This kernel keeps everything in VMEM: for each ray tile it
runs the MXU feature matmul (see ``intersect._tri_features`` for the
bilinear Möller-Trumbore formulation), the division-free hit test, and the
running nearest-hit min over triangle chunks, writing only (t, idx) per
ray. HBM traffic drops from ~GBs to ~16 bytes/ray.

Replaces the C++ native tier of the reference (``Mesh::intersect`` /
``rayTriangleIntersect``, reference: Src/primitive.cpp:83-168) per
SURVEY.md §2.5 "Pallas kernels for ray-triangle intersection sweeps".

Layout: rays are processed 4096 per grid step as eight 512-lane rows
(TPU block constraints want (8k, 128m) tiles); triangle features are
chunk-grouped (n_chunks, 4*TRI_CHUNK, 10) and live fully in VMEM.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import INF, K_EPS
from .types import Rays

RAY_LANES = 512         # rays per kernel row
RAY_ROWS = 8            # rows per grid step
RAY_TILE = RAY_LANES * RAY_ROWS  # 4096 rays per grid step
TRI_CHUNK = 128         # triangles per in-kernel chunk

_BIG = np.float32(3.0e38)


_INF_KEY = np.int32(0x7F800000)  # float32 +inf bit pattern
_IDX_MASK = np.int32(0x7F)       # low 7 bits carry the chunk-local triangle


def _sweep_kernel(
    f_ref, g_ref, t_ref, i_ref, u_ref, v_ref, *, n_chunks, tc, use_mxu=True,
    anyhit=False,
):
    _sweep_kernel_impl(
        f_ref, g_ref, None, t_ref, i_ref, u_ref, v_ref, None,
        n_chunks=n_chunks, tc=tc, use_mxu=use_mxu, anyhit=anyhit,
    )


def _sweep_kernel_rec(
    f_ref, g_ref, rec_ref_in, t_ref, i_ref, u_ref, v_ref, rec_ref, *,
    n_chunks, tc, use_mxu=True,
):
    _sweep_kernel_impl(
        f_ref, g_ref, rec_ref_in, t_ref, i_ref, u_ref, v_ref, rec_ref,
        n_chunks=n_chunks, tc=tc, use_mxu=use_mxu, anyhit=False,
    )


def _sweep_kernel_impl(
    f_ref, g_ref, rec_in, t_ref, i_ref, u_ref, v_ref, rec_out, *,
    n_chunks, tc, use_mxu=True, anyhit=False,
):
    """One 4096-ray tile vs. all triangle chunks.

    f_ref: (10, RAY_TILE) ray features; g_ref: (n_chunks, 4*tc, 10)
    chunk-grouped triangle features (row sections [det | u | v | t]);
    t_ref/i_ref/u_ref/v_ref: (RAY_ROWS, RAY_LANES) winner t / index / u / v.
    rec_in/rec_out (record variant only): (n_chunks, tc, 32) per-triangle
    surface records and the (RAY_ROWS, 32, RAY_LANES) winner record,
    extracted with ONE one-hot (32, tc)@(tc, RAY_LANES) MXU matmul per
    chunk — this replaces the post-kernel (N, 32) HBM gather, which costs
    several ms at 456k lanes because TPU gathers serialize.

    Nearest-hit selection uses a packed int32 key: positive float32 order
    as int bits, low 7 mantissa bits replaced by the chunk-local triangle
    row. One int min replaces float min + argmin (the profile bottleneck);
    the winner's exact f32 (t, u, v) are then extracted with key-match
    masked reduces — entirely in VMEM, so no epilogue gathers back in HBM
    (XLA lowers those to ~GB one-hot matmuls; they cost 3x the sweep).
    ``anyhit`` skips the u/v extraction for shadow rays.
    """
    assert tc <= 128, "local index must fit the 7-bit key field"
    for r in range(RAY_ROWS):
        f = f_ref[:, r * RAY_LANES:(r + 1) * RAY_LANES]   # (10, 512)

        def chunk(c, carry):
            bk, bi, bt, bu, bv, brec = carry               # (1, 512) each
            g = g_ref[c]                                   # (4*tc, 10)
            if use_mxu:
                prod = jax.lax.dot_general(
                    g, f,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )                                          # (4*tc, 512)
                det = prod[0:tc]
                u_num = prod[tc:2 * tc]
                v_num = prod[2 * tc:3 * tc]
                t_num = prod[3 * tc:4 * tc]
            else:
                # per-section rank-1 accumulation keeps live temporaries at
                # (tc, 512) — the full (4*tc, 512) version blows VMEM
                def section(s):
                    gs = g[s * tc:(s + 1) * tc]            # (tc, 10)
                    acc = gs[:, 0:1] * f[0:1, :]
                    for k in range(1, 10):
                        acc = acc + gs[:, k:k + 1] * f[k:k + 1, :]
                    return acc                              # (tc, 512)

                det = section(0)
                u_num = section(1)
                v_num = section(2)
                t_num = section(3)
            sgn = jnp.sign(det)
            absd = jnp.abs(det)
            u_s = u_num * sgn
            v_s = v_num * sgn
            t_s = t_num * sgn
            ok = (
                (absd >= K_EPS)
                & (u_s >= 0.0)
                & (v_s >= 0.0)
                & (u_s + v_s <= absd)
                & (t_s > K_EPS * absd)
            )
            inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
            t = jnp.where(ok, t_num * inv_det, 1.0)
            local = jax.lax.broadcasted_iota(jnp.int32, (tc, RAY_LANES), 0)
            # Tie-break quantization (PARITY.md "nearest-hit tie-break"):
            # replacing the low 7 mantissa bits with the triangle row means
            # two hits within ~2^-17 relative t compare equal in the t field
            # and tie-break by (chunk, row) order — coincident/z-fighting
            # geometry can therefore pick a different (still ~equidistant)
            # primitive than the XLA argmin path.
            key = (
                jax.lax.bitcast_convert_type(t, jnp.int32) & ~_IDX_MASK
            ) | local
            key = jnp.where(ok, key, _INF_KEY)
            kmin = jnp.min(key, axis=0, keepdims=True)     # (1, 512)
            better = kmin < bk
            bi = jnp.where(better, c * tc + (kmin & _IDX_MASK), bi)
            bk = jnp.minimum(bk, kmin)
            if anyhit:
                return bk, bi, bt, bu, bv, brec
            # winner extraction: the key-matching row's exact f32 values
            win = key == kmin                              # one row per lane
            neg = jnp.float32(-3.0e38)
            t_w = jnp.max(jnp.where(win, t, neg), axis=0, keepdims=True)
            u_w = jnp.max(
                jnp.where(win, u_num * inv_det, neg), axis=0, keepdims=True
            )
            v_w = jnp.max(
                jnp.where(win, v_num * inv_det, neg), axis=0, keepdims=True
            )
            bt = jnp.where(better, t_w, bt)
            bu = jnp.where(better, u_w, bu)
            bv = jnp.where(better, v_w, bv)
            if rec_in is not None:
                # one-hot matmul: (32, tc) @ win(tc, 512) -> winner record
                win_f = win.astype(jnp.float32)
                rec_w = jax.lax.dot_general(
                    rec_in[c], win_f,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )                                          # (32, 512)
                brec = jnp.where(better, rec_w, brec)
            return bk, bi, bt, bu, bv, brec

        bk = jnp.full((1, RAY_LANES), _INF_KEY, jnp.int32)
        bi = jnp.full((1, RAY_LANES), -1, jnp.int32)
        zf = jnp.zeros((1, RAY_LANES), jnp.float32)
        brec0 = jnp.zeros((32, RAY_LANES), jnp.float32)
        bk, bi, bt, bu, bv, brec = lax.fori_loop(
            0, n_chunks, chunk,
            (bk, bi, jnp.full_like(zf, _BIG), zf, zf, brec0),
        )
        if anyhit:
            # decode the approximate t from the packed key (2^-16 relative
            # quantization — far below the shadow-bias scale)
            bt = jax.lax.bitcast_convert_type(bk & ~_IDX_MASK, jnp.float32)
            bt = jnp.where(bk < _INF_KEY, bt, _BIG)
        t_ref[r, :] = bt[0]
        i_ref[r, :] = bi[0]
        u_ref[r, :] = bu[0]
        v_ref[r, :] = bv[0]
        if rec_out is not None:
            rec_out[r, :, :] = brec


def _anyhit_kernel(f_ref, g_ref, tm_ref, o_ref, *, n_chunks, tc):
    """Boolean shadow sweep: ``blocked = any(valid MT hit with t < t_max)``.

    Much leaner than the nearest-hit kernel — no division, no key packing,
    no winner extraction: the in-kernel compare ``t_num*sgn < t_max*|det|``
    is exact (division-free) and the only output is one int32 per ray.
    Replaces ``Mesh::occluded`` (reference: Src/primitive.cpp:118-138).
    """
    for r in range(RAY_ROWS):
        f = f_ref[:, r * RAY_LANES:(r + 1) * RAY_LANES]   # (10, 512)
        tm = tm_ref[r:r + 1, :]                            # (1, 512)

        def chunk(c, acc):
            g = g_ref[c]                                   # (4*tc, 10)
            prod = jax.lax.dot_general(
                g, f,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                              # (4*tc, 512)
            det = prod[0:tc]
            u_num = prod[tc:2 * tc]
            v_num = prod[2 * tc:3 * tc]
            t_num = prod[3 * tc:4 * tc]
            sgn = jnp.sign(det)
            absd = jnp.abs(det)
            u_s = u_num * sgn
            v_s = v_num * sgn
            t_s = t_num * sgn
            ok = (
                (absd >= K_EPS)
                & (u_s >= 0.0)
                & (v_s >= 0.0)
                & (u_s + v_s <= absd)
                & (t_s > K_EPS * absd)
                & (t_s < tm * absd)
            )
            hit = jnp.max(ok.astype(jnp.int32), axis=0, keepdims=True)
            return jnp.maximum(acc, hit)

        acc = lax.fori_loop(
            0, n_chunks, chunk, jnp.zeros((1, RAY_LANES), jnp.int32)
        )
        o_ref[r, :] = acc[0]


def occluded_triangles_pallas(
    rays: Rays, v0, e1, e2, valid, t_max, interpret=False
):
    """Fused boolean occlusion sweep. Returns (N,) bool ``blocked``.

    The t_max compare happens in-kernel (exact, division-free), so there is
    no quantized-t decode and no epilogue compare. Falls back to the XLA
    sweep when the table shape doesn't fit the kernel.
    """
    t_total = v0.shape[0]
    tc = t_total if t_total <= TRI_CHUNK else TRI_CHUNK
    if t_total == 0 or t_total % tc or tc % 8:
        from .intersect import intersect_triangles

        tt, _, _, _ = intersect_triangles(rays, v0, e1, e2, valid)
        return tt < t_max
    n = rays.o.shape[0]
    center = jnp.mean(v0, axis=0)
    g_chunks = _build_g_chunks(v0 - center, e1, e2, valid, tc)
    n_chunks = t_total // tc

    from .intersect import _ray_features_t

    f = _ray_features_t(rays.o - center, rays.d)
    n_pad = ((n + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if n_pad != n:
        f = jnp.pad(f, ((0, 0), (0, n_pad - n)))
        tm = jnp.pad(tm, (0, n_pad - n))
    n_tiles = n_pad // RAY_TILE
    tm = tm.reshape(n_tiles * RAY_ROWS, RAY_LANES)
    kernel = partial(_anyhit_kernel, n_chunks=n_chunks, tc=tc)
    io_spec = pl.BlockSpec(
        (RAY_ROWS, RAY_LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (10, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                g_chunks.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            io_spec,
        ],
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles * RAY_ROWS, RAY_LANES), jnp.int32
        ),
        interpret=interpret,
    )(f, g_chunks, tm)
    return out.reshape(-1)[:n] > 0


def _build_g_chunks(v0, e1, e2, valid, tc):
    """(n_chunks, 4*tc, 10) chunk-grouped triangle features; invalid rows get
    all-zero coefficients (det = 0 -> never hit)."""
    from .intersect import _tri_features

    t_total = v0.shape[0]
    g = _tri_features(v0, e1, e2).T.reshape(t_total, 4, 10)
    g = g * valid[:, None, None].astype(jnp.float32)
    n_chunks = t_total // tc
    # (T, 4, 10) -> (n_chunks, tc, 4, 10) -> (n_chunks, 4, tc, 10)
    g = g.reshape(n_chunks, tc, 4, 10).transpose(0, 2, 1, 3)
    return g.reshape(n_chunks, 4 * tc, 10)


def sweep_pallas(f, g_chunks, n_rays_padded, *, anyhit=False, interpret=False):
    """Run the fused sweep. ``f``: (10, N_pad); returns (t, idx, u, v) each
    (N_pad,)."""
    n_chunks, four_tc, _ = g_chunks.shape
    tc = four_tc // 4
    n_tiles = n_rays_padded // RAY_TILE
    kernel = partial(_sweep_kernel, n_chunks=n_chunks, tc=tc, anyhit=anyhit)
    out_spec = pl.BlockSpec(
        (RAY_ROWS, RAY_LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = (n_tiles * RAY_ROWS, RAY_LANES)
    t, idx, u, v = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (10, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                g_chunks.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[out_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.int32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
        ],
        interpret=interpret,
    )(f, g_chunks)
    return t.reshape(-1), idx.reshape(-1), u.reshape(-1), v.reshape(-1)


def _sweep(rays: Rays, v0, e1, e2, valid, interpret, anyhit):
    """Shared front half: features + fused sweep -> (t, idx, u, v)."""
    n = rays.o.shape[0]
    t_total = v0.shape[0]
    tc = t_total if t_total <= TRI_CHUNK else TRI_CHUNK
    center = jnp.mean(v0, axis=0)
    g_chunks = _build_g_chunks(v0 - center, e1, e2, valid, tc)

    from .intersect import _ray_features_t

    f = _ray_features_t(rays.o - center, rays.d)      # (10, N), no relayout
    n_pad = ((n + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    if n_pad != n:
        f = jnp.pad(f, ((0, 0), (0, n_pad - n)))
    bt, bi, bu, bv = sweep_pallas(
        f, g_chunks, n_pad, anyhit=anyhit, interpret=interpret
    )
    return bt[:n], bi[:n], bu[:n], bv[:n]


def sweep_pallas_rec(f, g_chunks, rec_chunks, n_rays_padded, *, interpret=False):
    """Fused sweep + in-kernel winner-record extraction.
    Returns (t, idx, u, v, rec) with rec (n_tiles*8, 32, RAY_LANES)."""
    n_chunks, four_tc, _ = g_chunks.shape
    tc = four_tc // 4
    n_tiles = n_rays_padded // RAY_TILE
    kernel = partial(_sweep_kernel_rec, n_chunks=n_chunks, tc=tc)
    out_spec = pl.BlockSpec(
        (RAY_ROWS, RAY_LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = (n_tiles * RAY_ROWS, RAY_LANES)
    t, idx, u, v, rec = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (10, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                g_chunks.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                rec_chunks.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[out_spec] * 4 + [
            pl.BlockSpec(
                (RAY_ROWS, 32, RAY_LANES), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_shape=[
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.int32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(
                (n_tiles * RAY_ROWS, 32, RAY_LANES), jnp.float32
            ),
        ],
        interpret=interpret,
    )(f, g_chunks, rec_chunks)
    return (
        t.reshape(-1), idx.reshape(-1), u.reshape(-1), v.reshape(-1), rec
    )


def intersect_triangles_pallas_rec(rays: Rays, scene, interpret=False):
    """Nearest-hit sweep that also returns the winner's (N, 32) packed
    surface record, extracted in-kernel (no HBM gather). Falls back to
    (sweep + gather) when the table shape doesn't fit the kernel."""
    v0, e1, e2 = scene.tri_v0, scene.tri_e1, scene.tri_e2
    valid = scene.tri_obj >= 0
    n = rays.o.shape[0]
    t_total = v0.shape[0]
    tc = t_total if t_total <= TRI_CHUNK else TRI_CHUNK
    if t_total == 0 or t_total % tc or tc % 8:
        from .intersect import intersect_triangles

        tt, ti, tu, tv = intersect_triangles(rays, v0, e1, e2, valid)
        rec = scene.tri_rec[jnp.maximum(ti, 0)]
        rec = jnp.where((ti >= 0)[:, None], rec, 0.0)
        return tt, ti, tu, tv, rec

    center = jnp.mean(v0, axis=0)
    g_chunks = _build_g_chunks(v0 - center, e1, e2, valid, tc)
    n_chunks = t_total // tc
    rec_chunks = scene.tri_rec.reshape(n_chunks, tc, 32)

    from .intersect import _ray_features_t

    f = _ray_features_t(rays.o - center, rays.d)
    n_pad = ((n + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    if n_pad != n:
        f = jnp.pad(f, ((0, 0), (0, n_pad - n)))
    bt, bi, bu, bv, rec = sweep_pallas_rec(
        f, g_chunks, rec_chunks, n_pad, interpret=interpret
    )
    # (G8, 32, L) -> (N, 32)
    rec = rec.transpose(0, 2, 1).reshape(-1, 32)[:n]
    bt, bi, bu, bv = bt[:n], bi[:n], bu[:n], bv[:n]
    hit = bi >= 0
    return (
        jnp.where(hit, bt, INF),
        bi,
        jnp.where(hit, bu, 0.0),
        jnp.where(hit, bv, 0.0),
        rec,
    )


def intersect_triangles_pallas(
    rays: Rays, v0, e1, e2, valid, chunk=None, interpret=False
):
    """Drop-in ``tri_fn`` (same contract as ``intersect_triangles``) backed
    by the fused kernel; the winner's exact f32 (t, u, v) come out of the
    kernel itself (no HBM epilogue)."""
    t_total = v0.shape[0]
    tc = t_total if t_total <= TRI_CHUNK else TRI_CHUNK
    if t_total == 0 or t_total % tc or tc % 8:
        from .intersect import intersect_triangles

        return intersect_triangles(rays, v0, e1, e2, valid)
    bt, bi, bu, bv = _sweep(rays, v0, e1, e2, valid, interpret, False)
    hit = bi >= 0
    return (
        jnp.where(hit, bt, INF),
        bi,
        jnp.where(hit, bu, 0.0),
        jnp.where(hit, bv, 0.0),
    )


def intersect_triangles_pallas_anyhit(
    rays: Rays, v0, e1, e2, valid, chunk=None, interpret=False
):
    """Shadow-ray variant: skips winner u/v extraction and returns the
    packed-key approximate t (2^-16 relative) with zero u/v. Occlusion
    compares t against a biased t_max, so the quantization is far below the
    bias scale."""
    t_total = v0.shape[0]
    tc = t_total if t_total <= TRI_CHUNK else TRI_CHUNK
    if t_total == 0 or t_total % tc or tc % 8:
        from .intersect import intersect_triangles

        return intersect_triangles(rays, v0, e1, e2, valid)
    bt, bi, bu, bv = _sweep(rays, v0, e1, e2, valid, interpret, True)
    return jnp.where(bi >= 0, bt, INF), bi, bu, bv


def default_tri_fn(anyhit=False):
    """Platform-appropriate triangle sweep: the fused Pallas kernel on TPU
    (with a cheaper any-hit flavor for shadow rays), the XLA matmul
    formulation elsewhere (CPU tests, autodiff)."""
    try:
        is_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        is_tpu = False
    if is_tpu:
        return intersect_triangles_pallas_anyhit if anyhit else intersect_triangles_pallas
    from .intersect import intersect_triangles_mm

    return intersect_triangles_mm
