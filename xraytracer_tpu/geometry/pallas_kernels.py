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
# Chunks per streamed group (16 * 128 = 2048 tris). Empirically the scoped-
# VMEM cost of the sweep kernels scales ~0.5 MB per chunk IN THE GROUP on
# the axon Mosaic backend (measured: 64-chunk groups allocate 32 MB > the
# 16 MB limit; 16-chunk groups fit) — the streamed-group grid keeps total
# mesh size unbounded either way.
CHUNK_GROUP = 16

_BIG = np.float32(3.0e38)


_INF_KEY = np.int32(0x7F800000)  # float32 +inf bit pattern
_IDX_MASK = np.int32(0x7F)       # low 7 bits carry the chunk-local triangle


def _sweep_kernel(
    *refs, cpg, tc, cull=True, use_mxu=True, anyhit=False, worklist=False,
):
    ids_ref = nact_ref = mask_ref = None
    if worklist:
        ids_ref, nact_ref, mask_ref, refs = (
            refs[0], refs[1], refs[2], refs[3:]
        )
    f_ref, g_ref, ab_ref, t_ref, i_ref, u_ref, v_ref, bk_scr = refs
    _sweep_kernel_impl(
        f_ref, g_ref, None, ab_ref, t_ref, i_ref, u_ref, v_ref, None,
        bk_scr, cpg=cpg, tc=tc, cull=cull, use_mxu=use_mxu, anyhit=anyhit,
        ids_ref=ids_ref, nact_ref=nact_ref, mask_ref=mask_ref,
    )


def _sweep_kernel_rec(
    *refs, cpg, tc, cull=True, use_mxu=True, worklist=False,
):
    ids_ref = nact_ref = mask_ref = None
    if worklist:
        ids_ref, nact_ref, mask_ref, refs = (
            refs[0], refs[1], refs[2], refs[3:]
        )
    (f_ref, g_ref, rec_ref_in, ab_ref, t_ref, i_ref, u_ref, v_ref,
     rec_ref, bk_scr) = refs
    _sweep_kernel_impl(
        f_ref, g_ref, rec_ref_in, ab_ref, t_ref, i_ref, u_ref, v_ref,
        rec_ref, bk_scr, cpg=cpg, tc=tc, cull=cull, use_mxu=use_mxu,
        anyhit=False, ids_ref=ids_ref, nact_ref=nact_ref, mask_ref=mask_ref,
    )


def _slab_lohi(lo3, hi3, o_row, inv_row):
    """Per-lane slab test of one 512-lane row against the box (lo3, hi3)
    (3 scalars each). Returns (tmin, tmax), each (1, 512)."""
    tmin = jnp.full_like(o_row[0], -_BIG)
    tmax = jnp.full_like(o_row[0], _BIG)
    for k in range(3):
        ta = (lo3[k] - o_row[k]) * inv_row[k]
        tb = (hi3[k] - o_row[k]) * inv_row[k]
        tmin = jnp.maximum(tmin, jnp.minimum(ta, tb))
        tmax = jnp.minimum(tmax, jnp.maximum(ta, tb))
    return tmin, tmax


def _row_slab(ab_ref, c, o_row, inv_row):
    """Slab test against chunk ``c``'s AABB (row c of the (n_chunks, 8)
    lo3|hi3|pad table, scalars read from VMEM)."""
    return _slab_lohi(
        [ab_ref[c, k] for k in range(3)],
        [ab_ref[c, k + 3] for k in range(3)],
        o_row, inv_row,
    )


def _group_box(ab_ref):
    """Union AABB of the in-VMEM chunk-AABB block: (lo3, hi3) scalars.
    Empty (padded) chunks have lo > hi and drop out of the min/max."""
    lo3 = [jnp.min(ab_ref[:, k]) for k in range(3)]
    hi3 = [jnp.max(ab_ref[:, k + 3]) for k in range(3)]
    return lo3, hi3


# AABB-table validity column. The branchless min/max slab test CANNOT
# reject an inverted (lo > hi) "empty" box — per component it sees the
# interval [min(lo,hi), max(lo,hi)], so a +/-BIG empty box behaves as an
# INFINITE box and every padded chunk used to pay the full sweep body.
# Column 6 of the (n_chunks, 8) table is an explicit validity flag
# (1.0 = chunk has >= 1 valid triangle) that gates candidacy instead.
AB_VALID_COL = 6

# Per-tile group worklists (scalar-prefetch dynamic block indices). Module
# flag so bench_sweep.py can A/B the plain streamed grid on real hardware.
ENABLE_WORKLIST = True

# MT matmul precision (A/B flag for bench_sweep only — HIGHEST is the
# correctness requirement, see the geometry-precision gotcha)
SWEEP_PRECISION = jax.lax.Precision.HIGHEST


def _sweep_kernel_impl(
    f_ref, g_ref, rec_in, ab_ref, t_ref, i_ref, u_ref, v_ref, rec_out,
    bk_scr, *, cpg, tc, cull=True, use_mxu=True, anyhit=False,
    ids_ref=None, nact_ref=None, mask_ref=None,
):
    """One 4096-ray tile vs. one GROUP of ``cpg`` triangle chunks.

    The grid is (ray tiles, chunk groups): the chunk-group dimension
    streams the (possibly huge) triangle tables HBM -> VMEM one group at a
    time (Pallas double-buffers the blocks), so mesh size is bounded by
    HBM, not VMEM. Winner state persists across groups in the OUTPUT refs
    plus a packed-key VMEM scratch (``bk_scr``), re-initialized at group 0
    of every tile.

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

    Chunk culling: triangles are chunk-grouped in build order (large meshes
    are Morton-sorted at build, scene/builder.py), so each chunk has a
    tight AABB (``ab_ref``). Per chunk, a per-lane slab test against the
    row's rays — including an exact "could this beat the lane's current
    best t" prune — gates the whole MT matmul behind ``lax.cond``: rows
    whose rays all miss (or already have closer hits than) the chunk skip
    it entirely. Bitwise-neutral by construction: a skipped chunk cannot
    contain a winning hit (any hit inside the AABB has t within the padded
    slab interval, and equal-t hits never replace the incumbent key).
    """
    assert tc <= 128, "local index must fit the 7-bit key field"
    g_id = pl.program_id(1)

    # Worklist mode (ids_ref/nact_ref scalar-prefetched): the group-grid
    # step g processes GROUP ids_ref[tile, g] — each tile visits only the
    # groups an XLA pre-pass (``_group_worklist``) proved some lane could
    # touch. Steps past nact_ref[tile] repeat the last active block index
    # (no DMA is issued for an unchanged index) and skip the body
    # entirely. Measured on the axon backend (bench_sweep.py group-skip
    # case, round-trip amortized): a fully-skipped plain grid step costs
    # ~7.3 us vs ~2 us guarded — 5.8 -> 1.6 ms skip floor per 131k-ray
    # sweep at 51k tris, and mesh GI +31%/+48% at 13k/51k tris.
    if ids_ref is not None:
        tile = pl.program_id(0)
        group_id = ids_ref[tile, g_id]
        run = g_id < nact_ref[tile]
        # per-tile chunk bitmask (indexed by ORIGINAL group id): bit c set
        # iff the pre-pass proved some lane of this tile can touch chunk c
        # of the group — a scalar test replacing the 512-lane slab + any()
        group_mask = mask_ref[tile, group_id]
    else:
        group_id = g_id
        run = None
        group_mask = None

    @pl.when(g_id == 0)
    def _init():
        bk_scr[...] = jnp.full(
            (RAY_ROWS, RAY_LANES), _INF_KEY, jnp.int32
        )
        t_ref[...] = jnp.full((RAY_ROWS, RAY_LANES), _BIG)
        i_ref[...] = jnp.full((RAY_ROWS, RAY_LANES), -1, jnp.int32)
        u_ref[...] = jnp.zeros((RAY_ROWS, RAY_LANES))
        v_ref[...] = jnp.zeros((RAY_ROWS, RAY_LANES))
        if rec_out is not None:
            rec_out[...] = jnp.zeros((RAY_ROWS, 32, RAY_LANES))

    chunk_base = group_id * np.int32(cpg)

    def row_body(r, _):
        # lax loop (not Python unroll): the row bodies then SHARE one
        # temporary-buffer scope — 8 unrolled rows each holding a
        # (4*tc, 512) product inside a lax.cond blew the 16 MB scoped-VMEM
        # stack at tc=128 (measured 32.5M)
        lane0 = pl.multiple_of(r * RAY_LANES, RAY_LANES)
        f = f_ref[:, pl.ds(lane0, RAY_LANES)]              # (10, 512)
        o_row = (f[6:7], f[7:8], f[8:9])
        d_row = (f[3:4], f[4:5], f[5:6])
        tiny = np.float32(1e-12)
        inv_row = tuple(
            1.0 / jnp.where(jnp.abs(d) < tiny, tiny, d) for d in d_row
        )
        # loop-invariant chunk-local row ids (hoisted out of the chunk loop)
        local = jax.lax.broadcasted_iota(jnp.int32, (tc, RAY_LANES), 0)

        def chunk(c, carry):
            if not cull:
                return _run_chunk(c, carry)

            def decide(carry):
                tmin, tmax = _row_slab(ab_ref, c, o_row, inv_row)
                enter = jnp.maximum(tmin, 0.0)
                bt_cur = carry[2]
                cand = (
                    (tmax >= tmin) & (tmax > 0.0)
                    & (enter < bt_cur * np.float32(1.0 + 1e-5))
                    & (ab_ref[c, AB_VALID_COL] > 0.0)
                )
                return lax.cond(
                    jnp.any(cand), partial(_run_chunk, c), lambda cr: cr,
                    carry,
                )

            if group_mask is None:
                return decide(carry)
            # scalar bit gate first: chunks the pre-pass rejected for the
            # WHOLE tile skip even the per-row slab work
            bit = (group_mask >> c) & jnp.int32(1)
            return lax.cond(bit != 0, decide, lambda cr: cr, carry)

        def _run_chunk(c, carry):
            bk, bi, bt, bu, bv, brec = carry               # (1, 512) each
            g = g_ref[c]                                   # (4*tc, 10)
            if use_mxu:
                prod = jax.lax.dot_general(
                    g, f,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=SWEEP_PRECISION,
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
            bi = jnp.where(
                better, (chunk_base + c) * tc + (kmin & _IDX_MASK), bi
            )
            bk = jnp.minimum(bk, kmin)
            if anyhit:
                return bk, bi, bt, bu, bv, brec
            # Winner extraction is gated on ANY lane improving: with
            # front-to-back traversal the running best settles after the
            # first few chunks, so most genuine visits improve NO lane —
            # they then pay only matmul + hit test + key min, skipping the
            # key-match compare, the three masked reduces, and the record
            # matmul (~half the measured 2.8 us visit cost). Bitwise-
            # neutral: when ``better`` is all-false every carry is
            # unchanged by the extraction path too.
            def _extract(cr):
                bt, bu, bv, brec = cr
                # the key-matching row's exact f32 values
                win = key == kmin                          # one row per lane
                neg = jnp.float32(-3.0e38)
                t_w = jnp.max(jnp.where(win, t, neg), axis=0, keepdims=True)
                u_w = jnp.max(
                    jnp.where(win, u_num * inv_det, neg), axis=0,
                    keepdims=True,
                )
                v_w = jnp.max(
                    jnp.where(win, v_num * inv_det, neg), axis=0,
                    keepdims=True,
                )
                bt = jnp.where(better, t_w, bt)
                bu = jnp.where(better, u_w, bu)
                bv = jnp.where(better, v_w, bv)
                if rec_in is not None:
                    # one-hot matmul: (32, tc) @ win(tc, 512) -> record
                    win_f = win.astype(jnp.float32)
                    rec_w = jax.lax.dot_general(
                        rec_in[c], win_f,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=SWEEP_PRECISION,
                    )                                      # (32, 512)
                    brec = jnp.where(better, rec_w, brec)
                return bt, bu, bv, brec

            bt, bu, bv, brec = lax.cond(
                jnp.any(better), _extract, lambda cr: cr, (bt, bu, bv, brec)
            )
            return bk, bi, bt, bu, bv, brec

        # carries persist in the output refs + key scratch across groups
        rs = pl.ds(r, 1)
        bk = bk_scr[rs, :]
        bi = i_ref[rs, :]
        bt = t_ref[rs, :]
        bu = u_ref[rs, :]
        bv = v_ref[rs, :]
        brec0 = (
            rec_out[rs, :, :][0] if rec_out is not None
            else jnp.zeros((32, RAY_LANES), jnp.float32)
        )
        # while_loop, NOT fori: Mosaic unrolls static-bound fori loops,
        # allocating every iteration's (4*tc, 512) temporaries separately —
        # 64 chunks blew the 16 MB scoped-VMEM stack (measured 32.1M)
        def run_group(carry0):
            _, st = lax.while_loop(
                lambda st: st[0] < cpg,
                lambda st: (st[0] + 1, chunk(st[0], st[1])),
                (jnp.int32(0), carry0),
            )
            return st

        carry0 = (bk, bi, bt, bu, bv, brec0)
        if cull and cpg > 1:
            # group-level skip: ONE slab decision against the union AABB of
            # this group's chunks replaces cpg per-chunk decisions for rows
            # that miss (or already beat) the whole group — at large mesh
            # sizes the sweep is bound by per-chunk loop iterations, not by
            # the matmuls they gate (measured: no-cull 403 chunks = 3.4 us
            # per chunk VISIT, matmul itself ~0.2 us).
            glo, ghi = _group_box(ab_ref)
            tmin_g, tmax_g = _slab_lohi(glo, ghi, o_row, inv_row)
            enter_g = jnp.maximum(tmin_g, 0.0)
            cand_g = (
                (tmax_g >= tmin_g) & (tmax_g > 0.0)
                & (enter_g < bt * np.float32(1.0 + 1e-5))
                & (jnp.max(ab_ref[:, AB_VALID_COL]) > 0.0)
            )
            (bk, bi, bt, bu, bv, brec) = lax.cond(
                jnp.any(cand_g), run_group, lambda cr: cr, carry0
            )
        else:
            (bk, bi, bt, bu, bv, brec) = run_group(carry0)
        if anyhit:
            # decode the approximate t from the packed key (2^-16 relative
            # quantization — far below the shadow-bias scale)
            bt = jax.lax.bitcast_convert_type(bk & ~_IDX_MASK, jnp.float32)
            bt = jnp.where(bk < _INF_KEY, bt, _BIG)
        bk_scr[rs, :] = bk
        t_ref[rs, :] = bt
        i_ref[rs, :] = bi
        u_ref[rs, :] = bu
        v_ref[rs, :] = bv
        if rec_out is not None:
            rec_out[rs, :, :] = brec[None]
        return 0

    if run is None:
        lax.fori_loop(0, RAY_ROWS, row_body, 0)
    else:
        @pl.when(run)
        def _rows():
            lax.fori_loop(0, RAY_ROWS, row_body, 0)


def _anyhit_kernel(*refs, cpg, tc, cull=True, worklist=False):
    """Boolean shadow sweep: ``blocked = any(valid MT hit with t < t_max)``.

    Much leaner than the nearest-hit kernel — no division, no key packing,
    no winner extraction: the in-kernel compare ``t_num*sgn < t_max*|det|``
    is exact (division-free) and the only output is one int32 per ray.
    Replaces ``Mesh::occluded`` (reference: Src/primitive.cpp:118-138).
    Chunk AABBs gate each chunk's matmul behind a per-lane slab-vs-t_max
    test, and the grid streams chunk GROUPS from HBM with the blocked
    state accumulating in the output ref (see ``_sweep_kernel_impl``,
    including the worklist mode — here the pre-pass also prunes groups
    entirely beyond the lanes' t_max).
    """
    ids_ref = nact_ref = mask_ref = None
    if worklist:
        ids_ref, nact_ref, mask_ref, refs = (
            refs[0], refs[1], refs[2], refs[3:]
        )
    f_ref, g_ref, tm_ref, ab_ref, o_ref = refs
    g_id = pl.program_id(1)
    if ids_ref is not None:
        tile = pl.program_id(0)
        run = g_id < nact_ref[tile]
        group_mask = mask_ref[tile, ids_ref[tile, g_id]]
    else:
        run = None
        group_mask = None

    @pl.when(g_id == 0)
    def _init():
        o_ref[...] = jnp.zeros((RAY_ROWS, RAY_LANES), jnp.int32)

    def row_body(r, _):
        lane0 = pl.multiple_of(r * RAY_LANES, RAY_LANES)
        f = f_ref[:, pl.ds(lane0, RAY_LANES)]              # (10, 512)
        tm = tm_ref[pl.ds(r, 1), :]                        # (1, 512)
        o_row = (f[6:7], f[7:8], f[8:9])
        d_row = (f[3:4], f[4:5], f[5:6])
        tiny = np.float32(1e-12)
        inv_row = tuple(
            1.0 / jnp.where(jnp.abs(d) < tiny, tiny, d) for d in d_row
        )

        def chunk(c, acc):
            if not cull:
                return _run_chunk(c, acc)

            def decide(acc):
                tmin, tmax = _row_slab(ab_ref, c, o_row, inv_row)
                enter = jnp.maximum(tmin, 0.0)
                cand = (
                    (tmax >= tmin) & (tmax > 0.0)
                    & (enter < tm * np.float32(1.0 + 1e-5)) & (acc == 0)
                    & (ab_ref[c, AB_VALID_COL] > 0.0)
                )
                return lax.cond(
                    jnp.any(cand), partial(_run_chunk, c), lambda a: a, acc
                )

            if group_mask is None:
                return decide(acc)
            bit = (group_mask >> c) & jnp.int32(1)
            return lax.cond(bit != 0, decide, lambda a: a, acc)

        def _run_chunk(c, acc):
            g = g_ref[c]                                   # (4*tc, 10)
            prod = jax.lax.dot_general(
                g, f,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=SWEEP_PRECISION,
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

        def run_group(acc0):
            _, acc = lax.while_loop(
                lambda st: st[0] < cpg,
                lambda st: (st[0] + 1, chunk(st[0], st[1])),
                (jnp.int32(0), acc0),
            )
            return acc

        acc0 = o_ref[pl.ds(r, 1), :]
        if cull and cpg > 1:
            # group-level skip (see _sweep_kernel_impl): one union-AABB
            # decision per row gates all cpg chunk iterations
            glo, ghi = _group_box(ab_ref)
            tmin_g, tmax_g = _slab_lohi(glo, ghi, o_row, inv_row)
            enter_g = jnp.maximum(tmin_g, 0.0)
            cand_g = (
                (tmax_g >= tmin_g) & (tmax_g > 0.0)
                & (enter_g < tm * np.float32(1.0 + 1e-5)) & (acc0 == 0)
                & (jnp.max(ab_ref[:, AB_VALID_COL]) > 0.0)
            )
            acc = lax.cond(jnp.any(cand_g), run_group, lambda a: a, acc0)
        else:
            acc = run_group(acc0)
        o_ref[pl.ds(r, 1), :] = acc
        return 0

    if run is None:
        lax.fori_loop(0, RAY_ROWS, row_body, 0)
    else:
        @pl.when(run)
        def _rows():
            lax.fori_loop(0, RAY_ROWS, row_body, 0)


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
    ab = _build_chunk_aabbs(v0 - center, e1, e2, valid, tc)
    n_chunks = t_total // tc

    from .intersect import _ray_features_t

    f = _ray_features_t(rays.o - center, rays.d)
    n_pad = ((n + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if n_pad != n:
        f = jnp.pad(f, ((0, 0), (0, n_pad - n)))
        tm = jnp.pad(tm, (0, n_pad - n))
    n_tiles = n_pad // RAY_TILE
    tm_flat = tm
    tm = tm.reshape(n_tiles * RAY_ROWS, RAY_LANES)
    cpg, n_groups, n_cpad = _grouping(n_chunks)
    g_chunks = _pad_chunk_axis(g_chunks, n_cpad)
    ab = _pad_aabbs(ab, n_cpad)
    worklist = ENABLE_WORKLIST and n_groups > 1
    kernel = partial(_anyhit_kernel, cpg=cpg, tc=tc, cull=n_cpad > 1,
                     worklist=worklist)
    cp = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary")
    )
    out_shape = jax.ShapeDtypeStruct(
        (n_tiles * RAY_ROWS, RAY_LANES), jnp.int32
    )
    if worklist:
        # the shadow worklist also prunes groups entirely beyond t_max
        ids, nact, masks = _group_worklist(f, ab, n_tiles, cpg, n_groups,
                                    tm=tm_flat)
        io_spec = pl.BlockSpec(
            (RAY_ROWS, RAY_LANES), lambda i, g, ids, na, mk: (i, 0),
            memory_space=pltpu.VMEM,
        )
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_tiles, n_groups),
            in_specs=[
                pl.BlockSpec((10, RAY_TILE), lambda i, g, ids, na, mk: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cpg, 4 * tc, 10),
                             lambda i, g, ids, na, mk: (ids[i, g], 0, 0),
                             memory_space=pltpu.VMEM),
                io_spec,
                pl.BlockSpec((cpg, 8),
                             lambda i, g, ids, na, mk: (ids[i, g], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=io_spec,
        )
        out = pl.pallas_call(
            kernel, grid_spec=gs, out_shape=out_shape,
            compiler_params=cp, interpret=interpret,
        )(ids, nact, masks, f, g_chunks, tm, ab)
        return out.reshape(-1)[:n] > 0
    io_spec = pl.BlockSpec(
        (RAY_ROWS, RAY_LANES), lambda i, g: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_groups),
        in_specs=[
            pl.BlockSpec(
                (10, RAY_TILE), lambda i, g: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (cpg, 4 * tc, 10), lambda i, g: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            io_spec,
            pl.BlockSpec(
                (cpg, 8), lambda i, g: (g, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=io_spec,
        out_shape=out_shape,
        compiler_params=cp,
        interpret=interpret,
    )(f, g_chunks, tm, ab)
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


def _group_worklist(f, ab, n_tiles, cpg, n_groups, tm=None):
    """Per-tile active-group worklists + chunk bitmasks for the sweep grid.

    XLA pre-pass over every (ray, CHUNK) pair: the same margin-padded slab
    test the kernel's per-row chunk gate runs (minus the running best-t
    prune, which only the kernel knows), OR-reduced over each
    RAY_TILE-lane tile. The 1e-4-relative AABB padding dwarfs any
    XLA-vs-Mosaic rounding difference, so a chunk this pass rejects cannot
    contain a hit for any lane of the tile — skipping it cannot change the
    nearest hit. The pass runs TILED (``lax.map`` over ray tiles) so the
    live intermediate is (n_chunks, RAY_TILE), not (n_chunks, n_rays) —
    the untiled version materialized ~840 MB per array at the
    205k-tri x 131k-ray point (round-3 advisor finding).

    Each tile's active groups are ordered FRONT-TO-BACK by the group's
    minimum candidate slab-entry distance (ties and inactives by id,
    stable argsort), not by ascending id: the kernel's per-row
    ``enter < best_t`` chunk prune and the group-level union-AABB prune
    then reject everything behind the first hits, which ascending-id
    traversal only managed by luck. Winner SELECTION is order-independent
    (the packed-key min is commutative, and a pruned chunk's hits quantize
    to strictly larger keys — see the margin note in _sweep_kernel_impl);
    only exact packed-key TIES (identical quantized t AND chunk-local row,
    i.e. duplicated geometry) resolve by traversal order, now
    front-to-back (PARITY.md "nearest-hit tie-break").

    Returns ``(ids, n_act, masks)``: ids (n_tiles, n_groups) int32 — each
    tile's candidate group ids front-to-back, padded by REPEATING the
    last active id (an unchanged block index issues no DMA); n_act
    (n_tiles,) int32; masks (n_tiles, n_groups) int32 — bit c of
    ``masks[tile, g]`` set iff chunk ``g*cpg + c`` is a candidate for some
    lane of the tile (indexed by ORIGINAL group id, so the kernel reads
    ``masks[tile, group_id]``). The in-kernel scalar bit test replaces a
    512-lane slab + any() reduction per (row, chunk) — measured 0.34 us
    each, two thirds of the sweep at high chunk-skip rates. ``tm``
    (n_rays_padded,) optionally prunes chunks entirely beyond a per-ray
    segment length (shadow sweeps).
    """
    assert cpg <= 31, "chunk bitmask must fit a non-negative int32"
    n_chunks = n_groups * cpg
    cvalid = ab[:, AB_VALID_COL] > 0.0                       # (C,)
    tiny = np.float32(1e-12)
    f_t = f.reshape(10, n_tiles, RAY_TILE).transpose(1, 0, 2)
    tm_t = (
        jnp.zeros((n_tiles, 0)) if tm is None
        else tm.reshape(n_tiles, RAY_TILE)
    )

    def per_tile(args):
        ft, tmt = args                                       # (10, 4096)
        tmin = jnp.full((n_chunks, RAY_TILE), -_BIG)
        tmax = jnp.full((n_chunks, RAY_TILE), _BIG)
        for k in range(3):
            d = ft[3 + k]
            inv = 1.0 / jnp.where(jnp.abs(d) < tiny, tiny, d)
            ta = (ab[:, k][:, None] - ft[6 + k][None, :]) * inv[None, :]
            tb = (ab[:, k + 3][:, None] - ft[6 + k][None, :]) * inv[None, :]
            tmin = jnp.maximum(tmin, jnp.minimum(ta, tb))
            tmax = jnp.minimum(tmax, jnp.maximum(ta, tb))
        cand = (tmax >= tmin) & (tmax > 0.0) & cvalid[:, None]
        if tm is not None:
            cand &= (
                jnp.maximum(tmin, 0.0)
                < tmt[None, :] * np.float32(1.0 + 1e-5)
            )
        cgrp = cand.reshape(n_groups, cpg, RAY_TILE)
        cbits = jnp.any(cgrp, axis=2)                        # (G, cpg)
        enter = jnp.where(cand, jnp.maximum(tmin, 0.0), _BIG)
        g_enter = jnp.min(
            enter.reshape(n_groups, cpg, RAY_TILE), axis=(1, 2)
        )                                                    # (G,)
        return cbits, g_enter

    cbits, g_enter = lax.map(per_tile, (f_t, tm_t))
    masks = jnp.sum(
        jnp.where(
            cbits,
            (jnp.int32(1) << jnp.arange(cpg, dtype=jnp.int32))[None, None],
            jnp.int32(0),
        ),
        axis=2,
        dtype=jnp.int32,
    )                                                        # (n_tiles, G)
    active = masks != 0
    gi = jnp.arange(n_groups, dtype=jnp.int32)
    # front-to-back: stable argsort over (entry; inactive -> +BIG) — active
    # groups ascending by entry (ties by id), inactive after (by id)
    order = jnp.argsort(
        jnp.where(active, g_enter, _BIG), axis=1, stable=True
    ).astype(jnp.int32)
    n_act = jnp.sum(active, axis=1).astype(jnp.int32)
    last = jnp.take_along_axis(
        order, jnp.maximum(n_act - 1, 0)[:, None], axis=1
    )
    pos = gi[None, :]
    ids = jnp.where(pos < n_act[:, None], order, last)
    return ids, n_act, masks


def _grouping(n_chunks):
    """(chunks_per_group, n_groups, padded_chunks) for the streamed grid."""
    if n_chunks <= CHUNK_GROUP:
        return n_chunks, 1, n_chunks
    n_groups = -(-n_chunks // CHUNK_GROUP)
    return CHUNK_GROUP, n_groups, n_groups * CHUNK_GROUP


def _pad_chunk_axis(x, n_pad):
    """Zero-pad the leading (chunk) axis — zero features mean det = 0,
    which the hit test rejects."""
    if x.shape[0] == n_pad:
        return x
    pad = [(0, n_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def _pad_aabbs(ab, n_pad):
    """Pad with invalid entries: validity column 0 (what actually gates
    candidacy) plus an inverted box so the group-union math ignores them."""
    extra = n_pad - ab.shape[0]
    if extra == 0:
        return ab
    empty = jnp.concatenate(
        [
            jnp.full((extra, 3), _BIG),
            jnp.full((extra, 3), -_BIG),
            jnp.zeros((extra, 2), jnp.float32),
        ],
        axis=-1,
    )
    return jnp.concatenate([ab, empty], axis=0)


def _build_chunk_aabbs(v0, e1, e2, valid, tc):
    """(n_chunks, 8) chunk AABBs (lo3 | hi3 | valid | pad) over valid
    triangles' vertices, in the same CENTERED coordinates as the ray
    features. Padded by a small relative margin so slab-vs-MT rounding can
    never cull a genuine hit. Column ``AB_VALID_COL`` is 1.0 iff the chunk
    holds >= 1 valid triangle — the slab test alone cannot reject the
    inverted box an all-invalid chunk gets (see AB_VALID_COL note)."""
    p1 = v0 + e1
    p2 = v0 + e2
    vm = valid[:, None]
    lo = jnp.minimum(
        jnp.minimum(jnp.where(vm, v0, _BIG), jnp.where(vm, p1, _BIG)),
        jnp.where(vm, p2, _BIG),
    )
    hi = jnp.maximum(
        jnp.maximum(jnp.where(vm, v0, -_BIG), jnp.where(vm, p1, -_BIG)),
        jnp.where(vm, p2, -_BIG),
    )
    n_chunks = v0.shape[0] // tc
    lo = lo.reshape(n_chunks, tc, 3).min(axis=1)
    hi = hi.reshape(n_chunks, tc, 3).max(axis=1)
    has_valid = jnp.any(
        valid.reshape(n_chunks, tc), axis=1, keepdims=True
    ).astype(jnp.float32)
    pad = 1e-4 * jnp.maximum(hi - lo, 0.0).max(axis=-1, keepdims=True) + 1e-6
    return jnp.concatenate(
        [lo - pad, hi + pad, has_valid,
         jnp.zeros((n_chunks, 1), jnp.float32)], axis=-1
    )


def sweep_pallas(
    f, g_chunks, ab, n_rays_padded, *, anyhit=False, interpret=False,
):
    """Run the fused sweep. ``f``: (10, N_pad); returns (t, idx, u, v) each
    (N_pad,)."""
    n_chunks, four_tc, _ = g_chunks.shape
    tc = four_tc // 4
    n_tiles = n_rays_padded // RAY_TILE
    cpg, n_groups, n_cpad = _grouping(n_chunks)
    g_chunks = _pad_chunk_axis(g_chunks, n_cpad)
    ab = _pad_aabbs(ab, n_cpad)
    worklist = ENABLE_WORKLIST and n_groups > 1
    kernel = partial(_sweep_kernel, cpg=cpg, tc=tc, cull=n_cpad > 1,
                     anyhit=anyhit, worklist=worklist)
    out_shape = (n_tiles * RAY_ROWS, RAY_LANES)
    out_shapes = [
        jax.ShapeDtypeStruct(out_shape, jnp.float32),
        jax.ShapeDtypeStruct(out_shape, jnp.int32),
        jax.ShapeDtypeStruct(out_shape, jnp.float32),
        jax.ShapeDtypeStruct(out_shape, jnp.float32),
    ]
    scratch = [pltpu.VMEM((RAY_ROWS, RAY_LANES), jnp.int32)]
    cp = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary")
    )
    if worklist:
        ids, nact, masks = _group_worklist(f, ab, n_tiles, cpg, n_groups)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_tiles, n_groups),
            in_specs=[
                pl.BlockSpec((10, RAY_TILE), lambda i, g, ids, na, mk: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cpg, 4 * tc, 10),
                             lambda i, g, ids, na, mk: (ids[i, g], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cpg, 8),
                             lambda i, g, ids, na, mk: (ids[i, g], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((RAY_ROWS, RAY_LANES),
                             lambda i, g, ids, na, mk: (i, 0),
                             memory_space=pltpu.VMEM)
            ] * 4,
            scratch_shapes=scratch,
        )
        t, idx, u, v = pl.pallas_call(
            kernel, grid_spec=gs, out_shape=out_shapes,
            compiler_params=cp, interpret=interpret,
        )(ids, nact, masks, f, g_chunks, ab)
        return t.reshape(-1), idx.reshape(-1), u.reshape(-1), v.reshape(-1)
    out_spec = pl.BlockSpec(
        (RAY_ROWS, RAY_LANES), lambda i, g: (i, 0), memory_space=pltpu.VMEM
    )
    t, idx, u, v = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_groups),
        in_specs=[
            pl.BlockSpec(
                (10, RAY_TILE), lambda i, g: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (cpg, 4 * tc, 10), lambda i, g: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (cpg, 8), lambda i, g: (g, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[out_spec] * 4,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=cp,
        interpret=interpret,
    )(f, g_chunks, ab)
    return t.reshape(-1), idx.reshape(-1), u.reshape(-1), v.reshape(-1)


def _sweep(rays: Rays, v0, e1, e2, valid, interpret, anyhit):
    """Shared front half: features + fused sweep -> (t, idx, u, v)."""
    n = rays.o.shape[0]
    t_total = v0.shape[0]
    tc = t_total if t_total <= TRI_CHUNK else TRI_CHUNK
    center = jnp.mean(v0, axis=0)
    g_chunks = _build_g_chunks(v0 - center, e1, e2, valid, tc)
    ab = _build_chunk_aabbs(v0 - center, e1, e2, valid, tc)

    from .intersect import _ray_features_t

    f = _ray_features_t(rays.o - center, rays.d)      # (10, N), no relayout
    n_pad = ((n + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    if n_pad != n:
        f = jnp.pad(f, ((0, 0), (0, n_pad - n)))
    bt, bi, bu, bv = sweep_pallas(
        f, g_chunks, ab, n_pad, anyhit=anyhit, interpret=interpret
    )
    return bt[:n], bi[:n], bu[:n], bv[:n]


def sweep_pallas_rec(
    f, g_chunks, rec_chunks, ab, n_rays_padded, *, interpret=False,
):
    """Fused sweep + in-kernel winner-record extraction.
    Returns (t, idx, u, v, rec) with rec (n_tiles*8, 32, RAY_LANES)."""
    n_chunks, four_tc, _ = g_chunks.shape
    tc = four_tc // 4
    n_tiles = n_rays_padded // RAY_TILE
    cpg, n_groups, n_cpad = _grouping(n_chunks)
    g_chunks = _pad_chunk_axis(g_chunks, n_cpad)
    rec_chunks = _pad_chunk_axis(rec_chunks, n_cpad)
    ab = _pad_aabbs(ab, n_cpad)
    worklist = ENABLE_WORKLIST and n_groups > 1
    kernel = partial(_sweep_kernel_rec, cpg=cpg, tc=tc, cull=n_cpad > 1,
                     worklist=worklist)
    out_shape = (n_tiles * RAY_ROWS, RAY_LANES)
    out_shapes = [
        jax.ShapeDtypeStruct(out_shape, jnp.float32),
        jax.ShapeDtypeStruct(out_shape, jnp.int32),
        jax.ShapeDtypeStruct(out_shape, jnp.float32),
        jax.ShapeDtypeStruct(out_shape, jnp.float32),
        jax.ShapeDtypeStruct(
            (n_tiles * RAY_ROWS, 32, RAY_LANES), jnp.float32
        ),
    ]
    scratch = [pltpu.VMEM((RAY_ROWS, RAY_LANES), jnp.int32)]
    cp = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary")
    )
    if worklist:
        ids, nact, masks = _group_worklist(f, ab, n_tiles, cpg, n_groups)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_tiles, n_groups),
            in_specs=[
                pl.BlockSpec((10, RAY_TILE), lambda i, g, ids, na, mk: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cpg, 4 * tc, 10),
                             lambda i, g, ids, na, mk: (ids[i, g], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cpg, tc, 32),
                             lambda i, g, ids, na, mk: (ids[i, g], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cpg, 8),
                             lambda i, g, ids, na, mk: (ids[i, g], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((RAY_ROWS, RAY_LANES),
                             lambda i, g, ids, na, mk: (i, 0),
                             memory_space=pltpu.VMEM)
            ] * 4 + [
                pl.BlockSpec((RAY_ROWS, 32, RAY_LANES),
                             lambda i, g, ids, na, mk: (i, 0, 0),
                             memory_space=pltpu.VMEM)
            ],
            scratch_shapes=scratch,
        )
        t, idx, u, v, rec = pl.pallas_call(
            kernel, grid_spec=gs, out_shape=out_shapes,
            compiler_params=cp, interpret=interpret,
        )(ids, nact, masks, f, g_chunks, rec_chunks, ab)
        return (
            t.reshape(-1), idx.reshape(-1), u.reshape(-1), v.reshape(-1),
            rec,
        )
    out_spec = pl.BlockSpec(
        (RAY_ROWS, RAY_LANES), lambda i, g: (i, 0), memory_space=pltpu.VMEM
    )
    t, idx, u, v, rec = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_groups),
        in_specs=[
            pl.BlockSpec(
                (10, RAY_TILE), lambda i, g: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (cpg, 4 * tc, 10), lambda i, g: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (cpg, tc, 32), lambda i, g: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (cpg, 8), lambda i, g: (g, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[out_spec] * 4 + [
            pl.BlockSpec(
                (RAY_ROWS, 32, RAY_LANES), lambda i, g: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=cp,
        interpret=interpret,
    )(f, g_chunks, rec_chunks, ab)
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
    ab = _build_chunk_aabbs(v0 - center, e1, e2, valid, tc)
    n_chunks = t_total // tc
    rec_chunks = scene.tri_rec.reshape(n_chunks, tc, 32)

    from .intersect import _ray_features_t

    f = _ray_features_t(rays.o - center, rays.d)
    n_pad = ((n + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    if n_pad != n:
        f = jnp.pad(f, ((0, 0), (0, n_pad - n)))
    bt, bi, bu, bv, rec = sweep_pallas_rec(
        f, g_chunks, rec_chunks, ab, n_pad, interpret=interpret
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


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sweep_stopgrad(interpret, o, d, v0, e1, e2, valid):
    return intersect_triangles_pallas(
        Rays(o=o, d=d), v0, e1, e2, valid, interpret=interpret
    )


def _sweep_stopgrad_fwd(interpret, o, d, v0, e1, e2, valid):
    return _sweep_stopgrad(interpret, o, d, v0, e1, e2, valid), (
        o.shape, d.shape, v0.shape, e1.shape, e2.shape
    )


def _sweep_stopgrad_bwd(interpret, shapes, _ct):
    return tuple(jnp.zeros(s) for s in shapes) + (None,)


_sweep_stopgrad.defvjp(_sweep_stopgrad_fwd, _sweep_stopgrad_bwd)


def intersect_triangles_pallas_stopgrad(rays: Rays, v0, e1, e2, valid,
                                        chunk=None, interpret=False):
    """Fused Pallas sweep usable INSIDE ``jax.grad`` pipelines.

    The fused kernel has no reverse-mode rule; this wrapper gives it one
    that returns ZERO cotangents for rays and geometry. That is exact for
    the framework's differentiable parameter set (albedo / Le / sigma /
    density — diff.py): with detached sampling, ray origins/directions and
    triangle vertices are functions of geometry + RNG only, so no gradient
    ever flows through the intersection OUTPUTS; appearance gradients
    travel through the ``tri_rec`` gather by winner index, which stays
    outside the kernel and differentiates normally. Do NOT use it to
    differentiate w.r.t. vertex positions (geometry gradients would be
    silently zero — the XLA ``intersect_triangles_mm`` path is the one
    that supports those).
    """
    return _sweep_stopgrad(interpret, rays.o, rays.d, v0, e1, e2, valid)


# geometry/intersect.occluded: shadow sweeps in pipelines built on this
# sweep may use the boolean any-hit kernel with stop_gradient-ed inputs
# (visibility is a detached boolean in every estimator here)
intersect_triangles_pallas_stopgrad.detached_ok = True


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
