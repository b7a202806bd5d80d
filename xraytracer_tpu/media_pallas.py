"""Fused Pallas TPU kernels for heterogeneous-medium tracking.

Why: the XLA tracking loops in media.py pay one serialized HBM row-gather
per collision candidate per lane for the fine trilinear density lookup
(measured ~3.6 ms per 65k-lane lookup on the axon TPU; ~12 candidates per
``sample_medium`` call -> ~43 of the 51.8 ms wavefront cost). TPU has no
vector gather — but the MXU can SELECT: with the density grid resident in
VMEM as a brick table, a per-lane one-hot matmul extracts each lane's
9x9x9 brick in ~tens of microseconds per 4096-lane tile, so the whole
delta-/ratio-tracking loop fuses into ONE kernel per wavefront with zero
HBM round-trips between steps.

Replaces the reference's per-ray null-collision loops
(``HeterogeneousMedium::sampleMedium`` Src/medium.cpp:45-133 and
``ratioTrackingTransmittance`` Src/medium.h:360-386) on the hot path; the
algorithm is the same piecewise-majorant optical-depth formulation as
media.py (``_majorant_segments`` / ``_sample_heterogeneous`` /
``segment_transmittance``), reproduced draw-for-draw so both paths consume
the identical counter-based PCG stream.

Design notes:
  * Brick table: the grid is cut into 8^3-cell blocks; each block's
    payload is its 9^3 corner lattice (one-cell halo, edge-clamped) padded
    to 128 lanes -> a (NB_act, 768) **bf16** table holding only ACTIVE
    (nonzero) bricks sorted by flat id, each row carrying its own id in
    two bf16-exact payload slots. Per candidate step and 512-lane row, an
    in-kernel rank (sum of active_ids < bflat) finds the lane's row, then
    ``bricks^T @ one_hot`` (one MXU matmul) yields every lane's full
    brick; the trilinear value is a VPU weight-product reduce, zeroed when
    the extracted id slots don't match (empty brick -> density 0). Cost
    scales as lanes x OCCUPIED-grid-cells, so eligibility is gated at
    NB_act <= MAX_BRICKS active blocks (a dense ~101^3 grid, or sparse
    clouds at 128^3-256^3); larger occupancies keep the XLA path.
  * The matmul runs at DEFAULT (bf16) MXU precision. One-hot entries and
    bf16-rounded payloads are exact in bf16, so the extraction is exact —
    the kernel therefore samples the density field ROUNDED TO BF16
    (relative 2^-8; the block majorants are recomputed over the rounded
    field so the sig_n >= 0 null-collision invariant still holds and the
    estimator stays unbiased w.r.t. the rounded field). PARITY.md
    documents this divergence; pass a bf16-exact grid for bitwise runs.
  * The supergrid DDA (24 fixed segments), the optical-depth inversion,
    spectral-MIS channel selection, and the PCG draws all run in-kernel on
    (8, 512) planes; the candidate loop is a ``lax.while_loop`` with a
    tile-uniform early exit, so a tile only pays for its own worst lane.
  * The tracking-site layout (site + step*SITES_PER_STEP + {0,1,2}) and
    the hoisted phase draw (site + scat_step*SITES_PER_STEP + 3, drawn by
    the XLA wrapper) match media.py exactly.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .constants import RAY_EPS
from .scene.tables import MED_HETEROGENEOUS

RAY_LANES = 512
RAY_ROWS = 8
RAY_TILE = RAY_LANES * RAY_ROWS
_DDA_SEGMENTS = 24              # must match media._DDA_SEGMENTS
_SITES_PER_STEP = 4             # must match media.SITES_PER_STEP
BRICK = 8                       # grid cells per brick edge
_PAYLOAD = 9 * 9 * 9            # corner lattice incl. +1 halo
_PAYLOAD_PAD = 768
# ACTIVE-brick cap (round 5): the table holds only bricks whose payload is
# nonzero, sorted by flat id; lanes find their row with an in-kernel rank
# (sum of active_ids < bflat) and an id-check zeroes lanes whose brick is
# empty. One-hot MAC cost therefore scales with the OCCUPIED volume, not
# the grid extent — a 128^3 cloud at ~25-50% fill costs 2-5x the old 64^3
# dense bound instead of 8x, and dense grids up to ~108^3 now fit outright.
MAX_BRICKS = 2560               # one-hot matmul eligibility bound (active)
# total-brick bound: flat ids are carried through the bf16 extraction as
# (id % 128, id // 128) payload slots, each exact in bf16 only up to 256
MAX_TOTAL_BRICKS = 128 * 256    # = 32768 bricks = a 256^3-cell grid
_SLOT_ID_LO = _PAYLOAD          # payload slot 729: flat brick id % 128
_SLOT_ID_HI = _PAYLOAD + 1      # payload slot 730: flat brick id // 128

_GOLDEN = np.uint32(0x9E3779B9)
_M1 = np.uint32(747796405)
_A1 = np.uint32(2891336453)
_M2 = np.uint32(277803737)
_INV24 = np.float32(1.0 / (1 << 24))
_TINY = np.float32(1e-38)
_BIG_F = np.float32(3.0e38)


def _pcg(x):
    x = x * _M1 + _A1
    word = ((x >> ((x >> np.uint32(28)) + np.uint32(4))) ^ x) * _M2
    return (word >> np.uint32(22)) ^ word


def _tof(u):
    return (
        lax.bitcast_convert_type(u >> np.uint32(8), jnp.int32)
        .astype(jnp.float32) * _INV24
    )


def _u1_at(key, offs_i32):
    """uniform1 at a runtime int32 scalar site offset (rng.uniform1 parity:
    pcg(key + site * GOLDEN) with uint32 wraparound)."""
    return _tof(_pcg(key + offs_i32.astype(jnp.uint32) * _GOLDEN))


def _u2_at(key, offs_i32):
    """uniform2 at a runtime int32 site offset (array offsets allowed —
    the hoisted phase draw uses per-lane scat_step sites)."""
    x1 = _pcg(key + offs_i32.astype(jnp.uint32) * _GOLDEN)
    x2 = _pcg(x1)
    return _tof(x1), _tof(x2)


def round_bf16(a):
    """f32 -> nearest bf16 -> f32 (the field the fused kernels sample)."""
    import ml_dtypes

    return np.asarray(a, np.float32).astype(ml_dtypes.bfloat16).astype(
        np.float32
    )


def build_bricks(grid):
    """ACTIVE-brick table from a (X, Y, Z) grid.

    Block (bx,by,bz) holds the 9^3 corner lattice grid[bx*8 + px, ...] for
    px,py,pz in [0, 8], edge-clamped; payload index p = (px*9 + py)*9 + pz.
    Only bricks with a nonzero payload are kept (sorted by flat id — any
    point landing in a dropped brick has zero density by construction, and
    the kernel's id-check returns 0 for it). Payload slots 729/730 carry
    (id % 128, id // 128) so the bf16 one-hot extraction can verify the
    selected row (both components are bf16-exact up to MAX_TOTAL_BRICKS).

    Returns ``(bricks, ids, nb, n_active)``: bricks (NB_pad, 768)
    **bfloat16** (exact: the field is bf16-rounded before packing and the
    MXU one-hot pass ran at bf16 precision already), ids (NB_pad, 1) f32
    flat ids (+BIG padding), nb the brick-axis counts, n_active the live
    row count. NB_pad always exceeds n_active by >= 1 padding row so the
    rank of an id beyond the last active brick selects a guaranteed-miss
    row."""
    import ml_dtypes

    g = np.asarray(grid, np.float32)
    nb = [max(1, -(-s // BRICK)) for s in g.shape]
    NB = nb[0] * nb[1] * nb[2]
    px = np.arange(9)
    rows, ids, corner_idx = [], [], []
    for bx in range(nb[0]):
        ix = np.minimum(bx * BRICK + px, g.shape[0] - 1)
        for by in range(nb[1]):
            iy = np.minimum(by * BRICK + px, g.shape[1] - 1)
            for bz in range(nb[2]):
                iz = np.minimum(bz * BRICK + px, g.shape[2] - 1)
                pay = g[np.ix_(ix, iy, iz)]            # (9, 9, 9)
                if not pay.any():
                    continue
                b = (bx * nb[1] + by) * nb[2] + bz
                row = np.zeros(_PAYLOAD_PAD, np.float32)
                row[:_PAYLOAD] = pay.reshape(-1)
                row[_SLOT_ID_LO] = b % 128
                row[_SLOT_ID_HI] = b // 128
                rows.append(row)
                ids.append(b)
                # flat-grid corner indices of this payload (live re-pack
                # + gradient un-brick both use them)
                fi = (
                    (ix[:, None, None] * g.shape[1] + iy[None, :, None])
                    * g.shape[2] + iz[None, None, :]
                )
                corner_idx.append(fi.reshape(-1))
    n_active = len(rows)
    if n_active + 1 > 1024:
        # large tables run the CHUNKED in-kernel id-compare path
        # (_density_rows) — pad to a whole number of 256-row blocks (the
        # persistent nee kernel at a 2560-row table measured 304 KB over
        # the 16 MB scoped budget; finer padding shaves the table block)
        nb_pad = ((n_active + 1 + 255) // 256) * 256
    else:
        nb_pad = max(8, ((n_active + 8) // 8) * 8)     # >= 1 padding row
    bricks = np.zeros((nb_pad, _PAYLOAD_PAD), np.float32)
    if n_active:
        bricks[:n_active] = np.stack(rows)
    # padding rows: id slots -1 (never match a real brick id)
    bricks[n_active:, _SLOT_ID_LO] = -1.0
    bricks[n_active:, _SLOT_ID_HI] = -1.0
    ids_col = np.full((nb_pad, 1), _BIG_F, np.float32)
    ids_col[:n_active, 0] = np.asarray(ids, np.float32)
    cidx = (
        np.stack(corner_idx).astype(np.int32) if n_active
        else np.zeros((0, _PAYLOAD), np.int32)
    )
    return (
        bricks.astype(ml_dtypes.bfloat16), ids_col, tuple(nb), n_active,
        cidx,
    )


def _f3(v):
    return tuple(np.float32(c) for c in np.asarray(v).reshape(-1)[:3])


def het_pack(tables):
    """Concrete-table eligibility + baked constants for the fused kernels,
    or None. Requires exactly one heterogeneous medium and a grid whose
    ACTIVE (nonzero-payload) brick count fits the VMEM table
    (<= MAX_BRICKS 8^3-cell blocks; total bricks <= MAX_TOTAL_BRICKS so
    the id slots stay bf16-exact). Sparse reference-scale clouds at
    128^3-256^3 therefore qualify; a dense grid caps at ~101^3."""
    try:
        med_type = np.asarray(tables.med_type)
    except Exception:               # traced tables: cannot bake
        return None
    het = np.flatnonzero(med_type == MED_HETEROGENEOUS)
    if het.size != 1:
        return None
    g = np.asarray(tables.grid_density, np.float32)
    nb = [max(1, -(-s // BRICK)) for s in g.shape]
    if nb[0] * nb[1] * nb[2] > MAX_TOTAL_BRICKS:
        return None
    row = int(het[0])
    gq = round_bf16(g)
    bricks, brick_ids, nb, n_active, corner_idx = build_bricks(gq)
    if n_active > MAX_BRICKS:
        return None
    # supergrid block maxima over the ROUNDED field, same partition as
    # scene.builder (keeps the piecewise majorants valid upper bounds for
    # the field the kernel actually samples)
    from .scene.builder import supergrid_max

    sg_nb = np.asarray(tables.grid_super_nb, np.int32)
    sg_bs = np.asarray(tables.grid_super_bsize, np.float32)
    sg = supergrid_max(gq, sg_nb, sg_bs).reshape(-1)
    nsg = sg.shape[0]
    nsg_pad = max(8, ((nsg + 7) // 8) * 8)
    sg_col = np.zeros((nsg_pad, 1), np.float32)
    sg_col[:nsg, 0] = sg

    gmin = np.asarray(tables.grid_min, np.float32)
    gmax = np.asarray(tables.grid_max, np.float32)
    ext = gmax - gmin
    res = np.asarray(g.shape, np.float32)
    scale = (res - 1.0) / np.where(ext == 0.0, np.float32(1.0), ext)
    sa = np.asarray(tables.med_sigma_a, np.float32)[row]
    ss = np.asarray(tables.med_sigma_s, np.float32)[row]
    return dict(
        row=row,
        bricks=jnp.asarray(bricks),
        ids=jnp.asarray(brick_ids),
        sg=jnp.asarray(sg_col),
        n_active=n_active,
        corner_idx=corner_idx,
        grid_shape=tuple(int(v) for v in g.shape),
        nb=tuple(int(v) for v in nb),
        consts=dict(
            big_table=bool(bricks.shape[0] > 1024),
            gmin=_f3(gmin), gmax=_f3(gmax), ext=_f3(ext),
            res_m1=_f3(res - 1.0), scale=_f3(scale),
            sg_nb=tuple(int(v) for v in sg_nb), sg_bs=_f3(sg_bs),
            sigma_a=_f3(sa), sigma_s=_f3(ss),
            sigma_t_max=np.float32((sa + ss).max()),
            dm=np.float32(np.asarray(tables.med_density_mult)[row]),
            majorant=np.float32(np.asarray(tables.med_majorant)[row]),
        ),
    )


def pack_bricks_live(grid, pack):
    """Re-pack the brick payload table from a LIVE (traced) density grid
    with the ACTIVE SET fixed at build time (same caveat as the majorant
    tables: the optimizer must keep mass inside the initially-active
    bricks — media.py score-terms docstring). The payload is bf16-rounded
    exactly like ``build_bricks``; id slots and padding come from the
    baked template."""
    import ml_dtypes

    tmpl = jnp.asarray(np.asarray(pack["bricks"], np.float32))
    n_act = pack["n_active"]
    if n_act == 0:
        return tmpl.astype(ml_dtypes.bfloat16)
    pay = jnp.asarray(grid).reshape(-1)[
        jnp.asarray(pack["corner_idx"]).reshape(-1)
    ].reshape(n_act, _PAYLOAD)
    t = tmpl.at[:n_act, :_PAYLOAD].set(pay)
    return t.astype(ml_dtypes.bfloat16)


def unbrick_grad(acc, pack):
    """Fold a (NB_pad, 768) brick-layout gradient accumulator back onto
    the dense grid (scatter-ADD: halo corners shared by up to 8 bricks
    arrive as separate rows)."""
    n_act = pack["n_active"]
    shape = pack["grid_shape"]
    flat = jnp.zeros(int(np.prod(shape)), jnp.float32)
    if n_act:
        flat = flat.at[jnp.asarray(pack["corner_idx"]).reshape(-1)].add(
            acc[:n_act, :_PAYLOAD].reshape(-1)
        )
    return flat.reshape(shape)


# --------------------------------------------------------------------------
# in-kernel building blocks (all on (8, 512) planes unless noted)
# --------------------------------------------------------------------------


def _payload_coords():
    """Static payload-lattice coordinates (px, py, pz) as (768, 512) int32
    planes; p = (px*9 + py)*9 + pz. Computed once per kernel invocation
    (loop-invariant; integer division by constants lowers fine on Mosaic —
    verified by probe; bf16 planes were tried to halve the footprint but
    the target rejects bf16 compares)."""
    ii = lax.broadcasted_iota(jnp.int32, (_PAYLOAD_PAD, RAY_LANES), 0)
    px = ii // 81
    py = (ii // 9) - px * 9
    pz = ii - (ii // 9) * 9
    return px, py, pz


def _density_rows(p3, bricks_ref, ids_ref, pcoords, c, compact=False):
    """Trilinear density of the bf16-rounded grid at world points ``p3``
    ((8,512) per component), via per-row one-hot MXU brick extraction over
    the ACTIVE-brick table.

    Row lookup is a direct id-equality one-hot: ``oh = (active_ids ==
    bflat)`` selects the lane's row (ids are unique and f32-exact), and a
    lane whose brick was dropped as empty matches NO row — its extracted
    payload is all-zero, exactly the value of an all-zero brick.

    LOOP SHAPE: the 8 kernel rows run in a ``lax.while_loop`` (NOT a
    Python/fori unroll — Mosaic unrolls static loops and then STACKS every
    iteration's (768, 512) payload and (NB, 512) one-hot temporaries in
    scoped VMEM: measured 19-22 MB > the 16 MB limit at reference-scale
    tables; the while body shares one set). Tables past 1024 rows
    additionally accumulate the compare + matmul over 512-row blocks in an
    inner while_loop. Bit-compatible with media.density_lookup on
    bf16-exact grids up to f32 summation order (the XLA path sums 8
    corners, this sums the weighted 768-payload; both are exact selections
    of the same corner values; the bf16 table stores the bf16-rounded
    field losslessly and the one-hot pass was already a bf16 MXU pass when
    the table was f32)."""
    gx, gy, gz = p3
    inside = (
        (gx >= c["gmin"][0]) & (gx <= c["gmax"][0])
        & (gy >= c["gmin"][1]) & (gy <= c["gmax"][1])
        & (gz >= c["gmin"][2]) & (gz <= c["gmax"][2])
    )

    def axis(p, k):
        x = (p - c["gmin"][k]) / c["ext"][k] * c["res_m1"][k]
        x = jnp.clip(x, 0.0, c["res_m1"][k])
        x0 = jnp.floor(x)
        return x0.astype(jnp.int32), x - x0

    i0x, fx = axis(gx, 0)
    i0y, fy = axis(gy, 1)
    i0z, fz = axis(gz, 2)
    nbx, nby, nbz = c["nb"]
    bxi = i0x >> 3               # i0 // BRICK
    byi = i0y >> 3
    bzi = i0z >> 3
    bflat = (bxi * np.int32(nby) + byi) * np.int32(nbz) + bzi
    lx = (i0x - (bxi << 3)).astype(jnp.float32)
    ly = (i0y - (byi << 3)).astype(jnp.float32)
    lz = (i0z - (bzi << 3)).astype(jnp.float32)
    px, py, pz = pcoords
    nb_rows = bricks_ref.shape[0]
    tdtype = bricks_ref.dtype
    # ``compact`` forces the while-loop row form even for small tables —
    # the gradient replay kernel carries the (NB, 768) accumulator and
    # scatter machinery on top and measured 104 KB over the scoped budget
    # with the unrolled form at depth 32
    chunked = nb_rows > 1024     # bound the live (rows, 512) intermediates
    bff = bflat.astype(jnp.float32)

    if not chunked and not compact:
        # SMALL tables: statically-unrolled rows (the while-loop form
        # below measured +33% on the 64^3 nee workload — the masked row
        # selects and loop machinery cost more than the unroll's extra
        # scoped VMEM, which only breaks past ~1024 rows)
        ids_col = ids_ref[...]
        rows = []
        for r in range(RAY_ROWS):
            bf = bff[r:r + 1, :]
            oh = (ids_col == bf).astype(tdtype)
            payload = lax.dot_general(
                bricks_ref[...], oh,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # (768, 512)
            lxr, fxr = lx[r:r + 1, :].astype(jnp.int32), fx[r:r + 1, :]
            lyr, fyr = ly[r:r + 1, :].astype(jnp.int32), fy[r:r + 1, :]
            lzr, fzr = lz[r:r + 1, :].astype(jnp.int32), fz[r:r + 1, :]
            wx = jnp.where(px == lxr, 1.0 - fxr, 0.0) + jnp.where(
                px == lxr + 1, fxr, 0.0
            )
            wy = jnp.where(py == lyr, 1.0 - fyr, 0.0) + jnp.where(
                py == lyr + 1, fyr, 0.0
            )
            wz = jnp.where(pz == lzr, 1.0 - fzr, 0.0) + jnp.where(
                pz == lzr + 1, fzr, 0.0
            )
            rows.append(
                jnp.sum(payload * (wx * wy * wz), axis=0, keepdims=True)
            )
        val = jnp.concatenate(rows, axis=0)                 # (8, 512)
        return jnp.where(inside, val, 0.0)

    # per-row select/update by sublane mask (Mosaic has no dynamic_slice
    # on values)
    row_iota = lax.broadcasted_iota(jnp.int32, (RAY_ROWS, RAY_LANES), 0)

    def srow(x, r):
        return jnp.sum(
            jnp.where(row_iota == r, x, 0.0), axis=0, keepdims=True
        )

    def row_body(st):
        r, acc = st
        bf = srow(bff, r)                                   # (1, 512)
        if chunked:
            CH = 256        # 512 measured 312 KB over the 16 MB scoped
                            # budget at a 2560-row table (the whole
                            # persistent nee kernel); 256 fits
            # NOTE (round-5 lead): the table is id-sorted, so the blocks
            # a row can match form a contiguous range — but both gating
            # schemes tried (per-block lax.cond, scalar-prescan loop
            # bounds) cost 1.2-1.35 MB of Mosaic stack and push the
            # persistent nee kernel past the 16 MB scoped budget at
            # 2304-row tables; the unconditional loop stays
            def pay_block(bst):
                cb, pacc = bst
                ids_c = ids_ref[pl.ds(cb * CH, CH), :]
                oh_c = (ids_c == bf).astype(tdtype)
                pacc = pacc + lax.dot_general(
                    bricks_ref[pl.ds(cb * CH, CH), :], oh_c,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return cb + 1, pacc

            _, payload = lax.while_loop(
                lambda bst: bst[0] < nb_rows // CH, pay_block,
                (jnp.int32(0),
                 jnp.zeros((_PAYLOAD_PAD, RAY_LANES), jnp.float32)),
            )                                               # (768, 512)
        else:
            oh = (ids_ref[...] == bf).astype(tdtype)        # (NB_pad, 512)
            payload = lax.dot_general(
                bricks_ref[...], oh,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # (768, 512)
        lxr = srow(lx, r).astype(jnp.int32)
        lyr = srow(ly, r).astype(jnp.int32)
        lzr = srow(lz, r).astype(jnp.int32)
        fxr, fyr, fzr = srow(fx, r), srow(fy, r), srow(fz, r)
        # arithmetic form (mask-cast * value): i1 masks under jnp.where
        # hit a Mosaic replicated-relayout error inside the row while_loop
        wx = ((px == lxr).astype(jnp.float32) * (1.0 - fxr)
              + (px == lxr + 1).astype(jnp.float32) * fxr)
        wy = ((py == lyr).astype(jnp.float32) * (1.0 - fyr)
              + (py == lyr + 1).astype(jnp.float32) * fyr)
        wz = ((pz == lzr).astype(jnp.float32) * (1.0 - fzr)
              + (pz == lzr + 1).astype(jnp.float32) * fzr)
        val_r = jnp.sum(payload * (wx * wy * wz), axis=0, keepdims=True)
        return r + 1, jnp.where(row_iota == r, val_r, acc)

    _, val = lax.while_loop(
        lambda st: st[0] < RAY_ROWS, row_body,
        (jnp.int32(0), jnp.zeros((RAY_ROWS, RAY_LANES), jnp.float32)),
    )
    return jnp.where(inside, val, 0.0)


def _super_rows(b3, sg_ref, c):
    """Supergrid block max for (8,512) int32 block coords: per-row one-hot
    MXU matmul against the (NSG, 1) column (exact pick, no gather).

    Exactness: the column holds block maxima of the bf16-rounded field —
    every value is bf16-representable, and one-hot entries are exact in
    bf16, so the default-precision matmul reproduces the selected value
    bit-for-bit (same argument as the brick extraction above). The matmul
    replaces a (NSG, 512) masked VPU reduce per row — the DDA runs
    _DDA_SEGMENTS of these per tracking call, and the reduce was most of
    its cost (round-4 ablation: dda8 saved 2.3 ms of the 39.8 ms nee spp).
    Rows run in a while_loop so the (NSG, 512) one-hots share one scoped
    buffer instead of stacking 8x (see _density_rows loop-shape note)."""
    bx, by, bz = b3
    _, nby, nbz = c["sg_nb"]
    bflat = ((bx * np.int32(nby) + by) * np.int32(nbz) + bz).astype(
        jnp.float32
    )
    ids = _sg_iota_col(sg_ref)
    if not c.get("big_table"):
        # small brick tables: unrolled rows (faster; the 8x (NSG, 512)
        # one-hots fit the scoped budget when the brick table is small)
        rows = []
        for r in range(RAY_ROWS):
            oh = (ids == bflat[r:r + 1, :]).astype(jnp.float32)
            rows.append(
                lax.dot_general(
                    sg_ref[...], oh,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                           # (1, 512)
            )
        return jnp.concatenate(rows, axis=0)
    row_iota = lax.broadcasted_iota(jnp.int32, (RAY_ROWS, RAY_LANES), 0)

    def row_body(st):
        r, acc = st
        bf = jnp.sum(
            jnp.where(row_iota == r, bflat, 0.0), axis=0, keepdims=True
        )
        oh = (ids == bf).astype(jnp.float32)
        got = lax.dot_general(
            sg_ref[...], oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # (1, 512)
        return r + 1, jnp.where(row_iota == r, got, acc)

    _, out = lax.while_loop(
        lambda st: st[0] < RAY_ROWS, row_body,
        (jnp.int32(0), jnp.zeros((RAY_ROWS, RAY_LANES), jnp.float32)),
    )
    return out


def _sg_iota_col(sg_ref):
    """(NSG, 1) row-index column for the supergrid one-hot (int iota then
    cast — Mosaic's tpu.iota is integer-only)."""
    n = sg_ref.shape[0]
    return lax.broadcasted_iota(jnp.int32, (n, 1), 0).astype(jnp.float32)


def _dda_segments(o3, d3, t0f, t1f, sg_ref, c):
    """In-kernel port of media._majorant_segments: per-lane piecewise
    majorants over [t0, t1]. Returns (seg_t, seg_m, tau_edges) as Python
    lists of (8, 512) planes (lengths K+1, K+1, K+2)."""
    ax_ = (o3[0] - c["gmin"][0]) * c["scale"][0]
    ay_ = (o3[1] - c["gmin"][1]) * c["scale"][1]
    az_ = (o3[2] - c["gmin"][2]) * c["scale"][2]
    vx = d3[0] * c["scale"][0]
    vy = d3[1] * c["scale"][1]
    vz = d3[2] * c["scale"][2]
    bs0, bs1, bs2 = c["sg_bs"]
    nb0, nb1, nb2 = (np.float32(v) for v in c["sg_nb"])
    eps20 = np.float32(1e-20)
    inf = np.float32(np.inf)

    def exit_ax(b, bsz, a, v):
        lo = b * bsz
        hi = (b + 1.0) * bsz
        v_safe = jnp.where(jnp.abs(v) < eps20, eps20, v)
        return jnp.where(
            v > eps20, (hi - a) / v_safe,
            jnp.where(v < -eps20, (lo - a) / v_safe, inf),
        )

    # integer-walk DDA (media._majorant_segments parity: block indices
    # advance along the exiting axis, first-min tie-break)
    bx = jnp.clip(jnp.floor((ax_ + t0f * vx) / bs0), 0.0, nb0 - 1.0)
    by = jnp.clip(jnp.floor((ay_ + t0f * vy) / bs1), 0.0, nb1 - 1.0)
    bz = jnp.clip(jnp.floor((az_ + t0f * vz) / bs2), 0.0, nb2 - 1.0)
    sgx = jnp.where(vx >= 0.0, 1.0, -1.0)
    sgy = jnp.where(vy >= 0.0, 1.0, -1.0)
    sgz = jnp.where(vz >= 0.0, 1.0, -1.0)
    seg_t, seg_m = [], []
    t_cur = t0f
    for _ in range(_DDA_SEGMENTS):
        dens_max = _super_rows(
            (bx.astype(jnp.int32), by.astype(jnp.int32),
             bz.astype(jnp.int32)), sg_ref, c,
        )
        m_loc = dens_max * c["dm"] * c["sigma_t_max"]
        ex = exit_ax(bx, bs0, ax_, vx)
        ey = exit_ax(by, bs1, ay_, vy)
        ez = exit_ax(bz, bs2, az_, vz)
        t_hi = jnp.minimum(jnp.minimum(ex, ey), ez)
        step_x = (ex <= ey) & (ex <= ez)        # argmin, first-min ties
        step_y = ~step_x & (ey <= ez)
        step_z = ~step_x & ~step_y
        seg_t.append(t_cur)
        seg_m.append(jnp.where(t_cur < t1f, m_loc, 0.0))
        bx = jnp.clip(bx + jnp.where(step_x, sgx, 0.0), 0.0, nb0 - 1.0)
        by = jnp.clip(by + jnp.where(step_y, sgy, 0.0), 0.0, nb1 - 1.0)
        bz = jnp.clip(bz + jnp.where(step_z, sgz, 0.0), 0.0, nb2 - 1.0)
        t_cur = jnp.minimum(jnp.maximum(t_hi, t_cur), t1f)
    t_tail = jnp.minimum(t_cur, t1f)
    seg_t.append(t_tail)
    seg_m.append(jnp.where(t_tail < t1f, c["majorant"], 0.0))

    tau_edges = [jnp.zeros_like(t0f)]
    for k in range(_DDA_SEGMENTS + 1):
        end = t1f if k == _DDA_SEGMENTS else seg_t[k + 1]
        dtau = seg_m[k] * jnp.maximum(end - seg_t[k], 0.0)
        tau_edges.append(tau_edges[-1] + dtau)
    return seg_t, seg_m, tau_edges


def _tau_to_t(seg_t, seg_m, tau_edges, tau):
    """In-kernel media._tau_to_t: piecewise-linear inversion, unrolled
    one-hot over the K+1 segments."""
    nseg = len(seg_m)
    k = -jnp.ones_like(tau, dtype=jnp.int32)
    for j in range(nseg):
        k = k + (tau_edges[j] <= tau).astype(jnp.int32)
    k = jnp.clip(k, 0, nseg - 1)
    m_loc = jnp.zeros_like(tau)
    t_k = jnp.zeros_like(tau)
    tau_k = jnp.zeros_like(tau)
    for j in range(nseg):
        sel = k == j
        m_loc = jnp.where(sel, seg_m[j], m_loc)
        t_k = jnp.where(sel, seg_t[j], t_k)
        tau_k = jnp.where(sel, tau_edges[j], tau_k)
    t = t_k + (tau - tau_k) / jnp.where(m_loc <= 0.0, 1.0, m_loc)
    return t, m_loc


def _by_channel(channel, v0, v1, v2):
    return jnp.where(channel == 0, v0, jnp.where(channel == 1, v1, v2))


def _pick_channel(w0, w1, w2, u):
    """sampling.sample_channel parity: pmf proportional to weights with a
    uniform fallback on zero sum; lower_bound with the x==0 bump."""
    s = w0 + w1 + w2
    pos = s > 0.0
    sg = jnp.where(s == 0.0, 1.0, s)
    third = np.float32(1.0 / 3.0)
    pmf0 = jnp.where(pos, w0 / sg, third)
    pmf1 = jnp.where(pos, w1 / sg, third)
    pmf2 = jnp.where(pos, w2 / sg, third)
    c1 = pmf0
    c2 = pmf0 + pmf1
    x = (
        (0.0 < u).astype(jnp.int32)
        + (c1 < u).astype(jnp.int32)
        + (c2 < u).astype(jnp.int32)
    )
    channel = jnp.maximum(x, 1) - 1
    return channel, (pmf0, pmf1, pmf2)


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------


def track_sample(
    o3, d3, t0v, t1v, tpv, key_v, site, active0, bricks_ref, ids_ref,
    sg_ref, pcoords, c, max_steps, chan_uniform=False,
):
    """In-kernel weighted delta tracking (media._sample_heterogeneous
    parity) over (8, 512) planes. ``site``: int32 scalar; ``active0``:
    bool plane. Returns (t_res, (w0, w1, w2), scattered(int32),
    scat_step(int32)) — the phase direction is drawn by the caller at
    site + scat_step*SITES_PER_STEP + 3.

    ``chan_uniform``: uniform channel pick (media.py ``chan_uniform`` /
    the reference's noMIS strategy, Src/medium.h:234-277) — the
    gradient-friendly estimator variant; the entry density lookup (only
    ever consumed by the throughput-weighted pick) is skipped."""
    t0f = t0v
    t1f = jnp.maximum(t1v, t0f)

    seg_t, seg_m, tau_edges = _dda_segments(o3, d3, t0f, t1f, sg_ref, c)
    tau_total = tau_edges[-1] - np.float32(RAY_EPS) * c["majorant"]

    if chan_uniform:
        sa_init = (jnp.zeros_like(t0f),) * 3
        m_entry = jnp.zeros_like(t0f)
    else:
        # entry sigma_a for the first channel pick (Src/medium.cpp:52-54)
        p_entry = tuple(o3[k] + t0v * d3[k] for k in range(3))
        dens0 = _density_rows(
            p_entry, bricks_ref, ids_ref, pcoords, c
        ) * c["dm"]
        sa_init = tuple(c["sigma_a"][k] * dens0 for k in range(3))
        _, m_entry = _tau_to_t(seg_t, seg_m, tau_edges, jnp.zeros_like(t0f))
        m_entry = jnp.maximum(m_entry, 0.0)

    zero = jnp.zeros_like(t0f)
    one = jnp.ones_like(t0f)

    def body(state):
        (step, act, tau, w0, w1, w2, sa0, sa1, sa2, m_prev, t_res, sstep,
         scat_acc) = state
        active = act > 0
        offs = site + step * np.int32(_SITES_PER_STEP)
        u_wl = _u1_at(key_v, offs)
        u_dist = _u1_at(key_v, offs + 1)
        u_ev = _u1_at(key_v, offs + 2)

        if chan_uniform:
            channel, pmf = _pick_channel(
                jnp.ones_like(w0), jnp.ones_like(w1), jnp.ones_like(w2),
                u_wl,
            )
        else:
            m_prev_s = jnp.where(m_prev <= 0.0, 1.0, m_prev)
            alb = tuple(
                jnp.maximum((m_prev - sa) / m_prev_s, 0.0)
                for sa in (sa0, sa1, sa2)
            )
            channel, pmf = _pick_channel(
                tpv[0] * w0 * alb[0], tpv[1] * w1 * alb[1],
                tpv[2] * w2 * alb[2], u_wl,
            )

        dtau = -jnp.log(jnp.maximum(1.0 - u_dist, _TINY))
        tau_new = tau + dtau

        esc = tau_new > tau_total
        tr_esc = jnp.exp(-(tau_total - tau))
        pdf_esc = (pmf[0] + pmf[1] + pmf[2]) * tr_esc
        pe = jnp.where(pdf_esc == 0.0, 1.0, pdf_esc)
        w_esc = tuple(w * tr_esc / pe for w in (w0, w1, w2))

        t_new, m_loc = _tau_to_t(seg_t, seg_m, tau_edges, tau_new)
        m_safe = jnp.where(m_loc <= 0.0, 1.0, m_loc)
        p3 = tuple(o3[k] + t_new * d3[k] for k in range(3))
        dens = _density_rows(p3, bricks_ref, ids_ref, pcoords, c) * c["dm"]
        sig_s = tuple(c["sigma_s"][k] * dens for k in range(3))
        sig_a = tuple(c["sigma_a"][k] * dens for k in range(3))
        sig_n = tuple(
            jnp.maximum(m_loc - sig_a[k] - sig_s[k], 0.0) for k in range(3)
        )
        denom = tuple(
            jnp.where(sig_s[k] + sig_n[k] == 0.0, 1.0, sig_s[k] + sig_n[k])
            for k in range(3)
        )
        p_s = tuple(sig_s[k] / denom[k] for k in range(3))
        p_n = tuple(sig_n[k] / denom[k] for k in range(3))
        p_s_c = _by_channel(channel, *p_s)

        tr_s = jnp.exp(-dtau)
        pdf_sc = (
            pmf[0] * m_safe * tr_s * p_s[0]
            + pmf[1] * m_safe * tr_s * p_s[1]
            + pmf[2] * m_safe * tr_s * p_s[2]
        )
        ps_safe = jnp.where(pdf_sc == 0.0, 1.0, pdf_sc)
        w_cur = (w0, w1, w2)
        w_scat = tuple(
            w_cur[k] * tr_s * sig_s[k] / ps_safe for k in range(3)
        )
        pdf_nl = (
            pmf[0] * m_safe * tr_s * p_n[0]
            + pmf[1] * m_safe * tr_s * p_n[1]
            + pmf[2] * m_safe * tr_s * p_n[2]
        )
        pn_safe = jnp.where(pdf_nl == 0.0, 1.0, pdf_nl)
        w_null = tuple(
            w_cur[k] * tr_s * sig_n[k] / pn_safe for k in range(3)
        )

        scat = ~esc & (u_ev < p_s_c)
        a_esc = active & esc
        a_scat = active & scat
        cont = active & ~esc & ~scat
        t_res = jnp.where(a_esc, t1v + np.float32(RAY_EPS), t_res)
        t_res = jnp.where(a_scat, t_new, t_res)
        sstep = jnp.where(a_scat, step, sstep)
        scat_acc = jnp.where(a_scat, 1, scat_acc)
        w_out = []
        for k in range(3):
            w = jnp.where(a_esc, w_esc[k], w_cur[k])
            w = jnp.where(a_scat, w_scat[k], w)
            w_out.append(jnp.where(cont, w_null[k], w))
        act_new = cont.astype(jnp.int32)
        tau = jnp.where(cont, tau_new, tau)
        return (
            step + 1, act_new, tau, w_out[0], w_out[1], w_out[2],
            sig_a[0], sig_a[1], sig_a[2], m_loc, t_res, sstep, scat_acc,
        )

    def cond(state):
        return (state[0] < max_steps) & (jnp.sum(state[1]) > 0)

    init = (
        jnp.int32(0), active0.astype(jnp.int32), zero, one, one, one,
        sa_init[0], sa_init[1], sa_init[2], m_entry,
        t1v + np.float32(RAY_EPS), jnp.zeros_like(t0f, dtype=jnp.int32),
        jnp.zeros_like(t0f, dtype=jnp.int32),
    )
    out = lax.while_loop(cond, body, init)
    (_, act, _, w0, w1, w2, _, _, _, _, t_res, sstep, scat_acc) = out
    # exhausted lanes: weight 0 (bounded-loop policy, media.py)
    alive = act > 0
    w = tuple(jnp.where(alive, 0.0, wc) for wc in (w0, w1, w2))
    return t_res, w, scat_acc, sstep


def _sample_kernel(
    site_ref, ox, oy, oz, dx, dy, dz, t0, t1, tp0, tp1, tp2, key, hmask,
    bricks_ref, ids_ref, sg_ref, t_out, w0_out, w1_out, w2_out, scat_out,
    step_out, *, c, max_steps,
):
    """Fused media._sample_heterogeneous for one (8, 512) tile."""
    t0v, t1v = t0[...], t1[...]
    t_res, w, scat_acc, sstep = track_sample(
        (ox[...], oy[...], oz[...]), (dx[...], dy[...], dz[...]),
        t0v, t1v, (tp0[...], tp1[...], tp2[...]), key[...], site_ref[0],
        hmask[...] > 0, bricks_ref, ids_ref, sg_ref, _payload_coords(), c,
        max_steps,
    )
    t_out[...] = t_res
    w0_out[...] = w[0]
    w1_out[...] = w[1]
    w2_out[...] = w[2]
    scat_out[...] = scat_acc.astype(jnp.float32)
    step_out[...] = sstep.astype(jnp.float32)


def track_transmittance(
    o3, q3, key_v, site, active0, bricks_ref, ids_ref, sg_ref, pcoords, c,
    max_steps,
):
    """In-kernel ratio tracking between point planes ``o3`` -> ``q3``
    (media.segment_transmittance het-branch parity; reference:
    Src/medium.h:360-386). Returns (tr0, tr1, tr2)."""
    dvx = q3[0] - o3[0]
    dvy = q3[1] - o3[1]
    dvz = q3[2] - o3[2]
    dist = jnp.sqrt(dvx * dvx + dvy * dvy + dvz * dvz)
    safe = jnp.where(dist == 0.0, 1.0, dist)
    d3 = (dvx / safe, dvy / safe, dvz / safe)
    zero = jnp.zeros_like(dist)

    seg_t, seg_m, tau_edges = _dda_segments(o3, d3, zero, dist, sg_ref, c)
    tau_total = tau_edges[-1]

    def body(state):
        step, act, tau, tr0, tr1, tr2 = state
        active = act > 0
        u = _u1_at(key_v, site + step)
        tau_new = tau - jnp.log(jnp.maximum(1.0 - u, _TINY))
        esc = tau_new > tau_total
        t_new, m_loc = _tau_to_t(seg_t, seg_m, tau_edges, tau_new)
        p3 = tuple(o3[k] + t_new * d3[k] for k in range(3))
        dens = _density_rows(p3, bricks_ref, ids_ref, pcoords, c) * c["dm"]
        m_safe = jnp.where(m_loc <= 0.0, 1.0, m_loc)
        upd = active & ~esc
        trs = []
        for k, tr in enumerate((tr0, tr1, tr2)):
            sig_n = jnp.maximum(
                m_loc - (c["sigma_a"][k] + c["sigma_s"][k]) * dens, 0.0
            )
            trs.append(jnp.where(upd, tr * sig_n / m_safe, tr))
        act_new = upd.astype(jnp.int32)
        tau = jnp.where(upd, tau_new, tau)
        return step + 1, act_new, tau, trs[0], trs[1], trs[2]

    def cond(state):
        return (state[0] < max_steps) & (jnp.sum(state[1]) > 0)

    init = (
        jnp.int32(0), active0.astype(jnp.int32), zero,
        jnp.ones_like(dist), jnp.ones_like(dist), jnp.ones_like(dist),
    )
    _, act, _, tr0, tr1, tr2 = lax.while_loop(cond, body, init)
    alive = act > 0                 # exhausted -> 0 (never biased bright)
    return tuple(jnp.where(alive, 0.0, tr) for tr in (tr0, tr1, tr2))


# --------------------------------------------------------------------------
# analytic-gradient replay kernels (round 5)
#
# Two-pass forward-speed gradients of the realized (score-corrected,
# grad-sampling) estimator w.r.t. the density grid: pass A renders img
# (grad-sampling forward), pass B REPLAYS the identical RNG stream and, at
# every tracking event, scatters
#     coeff = sum_c rfac_c * suffix_c * dlog(factor_c)/d dens(x_k)
# into a VMEM (NB_pad, 768) brick-layout accumulator via a one-hot MXU
# matmul (the transpose of the extraction pattern). ``suffix_c`` =
# img_c - (contributions emitted so far): every contribution after event k
# carries event k's per-channel multiplicative factor exactly once, so the
# suffix-times-log-derivative form reproduces autodiff of the realized
# weight products. This requires the grad-sampling estimator (RR off,
# uniform channel pick — media.py ``grad_sampling``): those two decisions'
# probabilities depend on the whole throughput HISTORY, whose per-voxel
# log-derivative cannot be carried forward. Parity-gated against
# jax.grad of the wavefront (differentiable=True, score_terms=True,
# grad_sampling=True) path in tests/test_het_grad_kernel.py.
# --------------------------------------------------------------------------


def _scatter_rows(p3, coeff, ids_ref, acc_ref, pcoords, c):
    """Accumulate ``coeff`` ((8,512) per-lane scalars) times the trilinear
    corner weights of world points ``p3`` into the (NB_pad, 768)
    brick-gradient accumulator: per row, acc += onehot(id match) @
    (w3*coeff) — one HIGHEST-precision MXU matmul (exact f32 accumulation;
    the gradient parity test depends on it). Lanes outside the grid or in
    a dropped (empty) brick contribute nothing (no row matches their id).
    Rows run in a while_loop (shared scoped temporaries — see
    _density_rows loop-shape note)."""
    gx, gy, gz = p3
    inside = (
        (gx >= c["gmin"][0]) & (gx <= c["gmax"][0])
        & (gy >= c["gmin"][1]) & (gy <= c["gmax"][1])
        & (gz >= c["gmin"][2]) & (gz <= c["gmax"][2])
    )

    def axis(p, k):
        x = (p - c["gmin"][k]) / c["ext"][k] * c["res_m1"][k]
        x = jnp.clip(x, 0.0, c["res_m1"][k])
        x0 = jnp.floor(x)
        return x0.astype(jnp.int32), x - x0

    i0x, fx = axis(gx, 0)
    i0y, fy = axis(gy, 1)
    i0z, fz = axis(gz, 2)
    _, nby, nbz = c["nb"]
    bxi, byi, bzi = i0x >> 3, i0y >> 3, i0z >> 3
    bff = (
        (bxi * np.int32(nby) + byi) * np.int32(nbz) + bzi
    ).astype(jnp.float32)
    lx = (i0x - (bxi << 3)).astype(jnp.float32)
    ly = (i0y - (byi << 3)).astype(jnp.float32)
    lz = (i0z - (bzi << 3)).astype(jnp.float32)
    px, py, pz = pcoords
    cf = jnp.where(inside, coeff, 0.0)
    row_iota = lax.broadcasted_iota(jnp.int32, (RAY_ROWS, RAY_LANES), 0)

    def srow(x, r):
        return jnp.sum(
            jnp.where(row_iota == r, x, 0.0), axis=0, keepdims=True
        )

    def row_body(r):
        bf = srow(bff, r)
        oh = (ids_ref[...] == bf).astype(jnp.float32)
        cfr = srow(cf, r)
        lxr = srow(lx, r).astype(jnp.int32)
        lyr = srow(ly, r).astype(jnp.int32)
        lzr = srow(lz, r).astype(jnp.int32)
        fxr, fyr, fzr = srow(fx, r), srow(fy, r), srow(fz, r)
        # arithmetic form (mask-cast * value): i1 masks under jnp.where
        # hit a Mosaic replicated-relayout error inside the row while_loop
        wx = ((px == lxr).astype(jnp.float32) * (1.0 - fxr)
              + (px == lxr + 1).astype(jnp.float32) * fxr)
        wy = ((py == lyr).astype(jnp.float32) * (1.0 - fyr)
              + (py == lyr + 1).astype(jnp.float32) * fyr)
        wz = ((pz == lzr).astype(jnp.float32) * (1.0 - fzr)
              + (pz == lzr + 1).astype(jnp.float32) * fzr)
        contrib = (wx * wy * wz) * cfr                      # (768, 512)
        acc_ref[...] = acc_ref[...] + lax.dot_general(
            oh, contrib,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )                                                   # (NB_pad, 768)
        return r + 1

    lax.while_loop(
        lambda r: r < RAY_ROWS, row_body, jnp.int32(0)
    )


def _dps_channels(dens, m_loc, sig_s, sig_n, denom, c):
    """d p_s_c / d dens at the current point (closed form; clamp-aware to
    match autodiff through ``maximum(sig_n, 0)``): in the unclamped region
    p_s = sigma_s*D*dens / (m - sigma_a*D*dens) so
    dp_s/ddens = D*(sigma_s*q + sigma_a*sig_s)/q^2; where the null channel
    clamps (sig_n == 0, p_s == 1) the derivative is 0."""
    D = c["dm"]
    out = []
    for k in range(3):
        q = denom[k]
        dps = (
            np.float32(c["sigma_s"][k] * D) * q
            + np.float32(c["sigma_a"][k] * D) * sig_s[k]
        ) / (q * q)
        out.append(jnp.where(sig_n[k] > 0.0, dps, 0.0))
    return tuple(out)


def track_sample_grad(
    o3, d3, t0v, t1v, key_v, site, active0, rfac3, suffix3,
    bricks_ref, ids_ref, sg_ref, acc_ref, pcoords, c, max_steps,
):
    """Gradient REPLAY of ``track_sample(chan_uniform=True)``: identical
    draws, branches, and returned (t_res, w, scattered, scat_step), plus a
    per-event density-gradient scatter into ``acc_ref``.

    Per event at point x with picked channel c*, the scattered coefficient
    is sum_c rfac_c * suffix_c * slog_c with
      scatter: slog_c = dlog(sig_s_c/pdf_sc) + dlog ratio(p_s_c*)
      null:    slog_c = dlog(sig_n_c/pdf_nl) + dlog ratio(1 - p_s_c*)
      escape:  0 (majorant-only factors)
    where the ratio terms are media._score_ratio's clipped score
    (no score below p = 1e-5) and every 1/x is guarded by its factor being
    zero (then suffix_c is zero too — the contribution chain died)."""
    t0f = t0v
    t1f = jnp.maximum(t1v, t0f)
    seg_t, seg_m, tau_edges = _dda_segments(o3, d3, t0f, t1f, sg_ref, c)
    tau_total = tau_edges[-1] - np.float32(RAY_EPS) * c["majorant"]
    zero = jnp.zeros_like(t0f)
    one = jnp.ones_like(t0f)
    p_min = np.float32(1e-5)

    def body(state):
        step, act, tau, w0, w1, w2, t_res, sstep, scat_acc = state
        active = act > 0
        offs = site + step * np.int32(_SITES_PER_STEP)
        u_wl = _u1_at(key_v, offs)
        u_dist = _u1_at(key_v, offs + 1)
        u_ev = _u1_at(key_v, offs + 2)
        channel, pmf = _pick_channel(
            jnp.ones_like(w0), jnp.ones_like(w1), jnp.ones_like(w2), u_wl
        )
        dtau = -jnp.log(jnp.maximum(1.0 - u_dist, _TINY))
        tau_new = tau + dtau
        esc = tau_new > tau_total
        tr_esc = jnp.exp(-(tau_total - tau))
        pdf_esc = (pmf[0] + pmf[1] + pmf[2]) * tr_esc
        pe = jnp.where(pdf_esc == 0.0, 1.0, pdf_esc)
        w_esc = tuple(w * tr_esc / pe for w in (w0, w1, w2))

        t_new, m_loc = _tau_to_t(seg_t, seg_m, tau_edges, tau_new)
        m_safe = jnp.where(m_loc <= 0.0, 1.0, m_loc)
        p3 = tuple(o3[k] + t_new * d3[k] for k in range(3))
        dens = _density_rows(
            p3, bricks_ref, ids_ref, pcoords, c, compact=True
        ) * c["dm"]
        sig_s = tuple(c["sigma_s"][k] * dens for k in range(3))
        sig_a = tuple(c["sigma_a"][k] * dens for k in range(3))
        sig_n = tuple(
            jnp.maximum(m_loc - sig_a[k] - sig_s[k], 0.0) for k in range(3)
        )
        denom = tuple(
            jnp.where(sig_s[k] + sig_n[k] == 0.0, 1.0, sig_s[k] + sig_n[k])
            for k in range(3)
        )
        p_s = tuple(sig_s[k] / denom[k] for k in range(3))
        p_n = tuple(sig_n[k] / denom[k] for k in range(3))
        p_s_c = _by_channel(channel, *p_s)

        tr_s = jnp.exp(-dtau)
        pdf_sc = (
            pmf[0] * m_safe * tr_s * p_s[0]
            + pmf[1] * m_safe * tr_s * p_s[1]
            + pmf[2] * m_safe * tr_s * p_s[2]
        )
        ps_safe = jnp.where(pdf_sc == 0.0, 1.0, pdf_sc)
        w_cur = (w0, w1, w2)
        w_scat = tuple(
            w_cur[k] * tr_s * sig_s[k] / ps_safe for k in range(3)
        )
        pdf_nl = (
            pmf[0] * m_safe * tr_s * p_n[0]
            + pmf[1] * m_safe * tr_s * p_n[1]
            + pmf[2] * m_safe * tr_s * p_n[2]
        )
        pn_safe = jnp.where(pdf_nl == 0.0, 1.0, pdf_nl)
        w_null = tuple(
            w_cur[k] * tr_s * sig_n[k] / pn_safe for k in range(3)
        )

        scat = ~esc & (u_ev < p_s_c)
        a_esc = active & esc
        a_scat = active & scat
        cont = active & ~esc & ~scat

        # ---- density-gradient scatter for this event ----
        D = np.float32(c["dm"])
        dps = _dps_channels(dens, m_loc, sig_s, sig_n, denom, c)
        dpdf_sc = (
            pmf[0] * m_safe * tr_s * dps[0]
            + pmf[1] * m_safe * tr_s * dps[1]
            + pmf[2] * m_safe * tr_s * dps[2]
        )
        dps_c = _by_channel(channel, *dps)
        # clipped score terms (media._score_ratio, p_min = 1e-5)
        score_scat = jnp.where(p_s_c > p_min, dps_c / jnp.where(
            p_s_c == 0.0, 1.0, p_s_c), 0.0)
        one_m = 1.0 - p_s_c
        score_null = jnp.where(one_m > p_min, -dps_c / jnp.where(
            one_m == 0.0, 1.0, one_m), 0.0)
        coeff = zero
        for k in range(3):
            # scatter branch: dlog sig_s_k - dlog pdf_sc (+ shared score)
            dlog_s = jnp.where(
                sig_s[k] > 0.0,
                np.float32(c["sigma_s"][k]) * D / jnp.where(
                    sig_s[k] == 0.0, 1.0, sig_s[k]),
                0.0,
            ) - dpdf_sc / ps_safe + score_scat
            # null branch: dlog sig_n_k - dlog pdf_nl (+ shared score)
            st_k = np.float32((c["sigma_a"][k] + c["sigma_s"][k])) * D
            dlog_n = jnp.where(
                sig_n[k] > 0.0,
                -st_k / jnp.where(sig_n[k] == 0.0, 1.0, sig_n[k]),
                0.0,
            ) + dpdf_sc / pn_safe + score_null
            slog = jnp.where(a_scat, dlog_s, jnp.where(cont, dlog_n, 0.0))
            coeff = coeff + rfac3[k] * suffix3[k] * slog
        coeff = jnp.where(a_scat | cont, coeff, 0.0)
        _scatter_rows(p3, coeff, ids_ref, acc_ref, pcoords, c)

        t_res = jnp.where(a_esc, t1v + np.float32(RAY_EPS), t_res)
        t_res = jnp.where(a_scat, t_new, t_res)
        sstep = jnp.where(a_scat, step, sstep)
        scat_acc = jnp.where(a_scat, 1, scat_acc)
        w_out = []
        for k in range(3):
            w = jnp.where(a_esc, w_esc[k], w_cur[k])
            w = jnp.where(a_scat, w_scat[k], w)
            w_out.append(jnp.where(cont, w_null[k], w))
        act_new = cont.astype(jnp.int32)
        tau = jnp.where(cont, tau_new, tau)
        return (step + 1, act_new, tau, w_out[0], w_out[1], w_out[2],
                t_res, sstep, scat_acc)

    def cond(state):
        return (state[0] < max_steps) & (jnp.sum(state[1]) > 0)

    init = (
        jnp.int32(0), active0.astype(jnp.int32), zero, one, one, one,
        t1v + np.float32(RAY_EPS), jnp.zeros_like(t0f, dtype=jnp.int32),
        jnp.zeros_like(t0f, dtype=jnp.int32),
    )
    out = lax.while_loop(cond, body, init)
    _, act, _, w0, w1, w2, t_res, sstep, scat_acc = out
    alive = act > 0
    w = tuple(jnp.where(alive, 0.0, wc) for wc in (w0, w1, w2))
    return t_res, w, scat_acc, sstep


def track_transmittance_grad(
    o3, q3, key_v, site, active0, pend3, bricks_ref, ids_ref, sg_ref,
    acc_ref, pcoords, c, max_steps,
):
    """Density-gradient replay of ``track_transmittance``: walks the SAME
    candidate sequence (the caller already holds tr from the forward call)
    and scatters sum_c pend_c * dlog(sig_n_c)/d dens per event, where
    ``pend3`` = rfac_c * (the full NEE contribution in channel c,
    INCLUDING tr_c). Ratio tracking samples from the majorant only, so
    there are no score terms (matches the XLA autodiff path)."""
    dvx = q3[0] - o3[0]
    dvy = q3[1] - o3[1]
    dvz = q3[2] - o3[2]
    dist = jnp.sqrt(dvx * dvx + dvy * dvy + dvz * dvz)
    safe = jnp.where(dist == 0.0, 1.0, dist)
    d3 = (dvx / safe, dvy / safe, dvz / safe)
    zero = jnp.zeros_like(dist)
    seg_t, seg_m, tau_edges = _dda_segments(o3, d3, zero, dist, sg_ref, c)
    tau_total = tau_edges[-1]
    D = np.float32(c["dm"])

    def body(state):
        step, act, tau = state
        active = act > 0
        u = _u1_at(key_v, site + step)
        tau_new = tau - jnp.log(jnp.maximum(1.0 - u, _TINY))
        esc = tau_new > tau_total
        t_new, m_loc = _tau_to_t(seg_t, seg_m, tau_edges, tau_new)
        p3 = tuple(o3[k] + t_new * d3[k] for k in range(3))
        dens = _density_rows(
            p3, bricks_ref, ids_ref, pcoords, c, compact=True
        ) * c["dm"]
        upd = active & ~esc
        coeff = zero
        for k in range(3):
            sig_n = m_loc - np.float32(
                c["sigma_a"][k] + c["sigma_s"][k]
            ) * dens
            st_k = np.float32((c["sigma_a"][k] + c["sigma_s"][k])) * D
            # factor_k = max(sig_n, 0)/m: dlog = -(sa+ss)*dm/sig_n when
            # > 0 (the scatter variable is the RAW trilinear grid value);
            # when clamped the factor (and thus pend through tr) is zero
            dlog = jnp.where(
                sig_n > 0.0, -st_k / jnp.where(sig_n == 0.0, 1.0, sig_n),
                0.0,
            )
            coeff = coeff + pend3[k] * dlog
        coeff = jnp.where(upd, coeff, 0.0)
        _scatter_rows(p3, coeff, ids_ref, acc_ref, pcoords, c)
        act_new = upd.astype(jnp.int32)
        tau = jnp.where(upd, tau_new, tau)
        return step + 1, act_new, tau

    def cond(state):
        return (state[0] < max_steps) & (jnp.sum(state[1]) > 0)

    lax.while_loop(
        cond, body, (jnp.int32(0), active0.astype(jnp.int32), zero)
    )


def _transmittance_kernel(
    site_ref, p1x, p1y, p1z, p2x, p2y, p2z, key, hmask, bricks_ref,
    ids_ref, sg_ref, t0_out, t1_out, t2_out, *, c, max_steps,
):
    """Fused ratio-tracking transmittance (media.segment_transmittance het
    branch; reference: Src/medium.h:360-386)."""
    tr = track_transmittance(
        (p1x[...], p1y[...], p1z[...]), (p2x[...], p2y[...], p2z[...]),
        key[...], site_ref[0], hmask[...] > 0, bricks_ref, ids_ref,
        sg_ref, _payload_coords(), c, max_steps,
    )
    t0_out[...] = tr[0]
    t1_out[...] = tr[1]
    t2_out[...] = tr[2]


# --------------------------------------------------------------------------
# host wrappers
# --------------------------------------------------------------------------


def _pallas_het_call(kernel, n_in, n_out, pack, interpret):
    bricks, ids, sg = pack["bricks"], pack["ids"], pack["sg"]
    io = pl.BlockSpec(
        (RAY_ROWS, RAY_LANES), lambda i, s: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i, s: (0, 0), memory_space=pltpu.VMEM
    )

    def call(planes, site, n_tiles):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[io] * n_in + [full(bricks.shape), full(ids.shape),
                                    full(sg.shape)],
            out_specs=[io] * n_out,
        )
        shp = (n_tiles * RAY_ROWS, RAY_LANES)
        out_shape = [jax.ShapeDtypeStruct(shp, jnp.float32)] * n_out
        return pl.pallas_call(
            kernel, grid_spec=gs, out_shape=out_shape, interpret=interpret,
        )(site, *planes, bricks, ids, sg)

    return call


def _to_planes(n, cols):
    """(N,) columns -> padded (n_tiles*8, 512) planes + tile count."""
    n_pad = ((n + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    n_tiles = n_pad // RAY_TILE

    def lane(x):
        if n_pad != n:
            x = jnp.pad(x, (0, n_pad - n))
        return x.reshape(n_tiles * RAY_ROWS, RAY_LANES)

    return [lane(x) for x in cols], n_tiles


def _is_tpu():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def try_make_fused_het_sampler(
    tables, max_steps, interpret=False, force=False,
):
    """Fused ``het_fn`` for media.sample_medium (same contract as
    ``_sample_heterogeneous``: (rays, t0, t1, tp, keys, site, het_mask) ->
    MediumSample), or None if the scene/platform is ineligible."""
    if not force and not _is_tpu():
        return None
    pack = het_pack(tables)
    if pack is None:
        return None
    c = dict(pack["consts"])
    c["nb"] = pack["nb"]
    kernel = partial(_sample_kernel, c=c, max_steps=int(max_steps))
    call = _pallas_het_call(kernel, 13, 6, pack, interpret)

    from .media import MediumSample, SITES_PER_STEP
    from .sampling import uniform2
    from .sampling.warps import hg_sample_direction

    g_hg = float(np.asarray(tables.med_g)[pack["row"]])

    def het_fn(rays, t0, t1, path_throughput, keys, site, het_mask):
        n = rays.o.shape[0]
        t0s = jnp.where(het_mask, t0, 0.0)
        t1s = jnp.where(het_mask, t1, 0.0)
        planes, n_tiles = _to_planes(n, [
            rays.o[:, 0], rays.o[:, 1], rays.o[:, 2],
            rays.d[:, 0], rays.d[:, 1], rays.d[:, 2],
            t0s, t1s,
            path_throughput[:, 0], path_throughput[:, 1],
            path_throughput[:, 2],
        ])
        kplane, _ = _to_planes(n, [keys.astype(jnp.uint32)])
        mplane, _ = _to_planes(n, [het_mask.astype(jnp.int32)])
        site_arr = jnp.asarray(site, jnp.int32).reshape(1)
        t_res, w0, w1, w2, scat, sstep = call(
            planes + kplane + mplane, site_arr, n_tiles
        )

        def flat(x):
            return x.reshape(-1)[:n]

        t_res = flat(t_res)
        weight = jnp.stack([flat(w0), flat(w1), flat(w2)], axis=-1)
        scattered = flat(scat) > 0.0
        scat_step = flat(sstep).astype(jnp.int32)
        # hoisted phase draw at the recorded scatter step's site (media.py)
        u_ph = uniform2(keys, site + scat_step * SITES_PER_STEP + 3)
        new_dir, _ = hg_sample_direction(
            rays.d, u_ph[:, 0], u_ph[:, 1], jnp.full((n,), g_hg)
        )
        d = jnp.where(scattered[:, None], new_dir, rays.d)
        # NaN guard (media.py / Src/medium.cpp:83-91)
        weight = jnp.where(
            jnp.isnan(weight).any(axis=-1, keepdims=True), 0.0, weight
        )
        return MediumSample(
            pos=rays.at(t_res), dir=d, weight=weight, scattered=scattered
        )

    return het_fn


def try_make_fused_het_transmittance(
    tables, max_steps, interpret=False, force=False,
):
    """Fused ``het_tr_fn`` for media.segment_transmittance: (p1, p2, keys,
    site, het_mask) -> (N, 3) ratio-tracked transmittance, or None."""
    if not force and not _is_tpu():
        return None
    pack = het_pack(tables)
    if pack is None:
        return None
    c = dict(pack["consts"])
    c["nb"] = pack["nb"]
    kernel = partial(_transmittance_kernel, c=c, max_steps=int(max_steps))
    call = _pallas_het_call(kernel, 8, 3, pack, interpret)

    def het_tr_fn(p1, p2, keys, site, het_mask):
        n = p1.shape[0]
        p2s = jnp.where(het_mask[:, None], p2, p1)
        planes, n_tiles = _to_planes(n, [
            p1[:, 0], p1[:, 1], p1[:, 2], p2s[:, 0], p2s[:, 1], p2s[:, 2],
        ])
        kplane, _ = _to_planes(n, [keys.astype(jnp.uint32)])
        mplane, _ = _to_planes(n, [het_mask.astype(jnp.int32)])
        site_arr = jnp.asarray(site, jnp.int32).reshape(1)
        tr0, tr1, tr2 = call(planes + kplane + mplane, site_arr, n_tiles)

        def flat(x):
            return x.reshape(-1)[:n]

        return jnp.stack([flat(tr0), flat(tr1), flat(tr2)], axis=-1)

    return het_tr_fn
