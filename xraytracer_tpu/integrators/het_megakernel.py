"""Fused single-kernel HETEROGENEOUS volume path tracer for TPU.

Completes the fused-path family: surface GI (megakernel.py), homogeneous
volumes (vol_megakernel.py), and now the reference's flagship cloud
workloads — ``volume.cpp`` / ``nee.cpp`` (reference:
Src/examples/volume.cpp, nee.cpp: a HeterogeneousMedium grid box plus
emissive sphere lights, no triangles, Src/integrator.h:401-636).

The wavefront path already runs the delta-tracking sample and the NEE
ratio-tracking transmittance as fused kernels (media_pallas.py), but each
of the ``2*max_depth + 2`` iterations still pays several separate Pallas
dispatches plus an XLA glue epilogue per 65k-lane wavefront. Here the
ENTIRE path — sphere-light/box intersection, Russian roulette, one-sided
emitter Le, weighted delta tracking, Henyey-Greenstein scattering, and
sphere-light cone NEE with in-kernel ratio-tracked transmittance — runs
inside ONE Pallas kernel per (8, 512)-ray tile, with the brick density
table and supergrid resident in VMEM across all iterations and a
while_loop that exits as soon as every lane in the tile has died.

Draw-for-draw parity with integrators/volume.py (same RNG sites: RR=0,
medium=16+step*4, phase hoisted to 16+scat_step*4+3, NEE pick/light/tr at
the ``_nee_site_layout`` offsets), verified by the interpret-mode test on
a bf16-exact grid (the kernels sample the bf16-rounded field, PARITY.md).

Eligibility (``_eligible_het``): no triangles, exactly one box carrying
the single heterogeneous medium, every sphere purely emissive (no
material/medium — so shadow rays are never surface-blocked, matching the
wavefront's ``mtype >= 0`` test compiling to False), <= 16 sphere area
lights (one uniform-picked NEE pass per bounce regardless of count),
grids within media_pallas.het_pack's VMEM bound.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import INF, PI, RAY_EPS
from ..media_pallas import (
    _payload_coords,
    _u1_at,
    _u2_at,
    het_pack,
    track_sample,
    track_transmittance,
)
from ..sampling import SITES_PER_BOUNCE
from ..scene.tables import AL_SPHERE, MED_HETEROGENEOUS
from .megakernel import RAY_LANES, RAY_ROWS, RAY_TILE, make_spp_render

_INF = np.float32(INF)
_SITE_RR = 0
_SITE_MEDIUM = 16
_SITES_PER_STEP = 4
_TWO_PI = np.float32(2.0 * PI)
_INV_4PI = np.float32(1.0 / (4.0 * PI))
_ACC_COLS = 768                 # media_pallas._PAYLOAD_PAD (grad accum)


def _f3(v):
    return tuple(np.float32(x) for x in np.asarray(v).reshape(-1)[:3])


def _duff_onb(nx, ny, nz):
    """Branchless ONB about a unit normal, per-component
    (math.vec.orthonormal_basis parity)."""
    sgn = jnp.copysign(jnp.ones_like(nz), nz)
    a = -1.0 / (sgn + nz)
    cc = nx * ny * a
    tx, ty, tz = 1.0 + sgn * nx * nx * a, sgn * cc, -sgn * nx
    bx, by, bz = cc, sgn + ny * ny * a, -ny
    return (tx, ty, tz), (bx, by, bz)


def _intersect(o3, d3, spheres, box):
    """Nearest hit among baked emissive spheres + the medium box.

    Replicates geometry.intersect: sphere q-form quadratic
    (intersect_spheres), box slab with entry clamped to 0
    (intersect_boxes), and the argmin-first-min combine (sphere beats box
    on exact ties since argmin over [tri, sphere, box] picks the first).
    Returns dict(hit, box_win, t, t1, lrow, ns*)."""
    ox, oy, oz = o3
    dx, dy, dz = d3
    shp = ox.shape
    t_sph = jnp.full(shp, _INF)
    lrow = jnp.full(shp, -1.0)
    scx = jnp.zeros(shp)
    scy = jnp.zeros(shp)
    scz = jnp.zeros(shp)
    a = dx * dx + dy * dy + dz * dz
    for sp in spheres:
        cx, cy, cz = sp["center"]
        ex, ey, ez = ox - cx, oy - cy, oz - cz
        b = 2.0 * (dx * ex + dy * ey + dz * ez)
        cq = ex * ex + ey * ey + ez * ez - np.float32(sp["radius"] ** 2)
        disc = b * b - 4.0 * a * cq
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        q = jnp.where(b > 0.0, -0.5 * (b + sq), -0.5 * (b - sq))
        q_safe = jnp.where(q == 0.0, 1.0, q)
        x0 = q / a
        x1 = jnp.where(q == 0.0, x0, cq / q_safe)
        t0 = jnp.minimum(x0, x1)
        t1 = jnp.maximum(x0, x1)
        t = jnp.where(t0 > 0.0, t0, t1)
        ok = (disc >= 0.0) & (t > 0.0)
        better = ok & (t < t_sph)           # strict: first sphere wins ties
        t_sph = jnp.where(better, t, t_sph)
        lrow = jnp.where(better, np.float32(sp["lrow"]), lrow)
        scx = jnp.where(better, np.float32(cx), scx)
        scy = jnp.where(better, np.float32(cy), scy)
        scz = jnp.where(better, np.float32(cz), scz)

    # medium box slab (intersect_boxes: entry clamped to 0 when inside)
    lo, hi = box["lo"], box["hi"]
    eps = np.float32(1e-12)

    def slab(o, d, lo_c, hi_c):
        d_safe = jnp.where(jnp.abs(d) < eps, eps, d)
        iv = 1.0 / d_safe
        ta = (lo_c - o) * iv
        tb = (hi_c - o) * iv
        return jnp.minimum(ta, tb), jnp.maximum(ta, tb)

    ax_, bx_ = slab(ox, dx, lo[0], hi[0])
    ay_, by_ = slab(oy, dy, lo[1], hi[1])
    az_, bz_ = slab(oz, dz, lo[2], hi[2])
    b0 = jnp.maximum(jnp.maximum(ax_, ay_), az_)
    b1 = jnp.minimum(jnp.minimum(bx_, by_), bz_)
    bok = (b0 <= b1) & (b1 > 0.0)
    b0 = jnp.maximum(b0, 0.0)
    box_win = bok & (b0 < t_sph)            # strict: sphere wins exact ties

    t = jnp.where(box_win, b0, t_sph)
    hit = box_win | (t_sph < _INF)
    # sphere shading normal (intersect_scene: normalize(pos - center))
    px, py, pz = ox + t * dx, oy + t * dy, oz + t * dz
    nx, ny, nz = px - scx, py - scy, pz - scz
    nl = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    nl = jnp.where(nl == 0.0, 1.0, nl)
    return dict(
        hit=hit, box_win=box_win, t=t, t1=jnp.where(box_win, b1, _INF),
        lrow=jnp.where(box_win, -1.0, lrow),
        nsx=nx / nl, nsy=ny / nl, nsz=nz / nl,
    )


def _cone_sample(mp3, light, lu, lv):
    """PBRT-style cone sample of a baked sphere light about the shading
    point (lights.sample_area_light default strategy, reference:
    Src/light.h:160-198). Returns (wi3, t_max, pdf, front)."""
    cx, cy, cz = light["center"]
    r = np.float32(light["radius"])
    dzx = cx - mp3[0]
    dzy = cy - mp3[1]
    dzz = cz - mp3[2]
    len2 = dzx * dzx + dzy * dzy + dzz * dzz
    ln = jnp.sqrt(len2)
    safe_len = jnp.where(ln == 0.0, 1.0, ln)
    # frame axis points from the CENTER toward the shading point
    ux, uy, uz = -dzx / safe_len, -dzy / safe_len, -dzz / safe_len
    (txx, txy, txz), (bxx, bxy, bxz) = _duff_onb(ux, uy, uz)
    safe_len2 = jnp.where(len2 == 0.0, 1.0, len2)
    sin_tm2 = r * r / safe_len2
    sin_tm = jnp.sqrt(sin_tm2)
    cos_tm = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_tm2))
    cos_t = 1.0 + (cos_tm - 1.0) * lu
    sin_t2 = 1.0 - cos_t * cos_t
    safe_sin_tm = jnp.where(sin_tm == 0.0, 1.0, sin_tm)
    safe_sin_tm2 = jnp.where(sin_tm2 == 0.0, 1.0, sin_tm2)
    cos_a = sin_t2 / safe_sin_tm + cos_t * jnp.sqrt(
        jnp.maximum(0.0, 1.0 - sin_t2 / safe_sin_tm2)
    )
    sin_a = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_a * cos_a))
    phi = _TWO_PI * lv
    cp, sp_ = jnp.cos(phi), jnp.sin(phi)
    nsx = cp * sin_a * txx + sp_ * sin_a * bxx + cos_a * ux
    nsy = cp * sin_a * txy + sp_ * sin_a * bxy + cos_a * uy
    nsz = cp * sin_a * txz + sp_ * sin_a * bxz + cos_a * uz
    px = cx + nsx * r
    py = cy + nsy * r
    pz = cz + nsz * r
    dx_ = px - mp3[0]
    dy_ = py - mp3[1]
    dz_ = pz - mp3[2]
    t_max = jnp.sqrt(dx_ * dx_ + dy_ * dy_ + dz_ * dz_)
    front = (dx_ * nsx + dy_ * nsy + dz_ * nsz) < 0.0
    pdf = 1.0 / (_TWO_PI * jnp.maximum(1.0 - cos_tm, np.float32(1e-12)))
    ts = jnp.where(t_max == 0.0, 1.0, t_max)
    return (dx_ / ts, dy_ / ts, dz_ / ts), t_max, pdf, front


def _make_het_iteration(
    bricks_ref, ids_ref, sg_ref, *,
    cmed, spheres, box, lights, max_depth, nee, max_steps,
    site_pick, site_light, site_tr, g_hg, grad_sampling=False,
):
    """One path-loop iteration over (8, 512) planes, shared by the
    whole-path wavefront body (``_het_trace_body``, scalar ``it``) and the
    persistent-lane spp kernel (per-lane ``it`` plane — RNG sites are pure
    functions of (key, it), so a plane `it` gives every lane its own path
    step while the tile executes one shared body).

    Carry: (it, key, rr_, rg_, rb_, trr, trg, trb, ox, oy, oz, dx, dy, dz,
    depth, act). Inactive lanes (act == 0) flow through unchanged — every
    state update is masked on ``active``."""
    pcoords = _payload_coords()

    def hg_cos(u):
        if abs(float(g_hg)) < 1e-3:
            return 2.0 * u - 1.0
        sqr = (1.0 - g_hg * g_hg) / (1.0 - g_hg + 2.0 * g_hg * u)
        return (1.0 + g_hg * g_hg - sqr * sqr) / (2.0 * g_hg)

    def hg_phase_val(cos_t):
        denom = 1.0 + g_hg * g_hg - 2.0 * g_hg * cos_t
        return _INV_4PI * (1.0 - g_hg * g_hg) / (denom * jnp.sqrt(denom))

    def iteration(carry):
        (it, key, rr_, rg_, rb_, trr, trg, trb, ox, oy, oz, dx, dy, dz,
         depth, act) = carry
        shp = ox.shape
        zero = jnp.zeros(shp, jnp.float32)
        o3 = (ox, oy, oz)
        d3 = (dx, dy, dz)
        site = it * np.int32(SITES_PER_BOUNCE)
        active = (act > 0) & (depth < max_depth)
        h = _intersect(o3, d3, spheres, box)
        active = active & h["hit"]

        # Russian roulette, depth > 0 (Src/integrator.h:507-514)
        rr_prob = jnp.minimum((trr + trg + trb) * np.float32(1.0 / 3.0), 1.0)
        u_rr = _u1_at(key, site + np.int32(_SITE_RR))
        do_rr = active & (depth > 0)
        if grad_sampling:
            # gradient-friendly estimator (media.py ``grad_sampling``):
            # RR off + uniform channel pick — unbiased, and the two
            # history-dependent score terms vanish
            do_rr = do_rr & False
        active = active & ~(do_rr & (u_rr >= rr_prob))
        boost = 1.0 / jnp.maximum(rr_prob, np.float32(1e-12))
        keep = do_rr & active
        trr = jnp.where(keep, trr * boost, trr)
        trg = jnp.where(keep, trg * boost, trg)
        trb = jnp.where(keep, trb * boost, trb)

        # one-sided emitter Le (area_light_le; depth 0 only under NEE)
        lrow = h["lrow"]
        is_emitter = active & (lrow >= 0.0)
        on = -(dx * h["nsx"] + dy * h["nsy"] + dz * h["nsz"]) > 0.0
        ler, leg, leb = zero, zero, zero
        for i, L in enumerate(lights):
            sel = (lrow == np.float32(i)) & on
            ler = jnp.where(sel, np.float32(L["le"][0]), ler)
            leg = jnp.where(sel, np.float32(L["le"][1]), leg)
            leb = jnp.where(sel, np.float32(L["le"][2]), leb)
        add_le = is_emitter & (depth == 0) if nee else is_emitter
        rr_ = rr_ + jnp.where(add_le, trr * ler, 0.0)
        rg_ = rg_ + jnp.where(add_le, trg * leg, 0.0)
        rb_ = rb_ + jnp.where(add_le, trb * leb, 0.0)
        active = active & ~is_emitter

        has_med = active & h["box_win"]

        # ---- weighted delta tracking (media_pallas.track_sample) --------
        t0v = jnp.where(has_med, h["t"], 0.0)
        t1v = jnp.where(has_med, h["t1"], 0.0)

        def _do_track(_):
            return track_sample(
                o3, d3, t0v, t1v, (trr, trg, trb), key,
                site + np.int32(_SITE_MEDIUM), has_med, bricks_ref,
                ids_ref, sg_ref, pcoords, cmed, max_steps,
                chan_uniform=grad_sampling,
            )

        def _skip_track(_):
            # exactly track_sample's inactive-lane outputs
            return (
                t1v + np.float32(RAY_EPS),
                (jnp.ones(shp), jnp.ones(shp), jnp.ones(shp)),
                jnp.zeros(shp, jnp.int32), jnp.zeros(shp, jnp.int32),
            )

        # tile-level gate: when no lane of the tile is in the medium this
        # pass (sky tiles, persistent-loop tails), skip the whole tracking
        # call INCLUDING its majorant DDA and entry density lookup — the
        # inner while_loop alone exits early but only after paying those
        t_res, w, scat_acc, sstep = lax.cond(
            jnp.any(has_med), _do_track, _skip_track, 0
        )
        # NaN guard (media.sample_medium wrapper / Src/medium.cpp:83-91)
        bad = jnp.isnan(w[0]) | jnp.isnan(w[1]) | jnp.isnan(w[2])
        w = tuple(jnp.where(bad, 0.0, wc) for wc in w)
        scattered = has_med & (scat_acc > 0)

        # hoisted phase draw (media.py: site + 16 + scat_step*4 + 3)
        u_p1, u_p2 = _u2_at(
            key,
            site + np.int32(_SITE_MEDIUM)
            + sstep * np.int32(_SITES_PER_STEP) + np.int32(3),
        )
        cos_t = hg_cos(u_p1)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        phi = _TWO_PI * u_p2
        lx = jnp.cos(phi) * sin_t
        lz = jnp.sin(phi) * sin_t
        (t0x, t0y, t0z), (b0x, b0y, b0z) = _duff_onb(dx, dy, dz)
        ndx = lx * t0x + cos_t * dx + lz * b0x
        ndy = lx * t0y + cos_t * dy + lz * b0y
        ndz = lx * t0z + cos_t * dz + lz * b0z

        mpx = ox + t_res * dx
        mpy = oy + t_res * dy
        mpz = oz + t_res * dz

        # ---- NEE at the scatter vertex (Src/integrator.h:538-631) -------
        # tile-level gate: every contribution below is masked on
        # ``scattered``, so when no lane scattered the whole block (cone
        # sample, shadow intersect, transmittance DDA + tracking) adds
        # exactly zero — skip it
        if nee and lights:
            def _do_nee(_):
                return _nee_block()

            def _skip_nee(_):
                return rr_, rg_, rb_

            def _nee_block():
                n_l = len(lights)
                u_pick = _u1_at(key, site + np.int32(site_pick))
                lidx = jnp.minimum(
                    (u_pick * np.float32(n_l)).astype(jnp.int32), n_l - 1
                )
                lu, lv = _u2_at(key, site + np.int32(site_light))
                mp3 = (mpx, mpy, mpz)
                wix = jnp.zeros(shp)
                wiy = jnp.zeros(shp)
                wiz = jnp.zeros(shp)
                pdf = jnp.zeros(shp)
                ler2, leg2, leb2 = zero, zero, zero
                for i, L in enumerate(lights):
                    wi3, _tm, pdf_i, front = _cone_sample(mp3, L, lu, lv)
                    sel = lidx == i
                    wix = jnp.where(sel, wi3[0], wix)
                    wiy = jnp.where(sel, wi3[1], wiy)
                    wiz = jnp.where(sel, wi3[2], wiz)
                    pdf = jnp.where(sel, pdf_i * np.float32(1.0 / n_l), pdf)
                    fr = sel & front
                    ler2 = jnp.where(fr, np.float32(L["le"][0]), ler2)
                    leg2 = jnp.where(fr, np.float32(L["le"][1]), leg2)
                    leb2 = jnp.where(fr, np.float32(L["le"][2]), leb2)
                ok_ = scattered & (pdf > 0.0)
                # isVisible (Src/integrator.h:604-631): nearest hit from
                # the scatter point; all spheres here are emitters without
                # materials, so a surface block is statically impossible —
                # only the medium box multiplies its ratio-tracked
                # transmittance
                sh = _intersect(mp3, (wix, wiy, wiz), spheres, box)
                s_med = ok_ & sh["box_win"]
                p1 = tuple(mp3[k] + sh["t"] * wv
                           for k, wv in enumerate((wix, wiy, wiz)))
                p2 = tuple(
                    jnp.where(s_med, mp3[k] + sh["t1"] * wv, p1[k])
                    for k, wv in enumerate((wix, wiy, wiz))
                )
                tr = track_transmittance(
                    p1, p2, key, site + np.int32(site_tr), s_med,
                    bricks_ref, ids_ref, sg_ref, pcoords, cmed, max_steps,
                )
                cos_sc = wix * dx + wiy * dy + wiz * dz
                f = hg_phase_val(cos_sc)
                pdfs = jnp.where(pdf == 0.0, 1.0, pdf)
                coef = jnp.where(ok_, f / pdfs, 0.0)
                return (
                    rr_ + trr * w[0] * tr[0] * ler2 * coef,
                    rg_ + trg * w[1] * tr[1] * leg2 * coef,
                    rb_ + trb * w[2] * tr[2] * leb2 * coef,
                )

            rr_, rg_, rb_ = lax.cond(
                jnp.any(scattered), _do_nee, _skip_nee, 0
            )

        # ---- advance (Src/integrator.h:456-467) -------------------------
        ox = jnp.where(has_med, mpx, ox)
        oy = jnp.where(has_med, mpy, oy)
        oz = jnp.where(has_med, mpz, oz)
        dx = jnp.where(scattered, ndx, dx)
        dy = jnp.where(scattered, ndy, dy)
        dz = jnp.where(scattered, ndz, dz)
        trr = jnp.where(has_med, trr * w[0], trr)
        trg = jnp.where(has_med, trg * w[1], trg)
        trb = jnp.where(has_med, trb * w[2], trb)
        depth = depth + scattered.astype(jnp.int32)
        active = active & has_med & ((trr > 0.0) | (trg > 0.0) | (trb > 0.0))
        return (it + 1, key, rr_, rg_, rb_, trr, trg, trb, ox, oy, oz,
                dx, dy, dz, depth, active.astype(jnp.int32))

    return iteration


def _het_trace_body(
    ox, oy, oz, dx, dy, dz, key, bricks_ref, ids_ref, sg_ref, *,
    cmed, spheres, box, lights, n_iterations, max_depth, nee, max_steps,
    site_pick, site_light, site_tr, g_hg, grad_sampling=False,
):
    """Whole heterogeneous volume path for one (8, 512) tile
    (integrators/volume.py iteration semantics, line for line)."""
    shp = ox.shape
    zero = jnp.zeros(shp, jnp.float32)
    iteration = _make_het_iteration(
        bricks_ref, ids_ref, sg_ref, cmed=cmed, spheres=spheres, box=box,
        lights=lights, max_depth=max_depth, nee=nee, max_steps=max_steps,
        site_pick=site_pick, site_light=site_light, site_tr=site_tr,
        g_hg=g_hg, grad_sampling=grad_sampling,
    )
    init = (
        jnp.int32(0), key, zero, zero, zero,
        jnp.ones(shp), jnp.ones(shp), jnp.ones(shp),
        ox, oy, oz, dx, dy, dz,
        jnp.zeros(shp, jnp.int32), jnp.ones(shp, jnp.int32),
    )
    out = lax.while_loop(
        lambda c: (c[0] < n_iterations) & (jnp.sum(c[15]) > 0),
        iteration, init,
    )
    return out[2], out[3], out[4]


def _eligible_het(scene, statics, max_depth):
    """Concrete-table eligibility (see module docstring), or None."""
    try:
        tri_obj = np.asarray(scene.tri_obj)
        sph_obj = np.asarray(scene.sph_obj)
        box_obj = np.asarray(scene.box_obj)
        al_type = np.asarray(scene.al_type)
        med_type = np.asarray(scene.med_type)
        obj_light = np.asarray(scene.obj_light)
        obj_medium = np.asarray(scene.obj_medium)
        obj_mat = np.asarray(scene.obj_mat)
    except Exception:
        return None
    if max_depth < 1 or max_depth > 128:
        return None
    if (tri_obj >= 0).any():
        return None
    if (med_type >= 0).sum() != 1:
        return None
    boxes = np.flatnonzero(box_obj >= 0)
    if boxes.size != 1:
        return None
    mrow = obj_medium[box_obj[boxes[0]]]
    if mrow < 0 or med_type[mrow] != MED_HETEROGENEOUS:
        return None
    pack = het_pack(scene)
    if pack is None:
        return None
    box = dict(
        lo=_f3(np.asarray(scene.box_min)[boxes[0]]),
        hi=_f3(np.asarray(scene.box_max)[boxes[0]]),
    )
    spheres = []
    for s in np.flatnonzero(sph_obj >= 0):
        obj = sph_obj[s]
        if obj_light[obj] < 0 or obj_mat[obj] >= 0 or obj_medium[obj] >= 0:
            return None                 # non-emissive sphere: fall back
        spheres.append(dict(
            center=_f3(np.asarray(scene.sph_center)[s]),
            radius=float(np.asarray(scene.sph_radius)[s]),
            lrow=int(obj_light[obj]),
        ))
    n_lights = statics["n_area_lights"]
    if n_lights > 16:
        # uniform one-light NEE pays ONE shadow/transmittance pass per
        # bounce regardless of light count (the reference's pick strategy,
        # Src/integrator.h:586-602); the per-light cost is an O(L) select
        # loop plus L sphere intersects per bounce (round-5 verdict item
        # 8: was capped at 2)
        return None
    lights = []
    for i in range(n_lights):
        if al_type[i] != AL_SPHERE:
            return None
        lights.append(dict(
            center=_f3(np.asarray(scene.al_center)[i]),
            radius=float(np.asarray(scene.al_radius)[i]),
            le=_f3(np.asarray(scene.al_le)[i]),
        ))
    return pack, spheres, box, tuple(lights), int(mrow)


def _het_consts(scene, statics, max_depth, nee, max_steps, n_iterations,
                grad_sampling=False):
    from ..media import default_max_steps
    from .volume import _nee_site_layout

    el = _eligible_het(scene, statics, max_depth)
    if el is None:
        return None
    pack, spheres, box, lights, mrow = el
    if max_steps is None:
        max_steps = default_max_steps(scene)
    pick, light_site, tr_site = _nee_site_layout(max_steps)
    if n_iterations is None:
        n_iterations = 2 * max_depth + 2
    cmed = dict(pack["consts"])
    cmed["nb"] = pack["nb"]
    consts = dict(
        cmed=cmed, spheres=tuple(spheres), box=box, lights=tuple(lights),
        n_iterations=np.int32(n_iterations), max_depth=max_depth, nee=nee,
        max_steps=int(max_steps), site_pick=pick, site_light=light_site,
        site_tr=tr_site,
        g_hg=np.float32(np.asarray(scene.med_g)[mrow]),
    )
    if grad_sampling:
        consts["grad_sampling"] = True
    return consts, pack


def try_make_fused_het_path_integrator(
    scene, statics, max_depth, nee=False, max_steps=None, n_iterations=None,
    interpret=False, force=False, grad_sampling=False,
):
    """Build the fused heterogeneous-volume integrate(rays, keys) if the
    scene qualifies, else None. ``integrate`` accepts an optional LIVE
    brick table (``bricks_t``, from media_pallas.pack_bricks_live) so the
    differentiable step can re-render an updated density without
    recompiling; ``grad_sampling`` selects the gradient-friendly estimator
    variant (RR off, uniform channel pick — media.py)."""
    if not force:
        try:
            if jax.devices()[0].platform != "tpu":
                return None
        except Exception:
            return None
    made = _het_consts(scene, statics, max_depth, nee, max_steps,
                       n_iterations, grad_sampling=grad_sampling)
    if made is None:
        return None
    consts, pack = made
    bricks, brick_ids, sg = pack["bricks"], pack["ids"], pack["sg"]

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, key_ref,
               bricks_ref, ids_ref, sg_ref, rr_ref, rg_ref, rb_ref):
        rr, rg, rb = _het_trace_body(
            ox_ref[...], oy_ref[...], oz_ref[...],
            dx_ref[...], dy_ref[...], dz_ref[...], key_ref[...],
            bricks_ref, ids_ref, sg_ref, **consts,
        )
        rr_ref[...] = rr
        rg_ref[...] = rg
        rb_ref[...] = rb

    io_spec = pl.BlockSpec(
        (RAY_ROWS, RAY_LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    table_specs = [
        pl.BlockSpec(bricks.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(brick_ids.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(sg.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]

    def integrate(rays, keys, bricks_t=None):
        n = rays.o.shape[0]
        n_pad = ((n + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
        n_tiles = n_pad // RAY_TILE
        grid_rows = n_tiles * RAY_ROWS

        def lane(x):
            if n_pad != n:
                x = jnp.pad(x, (0, n_pad - n))
            return x.reshape(grid_rows, RAY_LANES)

        comps = [lane(rays.o[:, 0]), lane(rays.o[:, 1]), lane(rays.o[:, 2]),
                 lane(rays.d[:, 0]), lane(rays.d[:, 1]), lane(rays.d[:, 2]),
                 lane(keys.astype(jnp.uint32))]
        out_shape = jax.ShapeDtypeStruct((grid_rows, RAY_LANES), jnp.float32)
        r, g, b = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[io_spec] * 7 + table_specs,
            out_specs=[io_spec] * 3,
            out_shape=[out_shape] * 3,
            interpret=interpret,
        )(*comps, bricks if bricks_t is None else bricks_t, brick_ids, sg)
        return jnp.stack(
            [r.reshape(-1)[:n], g.reshape(-1)[:n], b.reshape(-1)[:n]],
            axis=-1,
        )

    return integrate


def _make_het_grad_iteration(
    bricks_ref, ids_ref, sg_ref, acc_ref, *,
    cmed, spheres, box, lights, max_depth, nee, max_steps,
    site_pick, site_light, site_tr, g_hg,
):
    """Gradient-REPLAY iteration (the analytic volume-gradient pass B; see
    media_pallas's round-5 analytic-gradient section). Mirrors
    ``_make_het_iteration(grad_sampling=True)`` draw for draw, but carries
    per-lane SUFFIX planes (img_c minus contributions emitted so far) and
    rfac planes (the loss residual), scatters per-event density-gradient
    coefficients into ``acc_ref`` via ``track_sample_grad`` /
    ``track_transmittance_grad``, and accumulates per-lane ∂img_c/∂Le_l
    planes (``dE``, surface-megakernel style).

    Carry: (it, key, sfr, sfg, sfb, trr, trg, trb, ox, oy, oz, dx, dy, dz,
    depth, act, dE[3][n_l]...)."""
    from ..media_pallas import track_sample_grad, track_transmittance_grad

    pcoords = _payload_coords()
    n_l = len(lights)

    def hg_phase_val(cos_t):
        denom = 1.0 + g_hg * g_hg - 2.0 * g_hg * cos_t
        return _INV_4PI * (1.0 - g_hg * g_hg) / (denom * jnp.sqrt(denom))

    def hg_cos(u):
        if abs(float(g_hg)) < 1e-3:
            return 2.0 * u - 1.0
        sqr = (1.0 - g_hg * g_hg) / (1.0 - g_hg + 2.0 * g_hg * u)
        return (1.0 + g_hg * g_hg - sqr * sqr) / (2.0 * g_hg)

    def iteration(rf3, carry):
        (it, key, sfr, sfg, sfb, trr, trg, trb, ox, oy, oz, dx, dy, dz,
         depth, act, dE) = carry
        shp = ox.shape
        zero = jnp.zeros(shp, jnp.float32)
        o3 = (ox, oy, oz)
        d3 = (dx, dy, dz)
        site = it * np.int32(SITES_PER_BOUNCE)
        active = (act > 0) & (depth < max_depth)
        h = _intersect(o3, d3, spheres, box)
        active = active & h["hit"]
        # (no Russian roulette: grad-sampling estimator)

        lrow = h["lrow"]
        is_emitter = active & (lrow >= 0.0)
        on = -(dx * h["nsx"] + dy * h["nsy"] + dz * h["nsz"]) > 0.0
        ler, leg, leb = zero, zero, zero
        for i, L in enumerate(lights):
            sel = (lrow == np.float32(i)) & on
            ler = jnp.where(sel, np.float32(L["le"][0]), ler)
            leg = jnp.where(sel, np.float32(L["le"][1]), leg)
            leb = jnp.where(sel, np.float32(L["le"][2]), leb)
        add_le = is_emitter & (depth == 0) if nee else is_emitter
        # emit T*Le: decrement the suffix, accumulate dLe
        t_c = (trr, trg, trb)
        le_c = (ler, leg, leb)
        sfr = sfr - jnp.where(add_le, trr * ler, 0.0)
        sfg = sfg - jnp.where(add_le, trg * leg, 0.0)
        sfb = sfb - jnp.where(add_le, trb * leb, 0.0)
        for ci in range(3):
            for i in range(n_l):
                dE[ci][i] = dE[ci][i] + jnp.where(
                    add_le & (lrow == np.float32(i)) & on, t_c[ci], 0.0
                )
        active = active & ~is_emitter

        has_med = active & h["box_win"]
        t0v = jnp.where(has_med, h["t"], 0.0)
        t1v = jnp.where(has_med, h["t1"], 0.0)
        # suffix AFTER the Le emit — every tracking event's factor
        # multiplies exactly the contributions still pending
        suffix3 = (sfr, sfg, sfb)

        def _do_track(_):
            return track_sample_grad(
                o3, d3, t0v, t1v, key, site + np.int32(_SITE_MEDIUM),
                has_med, rf3, suffix3, bricks_ref, ids_ref, sg_ref,
                acc_ref, pcoords, cmed, max_steps,
            )

        def _skip_track(_):
            return (
                t1v + np.float32(RAY_EPS),
                (jnp.ones(shp), jnp.ones(shp), jnp.ones(shp)),
                jnp.zeros(shp, jnp.int32), jnp.zeros(shp, jnp.int32),
            )

        t_res, w, scat_acc, sstep = lax.cond(
            jnp.any(has_med), _do_track, _skip_track, 0
        )
        bad = jnp.isnan(w[0]) | jnp.isnan(w[1]) | jnp.isnan(w[2])
        w = tuple(jnp.where(bad, 0.0, wc) for wc in w)
        scattered = has_med & (scat_acc > 0)

        u_p1, u_p2 = _u2_at(
            key,
            site + np.int32(_SITE_MEDIUM)
            + sstep * np.int32(_SITES_PER_STEP) + np.int32(3),
        )
        cos_t = hg_cos(u_p1)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        phi = _TWO_PI * u_p2
        lx = jnp.cos(phi) * sin_t
        lz = jnp.sin(phi) * sin_t
        (t0x, t0y, t0z), (b0x, b0y, b0z) = _duff_onb(dx, dy, dz)
        ndx = lx * t0x + cos_t * dx + lz * b0x
        ndy = lx * t0y + cos_t * dy + lz * b0y
        ndz = lx * t0z + cos_t * dz + lz * b0z
        mpx = ox + t_res * dx
        mpy = oy + t_res * dy
        mpz = oz + t_res * dz

        if nee and lights:
            def _do_nee(args):
                sfr, sfg, sfb, dE_flat = args
                n_lf = len(lights)
                u_pick = _u1_at(key, site + np.int32(site_pick))
                lidx = jnp.minimum(
                    (u_pick * np.float32(n_lf)).astype(jnp.int32), n_lf - 1
                )
                lu, lv = _u2_at(key, site + np.int32(site_light))
                mp3 = (mpx, mpy, mpz)
                wix = jnp.zeros(shp)
                wiy = jnp.zeros(shp)
                wiz = jnp.zeros(shp)
                pdf = jnp.zeros(shp)
                ler2, leg2, leb2 = zero, zero, zero
                front_sel = zero                # f32 0/1: Mosaic cannot
                                                # select between i1 planes
                for i, L in enumerate(lights):
                    wi3, _tm, pdf_i, front = _cone_sample(mp3, L, lu, lv)
                    sel = lidx == i
                    wix = jnp.where(sel, wi3[0], wix)
                    wiy = jnp.where(sel, wi3[1], wiy)
                    wiz = jnp.where(sel, wi3[2], wiz)
                    pdf = jnp.where(sel, pdf_i * np.float32(1.0 / n_lf),
                                    pdf)
                    fr = sel & front
                    front_sel = jnp.where(
                        sel, front.astype(jnp.float32), front_sel
                    )
                    ler2 = jnp.where(fr, np.float32(L["le"][0]), ler2)
                    leg2 = jnp.where(fr, np.float32(L["le"][1]), leg2)
                    leb2 = jnp.where(fr, np.float32(L["le"][2]), leb2)
                ok_ = scattered & (pdf > 0.0)
                sh = _intersect(mp3, (wix, wiy, wiz), spheres, box)
                s_med = ok_ & sh["box_win"]
                p1 = tuple(mp3[k] + sh["t"] * wv
                           for k, wv in enumerate((wix, wiy, wiz)))
                p2 = tuple(
                    jnp.where(s_med, mp3[k] + sh["t1"] * wv, p1[k])
                    for k, wv in enumerate((wix, wiy, wiz))
                )
                tr = track_transmittance(
                    p1, p2, key, site + np.int32(site_tr), s_med,
                    bricks_ref, ids_ref, sg_ref, pcoords, cmed, max_steps,
                )
                cos_sc = wix * dx + wiy * dy + wiz * dz
                f = hg_phase_val(cos_sc)
                pdfs = jnp.where(pdf == 0.0, 1.0, pdf)
                coef = jnp.where(ok_, f / pdfs, 0.0)
                le2 = (ler2, leg2, leb2)
                contrib = tuple(
                    t_c[ci] * w[ci] * tr[ci] * le2[ci] * coef
                    for ci in range(3)
                )
                # Le gradient: d contrib_c / d Le_{picked, c} — nonzero
                # only for the picked, front-facing light of valid lanes
                for ci in range(3):
                    for i in range(n_lf):
                        dE_flat[ci][i] = dE_flat[ci][i] + jnp.where(
                            (lidx == i) & (front_sel > 0.0) & ok_,
                            t_c[ci] * w[ci] * tr[ci] * coef,
                            0.0,
                        )
                # transmittance density-gradient replay (pend includes the
                # FULL contribution — each tr factor multiplies it once)
                pend3 = tuple(rf3[ci] * contrib[ci] for ci in range(3))
                track_transmittance_grad(
                    p1, p2, key, site + np.int32(site_tr), s_med, pend3,
                    bricks_ref, ids_ref, sg_ref, acc_ref, pcoords, cmed,
                    max_steps,
                )
                return (sfr - contrib[0], sfg - contrib[1],
                        sfb - contrib[2], dE_flat)

            def _skip_nee(args):
                return args

            sfr, sfg, sfb, dE = lax.cond(
                jnp.any(scattered), _do_nee, _skip_nee, (sfr, sfg, sfb, dE)
            )

        ox = jnp.where(has_med, mpx, ox)
        oy = jnp.where(has_med, mpy, oy)
        oz = jnp.where(has_med, mpz, oz)
        dx = jnp.where(scattered, ndx, dx)
        dy = jnp.where(scattered, ndy, dy)
        dz = jnp.where(scattered, ndz, dz)
        trr = jnp.where(has_med, trr * w[0], trr)
        trg = jnp.where(has_med, trg * w[1], trg)
        trb = jnp.where(has_med, trb * w[2], trb)
        depth = depth + scattered.astype(jnp.int32)
        active = active & has_med & ((trr > 0.0) | (trg > 0.0)
                                     | (trb > 0.0))
        return (it + 1, key, sfr, sfg, sfb, trr, trg, trb, ox, oy, oz,
                dx, dy, dz, depth, active.astype(jnp.int32), dE)

    return iteration


def try_make_fused_het_spp_render(
    scene, statics, camera, width, height, seed, max_depth, nee=False,
    max_steps=None, n_iterations=None, interpret=False, force=False,
    mesh=None, mesh_axis="d", pixel_order="raster", persistent=True,
):
    """Whole-render fused heterogeneous path (megakernel.make_spp_render
    plumbing). ``persistent=True`` (default) merges the spp loop into the
    path loop (persistent lanes, ``_mega_spp_persistent_kernel``):
    draw-for-draw identical images (1-ulp FMA-contraction differences
    only), ~2x+ on the high-divergence nee/volume workloads because a
    dead lane starts its next sample instead of idling out the tile's
    worst lane. ``persistent=False`` keeps the per-sample
    ``_het_trace_body`` loop (A/B tests, debugging)."""
    from ..camera import PinholeCamera

    if not force:
        try:
            if jax.devices()[0].platform != "tpu":
                return None
        except Exception:
            return None
    if not isinstance(camera, PinholeCamera):
        return None
    made = _het_consts(scene, statics, max_depth, nee, max_steps,
                       n_iterations)
    if made is None:
        return None
    consts, pack = made
    bricks, brick_ids, sg = pack["bricks"], pack["ids"], pack["sg"]
    table_specs = [
        pl.BlockSpec(bricks.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(brick_ids.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(sg.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    trace = partial(_het_trace_body, **consts)
    persist = None
    if persistent:
        iter_kwargs = {k: v for k, v in consts.items()
                       if k != "n_iterations"}
        persist = (
            partial(_make_het_iteration, **iter_kwargs),
            int(consts["n_iterations"]),
        )
    return make_spp_render(
        trace, (bricks, brick_ids, sg), table_specs, camera, width, height,
        seed,
        interpret=interpret, mesh=mesh, mesh_axis=mesh_axis,
        pixel_order=pixel_order, persistent=persist,
    )


def try_make_fused_het_value_and_grad(
    tables, statics, camera, width, height, max_depth, nee=True,
    max_steps=None, n_iterations=None, seed=0, interpret=False, force=False,
):
    """Forward-speed ANALYTIC value_and_grad of the L2 image loss for the
    fused heterogeneous volume path — the volume counterpart of
    diff.try_make_fast_value_and_grad (round-4's surface analytic-gradient
    megakernel, extended per the round-4 verdict item 3).

    Two passes at forward cost (no tape, no transpose): pass A renders the
    image with the GRAD-SAMPLING estimator (RR off + uniform channel pick
    — media.py ``grad_sampling``; unbiased, reference-noMIS-style); pass B
    replays the identical RNG stream and scatters per-event density
    log-derivatives times the per-lane contribution SUFFIX into a VMEM
    brick-layout accumulator (media_pallas analytic-gradient section),
    plus per-lane ∂img/∂al_le planes. Gradients exactly match
    jax.grad of the wavefront
    ``make_volume_integrator(differentiable=True, score_terms=True,
    grad_sampling=True)`` path on a bf16-exact grid (parity test:
    tests/test_het_grad_kernel.py) up to f32 summation order.

    Returns ``step(params, pixel_ids, pixel_xy, target, sample_idx) ->
    (loss, grads)``. ``grid_density`` is LIVE (updates re-pack the brick
    payload per call — active set and majorants stay fixed at build, the
    documented score-terms caveat). ``al_le`` gradients are returned when
    requested but evaluated AT THE BUILD-TIME emissions — the volume
    kernels bake Le as constants (unlike the surface grad kernel's live
    VMEM Le table); rebuild to apply an Le update. Returns None when the
    scene is ineligible (het-megakernel eligibility + the gradient
    accumulator VMEM bound)."""
    from ..camera import PinholeCamera
    from ..media_pallas import pack_bricks_live, unbrick_grad
    from ..renderer import CAMERA_SITE
    from ..sampling import path_keys, uniform2

    if not force:
        try:
            if jax.devices()[0].platform != "tpu":
                return None
        except Exception:
            return None
    if not isinstance(camera, PinholeCamera):
        return None
    made = _het_consts(tables, statics, max_depth, nee, max_steps,
                       n_iterations, grad_sampling=True)
    if made is None:
        return None
    consts, pack = made
    bricks, brick_ids, sg = pack["bricks"], pack["ids"], pack["sg"]
    nb_pad = int(bricks.shape[0])
    if nb_pad > 1024:
        # acc (NB_pad, 768) f32 must fit VMEM next to the brick table
        return None
    n_iter = int(consts["n_iterations"])
    lights = consts["lights"]
    n_l = len(lights)
    giter_kwargs = {k: v for k, v in consts.items()
                    if k not in ("n_iterations", "grad_sampling")}

    fwd = try_make_fused_het_path_integrator(
        tables, statics, max_depth, nee=nee, max_steps=max_steps,
        n_iterations=n_iterations, interpret=interpret, force=force,
        grad_sampling=True,
    )
    if fwd is None:
        return None

    io_spec = pl.BlockSpec(
        (RAY_ROWS, RAY_LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    table_specs = [
        pl.BlockSpec(bricks.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(brick_ids.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(sg.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    acc_spec = pl.BlockSpec(
        (nb_pad, _ACC_COLS), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    n_de = 3 * n_l

    def kernel(*refs):
        (ox, oy, oz, dx, dy, dz, key, ir, ig, ib, fr, fg, fb,
         bricks_ref, ids_ref, sg_ref) = refs[:16]
        out_refs = refs[16:]
        acc_ref = out_refs[-1]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            acc_ref[...] = jnp.zeros((nb_pad, _ACC_COLS), jnp.float32)

        iteration = _make_het_grad_iteration(
            bricks_ref, ids_ref, sg_ref, acc_ref, **giter_kwargs
        )
        rf3 = (fr[...], fg[...], fb[...])
        z = ox[...] * 0.0
        iz = z.astype(jnp.int32)
        dE = [[z for _ in range(n_l)] for _ in range(3)]
        init = (
            jnp.int32(0), key[...], ir[...], ig[...], ib[...],
            z + 1.0, z + 1.0, z + 1.0,
            ox[...], oy[...], oz[...], dx[...], dy[...], dz[...],
            iz, iz + 1, dE,
        )
        out = lax.while_loop(
            lambda cr: (cr[0] < np.int32(n_iter))
            & (jnp.sum(cr[15]) > 0),
            lambda cr: iteration(rf3, cr),
            init,
        )
        dE = out[16]
        k = 0
        for ci in range(3):
            for li in range(n_l):
                out_refs[k][...] = dE[ci][li]
                k += 1

    def grad_call(rays, keys, img, rfac, bricks_t):
        n = rays.o.shape[0]
        n_pad = ((n + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
        n_tiles = n_pad // RAY_TILE
        grid_rows = n_tiles * RAY_ROWS

        def lane(x):
            if n_pad != n:
                x = jnp.pad(x, (0, n_pad - n))
            return x.reshape(grid_rows, RAY_LANES)

        comps = [lane(rays.o[:, 0]), lane(rays.o[:, 1]), lane(rays.o[:, 2]),
                 lane(rays.d[:, 0]), lane(rays.d[:, 1]), lane(rays.d[:, 2]),
                 lane(keys.astype(jnp.uint32)),
                 lane(img[:, 0]), lane(img[:, 1]), lane(img[:, 2]),
                 lane(rfac[:, 0]), lane(rfac[:, 1]), lane(rfac[:, 2])]
        plane_shape = jax.ShapeDtypeStruct(
            (grid_rows, RAY_LANES), jnp.float32
        )
        outs = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[io_spec] * 13 + table_specs,
            out_specs=[io_spec] * n_de + [acc_spec],
            out_shape=[plane_shape] * n_de + [
                jax.ShapeDtypeStruct((nb_pad, _ACC_COLS), jnp.float32)
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
            ),
            interpret=interpret,
        )(*comps, bricks_t, brick_ids, sg)
        dE = outs[:n_de]
        acc = outs[-1]

        def flat(x):
            return x.reshape(-1)[:n]

        gle = jnp.stack(
            [flat(o) for o in dE], -1
        ).reshape(n, 3, n_l) if n_de else jnp.zeros((n, 3, 0))
        return gle, acc

    wh = jnp.asarray([float(width), float(height)])
    le_base = np.asarray(tables.al_le)

    def step(params, pixel_ids, pixel_xy, target, sample_idx):
        n = pixel_ids.shape[0]
        grid = params.get("grid_density", tables.grid_density)
        bricks_t = pack_bricks_live(grid, pack)
        keys = path_keys(seed, pixel_ids, sample_idx)
        u = uniform2(keys, CAMERA_SITE)
        rays = camera.sample_rays((pixel_xy + u) / wh)
        img = fwd(rays, keys, bricks_t)
        loss = jnp.mean((img - target) ** 2)
        rfac = 2.0 * (img - target) / (n * 3)
        gle, acc = grad_call(rays, keys, img, rfac, bricks_t)
        grads = {}
        if "grid_density" in params:
            grads["grid_density"] = unbrick_grad(acc, pack)
        if "al_le" in params:
            gl = jnp.einsum("nc,ncl->lc", rfac, gle)
            base = params["al_le"]
            grads["al_le"] = (
                jnp.zeros_like(base).at[: gl.shape[0]].set(gl)
            )
        return loss, grads

    def step_pair(params, pixel_ids, pixel_xy, target, sample_a, sample_b):
        """TWO-SAMPLE product-loss step: loss = mean((a - t)(b - t)) over
        two INDEPENDENT renders (distinct RNG streams) — the unbiased
        surrogate for (E img - t)^2 that drops the Var(img) term a plain
        L2 on one noisy render minimizes (test_diff_volume's measured
        failure mode: density collapses to 0). Gradients via two replay
        passes with crossed residuals: d loss/d a = (b - t)/N etc."""
        n = pixel_ids.shape[0]
        grid = params.get("grid_density", tables.grid_density)
        bricks_t = pack_bricks_live(grid, pack)
        keys_a = path_keys(seed, pixel_ids, sample_a)
        keys_b = path_keys(seed + 7919, pixel_ids, sample_b)
        u_a = uniform2(keys_a, CAMERA_SITE)
        u_b = uniform2(keys_b, CAMERA_SITE)
        rays_a = camera.sample_rays((pixel_xy + u_a) / wh)
        rays_b = camera.sample_rays((pixel_xy + u_b) / wh)
        img_a = fwd(rays_a, keys_a, bricks_t)
        img_b = fwd(rays_b, keys_b, bricks_t)
        loss = jnp.mean((img_a - target) * (img_b - target))
        rfac_a = (img_b - target) / (n * 3)
        rfac_b = (img_a - target) / (n * 3)
        gle_a, acc_a = grad_call(rays_a, keys_a, img_a, rfac_a, bricks_t)
        gle_b, acc_b = grad_call(rays_b, keys_b, img_b, rfac_b, bricks_t)
        grads = {}
        if "grid_density" in params:
            grads["grid_density"] = unbrick_grad(acc_a + acc_b, pack)
        if "al_le" in params:
            gl = (jnp.einsum("nc,ncl->lc", rfac_a, gle_a)
                  + jnp.einsum("nc,ncl->lc", rfac_b, gle_b))
            base = params["al_le"]
            grads["al_le"] = (
                jnp.zeros_like(base).at[: gl.shape[0]].set(gl)
            )
        return loss, grads

    step.n_lights = n_l
    step.step_pair = step_pair
    return step
