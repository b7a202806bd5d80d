"""Independent numpy oracle vs. the JAX renderer at matched seeds.

The BASELINE.md correctness gate: a from-scratch scalar/numpy
re-implementation of the render pipeline (RNG, camera, intersection, light
sampling, shading) reproduces the framework's images allclose at the same
(seed, pixel, sample, site) random draws. This catches systematic errors
that a same-code regression test cannot — everything here is written
directly from the math, sharing no code with xraytracer_tpu except the
constants.
"""

import numpy as np
import jax.numpy as jnp

from xraytracer_tpu.camera import PinholeCamera
from xraytracer_tpu.constants import K_EPS, SHADOW_BIAS
from xraytracer_tpu.integrators import make_direct_integrator, make_normal_integrator
from xraytracer_tpu.renderer import CAMERA_SITE, render
from xraytracer_tpu.scene.builder import SceneBuilder, scene_statics
from xraytracer_tpu.scene.presets import build_cornell_box, cornell_camera

W, H = 16, 12
SPP = 2

# --- independent PCG RNG (pure-int, mirrors the published hash) -----------
MASK = 0xFFFFFFFF


def pcg(x):
    x = (x * 747796405 + 2891336453) & MASK
    word = (((x >> ((x >> 28) + 4)) ^ x) * 277803737) & MASK
    return (word >> 22) ^ word


def path_key(seed, pixel, sample):
    s = pcg((pcg(seed & MASK) + pixel) & MASK)
    return pcg((s + sample) & MASK)


def u1(key, site):
    x = pcg((key + site * 0x9E3779B9) & MASK)
    return float(x >> 8) * (1.0 / (1 << 24))


def u2(key, site):
    x1 = pcg((key + site * 0x9E3779B9) & MASK)
    x2 = pcg(x1)
    s = 1.0 / (1 << 24)
    return float(x1 >> 8) * s, float(x2 >> 8) * s


# --- scalar geometry -------------------------------------------------------

def ray_triangle(o, d, v0, e1, e2):
    """Classic Möller-Trumbore; returns (t, hit)."""
    pvec = np.cross(d, e2)
    det = float(e1 @ pvec)
    if abs(det) < K_EPS:
        return np.inf, False
    inv = 1.0 / det
    tvec = o - v0
    u = float(tvec @ pvec) * inv
    if u < 0 or u > 1:
        return np.inf, False
    qvec = np.cross(tvec, e1)
    v = float(d @ qvec) * inv
    if v < 0 or u + v > 1:
        return np.inf, False
    t = float(e2 @ qvec) * inv
    return (t, True) if t > K_EPS else (np.inf, False)


class Oracle:
    def __init__(self, tables, cam_kwargs, width, height, seed=0):
        t = tables
        self.v0 = np.asarray(t.tri_v0, np.float64)
        self.e1 = np.asarray(t.tri_e1, np.float64)
        self.e2 = np.asarray(t.tri_e2, np.float64)
        self.obj = np.asarray(t.tri_obj)
        self.obj_mat = np.asarray(t.obj_mat)
        self.obj_light = np.asarray(t.obj_light)
        self.mat_albedo = np.asarray(t.mat_albedo, np.float64)
        self.al_le = np.asarray(t.al_le, np.float64)
        self.al_v0 = np.asarray(t.al_v0, np.float64)
        self.al_e1 = np.asarray(t.al_e1, np.float64)
        self.al_e2 = np.asarray(t.al_e2, np.float64)
        self.al_ng = np.asarray(t.al_ng, np.float64)
        self.n_lights = int((np.asarray(t.al_type) >= 0).sum())
        self.c2w = np.asarray(cam_kwargs["c2w"], np.float64)
        self.scale = np.tan(0.5 * np.deg2rad(cam_kwargs.get("fov_deg", 90.0)))
        self.aspect = width / height
        self.width, self.height, self.seed = width, height, seed

    def camera_ray(self, px, py, key):
        ux, uy = u2(key, CAMERA_SITE)
        su = (px + ux) / self.width
        sv = (py + uy) / self.height
        d_local = np.array(
            [
                (2 * su - 1) * self.scale,
                (1 - 2 * sv) * self.scale / self.aspect,
                -1.0,
            ]
        )
        d = d_local @ self.c2w[:3, :3]  # row-vector convention
        d /= np.linalg.norm(d)
        return self.c2w[3, :3].copy(), d

    def intersect(self, o, d):
        best_t, best_i = np.inf, -1
        for i in range(len(self.v0)):
            if self.obj[i] < 0:
                continue
            t, hit = ray_triangle(o, d, self.v0[i], self.e1[i], self.e2[i])
            if hit and t < best_t:
                best_t, best_i = t, i
        return best_t, best_i

    def occluded(self, o, d, t_max):
        for i in range(len(self.v0)):
            oi = self.obj[i]
            if oi < 0 or self.obj_light[oi] >= 0:  # emitters never block
                continue
            t, hit = ray_triangle(o, d, self.v0[i], self.e1[i], self.e2[i])
            if hit and t < t_max:
                return True
        return False

    def direct(self, px, py, sample):
        """The DirectIntegrator (reference: Src/integrator.h:76-120)."""
        key = path_key(self.seed, py * self.width + px, sample)
        o, d = self.camera_ray(px, py, key)
        t, i = self.intersect(o, d)
        if i < 0:
            return np.full(3, 0.18)
        oi = self.obj[i]
        lrow = self.obj_light[oi]
        ng = np.cross(self.e1[i], self.e2[i])
        ng /= np.linalg.norm(ng)
        pos = o + t * d
        if lrow >= 0:  # emitter: one-sided Le
            return self.al_le[lrow] if (-d) @ ng > 0 else np.zeros(3)
        radiance = np.zeros(3)
        albedo = self.mat_albedo[self.obj_mat[oi]]
        for li in range(self.n_lights):
            ux, uy = u2(key, 16 + li)
            # quad light bilinear sample (the only light type in Cornell)
            p = self.al_v0[li] + ux * self.al_e1[li] + uy * self.al_e2[li]
            dvec = p - pos
            tmax = np.linalg.norm(dvec)
            ddn = dvec @ self.al_ng[li]
            if ddn >= 0:
                continue  # backfacing -> Le 0, pdf irrelevant
            pdf = tmax ** 3 / abs(ddn)
            wi = dvec / tmax
            so = pos + SHADOW_BIAS * ng
            vis = not self.occluded(so, wi, tmax - SHADOW_BIAS)
            cos = max(0.0, ng @ wi)
            fr = albedo / np.pi
            if vis:
                radiance += fr * self.al_le[li] * cos / pdf
        return radiance

    def normal_viz(self, px, py, sample):
        key = path_key(self.seed, py * self.width + px, sample)
        o, d = self.camera_ray(px, py, key)
        t, i = self.intersect(o, d)
        if i < 0:
            return np.zeros(3)
        # Cornell uses flat normals == geometric normal
        ng = np.cross(self.e1[i], self.e2[i])
        ng /= np.linalg.norm(ng)
        return 0.5 * (ng + 1.0)


def test_direct_matches_oracle():
    tables = build_cornell_box().build()
    statics = scene_statics(tables)
    camk = cornell_camera()
    cam = PinholeCamera.make(W / H, **camk)
    r = render(
        tables, cam, make_direct_integrator(tables, statics), W, H, SPP, seed=0
    )
    oracle = Oracle(tables, camk, W, H, seed=0)
    expect = np.zeros((H, W, 3))
    for py in range(H):
        for px in range(W):
            for s in range(SPP):
                expect[py, px] += oracle.direct(px, py, s)
    expect /= SPP
    np.testing.assert_allclose(r.image, expect, rtol=5e-4, atol=5e-5)


def test_normal_matches_oracle():
    tables = build_cornell_box().build()
    camk = cornell_camera()
    cam = PinholeCamera.make(W / H, **camk)
    r = render(tables, cam, make_normal_integrator(tables), W, H, 1, seed=0)
    oracle = Oracle(tables, camk, W, H, seed=0)
    expect = np.zeros((H, W, 3))
    for py in range(H):
        for px in range(W):
            expect[py, px] = oracle.normal_viz(px, py, 0)
    np.testing.assert_allclose(r.image, expect, atol=1e-4)
