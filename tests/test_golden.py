"""Golden-image regression gate (SURVEY.md §4: the reference's informal
golden JPGs become a checked-in reproducible array compared bitwise-ish).

The golden was generated on the CPU backend at the pinned seed; the RNG is
a pure counter-based function, so any change to sampling order, pdf
conventions, or integrator logic shifts the image and fails here."""

import os

import numpy as np

from xraytracer_tpu.camera import PinholeCamera
from xraytracer_tpu.integrators import make_path_integrator
from xraytracer_tpu.renderer import render
from xraytracer_tpu.scene.builder import scene_statics
from xraytracer_tpu.scene.presets import build_cornell_box, cornell_camera

GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "cornell_gi_32x24_8spp_seed0.npy"
)


def test_cornell_gi_matches_golden():
    W, H = 32, 24
    tables = build_cornell_box().build()
    st = scene_statics(tables)
    cam = PinholeCamera.make(W / H, **cornell_camera())
    r = render(
        tables, cam, make_path_integrator(tables, st, 3, nee=True),
        W, H, 8, seed=0,
    )
    expect = np.load(GOLDEN)
    np.testing.assert_allclose(r.image, expect, rtol=1e-5, atol=1e-6)
