"""Hardware A/B: ENABLE_WORKLIST on/off must produce identical images.

The worklist invariant (pruned chunks cannot contain a winner) is argued
from the 1e-4 AABB margin vs Mosaic/XLA rounding; interpret-mode CI can't
check the cross-compiler claim, so this script renders the 51k-tri mesh
scene twice on the REAL chip and asserts bitwise equality (verify skill
step, round-3 advisor item 3). Exact-key TIES (duplicate geometry) may
legitimately differ since round 4's front-to-back ordering — absent here.
"""
import numpy as np

import bench_mesh
from xraytracer_tpu.camera import PinholeCamera
from xraytracer_tpu.geometry import pallas_kernels as pk
from xraytracer_tpu.integrators import make_path_integrator
from xraytracer_tpu.renderer import WavefrontRenderer
from xraytracer_tpu.scene.builder import scene_statics

b, camk = bench_mesh.build_scene(*bench_mesh.SIZES["51k"])
tables = b.build()
statics = scene_statics(tables)
w, h = 128, 96
camera = PinholeCamera.make(w / h, **camk)
imgs = {}
for flag in (True, False):
    pk.ENABLE_WORKLIST = flag
    integ = make_path_integrator(tables, statics, max_depth=3, nee=True,
                                 cosine_sampling=True)
    r = WavefrontRenderer(tables, camera, integ, w, h, seed=0).render(2)
    imgs[flag] = np.asarray(r.image)
    print(f"worklist={flag} mean={imgs[flag].mean():.6f}", flush=True)
np.testing.assert_array_equal(imgs[True], imgs[False])
print("WORKLIST A/B BITWISE EQUAL OK")
