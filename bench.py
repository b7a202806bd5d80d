"""Benchmark: GI Cornell box rays/s on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (SURVEY.md §6), so the baseline is the
self-set target in BASELINE.json: primary-rays/s on the GI Cornell box
(780x585, depth 3). ``vs_baseline`` is measured rays/s divided by the
1e8 rays/s/chip target.
"""

import json
import sys
import time

BASELINE_RAYS_PER_S = 1.0e8  # self-set target (BASELINE.md)


def main():
    import os

    import jax

    # persistent compilation cache: the GI pipeline's Pallas programs take
    # minutes to compile; cached artifacts make repeat bench runs start fast
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from xraytracer_tpu.camera import PinholeCamera
    from xraytracer_tpu.integrators import make_path_integrator
    from xraytracer_tpu.renderer import render
    from xraytracer_tpu.scene.builder import scene_statics
    from xraytracer_tpu.scene.presets import build_cornell_box, cornell_camera

    w, h = 780, 585
    spp = 64
    tables = build_cornell_box().build()
    statics = scene_statics(tables)
    camera = PinholeCamera.make(w / h, **cornell_camera())
    integrate = make_path_integrator(
        tables, statics, max_depth=3, nee=True, cosine_sampling=True
    )

    # one compiled pipeline; warmup call pays compilation, timed call reuses
    from xraytracer_tpu.renderer import WavefrontRenderer

    renderer = WavefrontRenderer(tables, camera, integrate, w, h, seed=0)
    renderer.render(2)
    r = renderer.render(spp)
    rays_per_s = r.samples_per_sec  # primary camera rays per second

    print(
        json.dumps(
            {
                "metric": "gi_cornell_primary_rays_per_s",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / BASELINE_RAYS_PER_S,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
