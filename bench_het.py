"""Heterogeneous-NEE megakernel cost decomposition (round 4).

The round-3 verdict flagged het_nee_ms_per_spp as the one stagnant
headline metric (39.6 ms/spp, r02 == r03). This bench isolates where an
spp goes inside the fused kernel (het_megakernel.py) by timed ablation on
the REAL chip — the variants change draws/bias and exist for TIMING ONLY:

  base        — the bench workload exactly (preset_nee at 256x256, fused
                megakernel, default max_steps)
  nonee       — nee=False: removes cone sampling + the in-kernel
                ratio-tracked shadow transmittance (tells the NEE share)
  steps16     — max_steps=16: caps both tracking while_loops (tells the
                candidate-count share; biased, timing only)
  dda8        — _DDA_SEGMENTS=8 in media_pallas + het path (tells the
                majorant-DDA share; changes draws, timing only)
  iter24      — n_iterations=24 (tells the path-loop tail share)

Usage: python bench_het.py [variant ...]   (default: all)
Prints one line per variant: {"variant", "ms_per_spp"}.
"""

import json
import sys
import time


def build(variant):
    import xraytracer_tpu.media_pallas as mp
    from xraytracer_tpu.camera import PinholeCamera
    from xraytracer_tpu.integrators import make_volume_integrator
    from xraytracer_tpu.renderer import WavefrontRenderer
    from xraytracer_tpu.scene.builder import scene_statics
    from xraytracer_tpu.scene.presets import preset_nee

    tables, cam_kwargs, cfg = preset_nee()
    w = h = 256
    statics = scene_statics(tables)
    camera = PinholeCamera.make(w / h, **cam_kwargs)
    kw = dict(nee=True)
    if variant == "nonee":
        kw["nee"] = False
    if variant == "nopersist":
        # pin the pre-round-4 per-sample spp kernel (persistent-lane A/B)
        import functools

        import xraytracer_tpu.integrators.het_megakernel as hm

        hm.try_make_fused_het_spp_render = functools.partial(
            hm.try_make_fused_het_spp_render, persistent=False
        )
    if variant == "steps16":
        kw["max_steps"] = 16
    if variant == "iter24":
        kw["n_iterations"] = 24
    if variant == "dda8":
        mp._DDA_SEGMENTS = 8
        import xraytracer_tpu.media as m

        m._DDA_SEGMENTS = 8
    integrate = make_volume_integrator(
        tables, statics, cfg["max_depth"], **kw
    )
    return WavefrontRenderer(tables, camera, integrate, w, h, seed=0)


def main(argv):
    import os

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    variants = argv or ["base", "nonee", "steps16", "dda8", "iter24"]
    for v in variants:
        # variant builders mutate module globals (dda8, nopersist): reset
        # them after each variant so later variants measure only their own
        # knob (review finding: a default-order run measured iter24 with
        # dda8's _DDA_SEGMENTS=8 still applied)
        import xraytracer_tpu.integrators.het_megakernel as hm
        import xraytracer_tpu.media as med
        import xraytracer_tpu.media_pallas as mp

        saved = (mp._DDA_SEGMENTS, med._DDA_SEGMENTS,
                 hm.try_make_fused_het_spp_render)
        try:
            r = build(v)
            r.render(1)                                 # compile
            runs = [r.render(8).seconds / 8 * 1e3 for _ in range(2)]
            print(
                json.dumps({"variant": v, "ms_per_spp": round(min(runs), 2)}),
                flush=True,
            )
            del r
        finally:
            mp._DDA_SEGMENTS, med._DDA_SEGMENTS = saved[0], saved[1]
            hm.try_make_fused_het_spp_render = saved[2]


if __name__ == "__main__":
    main(sys.argv[1:])
