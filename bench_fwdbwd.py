"""Forward+backward cost decomposition (round 4, verdict item 3).

BENCH_r03 measured fwd+bwd at 16.1 M rays/s vs 39.8 M forward-only of the
same differentiable pipeline (and 105 M for the fused forward renderer) —
a 2.5x fwd->fwd+bwd multiplier with no recorded breakdown. Each variant
here times value_and_grad of the L2 image loss on the GI Cornell
differentiable pipeline (diff.py) with one knob turned, on the REAL chip:

  fwd         — forward radiance only (no grad), the 39.8 M baseline
  base        — value_and_grad w.r.t. mat_albedo (the bench metric)
  vjp_fwd     — jax.vjp forward half only (residual-saving cost: the gap
                between this and `fwd` is what materializing the tape
                costs; the gap between `base` and this is the transpose)
  nonee       — nee=False (drops the shadow sweep + light epilogue)
  depth1      — max_depth=1
  remat       — jax.checkpoint around the whole radiance fn (recompute
                instead of materialize; tells if the tape is HBM-bound)
  allparams   — grads w.r.t. mat_albedo AND al_le
  analytic    — the round-4 analytic-gradient megakernel
                (diff.try_make_fast_value_and_grad: per-lane Jacobians
                accumulated in the forward pass, no transpose)

Usage: python bench_fwdbwd.py [variant ...]
Prints one JSON line per variant: {"variant", "rays_per_s"}.
"""

import json
import os
import sys
import time


def build(variant):
    import jax
    import jax.numpy as jnp

    from xraytracer_tpu.camera import PinholeCamera
    from xraytracer_tpu.diff import make_loss_fn, make_radiance_fn
    from xraytracer_tpu.renderer import pixel_grid
    from xraytracer_tpu.scene.builder import scene_statics
    from xraytracer_tpu.scene.presets import build_cornell_box, cornell_camera

    w, h = 780, 585
    tables = build_cornell_box().build()
    statics = scene_statics(tables)
    camera = PinholeCamera.make(w / h, **cornell_camera())
    kw = dict(max_depth=3, cosine_sampling=True)
    if variant == "nonee":
        kw["nee"] = False
    if variant == "depth1":
        kw["max_depth"] = 1
    radiance = make_radiance_fn(tables, statics, camera, w, h, **kw)
    if variant == "remat":
        radiance = jax.checkpoint(radiance)
    pixel_ids, pixel_xy = pixel_grid(w, h)
    target = jnp.zeros((w * h, 3))
    params = {"mat_albedo": tables.mat_albedo}
    if variant == "allparams":
        params["al_le"] = tables.al_le
    loss = make_loss_fn(radiance)

    if variant == "analytic":
        from xraytracer_tpu.diff import try_make_fast_value_and_grad

        step = try_make_fast_value_and_grad(
            tables, statics, camera, w, h, max_depth=3, nee=True,
            cosine_sampling=True,
        )
        assert step is not None
        fn = jax.jit(step)

        def run(s):
            v, g = fn(params, pixel_ids, pixel_xy, target, s)
            return g["mat_albedo"]

        return run, w * h
    if variant == "fwd":
        fn = jax.jit(
            lambda p, s: jnp.sum(radiance(p, pixel_ids, pixel_xy, s))
        )

        def run(s):
            return fn(params, s)
    elif variant == "vjp_fwd":
        # forward half of reverse-mode only: linearize saves the SAME
        # residuals as value_and_grad but never runs the transpose
        fn = jax.jit(
            lambda p, s: jax.vjp(
                lambda q: loss(q, pixel_ids, pixel_xy, target, s), p
            )[0]
        )

        def run(s):
            return fn(params, s)
    else:
        grad_fn = jax.jit(jax.value_and_grad(loss))

        def run(s):
            v, g = grad_fn(params, pixel_ids, pixel_xy, target, s)
            return g["mat_albedo"]

    return run, w * h


def main(argv):
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    variants = argv or ["fwd", "base", "vjp_fwd", "nonee", "depth1",
                        "remat", "allparams"]
    for v in variants:
        run, n_rays = build(v)
        jax.block_until_ready(run(0))                      # compile
        n_steps = 8
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            out = None
            for s in range(1, 1 + n_steps):
                out = run(s)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            best = max(best, n_rays * n_steps / dt)
        print(json.dumps({"variant": v, "rays_per_s": round(best)}),
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
