"""Benchmark: GI Cornell box rays/s on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

The reference publishes no numbers (SURVEY.md §6), so the baseline is the
self-set target in BASELINE.json: primary-rays/s on the GI Cornell box
(780x585, depth 3). ``vs_baseline`` is measured rays/s divided by the
1e8 rays/s/chip target.

``extra`` carries the secondary north-star metrics (BASELINE.md):
  * fwd_bwd_rays_per_s — primary rays/s for value-and-gradient of the L2
    loss on the GI Cornell pipeline (forward + backward), the second half
    of BASELINE.json's declared throughput metric. Round 4: the headline
    is the ANALYTIC-gradient megakernel (forward-pass Jacobians,
    diff.try_make_fast_value_and_grad, parity-gated vs autodiff); the
    reverse-mode jax.value_and_grad number rides along as
    ``autodiff_rays_per_s`` for cross-round comparison;
  * vpt_rays_per_s — homogeneous VolumePathTracing preset (256x256 depth 10);
  * het_tracking_ms — one heterogeneous delta-tracking wavefront
    (65k lanes, bounded masked loop) on the procedural cloud;
  * het_nee_ms_per_spp — the reference nee workload (cloud + sphere light,
    VolumePathTracingNEE depth 32) at 256x256 through the fully-fused
    heterogeneous megakernel;
  * mesh_gi_51k_rays_per_s — GI depth-3 NEE on a 51k-triangle sphere mesh
    (bench_mesh.py's largest point: 26x the reference's biggest shipped
    mesh), the streamed worklist-culled sweep path.
Set XRT_BENCH_FAST=1 to skip the extras (primary metric only).

Methodology stamps (round 4): every timed metric carries
{value, spp, best_of, spread_pct} so workload changes are visible in the
record, and GI/VPT additionally report a legacy_* point at the rounds-1/2
spp settings (64 / 9) so the cross-round progression stays reconcilable
(the round-3 spp raise amortized the ~23 ms tunnel round-trip and is NOT
comparable to earlier rows — see BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_RAYS_PER_S = 1.0e8  # self-set target (BASELINE.md)


def _bench_gi_forward():
    from xraytracer_tpu.camera import PinholeCamera
    from xraytracer_tpu.integrators import make_path_integrator
    from xraytracer_tpu.renderer import WavefrontRenderer
    from xraytracer_tpu.scene.builder import scene_statics
    from xraytracer_tpu.scene.presets import build_cornell_box, cornell_camera

    w, h = 780, 585
    # 256 spp per timed render: a 64-spp call is ~280 ms, of which the
    # tunnel's ~23 ms null round-trip is ~8% — the longer render measures
    # sustained throughput (the declared metric), not dispatch latency
    spp = 256
    tables = build_cornell_box().build()
    statics = scene_statics(tables)
    camera = PinholeCamera.make(w / h, **cornell_camera())
    integrate = make_path_integrator(
        tables, statics, max_depth=3, nee=True, cosine_sampling=True
    )
    # one compiled pipeline; warmup call pays compilation, timed calls
    # reuse it. Best-of-3: the shared/tunneled chip shows +-7% run-to-run
    # variance, so a single timed render under-reports sustained throughput.
    renderer = WavefrontRenderer(tables, camera, integrate, w, h, seed=0)
    renderer.render(2)
    runs = [renderer.render(spp).samples_per_sec for _ in range(3)]
    # legacy same-workload point: rounds 1-2 timed 64-spp renders, where the
    # ~23 ms tunnel round-trip is ~8% of the call — kept so the cross-round
    # progression stays apples-to-apples (VERDICT r3 §weak-4)
    legacy = max(renderer.render(64).samples_per_sec for _ in range(3))
    return {
        "value": max(runs),
        "spp": spp,
        "best_of": len(runs),
        "spread_pct": round(100.0 * (max(runs) - min(runs)) / max(runs), 2),
        "legacy_spp64_rays_per_s": legacy,
    }


def _bench_gi_fwd_bwd():
    """rays/s through value_and_grad of the L2 image loss (diff.py pipeline:
    XLA matmul sweep, rejoined appearance) — BASELINE.md's forward+backward
    throughput metric."""
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
    radiance = make_radiance_fn(
        tables, statics, camera, w, h, max_depth=3, cosine_sampling=True
    )
    pixel_ids, pixel_xy = pixel_grid(w, h)
    target = jnp.zeros((w * h, 3))
    params = {"mat_albedo": tables.mat_albedo}

    def time_steps(fn):
        val, g = fn(params, pixel_ids, pixel_xy, target, 0)   # compile
        jax.block_until_ready(g["mat_albedo"])
        n_steps = 8
        t0 = time.perf_counter()
        for s in range(1, 1 + n_steps):
            val, g = fn(params, pixel_ids, pixel_xy, target, s)
        jax.block_until_ready(g["mat_albedo"])
        return w * h * n_steps / (time.perf_counter() - t0)

    autodiff = time_steps(jax.jit(jax.value_and_grad(make_loss_fn(radiance))))
    # round-4 analytic-gradient megakernel (forward-pass Jacobians,
    # diff.try_make_fast_value_and_grad — parity-gated vs autodiff); the
    # headline fwd+bwd metric is the fastest correct gradient the
    # framework offers, with the reverse-mode number kept for comparison
    from xraytracer_tpu.diff import try_make_fast_value_and_grad

    fast = try_make_fast_value_and_grad(
        tables, statics, camera, w, h, max_depth=3, nee=True,
        cosine_sampling=True,
    )
    analytic = time_steps(jax.jit(fast)) if fast is not None else None
    best = max(autodiff, analytic or 0.0)
    return {
        "value": best,
        # label the implementation that actually produced the headline —
        # an analytic-path regression below reverse mode must not hide
        # behind an "analytic_fused" tag
        "method": ("analytic_fused" if analytic == best else "autodiff"),
        "autodiff_rays_per_s": autodiff,
        "analytic_rays_per_s": analytic,
    }


def _bench_vpt():
    from xraytracer_tpu.camera import PinholeCamera
    from xraytracer_tpu.integrators import make_volume_integrator
    from xraytracer_tpu.renderer import WavefrontRenderer
    from xraytracer_tpu.scene.builder import scene_statics
    from xraytracer_tpu.scene.presets import preset_vpt

    tables, cam_kwargs, cfg = preset_vpt()
    w = h = 256
    statics = scene_statics(tables)
    camera = PinholeCamera.make(w / h, **cam_kwargs)
    integrate = make_volume_integrator(tables, statics, 10, nee=False)
    renderer = WavefrontRenderer(tables, camera, integrate, w, h, seed=0)
    renderer.render(1)
    # 512 spp per timed call, median of 5 — the round-4 45-spp best-of-3
    # carried 18.9% spread (verdict item 6), and even 128-spp calls are
    # ~30-45 ms (tunnel-latency scale: the round-trip jitters by ±10 ms
    # on bad days). ~150 ms calls put latency jitter under ~7%. The 9-spp
    # legacy point (rounds 1-2 methodology, round-trip-dominated) is kept
    # so cross-round VPT numbers stay reconcilable.
    # best of 7 (the convention of every throughput metric here: external
    # tunnel stalls only ever SLOW a call, so max measures the kernel);
    # the trimmed middle-5 spread documents the session's call-to-call
    # noise — on spiky-tunnel days it can exceed the kernel's own
    # variance by far (measured 2x call spread with a ~0-5 ms base RTT
    # and ~100 ms spikes), which median/best-of both survive
    runs = sorted(renderer.render(512).samples_per_sec for _ in range(7))
    mid = runs[1:-1]
    legacy = max(renderer.render(9).samples_per_sec for _ in range(3))
    return {
        "value": runs[-1],
        "spp": 512,
        "best_of": len(runs),
        "spread_pct": round(100.0 * (mid[-1] - mid[0]) / mid[-1], 2),
        "spread_kind": "middle5_of_7",
        "legacy_spp9_rays_per_s": legacy,
    }


def _bench_vol_fwd_bwd():
    """Analytic volume value_and_grad (round 5): one full L2-loss step —
    grad-sampling forward + density-gradient replay — on the nee cloud at
    256x256 depth 32. Rays/s here counts the 65k primary rays against the
    WHOLE fwd+bwd step (two kernel passes). Reverse mode through the
    bounded-trip wavefront measures ~100x slower at a reduced config
    (bench record in BASELINE.md); the analytic path is the only practical
    route to density gradients at this depth."""
    import jax
    import jax.numpy as jnp

    from xraytracer_tpu.camera import PinholeCamera
    from xraytracer_tpu.integrators.het_megakernel import (
        try_make_fused_het_value_and_grad,
    )
    from xraytracer_tpu.math import from_rows
    from xraytracer_tpu.renderer import pixel_grid
    from xraytracer_tpu.scene.builder import scene_statics
    from xraytracer_tpu.scene.presets import build_volume_scene

    tables = build_volume_scene(
        absorption=(0.01, 0.01, 0.01), scattering=(0.05, 0.05, 0.05),
        le=30.0, light_center=(0.0, 400.0, 0.0),
    ).build()
    statics = scene_statics(tables)
    w = h = 256
    c2w = from_rows(1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0, 0,
                    0, 70.0, 550.0, 1)
    cam = PinholeCamera.make(1.0, c2w=c2w, fov_deg=60.0)
    step = try_make_fused_het_value_and_grad(
        tables, statics, cam, w, h, 32, nee=True, seed=0
    )
    if step is None:
        raise RuntimeError("analytic het grad ineligible")
    ids, pxy = pixel_grid(w, h)
    params = {"grid_density": tables.grid_density}
    target = jnp.zeros((w * h, 3)) + 0.05
    js = jax.jit(step)

    def once(i):
        t0 = time.perf_counter()
        val, grads = js(params, ids, pxy, target, i)
        float(val)
        np.asarray(grads["grid_density"])
        return time.perf_counter() - t0

    once(0)
    runs = sorted(once(i) for i in range(1, 4))
    best = runs[0]
    return {
        "value": w * h / best,
        "unit": "rays/s fwd+bwd (analytic, depth 32)",
        "best_of": len(runs),
        "spread_pct": round(100.0 * (runs[-1] - runs[0]) / runs[-1], 2),
        "method": "analytic_two_pass",
    }


def _bench_het_tracking():
    """One bounded-loop delta-tracking wavefront on the procedural cloud:
    65k lanes through sample_medium (the volume-path hot loop). Uses the
    fused Pallas tracking kernel (media_pallas) when the platform/scene
    qualify — the same selection production makes in make_volume_integrator."""
    import jax
    import jax.numpy as jnp

    from xraytracer_tpu.geometry import Rays
    from xraytracer_tpu.media import sample_medium
    from xraytracer_tpu.media_pallas import try_make_fused_het_sampler
    from xraytracer_tpu.sampling import path_keys
    from xraytracer_tpu.scene.presets import build_volume_scene

    tables = build_volume_scene().build()
    het_fn = try_make_fused_het_sampler(tables, 128)
    n = 65536
    o = jnp.tile(jnp.asarray([[0.0, 0.0, 400.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    rays = Rays(o=o, d=d)
    t0v = jnp.full((n,), 240.0)
    t1v = jnp.full((n,), 560.0)
    tp = jnp.ones((n, 3))

    @jax.jit
    def run(keys):
        ms = sample_medium(
            tables, jnp.zeros((n,), jnp.int32), rays, t0v, t1v, tp, keys, 16,
            max_steps=128, has_heterogeneous=True, het_fn=het_fn,
        )
        return ms.weight

    # per-rep key sets hashed OUTSIDE jit (base_key needs a concrete seed);
    # one compile serves every rep
    key_sets = [path_keys(i, jnp.arange(n, dtype=jnp.int32), 0)
                for i in range(6)]
    jax.block_until_ready(run(key_sets[0]))
    reps = 5
    t0 = time.perf_counter()
    for i in range(1, 1 + reps):
        out = run(key_sets[i])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def _bench_het_nee():
    from xraytracer_tpu.camera import PinholeCamera
    from xraytracer_tpu.integrators import make_volume_integrator
    from xraytracer_tpu.renderer import WavefrontRenderer
    from xraytracer_tpu.scene.builder import scene_statics
    from xraytracer_tpu.scene.presets import preset_nee

    tables, cam_kwargs, cfg = preset_nee()
    w = h = 256
    statics = scene_statics(tables)
    camera = PinholeCamera.make(w / h, **cam_kwargs)
    integrate = make_volume_integrator(
        tables, statics, cfg["max_depth"], nee=True
    )
    renderer = WavefrontRenderer(tables, camera, integrate, w, h, seed=0)
    renderer.render(1)
    runs = [renderer.render(8).seconds / 8 * 1e3 for _ in range(2)]
    return {
        "value": min(runs),
        "spp": 8,
        "best_of": len(runs),
        "spread_pct": round(100.0 * (max(runs) - min(runs)) / max(runs), 2),
    }


def _bench_mesh_51k():
    import bench_mesh

    n_theta, n_phi = bench_mesh.SIZES["51k"]
    runs = [bench_mesh.bench_one(n_theta, n_phi, spp=4)["rays_per_s"]
            for _ in range(2)]
    return {
        "value": max(runs),
        "spp": 4,
        "best_of": len(runs),
        "spread_pct": round(100.0 * (max(runs) - min(runs)) / max(runs), 2),
    }


def _arm_watchdog():
    """The axon TPU tunnel can wedge so hard that even ``jax.devices()``
    blocks forever (observed 2026-08-18). A silent hang would leave the
    driver with NO bench line at all; instead, print an honest error JSON
    and hard-exit if the bench hasn't finished in XRT_BENCH_TIMEOUT
    seconds (default 2700 — a cold compile run needs ~15 min)."""
    import threading

    timeout = float(os.environ.get("XRT_BENCH_TIMEOUT", "2700"))

    def fire():
        print(
            json.dumps(
                {
                    "metric": "gi_cornell_primary_rays_per_s",
                    "value": 0.0,
                    "unit": "rays/s",
                    "vs_baseline": 0.0,
                    "error": f"bench watchdog: no result within {timeout:.0f}s"
                             " (TPU tunnel unresponsive?)",
                }
            ),
            flush=True,
        )
        os._exit(3)

    t = threading.Timer(timeout, fire)
    t.daemon = True
    t.start()
    return t


def main():
    import jax

    watchdog = _arm_watchdog()

    # persistent compilation cache: the GI pipeline's Pallas programs take
    # minutes to compile; cached artifacts make repeat bench runs start fast
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    gi = _bench_gi_forward()
    rays_per_s = gi.pop("value")
    extra = {"gi_methodology": gi}
    if not os.environ.get("XRT_BENCH_FAST"):
        # fault-isolated: a failing extra must never lose the primary metric
        for name, fn in (
            ("fwd_bwd_rays_per_s", _bench_gi_fwd_bwd),
            ("vpt_rays_per_s", _bench_vpt),
            ("het_tracking_ms", _bench_het_tracking),
            ("het_nee_ms_per_spp", _bench_het_nee),
            ("vol_fwd_bwd_rays_per_s", _bench_vol_fwd_bwd),
            ("mesh_gi_51k_rays_per_s", _bench_mesh_51k),
        ):
            try:
                extra[name] = fn()
            except Exception as e:  # pragma: no cover
                extra[name] = f"error: {type(e).__name__}: {e}"[:200]

    watchdog.cancel()
    print(
        json.dumps(
            {
                "metric": "gi_cornell_primary_rays_per_s",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / BASELINE_RAYS_PER_S,
                "extra": extra,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
