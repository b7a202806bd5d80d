"""Inverse VOLUME rendering demo: recover a 16^3 density blob from target
renders by gradient descent through the fused heterogeneous path.

The volume counterpart of ``fit_scene`` (round-4 verdict item 4 "make
density descent converge"): density gradients come from the ANALYTIC
forward-speed replay kernel
(``het_megakernel.try_make_fused_het_value_and_grad`` — no tape, no
transpose), using its TWO-SAMPLE product-loss step (``step_pair``:
E[(a-t)(b-t)] over independent renders removes the Var(img) term a plain
L2 minimizes by collapsing density) with the score-corrected grad-sampling
estimator. Multi-view: one step function per camera (the Pallas kernel is
camera-free — views share one compiled kernel), gradients summed per
Adam step under a cosine LR schedule.

No reference counterpart (the reference is a pure forward renderer);
capability extension per SURVEY.md §7 step 9 / BASELINE.md north star.

Usage (real TPU; the analytic kernel gates on the platform):
    python -m xraytracer_tpu.tools.fit_volume --steps 600 -o fit_vol.npz
"""

import argparse
import json

import numpy as np

RES = 16


def _blob_target():
    tgt = np.full((RES, RES, RES), 0.25, np.float32)
    c0, c1 = RES // 4, 3 * RES // 4
    tgt[c0:c1, c0:c1, c0:c1] = 0.85
    return tgt


def fit(width=96, height=72, steps=600, lr=0.1, max_depth=6, pairs=2,
        target_pairs=64, seed=0, verbose=False, force=False,
        interpret=False):
    """Run the demo. Returns (history, fitted_density, target_density)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..camera import PinholeCamera
    from ..integrators.het_megakernel import (
        try_make_fused_het_value_and_grad,
    )
    from ..math import from_rows
    from ..media_pallas import round_bf16
    from ..renderer import pixel_grid
    from ..scene.builder import scene_statics
    from ..scene.presets import build_volume_scene

    # majorants baked from a ones grid bound any density in [0, 1]
    # (the documented score-terms caveat)
    # OPTICALLY THIN coefficients: at the wdas-scale extent (~330 units
    # across), sigma_t = 0.10 gives tau ~ 15 — light never reaches the
    # interior, interior-voxel gradients vanish, and descent stalls
    # (measured). sigma_t = 0.005 puts the blob at tau ~ 0.8: every voxel
    # is observable from every view (tomography regime).
    tables = build_volume_scene(
        res=(RES, RES, RES), density=np.ones((RES, RES, RES), np.float32),
        absorption=(0.001, 0.001, 0.001),
        scattering=(0.004, 0.004, 0.004),
        le=120.0, light_center=(0.0, 400.0, 0.0),
    ).build()
    statics = scene_statics(tables)
    tgt_grid = _blob_target()

    dist = 540.0
    cams = [
        PinholeCamera.make(width / height, c2w=from_rows(
            1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0, 0,
            0, 40.0, dist, 1), fov_deg=55.0),
        PinholeCamera.make(width / height, c2w=from_rows(
            0, 0, -1.0, 0, 0, 1.0, 0, 0, 1.0, 0, 0, 0,
            dist, 40.0, 0, 1), fov_deg=55.0),
        PinholeCamera.make(width / height, c2w=from_rows(
            1.0, 0, 0, 0, 0, 0, -1.0, 0, 0, 1.0, 0, 0,
            0, dist, 0, 1), fov_deg=55.0),
    ]
    pixel_ids, pixel_xy = pixel_grid(width, height)

    steps_fns = []
    for ci, cam in enumerate(cams):
        st = try_make_fused_het_value_and_grad(
            tables, statics, cam, width, height, max_depth, nee=True,
            seed=seed + 1000 * ci, force=force, interpret=interpret,
        )
        if st is None:
            raise RuntimeError(
                "analytic het grad path ineligible (needs TPU or force)"
            )
        steps_fns.append(st)

    # targets: mean over many independent renders of the TRUE blob through
    # the forward grad-sampling integrator (matched estimator settings)
    from ..integrators.het_megakernel import (
        try_make_fused_het_path_integrator,
    )
    from ..media_pallas import het_pack, pack_bricks_live
    from ..renderer import CAMERA_SITE
    from ..sampling import path_keys, uniform2

    fwd = try_make_fused_het_path_integrator(
        tables, statics, max_depth, nee=True, grad_sampling=True,
        force=force, interpret=interpret,
    )
    pack = het_pack(tables)
    bricks_tgt = pack_bricks_live(jnp.asarray(round_bf16(tgt_grid)), pack)
    wh = jnp.asarray([float(width), float(height)])
    targets = []
    for ci in range(len(cams)):
        render = jax.jit(lambda s, _c=cams[ci], _ci=ci: fwd(
            _c.sample_rays(
                (pixel_xy + uniform2(
                    path_keys(seed + 1000 * _ci, pixel_ids, s),
                    CAMERA_SITE)) / wh),
            path_keys(seed + 1000 * _ci, pixel_ids, s), bricks_tgt))
        acc = np.zeros((width * height, 3), np.float32)
        for s in range(target_pairs):
            acc += np.asarray(render(jnp.int32(10_000 + s)))
        targets.append(jnp.asarray(acc / target_pairs))

    z = jnp.zeros((RES, RES, RES))
    # cosine LR decay must live INSIDE adam (scaling the gradient before
    # adam is a no-op — adam normalizes its input)
    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.05)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    ost = opt.init(z)
    history = []
    jitted = [jax.jit(st.step_pair) for st in steps_fns]
    for it in range(steps):
        g_total = None
        loss_sum = 0.0
        for ci, jp in enumerate(jitted):
            for pr in range(pairs):
                s = 2 * (it * pairs + pr)
                loss, grads = jp(
                    {"grid_density": jax.nn.sigmoid(z)}, pixel_ids,
                    pixel_xy, targets[ci], s, s + 1,
                )
                # chain rule through the sigmoid parameterization
                gz = grads["grid_density"] * (
                    jax.nn.sigmoid(z) * (1.0 - jax.nn.sigmoid(z))
                )
                g_total = gz if g_total is None else g_total + gz
                loss_sum += float(loss)
        g_total = g_total / (len(jitted) * pairs)
        up, ost = opt.update(g_total, ost)
        z = optax.apply_updates(z, up)
        if verbose and it % 25 == 0:
            d = np.asarray(jax.nn.sigmoid(z))
            print(json.dumps({
                "step": it, "loss": loss_sum,
                "mae": float(np.abs(d - tgt_grid).mean()),
            }), flush=True)
        history.append(loss_sum)
    return history, np.asarray(jax.nn.sigmoid(z)), tgt_grid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--height", type=int, default=72)
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()
    hist, fitted, tgt = fit(
        width=args.width, height=args.height, steps=args.steps,
        pairs=args.pairs, lr=args.lr, verbose=args.verbose,
    )
    c0, c1 = RES // 4, 3 * RES // 4
    mae = float(np.abs(fitted - tgt).mean())
    center = float(fitted[c0:c1, c0:c1, c0:c1].mean())
    n_in = (c1 - c0) ** 3
    outer = float(
        (fitted.sum() - fitted[c0:c1, c0:c1, c0:c1].sum())
        / (fitted.size - n_in)
    )
    print(json.dumps({
        "mae": mae, "center": center, "outer": outer,
        "center_target": 0.85, "outer_target": 0.25,
        "final_loss": hist[-1],
    }))
    if args.out:
        np.savez(args.out, fitted=fitted, target=tgt,
                 history=np.asarray(hist))


if __name__ == "__main__":
    main()
