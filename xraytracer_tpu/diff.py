"""Differentiable rendering: gradients of radiance w.r.t. scene parameters.

No counterpart exists in the reference (pure forward renderer); this is the
capability extension called for by BASELINE.md's north star (forward +
backward rays/s) and SURVEY.md §7 step 9.

Design: the surface path integrators are pure ``fori_loop`` programs over
jnp arrays, so ``jax.grad`` w.r.t. any ``SceneTables`` leaf (albedo, Le,
density) works directly. Discrete sampling decisions (RR kill, lobe choice,
light pick) enter only through boolean masks — autodiff naturally treats
them as detached, differentiating only the continuous integrand factors
(the detached-sampling estimator; SURVEY.md §7 "hard parts"). The volume
integrators' default ``lax.while_loop`` tracking loops are not reverse-mode
differentiable; ``make_volume_integrator(differentiable=True)`` switches
them to ``max_steps``-bounded ``fori_loop`` variants and pins the XLA
triangle sweep, making sigma_a/sigma_s/Le/grid-density gradients available
(tested in tests/test_diff_volume.py).

Sweep choice: on TPU the surface pipeline runs the FUSED Pallas sweep even
under ``jax.grad`` via a zero-cotangent ``custom_vjp``
(``_diff_tri_fn`` -> ``intersect_triangles_pallas_stopgrad``) — exact for
this parameter set because no gradient flows through intersection outputs,
only through the out-of-kernel ``tri_rec`` appearance gather. Pass
``geometry_grads=True`` to pin the XLA matmul sweep when differentiating
w.r.t. vertex positions.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .integrators import make_path_integrator
from .renderer import CAMERA_SITE
from .sampling import path_keys, uniform2


def _diff_tri_fn(geometry_grads=False):
    """Triangle sweep for ``jax.grad`` pipelines. Default: the fused Pallas
    kernel wrapped in a zero-cotangent ``custom_vjp``
    (``intersect_triangles_pallas_stopgrad``) on TPU — exact for the
    albedo/Le/sigma/density parameter set, and the sweep is the forward
    bottleneck of fwd+bwd. ``geometry_grads=True`` (or a non-TPU backend)
    pins the XLA matmul sweep, whose outputs differentiate w.r.t. vertex
    positions too."""
    from .geometry.intersect import intersect_triangles_mm

    if geometry_grads:
        return intersect_triangles_mm
    try:
        is_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        is_tpu = False
    if not is_tpu:
        return intersect_triangles_mm
    from .geometry.pallas_kernels import intersect_triangles_pallas_stopgrad

    return intersect_triangles_pallas_stopgrad


def make_radiance_fn(
    tables, statics, camera, width, height, max_depth=3, nee=True,
    cosine_sampling=True, seed=0, geometry_grads=False, tri_fn=None,
    nee_mode="all",
):
    """Returns ``radiance(params, pixel_ids, pixel_xy, sample_idx) -> (N,3)``
    where ``params`` is a dict of SceneTables overrides (e.g.
    ``{"mat_albedo": ..., "al_le": ...}``) — the differentiable inputs."""
    wh = jnp.asarray([float(width), float(height)])
    if tri_fn is None:
        tri_fn = _diff_tri_fn(geometry_grads)
    pick_w = None
    if nee_mode == "power":
        # bake the pick distribution from the CONCRETE base tables — the
        # traced (overridden) tables cannot weigh and would silently fall
        # back to uniform picking, diverging from the fused grad kernel's
        # baked power pick (the pick is a detached sampling choice either
        # way)
        from .lights import light_power_weights

        pick_w = light_power_weights(tables)

    def radiance(params, pixel_ids, pixel_xy, sample_idx):
        from .scene.tables import rejoin_appearance

        # re-derive the denormalized per-triangle appearance columns from
        # the overridden relational params so gradients reach them
        scene = rejoin_appearance(tables._replace(**params))
        integrate = make_path_integrator(
            scene, statics, max_depth, nee=nee,
            cosine_sampling=cosine_sampling, tri_fn=tri_fn,
            nee_mode=nee_mode, pick_weights=pick_w,
        )
        keys = path_keys(seed, pixel_ids, sample_idx)
        u = uniform2(keys, CAMERA_SITE)
        rays = camera.sample_rays((pixel_xy + u) / wh)
        return integrate(rays, keys)

    return radiance


def make_loss_fn(radiance_fn):
    """L2 image loss against a target; mean over lanes and channels."""

    def loss(params, pixel_ids, pixel_xy, target, sample_idx):
        img = radiance_fn(params, pixel_ids, pixel_xy, sample_idx)
        return jnp.mean((img - target) ** 2)

    return loss


def make_train_step(radiance_fn, lr=0.05):
    """One SGD step on the differentiable scene params. Under a sharded jit
    the pixel-axis inputs are sharded and XLA inserts the cross-device
    ``psum`` for the (replicated) parameter gradients automatically."""
    loss = make_loss_fn(radiance_fn)
    grad_fn = jax.value_and_grad(loss)

    def step(params, pixel_ids, pixel_xy, target, sample_idx):
        val, g = grad_fn(params, pixel_ids, pixel_xy, target, sample_idx)
        new = {k: v - lr * g[k] for k, v in params.items()}
        return val, new, g

    return step


def try_make_fast_value_and_grad(
    tables, statics, camera, width, height, max_depth=3, nee=True,
    cosine_sampling=True, seed=0, interpret=False, force=False,
    le_grads=False, nee_mode="all",
):
    """Forward-pass ANALYTIC value_and_grad of the L2 image loss — the
    megakernel accumulates per-lane ∂img/∂mat_albedo and ∂img/∂al_le
    alongside radiance (megakernel.try_make_fused_grad_path), so the
    whole "fwd+bwd" costs one forward kernel: no tape, no transpose
    (bench_fwdbwd.py measured the reverse-mode transpose at 1.3x the
    forward, an irreducible floor for that formulation).

    Same call signature as ``jax.value_and_grad(make_loss_fn(...))``:
    ``step(params, pixel_ids, pixel_xy, target, sample_idx) ->
    (loss, grads)`` with grads for ``params`` keys. Both "mat_albedo"
    (through the per-call rejoined tri_rec) and "al_le" (through the
    kernel's live Le VMEM table) are LIVE parameters — updates take
    effect without recompiling; ``le_grads=True`` additionally returns
    ``grads["al_le"]`` when al_le is not being optimized. Parity-gated
    against jax.value_and_grad on the autodiff pipeline
    (tests/test_diff.py::test_analytic_grad_kernel_matches_autodiff,
    including perturbed-Le values). Returns None when the scene isn't
    megakernel-eligible."""
    import jax.numpy as jnp

    from .integrators.megakernel import try_make_fused_grad_path
    from .scene.tables import rejoin_appearance

    fg = try_make_fused_grad_path(
        tables, statics, max_depth, nee=nee,
        cosine_sampling=cosine_sampling, interpret=interpret, force=force,
        nee_mode=nee_mode,
    )
    if fg is None:
        # volume scenes: the fused heterogeneous analytic-gradient path
        # (round 5 — forward-speed ∂loss/∂{grid_density, al_le} via the
        # suffix-replay kernel; grad-sampling estimator variant)
        from .integrators.het_megakernel import (
            try_make_fused_het_value_and_grad,
        )

        return try_make_fused_het_value_and_grad(
            tables, statics, camera, width, height, max_depth, nee=nee,
            seed=seed, interpret=interpret, force=force,
        )
    wh = jnp.asarray([float(width), float(height)])

    def step(params, pixel_ids, pixel_xy, target, sample_idx):
        rec_params = {k: v for k, v in params.items() if k != "al_le"}
        scene = rejoin_appearance(tables._replace(**rec_params))
        keys = path_keys(seed, pixel_ids, sample_idx)
        u = uniform2(keys, CAMERA_SITE)
        rays = camera.sample_rays((pixel_xy + u) / wh)
        img, galb, gle = fg(
            rays, keys, tri_rec=scene.tri_rec, al_le=params.get("al_le")
        )
        n = img.shape[0]
        loss = jnp.mean((img - target) ** 2)
        r = 2.0 * (img - target) / (n * 3)
        grads = {}
        if "mat_albedo" in params:
            grads["mat_albedo"] = jnp.einsum("nc,nckm->mk", r, galb)
        if le_grads or "al_le" in params:
            gl = jnp.einsum("nc,ncl->lc", r, gle)
            base = params.get("al_le", tables.al_le)
            grads["al_le"] = (
                jnp.zeros_like(base).at[: gl.shape[0]].set(gl)
            )
        return loss, grads

    return step
