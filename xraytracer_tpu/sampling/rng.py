"""Counter-based, per-path RNG.

The reference uses one stateful ``std::mt19937`` per pixel, seeded with the
pixel index (reference: Src/sampler.h:37-50, Src/renderer.cpp:35-36), which
gives per-pixel deterministic renders. On TPU that becomes a *counter-based*
scheme: each random draw is a pure function of

    (seed, global pixel id, sample index, site counter)

so renders are bitwise deterministic regardless of chunking, device count, or
host count (SURVEY §7 "multi-host determinism"). ``site`` counters are small
static ints that enumerate every consumption point inside an integrator; each
wavefront bounce offsets them by ``SITES_PER_BOUNCE``.
"""

import jax
import jax.numpy as jnp

# Generous per-bounce site budget: every integrator must consume fewer than
# this many distinct random sites per bounce (incl. tracking loop sites).
SITES_PER_BOUNCE = 1 << 16


def base_key(seed):
    """Root key for a render."""
    return jax.random.PRNGKey(seed)


def path_keys(seed, pixel_ids, sample_idx):
    """Per-path keys: fold the global pixel id and the sample index into the
    root key. ``pixel_ids`` is (N,) int32; ``sample_idx`` scalar int.

    Counterpart of ``sampler->setSeed(j + width * i)`` + the spp loop
    (reference: Src/renderer.cpp:36,42).
    """
    root = base_key(seed)
    k = jax.vmap(lambda p: jax.random.fold_in(root, p))(pixel_ids)
    return jax.vmap(lambda kk: jax.random.fold_in(kk, sample_idx))(k)


def uniform1(keys, site):
    """One uniform float in [0,1) per path. keys: (N,) key array -> (N,)."""
    return jax.vmap(
        lambda k: jax.random.uniform(jax.random.fold_in(k, site))
    )(keys)


def uniform2(keys, site):
    """Two uniforms per path -> (N, 2). Consumes a single site."""
    return jax.vmap(
        lambda k: jax.random.uniform(jax.random.fold_in(k, site), (2,))
    )(keys)


def uniform3(keys, site):
    """Three uniforms per path -> (N, 3). Consumes a single site."""
    return jax.vmap(
        lambda k: jax.random.uniform(jax.random.fold_in(k, site), (3,))
    )(keys)


def scalar_uniform(key, site, shape=()):
    """Uniforms from a single (non-batched) key, used by the scalar oracle."""
    return jax.random.uniform(jax.random.fold_in(key, site), shape)
