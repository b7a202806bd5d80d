"""Sweep-kernel cost decomposition: what does a chunk VISIT actually cost?

The streamed triangle sweep (geometry/pallas_kernels.py) is the hot kernel
for every mesh past the megakernel gate. Its per-(tile, group) costs split
into: (a) group DMA + group-level union-AABB decision, (b) per-chunk slab
decision, (c) the full chunk body (MT matmul + hit test + key min + winner
extraction [+ record matmul]). This harness isolates each term by driving
the kernel with doctored AABB tables:

  all-run     every chunk AABB is huge             -> every chunk pays (c)
  chunk-skip  1 huge chunk per group, rest distant -> 15/16 chunks pay (b)
  group-skip  every AABB distant (behind the rays) -> groups pay only (a)
  invalid     every chunk validity bit 0           -> groups pay only (a)
  real/beam   real AABBs, incoherent vs coherent rays

NOTE the branchless slab test cannot reject an inverted (lo > hi) box —
"distant" cases use finite boxes behind the rays; "invalid" uses the
AB_VALID_COL gate.

Run on the real chip: python bench_sweep.py [--rays 131072] [--tris 51200]
Prints one JSON line per case. Used to steer round-3 kernel work; results
recorded in BASELINE.md.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_tris(t_total, seed=0):
    rng = np.random.default_rng(seed)
    # small triangles scattered in [-1,1]^3
    v0 = rng.uniform(-1, 1, (t_total, 3)).astype(np.float32)
    e1 = rng.uniform(-0.02, 0.02, (t_total, 3)).astype(np.float32)
    e2 = rng.uniform(-0.02, 0.02, (t_total, 3)).astype(np.float32)
    return jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2)


def make_rays(n, seed=1, coherent=False):
    rng = np.random.default_rng(seed)
    if coherent:
        # narrow beam: tiny origin disk, near-parallel directions (what the
        # octant|Morton bounce sort produces per 512-lane row)
        o = 0.05 * rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        o[:, 2] = 3.0
        d = rng.normal(size=(n, 3)).astype(np.float32) * 0.05
        d[:, 2] = -1.0
    else:
        o = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        o[:, 2] = 3.0
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d[:, 2] = -np.abs(d[:, 2]) - 1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


CHAIN = 16          # kernel calls chained per jit (amortizes the tunnel
                    # round-trip — measured ~23 ms NULL latency, which
                    # swamped per-call costs in the first harness version)


def run_case(name, f, g_chunks, rec_chunks, ab, n_pad, t_total, variant,
             reps=5):
    from xraytracer_tpu.geometry import pallas_kernels as pk

    # timing is host-fetch of an in-jit scalar reduce over a CHAIN of
    # sequentially-dependent kernel calls: on the axon tunnel a single
    # call measures mostly the ~23 ms round-trip, so per-call cost is
    # the chained time / CHAIN with the floor amortized away
    def sum_chain(one, f, rest):
        # the where() is an opaque no-op dependency: `acc * 0` gets
        # algebraically folded to 0 and the whole chain CSE-collapses to
        # one kernel call (measured: exactly single-call-time / CHAIN)
        acc = jnp.int32(0)
        for _ in range(CHAIN):
            fi = jnp.where(acc == jnp.int32(-987654321), f + 1.0, f)
            acc = acc + one(fi, *rest)
        return acc

    if variant == "rec":
        one = lambda f, g, r, ab: jnp.sum(
            pk.sweep_pallas_rec(f, g, r, ab, n_pad)[1])
        args = (f, g_chunks, rec_chunks, ab)
        fn = jax.jit(lambda f, g, r, ab: sum_chain(one, f, (g, r, ab)))
    elif variant == "anyhit":
        one = lambda f, g, ab: jnp.sum(
            pk.sweep_pallas(f, g, ab, n_pad, anyhit=True)[1])
        args = (f, g_chunks, ab)
        fn = jax.jit(lambda f, g, ab: sum_chain(one, f, (g, ab)))
    else:
        one = lambda f, g, ab: jnp.sum(pk.sweep_pallas(f, g, ab, n_pad)[1])
        args = (f, g_chunks, ab)
        fn = jax.jit(lambda f, g, ab: sum_chain(one, f, (g, ab)))
    float(fn(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    best /= CHAIN
    n_groups = -(-g_chunks.shape[0] // pk.CHUNK_GROUP) \
        if g_chunks.shape[0] > pk.CHUNK_GROUP else 1
    n_tiles = n_pad // pk.RAY_TILE
    print(json.dumps({
        "case": name, "variant": variant, "ms": best * 1e3,
        "us_per_tile_group": best * 1e6 / (n_tiles * max(n_groups, 1)),
        "tests_per_s": n_pad * t_total / best,
    }), flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=131072)
    ap.add_argument("--tris", type=int, default=51200)
    ap.add_argument("--no-worklist", action="store_true")
    ap.add_argument("--variants", default="nearest,rec,anyhit")
    args = ap.parse_args()

    from xraytracer_tpu.geometry import pallas_kernels as pk

    if args.no_worklist:
        pk.ENABLE_WORKLIST = False
    from xraytracer_tpu.geometry.intersect import _ray_features_t

    t_total = args.tris
    tc = pk.TRI_CHUNK
    v0, e1, e2 = make_tris(t_total)
    valid = jnp.ones((t_total,), bool)
    center = jnp.mean(v0, axis=0)
    g_chunks = pk._build_g_chunks(v0 - center, e1, e2, valid, tc)
    ab_real = pk._build_chunk_aabbs(v0 - center, e1, e2, valid, tc)
    n_chunks = t_total // tc
    rec_chunks = jnp.zeros((n_chunks, tc, 32), jnp.float32)

    o, d = make_rays(args.rays)
    f = _ray_features_t(o - center, d)
    n_pad = ((args.rays + pk.RAY_TILE - 1) // pk.RAY_TILE) * pk.RAY_TILE
    if n_pad != args.rays:
        f = jnp.pad(f, ((0, 0), (0, n_pad - args.rays)))

    ones = jnp.ones((n_chunks, 1))
    zeros3 = jnp.zeros((n_chunks, 1))
    huge = jnp.concatenate([
        jnp.full((n_chunks, 3), -100.0), jnp.full((n_chunks, 3), 100.0),
        ones, zeros3], axis=-1)
    # behind the rays (rays start at z=3 heading -z): slab rejects, valid=1
    distant = jnp.concatenate([
        jnp.full((n_chunks, 3), 500.0), jnp.full((n_chunks, 3), 500.0),
        ones, zeros3], axis=-1)
    invalid = ab_real.at[:, pk.AB_VALID_COL].set(0.0)
    mask = (np.arange(n_chunks) % pk.CHUNK_GROUP == 0)[:, None]
    mixed = jnp.where(jnp.asarray(mask), huge, distant)

    ob, db = make_rays(args.rays, coherent=True)
    fb = _ray_features_t(ob - center, db)
    if n_pad != args.rays:
        fb = jnp.pad(fb, ((0, 0), (0, n_pad - args.rays)))

    for variant in args.variants.split(","):
        rec = rec_chunks
        run_case("all-run", f, g_chunks, rec, huge, n_pad, t_total, variant)
        run_case("chunk-skip", f, g_chunks, rec, mixed, n_pad, t_total,
                 variant)
        run_case("group-skip", f, g_chunks, rec, distant, n_pad, t_total,
                 variant)
        run_case("invalid", f, g_chunks, rec, invalid, n_pad, t_total,
                 variant)
        run_case("real-aabbs", f, g_chunks, rec, ab_real, n_pad, t_total,
                 variant)
        run_case("real-beam", fb, g_chunks, rec, ab_real, n_pad, t_total,
                 variant)


if __name__ == "__main__":
    main()
