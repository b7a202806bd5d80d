"""Device-count scaling harness (BASELINE.md: rays/s at 1 chip / 1 host /
N hosts, >=90% linear 1->2).

On this machine there is ONE real TPU chip, so true multi-chip scaling
can't be measured; this harness instead validates the scaling SHAPE of the
sharded renderer on an N-device virtual CPU mesh (the same mesh mechanics
a pod uses — pixel-axis NamedSharding, no collectives) and prints a table.
Run on a real pod, the same code measures real scaling — and on TPU the
sharded renderer engages the fused megakernel per device slice
(megakernel.make_spp_render(mesh=...)), so the scaling numbers measure the
flagship fused path, not the wavefront fallback.

Usage: python bench_scaling.py [--devices 1 2 4 8] [--spp 4]
"""

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--spp", type=int, default=4)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--cpu", action="store_true", default=None,
                   help="force the virtual CPU mesh (default when fewer "
                        "real devices than requested)")
    args = p.parse_args()

    import jax

    n_want = max(args.devices)
    try:
        if args.cpu or len(jax.local_devices()) < n_want:
            raise RuntimeError
    except Exception:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n_want)

    from xraytracer_tpu.camera import PinholeCamera
    from xraytracer_tpu.integrators import make_path_integrator
    from xraytracer_tpu.parallel import make_mesh
    from xraytracer_tpu.renderer import WavefrontRenderer, pixel_sharding
    from xraytracer_tpu.scene.builder import scene_statics
    from xraytracer_tpu.scene.presets import build_cornell_box, cornell_camera

    w, h = args.width, args.height
    tables = build_cornell_box().build()
    statics = scene_statics(tables)
    camera = PinholeCamera.make(w / h, **cornell_camera())
    integrate = make_path_integrator(
        tables, statics, max_depth=3, nee=True, cosine_sampling=True
    )

    rows = []
    base = None
    for nd in args.devices:
        mesh = make_mesh(nd)
        r = WavefrontRenderer(
            tables, camera, integrate, w, h, seed=0,
            sharding=pixel_sharding(mesh),
        )
        r.render(1)  # compile
        res = r.render(args.spp)
        rps = res.samples_per_sec
        if base is None:
            base = rps
        eff = rps / (base * nd)
        rows.append(dict(devices=nd, rays_per_s=rps, efficiency=eff))
        print(
            f"devices={nd:2d}  {rps/1e6:8.3f} Mrays/s  "
            f"scaling-efficiency={eff:6.1%}"
        )
    print(json.dumps({"metric": "scaling", "rows": rows}))


if __name__ == "__main__":
    main()
