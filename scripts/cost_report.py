"""Roofline cost report for the flagship edit pipeline phases.

Uses XLA's compiled cost model (flops / bytes accessed) plus optional on-device
timing to show how far each phase sits from the chip roofline — the
first-class profiling counterpart of the reference's wall-clock prints
(/root/reference/edit_image.py:113-130; SURVEY.md §5.1).

    python scripts/cost_report.py --model tiny --steps 4 --batch 2
    python scripts/cost_report.py --model sd15 --steps 50 --batch 8 --time
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(Path.home() / ".cache/eta_tpu_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from eta_inversion_tpu import load_editor, load_inverter
    from eta_inversion_tpu.models import load_diffusion_model
    from eta_inversion_tpu.utils.profiling import cost_analysis, format_cost

    model, _ = load_diffusion_model(args.model, dtype=args.dtype)
    inv = load_inverter(model, "diffinv", num_inference_steps=args.steps)

    B = args.batch
    s = model.image_size
    rs = np.random.RandomState(0)
    image = jnp.asarray(rs.rand(B, s, s, 3).astype("float32") * 2 - 1)
    ctx1 = inv.embed_texts([f"a cat number {i}" for i in range(B)])
    ctx = jnp.concatenate([jnp.broadcast_to(inv.embed_texts([""]), ctx1.shape),
                           ctx1], axis=0)
    latent = inv.encode(image)
    t = jnp.asarray(500)

    def unet_step(params, z, t, ctx):
        return inv.predict_noise(params, z, t, ctx, inv.guidance_scale_bwd)[0]

    def vae_encode(params, x):
        return inv.encode(x)

    def vae_decode(params, lat):
        return inv.decode(lat)

    phases = [
        ("unet_cfg_step", unet_step, (model.params, latent, t, ctx)),
        ("vae_encode", vae_encode, (model.params, image)),
        ("vae_decode", vae_decode, (model.params, latent)),
    ]

    print(f"# model={args.model} batch={B} image={s}px "
          f"backend={jax.default_backend()}")
    for name, fn, fargs in phases:
        cost = cost_analysis(fn, *fargs)
        measured = None
        if args.time:
            jfn = jax.jit(fn)  # time the compiled program, not eager dispatch
            out = jfn(*fargs)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]
                             ).astype("float32").mean())  # sync
            t0 = time.time()
            for _ in range(args.repeats):
                out = jfn(*fargs)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]
                             ).astype("float32").mean())
            measured = (time.time() - t0) / args.repeats * 1e3
        print(format_cost(name, cost, measured))


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="Roofline cost report")
    p.add_argument("--model", default="tiny")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--time", action="store_true",
                   help="Also measure on-device runtime per phase")
    p.add_argument("--repeats", type=int, default=10)
    main(p.parse_args())
