"""Batch-1 latency breakdown: per-phase wall times of ONE flagship edit.

The bench's latency row (BENCH_BATCH=1) reports one number; this script
splits it into the pipeline's phases — text embed, VAE encode, inversion
scan, host-side controller construction (the fwd->bwd program boundary),
denoise scan, VAE decode, and the final uint8 fetch — each synced explicitly,
so the host/dispatch overhead between compiled programs is measured rather
than guessed.  Run AFTER bench.py has warmed the compile cache.

Usage: python scripts/latency_probe.py [repeats]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/eta_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from eta_inversion_tpu import load_editor, load_inverter
    from eta_inversion_tpu.models import load_diffusion_model

    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    steps = int(os.environ.get("PROBE_STEPS", "50"))

    model, _ = load_diffusion_model("sd15", dtype="bfloat16")
    inv = load_inverter(model, "etainv", num_inference_steps=steps,
                        eta=((0.6, 0.0), (1.0, 0.7)), noise_sample_count=10)
    editor = load_editor(inv, "ptp")
    cfg = dict(is_replace_controller=True, cross_replace_steps=0.8,
               self_replace_steps=0.5)
    inv_cfg = {"edit_word_idx": (1, 1)}

    rs = np.random.RandomState(0)
    image = jnp.asarray(rs.rand(1, 512, 512, 3).astype("float32") * 2 - 1)
    src, tgt = "a cat sitting next to a mirror", "a tiger sitting next to a mirror"

    @jax.jit
    def to_u8(x):
        x = jnp.clip(x.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
        return jnp.round(x * 255.0).astype(jnp.uint8)

    def sync(x):
        jax.tree.map(lambda a: a.block_until_ready()
                     if hasattr(a, "block_until_ready") else a, x)
        # axon: block_until_ready is unreliable; force one scalar fetch
        leaves = [a for a in jax.tree.leaves(x) if hasattr(a, "astype")]
        if leaves:
            np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]
        return x

    # ---- warmup (compile everything the probe hits)
    res = editor.edit(image, src, tgt, cfg=cfg, inv_cfg=inv_cfg)
    np.asarray(to_u8(res["image"]))

    phases = {}

    def mark(name, t0):
        phases.setdefault(name, []).append(time.perf_counter() - t0)

    for _ in range(repeats):
        t0 = time.perf_counter()
        ctx_src = inv.create_context(src)
        ctx_tgt = inv.create_context(tgt)
        sync((ctx_src, ctx_tgt))
        mark("embed", t0)

        t0 = time.perf_counter()
        latent = inv.encode(image)
        sync(latent)
        mark("encode", t0)

        t0 = time.perf_counter()
        inv_res = inv.invert(image, context=ctx_src, inv_cfg=inv_cfg)
        sync(inv_res["zT_inv"])
        mark("fwd_scan", t0)

        t0 = time.perf_counter()
        ctrl = editor.make_controller(
            image=image, source_prompt=src, target_prompt=tgt,
            inv_res=inv_res, is_replace_controller=True,
            cross_replace_steps=0.8, self_replace_steps=0.5)
        mark("controller_host", t0)

        t0 = time.perf_counter()
        zT = inv_res["latents"][-1]
        if os.environ.get("PROBE_NO_SRC", "0") == "1":
            # serving mode: target row only (editor no_source_backward)
            ctx_bwd = ctx_tgt
            latent2 = zT
        else:
            ctx_bwd = inv.cat_context([ctx_src, ctx_tgt])
            latent2 = inv.cat_latent([zT, zT])
        z0 = inv.diffusion_backward(latent2, ctx_bwd, inv_res, ctrl=ctrl)
        sync(z0)
        mark("bwd_scan", t0)

        t0 = time.perf_counter()
        img = inv.decode(z0)
        sync(img)
        mark("decode", t0)

        t0 = time.perf_counter()
        np.asarray(to_u8(img))
        mark("u8_fetch", t0)

    total = 0.0
    for name, ts in phases.items():
        m = min(ts)
        total += m
        print(f"{name:16s} {m * 1000:9.1f} ms  (runs: "
              + ", ".join(f"{t * 1000:.0f}" for t in ts) + ")")
    print(f"{'TOTAL(min)':16s} {total * 1000:9.1f} ms")

    # reference: the fused single-call path the bench times
    for _ in range(2):
        t0 = time.perf_counter()
        res = editor.edit(image, src, tgt, cfg=cfg, inv_cfg=inv_cfg)
        np.asarray(to_u8(res["image"]))
        print(f"editor.edit end-to-end: {time.perf_counter() - t0:.3f}s")


if __name__ == "__main__":
    main()
