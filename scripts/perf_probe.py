"""Per-phase timing of the headline bench path (etainv+ptp, 512px, batch 8).

Replicates edit_batch's phase sequence with a PhaseTimer around each device
program so we can see where the 2.36 s/edit goes.  Uses the same compile-cache
keys as bench.py, so a warm persistent cache makes this start fast.

Env: PROBE_STEPS (50), PROBE_BATCH (8), PROBE_REPEATS (3),
PROBE_MICRO=1 to also run fresh-compile microbenches (slow compiles!).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def sync_scalar(x):
    """Fetch a value to synchronize (block_until_ready unreliable on axon)."""
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/eta_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from eta_inversion_tpu import load_editor, load_inverter
    from eta_inversion_tpu.editing.batched import _merged_ptp_cfg
    from eta_inversion_tpu.models import load_diffusion_model

    steps = int(os.environ.get("PROBE_STEPS", "50"))
    B = int(os.environ.get("PROBE_BATCH", "8"))
    repeats = int(os.environ.get("PROBE_REPEATS", "3"))

    model, _ = load_diffusion_model("sd15", dtype="bfloat16")
    inv = load_inverter(model, "etainv", num_inference_steps=steps,
                        eta=((0.6, 0.0), (1.0, 0.7)), noise_sample_count=10)
    editor = load_editor(inv, "ptp")
    cfg = dict(is_replace_controller=True, cross_replace_steps=0.8,
               self_replace_steps=0.5)

    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(B, 512, 512, 3).astype("float32") * 2 - 1)
    srcs = [f"a cat sitting next to a mirror number {i}" for i in range(B)]
    tgts = [f"a tiger sitting next to a mirror number {i}" for i in range(B)]
    inv_cfg = {"edit_word_idx": [(1, 1)] * B}

    def one_pass(label):
        t_all = time.perf_counter()
        tm = {}

        def mark(name, val):
            s = sync_scalar(val)
            tm[name] = time.perf_counter() - (mark.t0 if hasattr(mark, "t0") else t_all)
            mark.t0 = time.perf_counter()
            return s

        mark.t0 = t_all
        uncond = inv.embed_texts([""])
        cond_src = inv.embed_texts(srcs)
        cond_tgt = inv.embed_texts(tgts)
        mark("embed", cond_tgt)

        ctx_inv = jnp.concatenate(
            [jnp.broadcast_to(uncond, cond_src.shape), cond_src], axis=0)
        latent = inv.encode(images)
        mark("encode", latent)

        inv_res = inv.invert(images, context=ctx_inv, inv_cfg=inv_cfg)
        mark("fwd_scan", inv_res["zT_inv"])

        u = jnp.broadcast_to(uncond, cond_src.shape)
        ctx_bwd = jnp.concatenate([u, u, cond_src, cond_tgt], axis=0)
        ctrl = editor.make_controller(
            image=images, source_prompt=list(srcs), target_prompt=list(tgts),
            inv_res=inv_res, **_merged_ptp_cfg([cfg] * B, B))
        mark("make_ctrl", inv_res["zT_inv"])

        zT = inv_res["latents"][-1]
        latent2 = jnp.concatenate([zT, zT], axis=0)
        z0 = inv.diffusion_backward(latent2, ctx_bwd, inv_res, ctrl=ctrl)
        mark("bwd_scan", z0)

        img = inv.decode(z0)
        mark("decode", img)

        total = time.perf_counter() - t_all
        print(f"[{label}] total={total:.3f}s  ({total / B:.3f} s/edit)")
        for k, v in tm.items():
            print(f"    {k:12s} {v * 1000:10.1f} ms  ({v / B * 1000:8.1f} ms/edit)")
        sys.stdout.flush()
        return total

    one_pass("warmup")
    tot = min(one_pass(f"run{i}") for i in range(repeats))
    print(f"BEST: {tot / B:.4f} s/edit")

    if os.environ.get("PROBE_MICRO") != "1":
        return

    # ---- microbenches (fresh compiles: SD-scale, minutes each on this host)
    params = model.params

    def timed_scan(name, body, x0, n=10):
        def fn(p, x):
            def sbody(c, _):
                return body(p, c), None
            y, _ = jax.lax.scan(sbody, x, None, length=n)
            return y
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        sync_scalar(jfn(params, x0))
        print(f"  {name}: compile+first {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        sync_scalar(jfn(params, x0))
        dt = (time.perf_counter() - t0) / n
        print(f"  {name}: {dt * 1000:.2f} ms/call")
        sys.stdout.flush()
        return dt

    ctx32 = jnp.zeros((32, 77, 768), jnp.bfloat16)
    lat16 = jnp.zeros((16, 64, 64, 4), jnp.float32)

    def unet_cfg_body(p, lat):
        eps = model.unet.apply({"params": p["unet"]},
                               jnp.concatenate([lat, lat], 0),
                               jnp.asarray(500), ctx32)
        eu, ec = jnp.split(eps, 2, 0)
        return (lat + 0.001 * (eu + 7.5 * (ec - eu))).astype(lat.dtype)

    timed_scan("unet_cfg_rows32", unet_cfg_body, lat16)

    def rng_body(p, c):
        lat, key = c
        key, k2 = jax.random.split(key)
        noises = jax.random.normal(k2, (10,) + lat.shape, jnp.float32)
        return (lat + 0.0001 * noises.sum(0), key)

    def timed_scan2(name, body, x0, n=20):
        def fn(x):
            def sbody(c, _):
                return body(None, c), None
            y, _ = jax.lax.scan(sbody, x, None, length=n)
            return y
        jfn = jax.jit(fn)
        sync_scalar(jfn(x0)[0])
        t0 = time.perf_counter()
        sync_scalar(jfn(x0)[0])
        dt = (time.perf_counter() - t0) / n
        print(f"  {name}: {dt * 1000:.3f} ms/call")
        sys.stdout.flush()

    timed_scan2("rng_10cand_b8", rng_body,
                (jnp.zeros((8, 64, 64, 4), jnp.float32), jax.random.PRNGKey(0)))


if __name__ == "__main__":
    main()
