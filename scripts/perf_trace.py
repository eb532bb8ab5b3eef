"""Capture a jax.profiler device trace of the bench's backward scan and print
an op-level time breakdown (via xprof's xplane converter).

Usage: python scripts/perf_trace.py [phase]   # phase: bwd (default) | fwd | unet
"""

import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/eta_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from eta_inversion_tpu import load_editor, load_inverter
    from eta_inversion_tpu.editing.batched import _merged_ptp_cfg
    from eta_inversion_tpu.models import load_diffusion_model

    phase = sys.argv[1] if len(sys.argv) > 1 else "bwd"
    steps = int(os.environ.get("PROBE_STEPS", "50"))
    B = int(os.environ.get("PROBE_BATCH", "8"))
    model_name = os.environ.get("PROBE_MODEL", "sd15")

    model, _ = load_diffusion_model(model_name, dtype="bfloat16")
    inv = load_inverter(model, "etainv", num_inference_steps=steps,
                        eta=((0.6, 0.0), (1.0, 0.7)), noise_sample_count=10)
    editor = load_editor(inv, "ptp")
    cfg = dict(is_replace_controller=True, cross_replace_steps=0.8,
               self_replace_steps=0.5)

    rs = np.random.RandomState(0)
    size = model.image_size
    images = jnp.asarray(rs.rand(B, size, size, 3).astype("float32") * 2 - 1)
    srcs = [f"a cat sitting next to a mirror number {i}" for i in range(B)]
    tgts = [f"a tiger sitting next to a mirror number {i}" for i in range(B)]
    inv_cfg = {"edit_word_idx": [(1, 1)] * B}

    uncond = inv.embed_texts([""])
    cond_src = inv.embed_texts(srcs)
    cond_tgt = inv.embed_texts(tgts)
    ctx_inv = jnp.concatenate(
        [jnp.broadcast_to(uncond, cond_src.shape), cond_src], axis=0)
    inv_res = inv.invert(images, context=ctx_inv, inv_cfg=inv_cfg)
    u = jnp.broadcast_to(uncond, cond_src.shape)
    ctx_bwd = jnp.concatenate([u, u, cond_src, cond_tgt], axis=0)
    ctrl = editor.make_controller(
        image=images, source_prompt=list(srcs), target_prompt=list(tgts),
        inv_res=inv_res, **_merged_ptp_cfg([cfg] * B, B))
    zT = inv_res["latents"][-1]
    latent2 = jnp.concatenate([zT, zT], axis=0)

    def run_bwd():
        z0 = inv.diffusion_backward(latent2, ctx_bwd, inv_res, ctrl=ctrl)
        return float(np.asarray(jnp.sum(z0.astype(jnp.float32))))

    def run_fwd():
        r = inv.invert(images, context=ctx_inv, inv_cfg=inv_cfg)
        return float(np.asarray(jnp.sum(r["zT_inv"].astype(jnp.float32))))

    run = {"bwd": run_bwd, "fwd": run_fwd}[phase]
    print("warm:", run())
    t0 = time.perf_counter()
    run()
    print(f"steady: {time.perf_counter() - t0:.3f}s")

    log_dir = f"/tmp/jax-trace-{phase}"
    jax.profiler.start_trace(log_dir)
    run()
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    xplanes = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print("NO XPLANE FILES — device tracing unsupported here")
        return
    xp = max(xplanes, key=os.path.getmtime)
    print("xplane:", xp, os.path.getsize(xp), "bytes")

    from xprof.convert import raw_to_tool_data as rtd

    for tool in ("framework_op_stats", "op_profile"):
        try:
            data, _ = rtd.xspace_to_tool_data([xp], tool, {})
            out = f"/tmp/trace_{phase}_{tool}.out"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out, mode) as f:
                f.write(data)
            print(f"wrote {out} ({len(data)} bytes)")
        except Exception as e:
            print(f"{tool} failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
