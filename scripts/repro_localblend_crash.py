"""Minimal on-chip repro for the eval-harness TPU worker crash.

eval_onchip_smoke.py crashed the TPU worker three times at the same point
(first batch drain).  bench.py's etainv+ptp cfg differs from the PIE
per-sample cfg in exactly: is_replace_controller=False (refine), blend_words
(LocalBlend), equilizer_params.  This script runs that cfg directly through
edit_batch to isolate which ingredient faults the chip.

Usage: REPRO_MODE=full|noblend|noeq|replace python scripts/repro_localblend_crash.py
"""
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    mode = os.environ.get("REPRO_MODE", "full")
    steps = int(os.environ.get("REPRO_STEPS", "50"))
    batch = int(os.environ.get("REPRO_BATCH", "8"))

    import jax
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE",
                               os.path.expanduser("~/.cache/eta_tpu_jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    print("devices:", jax.devices())

    import jax.numpy as jnp
    from eta_inversion_tpu import load_inverter, load_editor
    from eta_inversion_tpu.models import load_diffusion_model
    from eta_inversion_tpu.editing.batched import edit_batch

    model, (pre, post) = load_diffusion_model("sd15", dtype="bfloat16")
    inverter = load_inverter(model, "etainv", num_inference_steps=steps,
                             eta=((0.6, 0.0), (1.0, 0.7)), noise_sample_count=10)
    editor = load_editor(inverter, "ptp")

    pairs = [("cat", "tiger"), ("dog", "wolf"), ("car", "truck"),
             ("house", "castle")]
    rs = np.random.RandomState(0)
    images, srcs, tgts, cfgs = [], [], [], []
    for i in range(batch):
        sw, tw = pairs[i % len(pairs)]
        src = f"a {sw} sitting in a garden"
        tgt = f"a {tw} sitting in a garden"
        cfg = dict(
            is_replace_controller=(mode == "replace"),
            prompts=[src, tgt],
            cross_replace_steps={"default_": 0.4},
            self_replace_steps=0.6,
            blend_words=None if mode == "noblend" else (((sw,), (tw,))),
            equilizer_params=None if mode in ("noeq",) else
            {"words": (tw,), "values": (2,)},
        )
        if mode == "noblend":
            cfg["equilizer_params"] = None
        srcs.append(src)
        tgts.append(tgt)
        cfgs.append(cfg)
    images = jnp.asarray(
        rs.rand(batch, 512, 512, 3).astype("float32") * 2 - 1)

    # etainv needs per-sample word indices + gt mask like the PIE eval path
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    inv_cfgs = [{"edit_word_idx": (1, 1), "mask": mask} for _ in range(batch)]

    print(f"=== repro mode={mode} steps={steps} batch={batch}")
    t0 = time.time()
    res = edit_batch(editor, images, srcs, tgts, cfgs=cfgs,
                     inv_cfgs=inv_cfgs)
    if mode == "post":
        # mirror eval.py save(): per-row postproc program + fetch
        for j in range(batch):
            out = post(res["image"][j])
            print(f"row {j}: {out.shape} {out.dtype} mean={out.mean():.1f}")
        print(f"OK: postproc path in {time.time()-t0:.1f}s")
    else:
        img = np.asarray(res["image"])  # blocking fetch — the crash point
        print(f"OK: fetched {img.shape} {img.dtype} in {time.time()-t0:.1f}s, "
              f"finite={np.isfinite(np.asarray(img, np.float32)).all()}")


if __name__ == "__main__":
    main()
