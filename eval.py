"""Benchmark evaluation driver (counterpart of /root/reference/eval.py).

yaml config grid -> one experiment per (model, data, edit_cfg, method,
edit_method) combination; writes result/{exp}/{NN_name}/{cfg.yaml, imgs/*.png}
with per-sample resume (skip existing pngs) and whole-experiment skipping.

Parallelism: on TPU, experiments run sequentially on the chip (each already
batches work onto the device); `--num_hosts/--host_id` partition the grid
across hosts (DCN level, no tensor traffic — replaces the reference's
CUDA_VISIBLE_DEVICES process pool).
"""

import argparse
import gc
import time
from pathlib import Path

import yaml

from eta_inversion_tpu.utils.debug_utils import enable_deterministic

enable_deterministic()


def _parse_mesh(spec):
    """"DATAxMODEL" (e.g. "4x2") or "N" -> (data, model_parallel) or None."""
    if not spec:
        return None
    parts = str(spec).lower().split("x")
    dp = int(parts[0])
    mp = int(parts[1]) if len(parts) > 1 else 1
    return dp, mp


def run_eval(cfg, override=False, skip_existing_dirs=False, batch: int = 1,
             mesh: str = None, inflight: int = 1):
    import contextlib

    import numpy as np
    from PIL import Image

    from eta_inversion_tpu import load_editor, load_inverter
    from eta_inversion_tpu.models import load_diffusion_model
    from eta_inversion_tpu.utils.eval_utils import EditResultData

    mesh_spec = _parse_mesh(mesh)
    stack = contextlib.ExitStack()

    path = Path(cfg["path"])
    if path.exists() and skip_existing_dirs:
        print(f"skipping existing {path}")
        return
    (path / "imgs").mkdir(parents=True, exist_ok=True)
    with open(path / "cfg.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    data = EditResultData.from_state_dict(cfg, skip_existing=not override,
                                          skip_img_load=True)

    edit_method = dict(cfg["edit_method"])
    editor_type = edit_method["type"]
    state = {"model": None, "editor": None, "preproc": None, "postproc": None}

    def ensure_loaded():
        if state["model"] is not None:
            return
        method = dict(cfg["method"])
        model_cfg = cfg.get("model") or "sd15"
        if not isinstance(model_cfg, dict):
            model_cfg = {"type": model_cfg}
        model_cfg = dict(model_cfg)
        if "dtype" not in model_cfg:
            import jax
            if jax.devices()[0].platform != "cpu":
                # TPU-native compute dtype.  The fp32 loader default at SD
                # scale (4.3 GB params + fp32 activations/attention stores at
                # batch 8) exceeds a 16 GB chip and faults the TPU worker
                # mid-program; an explicit model: {type: ..., dtype: float32}
                # in the yaml still wins.  Applied after create_configs, so
                # result-tree directory names are unaffected.
                model_cfg["dtype"] = "bfloat16"
                print("model dtype unspecified on a TPU backend: using bfloat16")
        state["model"], (state["preproc"], state["postproc"]) = \
            load_diffusion_model(model_cfg.pop("type"), **model_cfg)
        if mesh_spec is not None:
            # data x model device mesh: batch shards over ICI "data",
            # attention/MLP parameter matrices over "model" (replaces the
            # reference's process-per-GPU pool, utils/device_pool.py:10-61)
            from eta_inversion_tpu.models import DiffusionModel
            from eta_inversion_tpu.parallel.mesh import make_mesh
            from eta_inversion_tpu.parallel.sharding import shard_params

            dp, mp = mesh_spec
            m = make_mesh(dp * mp, model_parallel=mp)
            base = state["model"]
            state["model"] = DiffusionModel(
                base.preset, shard_params(base.params, m), base.tokenizer,
                dtype=base.dtype, schedule=base.schedule_config)
            stack.enter_context(m)
        inverter = load_inverter(state["model"], method.pop("type"), **method)
        em = dict(edit_method)
        state["editor"] = load_editor(inverter, em.pop("type"), **em)

    # native threaded image pipeline: decode+preprocess the next batch while
    # the chip runs the current one (eta_inversion_tpu/native.py,
    # native/loader.cpp; the reference loads synchronously per sample,
    # /root/reference/eval.py:84-100)
    loader_state = {"loader": None, "tickets": {}}

    def ensure_loader():
        if loader_state["loader"] is None:
            from eta_inversion_tpu.native import NativeImageLoader

            pre = state["preproc"]
            loader_state["loader"] = NativeImageLoader(
                pre.size, pre.center_crop, threads=4, fallback_fn=pre,
                force_fallback=pre.pil_resize)
        return loader_state["loader"]

    def prefetch(i, sample):
        f = sample.get("image_file")
        if f is not None:
            loader_state["tickets"][i] = ensure_loader().submit(f)

    def sample_args(i, sample):
        ticket = loader_state["tickets"].pop(i, None)
        if ticket is not None:
            image = loader_state["loader"].get(ticket)
        else:
            image_file = sample.get("image_file")
            image = state["preproc"](
                image_file if image_file is not None else sample["image"])
        # per-sample editing config keyed by editor type (reference eval.py:94)
        edit_cfg = sample["edit"].get(editor_type)
        if "zT_gt" in sample and isinstance(edit_cfg, dict):
            edit_cfg["zT_gt"] = sample["zT_gt"]
        inv_cfg = {"edit_word_idx": sample.get("edit_word_idx"),
                   "mask": sample.get("mask")}
        return image, edit_cfg, inv_cfg

    from concurrent.futures import ThreadPoolExecutor

    png_pool = ThreadPoolExecutor(max_workers=4)  # zlib encode releases the GIL
    png_futs = []

    def _encode(out, path_str, i):
        Image.fromarray(out).save(path_str)
        print(f"[{i}] saved {path_str}")

    def save(sample, image_arr, i):
        out = state["postproc"](image_arr)
        Path(sample["edit_image_file"]).parent.mkdir(parents=True, exist_ok=True)
        _encode(out, sample["edit_image_file"], i)

    pending = []  # (i, sample) batch accumulator
    in_flight = []  # dispatched-but-unsaved device batches

    def drain_inflight(keep: int = 0):
        while len(in_flight) > keep:
            idxs, samples, res = in_flight.pop(0)
            # one device program + one host fetch for the whole batch (the
            # per-slice path costs N separate ~100 ms relay round trips)
            u8 = state["postproc"].batch(res["image"])
            for j, (i, s) in enumerate(zip(idxs, samples)):
                Path(s["edit_image_file"]).parent.mkdir(parents=True,
                                                        exist_ok=True)
                png_futs.append(png_pool.submit(
                    _encode, u8[j], s["edit_image_file"], i))
            # surface finished encodes' errors and keep the list bounded
            for f in [f for f in png_futs if f.done()]:
                f.result()
            png_futs[:] = [f for f in png_futs if not f.done()]

    def flush_batch():
        if not pending:
            return
        from eta_inversion_tpu.editing.batched import edit_batch

        import jax.numpy as jnp

        t_batch = time.monotonic()
        gc.collect()  # once per batch, not per sample (collects are ~0.1 s
        # each over a heap holding big device buffers)
        idxs, samples = zip(*pending)
        pending.clear()
        args = [sample_args(i, s) for i, s in zip(idxs, samples)]
        images = jnp.concatenate([a[0] for a in args], axis=0)
        t_asm = time.monotonic()
        # Host/device overlap under the axon relay's one-big-program-in-flight
        # constraint (two 50-step edit programs queued exhaust chip-side HBM
        # buffers): fetch the PREVIOUS batch's outputs here — AFTER this
        # batch's host assembly (image decode, cfg merge) overlapped the
        # previous program's device run, BEFORE this batch dispatches.  PNG
        # encodes submitted by the drain then run on pool threads while this
        # batch's program runs.  inflight=1 (default) = exactly this;
        # inflight=0 = fully synchronous (drain right after dispatch);
        # inflight>=2 = old pipelined mode (N programs genuinely queued —
        # crashes the axon relay, fine on a directly attached chip).
        if inflight > 0:
            drain_inflight(keep=int(inflight) - 1)
        t_drain = time.monotonic()
        res = edit_batch(state["editor"], images,
                         [s["source_prompt"] for s in samples],
                         [s["edit"]["target_prompt"] for s in samples],
                         cfgs=[a[1] for a in args],
                         inv_cfgs=[a[2] for a in args])
        if res is None:
            print(f"batch {idxs}: combination unsupported, skipping")
            return
        in_flight.append((idxs, samples, res))
        if inflight == 0:
            drain_inflight(keep=0)
        t_end = time.monotonic()
        # steady state: wall ~= previous batch's device time + this batch's
        # dispatch; asm/dispatch are the serial host costs, drain is the wait
        print(f"batch [{idxs[0]}..{idxs[-1]}] wall {t_end - t_batch:.1f}s"
              f" ({(t_end - t_batch) / len(idxs):.2f} s/img;"
              f" asm {t_asm - t_batch:.2f}s drain {t_drain - t_asm:.2f}s"
              f" dispatch {t_end - t_drain:.2f}s)")

    try:
        with stack:  # holds the device mesh when --mesh is set
            for i in range(len(data)):
                sample = data[i]
                if sample is None:
                    continue  # resume: output exists
                ensure_loaded()
                if batch <= 1:
                    gc.collect()

                if batch > 1:
                    prefetch(i, sample)
                    pending.append((i, sample))
                    if len(pending) == batch:
                        flush_batch()
                    continue

                image, edit_cfg, inv_cfg = sample_args(i, sample)
                res = state["editor"].edit(image, sample["source_prompt"],
                                           sample["edit"]["target_prompt"],
                                           cfg=edit_cfg, inv_cfg=inv_cfg)
                if res is None:
                    print(f"[{i}] combination unsupported, skipping")
                    continue
                save(sample, res["image"], i)

            drain_inflight()
            # trailing partial batch runs per-sample to keep compiled shapes
            # stable — a real perf cliff (~batch x slower per image), so say
            # so out loud
            if pending:
                print(f"tail of {len(pending)} sample(s) < batch {batch}: "
                      f"falling back to per-sample edits (slower; pad the "
                      f"dataset to a multiple of the batch to avoid this)")
            for i, sample in pending:
                image, edit_cfg, inv_cfg = sample_args(i, sample)
                res = state["editor"].edit(image, sample["source_prompt"],
                                           sample["edit"]["target_prompt"],
                                           cfg=edit_cfg, inv_cfg=inv_cfg)
                if res is None:
                    print(f"[{i}] combination unsupported, skipping")
                else:
                    save(sample, res["image"], i)
        # success path: join + surface encode errors before resume/return
        for f in png_futs:
            f.result()
    finally:
        # even when an edit/drain raised mid-run, join the pending encodes and
        # release the pool/loader (otherwise futures are abandoned with their
        # exceptions never surfaced and a 4-thread pool leaks per grid config
        # — ADVICE r4); print-not-raise so the original exception propagates
        for f in png_futs:
            if f.exception() is not None:
                print(f"png encode failed: {f.exception()!r}")
        png_pool.shutdown()
        if loader_state["loader"] is not None:
            loader_state["loader"].close()


def main(args):
    from eta_inversion_tpu.parallel.eval_pool import partition_grid
    from eta_inversion_tpu.utils.eval_utils import create_configs

    cfgs, cfg_all = create_configs(args.cfg)
    cfgs = partition_grid(cfgs, args.host_id, args.num_hosts)
    Path(cfg_all["path"]).mkdir(parents=True, exist_ok=True)
    with open(Path(cfg_all["path"]) / "cfg.yaml", "w") as f:
        yaml.safe_dump(cfg_all, f)

    for cfg in cfgs:
        print(f"=== {cfg['path']}")
        run_eval(cfg, override=args.override,
                 skip_existing_dirs=args.skip_existing_dirs, batch=args.batch,
                 mesh=args.mesh, inflight=args.inflight)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Run an editing benchmark sweep")
    parser.add_argument("--cfg", type=str, required=True,
                        help="Eval config name (cfg/eval/{name}.yaml) or path")
    parser.add_argument("--override", action="store_true",
                        help="Recompute existing images")
    parser.add_argument("--skip_existing_dirs", action="store_true",
                        help="Skip whole experiment dirs that already exist")
    parser.add_argument("--host_id", type=int, default=0)
    parser.add_argument("--num_hosts", type=int, default=1)
    parser.add_argument("--batch", type=int, default=1,
                        help="Pair-batched editing: run N samples per compiled "
                             "program (supported editors: simple/ptp/"
                             "masactrl/pnp/invedit/pix2pix_zero)")
    parser.add_argument("--inflight", type=int, default=1,
                        help="Batches kept in flight. 1 (default) = fetch the "
                             "previous batch only after assembling the next "
                             "one, so host IO overlaps device compute with at "
                             "most ONE big program queued (safe under the "
                             "axon relay); 0 = fully synchronous; >=2 = "
                             "genuinely pipelined dispatches (crashes the "
                             "axon relay's chip-side buffer accounting, fine "
                             "on a directly attached chip)")
    parser.add_argument("--mesh", type=str, default=None,
                        help="Device mesh DATAxMODEL (e.g. 4x2) or DATA: "
                             "shard the edit batch over ICI data-parallel "
                             "chips with optional tensor-parallel params; "
                             "combine with --batch >= the data axis")
    main(parser.parse_args())
