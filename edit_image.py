"""Single-image editing CLI (counterpart of /root/reference/edit_image.py):
load model -> inverter -> editor -> edit -> save png(s); builds a default ptp
config from the one differing word when none is given (reference :37-58).
"""

import argparse
import time

from eta_inversion_tpu.utils.debug_utils import enable_deterministic

enable_deterministic()


def get_edit_word(source_prompt: str, target_prompt: str):
    """The single differing word pair between the prompts, or None
    (reference edit_image.py:37-58)."""
    sw = source_prompt.split(" ")
    tw = target_prompt.split(" ")
    if len(sw) != len(tw):
        return None
    diff = [(a, b) for a, b in zip(sw, tw) if a != b]
    if len(diff) != 1:
        return None
    return diff[0]


def main(args):
    import numpy as np
    from PIL import Image

    from eta_inversion_tpu import load_editor, load_inverter
    from eta_inversion_tpu.models import load_diffusion_model

    import json

    model, (preproc, postproc) = load_diffusion_model(
        args.model, dtype=args.dtype, weights_dir=getattr(args, "weights_dir", None))
    inverter = load_inverter(model, args.inv_method,
                             num_inference_steps=args.steps, seed=args.seed,
                             **json.loads(args.method_cfg))
    editor = load_editor(inverter, args.edit_method,
                         **json.loads(args.editor_cfg))
    image = preproc(args.input)

    cfg = None
    inv_cfg = None
    edit_word = get_edit_word(args.source_prompt, args.target_prompt)
    if args.edit_method == "ptp":
        cfg = dict(
            is_replace_controller=False,
            cross_replace_steps={"default_": 0.4},
            self_replace_steps=0.6,
        )
        if edit_word is not None:
            cfg["blend_words"] = ((edit_word[0],), (edit_word[1],))
            cfg["equilizer_params"] = {"words": (edit_word[1],), "values": (2,)}
    if edit_word is not None:
        inv_cfg = {"edit_word_idx": (
            args.source_prompt.split(" ").index(edit_word[0]),
            args.target_prompt.split(" ").index(edit_word[1]))}
    if args.edit_cfg:
        cfg = {**(cfg or {}), **json.loads(args.edit_cfg)}

    t1 = time.time()
    res = editor.edit(image, args.source_prompt, args.target_prompt, cfg=cfg,
                      inv_cfg=inv_cfg)
    if res is None:
        print("edit not supported for this inverter/editor combination")
        return
    np.asarray(res["image"]).mean()  # block
    t2 = time.time()
    print(f"Took {t2 - t1:.2f}s")

    Image.fromarray(postproc(res["image"])).save(args.output)
    print(f"saved {args.output}")
    if "image_inv" in res and args.output_inv:
        Image.fromarray(postproc(res["image_inv"])).save(args.output_inv)
        print(f"saved {args.output_inv}")


if __name__ == "__main__":
    from eta_inversion_tpu.utils.cli_utils import add_argparse_arg

    parser = argparse.ArgumentParser(description="Edit an image")
    parser.add_argument("--input", "-i", type=str, required=True, help="Input image")
    parser.add_argument("--output", "-o", type=str, default="edited.png")
    parser.add_argument("--output_inv", type=str, default=None,
                        help="Optionally save the reconstruction too")
    parser.add_argument("--source_prompt", "-s", type=str, required=True)
    parser.add_argument("--target_prompt", "-t", type=str, required=True)
    add_argparse_arg(parser, "inv_method")
    add_argparse_arg(parser, "edit_method")
    add_argparse_arg(parser, "model")
    add_argparse_arg(parser, "steps")
    add_argparse_arg(parser, "dtype")
    add_argparse_arg(parser, "seed")
    parser.add_argument("--weights_dir", type=str, default=None,
                        help="Diffusers-layout checkpoint directory "
                             "({unet,vae,text_encoder}/*.safetensors + "
                             "tokenizer/); random init when absent")
    parser.add_argument("--method_cfg", type=str, default="{}",
                        help="JSON kwargs for the inversion method, e.g. "
                             '\'{"scheduler": "dpm", "solver_order": 3}\'')
    parser.add_argument("--editor_cfg", type=str, default="{}",
                        help="JSON kwargs for the editor constructor, e.g. "
                             '\'{"step": 1, "layer": 1}\'')
    parser.add_argument("--edit_cfg", type=str, default=None,
                        help="JSON per-edit cfg merged over the auto-built "
                             'one, e.g. \'{"mode": "mask_auto"}\' (masactrl)')
    main(parser.parse_args())
