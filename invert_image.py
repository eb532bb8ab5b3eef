"""Single-image inversion CLI (counterpart of /root/reference/invert_image.py):
invert + re-denoise an image with a chosen inversion method and save the
reconstruction.
"""

import argparse
import time

from eta_inversion_tpu.utils.debug_utils import enable_deterministic

enable_deterministic()


def main(args):
    import numpy as np
    from PIL import Image

    from eta_inversion_tpu import load_inverter
    from eta_inversion_tpu.models import load_diffusion_model

    import json

    model, (preproc, postproc) = load_diffusion_model(
        args.model, dtype=args.dtype, weights_dir=getattr(args, "weights_dir", None))
    inverter = load_inverter(model, args.inv_method,
                             num_inference_steps=args.steps, seed=args.seed,
                             **json.loads(args.method_cfg))
    image = preproc(args.input)

    t1 = time.time()
    res = inverter.invert_sample(image, args.prompt)
    np.asarray(res["image"]).mean()  # block
    t2 = time.time()
    print(f"Took {t2 - t1:.2f}s")

    out = postproc(res["image"])
    Image.fromarray(out).save(args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    from eta_inversion_tpu.utils.cli_utils import add_argparse_arg

    parser = argparse.ArgumentParser(description="Invert and reconstruct an image")
    parser.add_argument("--input", "-i", type=str, required=True, help="Input image")
    parser.add_argument("--output", "-o", type=str, default="inverted.png",
                        help="Output image path")
    parser.add_argument("--prompt", "-p", type=str, required=True,
                        help="Prompt describing the image")
    add_argparse_arg(parser, "inv_method")
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
    main(parser.parse_args())
