"""Offline weight converters: torch checkpoints -> this framework's formats.

Run in an environment that has the pretrained weights (none are downloadable
here — zero egress).  Produces:

  * Stable Diffusion: a diffusers-layout directory of safetensors consumed
    directly by `load_diffusion_model(weights_dir=...)` (no conversion needed
    if you already have diffusers safetensors — the key mapping happens at
    load time, models/weights.py).
  * LPIPS (AlexNet + lin weights): flat .npz keyed by flax param path,
    consumed by models/lpips.py `load_lpips_params(weights_path=...)`.
  * CLIP ViT-B/16 and DINO ViT: flat .npz for the metric backbones.

Usage:
  python tools/convert_weights.py lpips out/lpips_alex.npz
  python tools/convert_weights.py clip out/clip_vitb16.npz
  python tools/convert_weights.py dino out/dino_vitb8.npz
"""

import sys

import numpy as np


def convert_lpips(out_path: str) -> None:
    import lpips  # requires the lpips package + torchvision weights

    net = lpips.LPIPS(net="alex")
    flat = {}
    alex = net.net  # torchvision alexnet features wrapper (slices)
    convs = [m for m in alex.modules()
             if m.__class__.__name__ == "Conv2d"]
    for i, conv in enumerate(convs):
        w = conv.weight.detach().numpy()  # (O, I, kh, kw) -> HWIO
        flat[f"alex/conv{i}/kernel"] = np.transpose(w, (2, 3, 1, 0))
        flat[f"alex/conv{i}/bias"] = conv.bias.detach().numpy()
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        flat[f"lin{i}"] = w.reshape(-1)
    np.savez(out_path, **flat)
    print(f"wrote {out_path} ({len(flat)} tensors)")


def convert_clip(out_path: str) -> None:
    import torch

    import clip  # openai clip

    model, _ = clip.load("ViT-B/16", device="cpu")
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    # raw openai state dict; mapped at load time by
    # models/backbone_weights.map_openai_clip_vision/_text (rehearsal-tested
    # in tests/test_backbone_weights_rehearsal.py)
    np.savez(out_path, **{k: v for k, v in sd.items()})
    print(f"wrote {out_path} ({len(sd)} tensors)")


def convert_dino(out_path: str, model_name: str = "dino_vitb8") -> None:
    import torch

    model = torch.hub.load("facebookresearch/dino:main", model_name)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    np.savez(out_path, **sd)
    print(f"wrote {out_path} ({len(sd)} tensors)")


if __name__ == "__main__":
    kind, out = sys.argv[1], sys.argv[2]
    {"lpips": convert_lpips, "clip": convert_clip, "dino": convert_dino}[kind](out)
