"""Materialize the plug-and-play ImageNetR-FAKE-TI2I benchmark (counterpart of
/root/reference/scripts/convert_plug_and_play_imagenetr-fake-ti2i.py):
generate each source image from its recorded (seed, scale, steps) with the
diffusion model, dump ground-truth initial latents to latents.pkl (for
fake-edit evaluation), and emit prompts.yaml with replace edits.
"""

import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import yaml

from scripts.convert_plug_and_play_imagenetr_ti2i import single_word_diff


def main(root="data/eval/plug_and_play", model_name="sd15"):
    import jax
    from PIL import Image

    from eta_inversion_tpu import load_inverter
    from eta_inversion_tpu.models import load_diffusion_model

    root = Path(root)
    file = root / "imagenetr-fake-ti2i" / "imnetr-fake-ti2i.yaml"
    output_dir = root / "imagenetr-fake-ti2i"
    img_output_dir = output_dir / "imgs"
    img_output_dir.mkdir(parents=True, exist_ok=True)

    with open(file, "r") as f:
        data = yaml.safe_load(f)

    model = None
    latents_all = {}
    idx = 0
    out_data = []
    for sample in data:
        source_prompt = sample["source_prompt"]
        img_file = img_output_dir / (source_prompt + ".png")
        if not img_file.is_file():
            if model is None:
                bundle, (pre, post) = load_diffusion_model(model_name)
                inverter = load_inverter(bundle, "diffinv",
                                         num_inference_steps=sample["ddim_steps"],
                                         guidance_scale_bwd=sample["scale"])
            res = inverter.generate(source_prompt,
                                    rng=jax.random.PRNGKey(sample["seed"]))
            latents_all[source_prompt] = np.asarray(res["latent"])
            Image.fromarray(post(res["image"])).save(img_file)

        for target_prompt in sample["target_prompts"][:3]:
            out_data.append({
                "idx": idx,
                "source_prompt_idx": sample.get("source_prompt_idx", idx),
                "source_prompt": source_prompt,
                "target_prompt": target_prompt,
                "edit": [["replace", single_word_diff(source_prompt, target_prompt)]],
            })
            idx += 1

    if latents_all:
        with open(output_dir / "latents.pkl", "wb") as f:
            pickle.dump(latents_all, f)
    with open(output_dir / "prompts.yaml", "w") as f:
        yaml.dump(out_data, f)
    print(f"wrote {len(out_data)} samples, {len(latents_all)} generated images")


if __name__ == "__main__":
    main()
