"""Convert the plug-and-play ImageNetR-TI2I release into the EditingDataset
layout (counterpart of /root/reference/scripts/
convert_plug_and_play_imagenetr-ti2i.py): imnetr-ti2i.yaml + image tree ->
prompts.yaml + imgs/{source_prompt}.png with single-word replace edits.
"""

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import yaml

# source prompts absent from the released yaml (style x class grid)
SOURCE_PROMPTS_FALLBACK = [
    "a sketch of a penguin", "an art of a penguin", "a painting of a penguin",
    "a sketch of a husky", "an art of a husky", "a toy of a husky",
    "a cartoon of a goldfish", "an origami of a goldfish", "a painting of a goldfish",
    "a sketch of a cat", "a sculpture of a cat", "a cartoon of a cat",
    "a sculpture of a jeep", "a painting of a jeep", "a toy of a jeep",
    "a cartoon of a castle", "a sculpture of a castle", "an embroidery of a castle",
    "a sculpture of a pizza", "a toy of a pizza", "a sketch of a pizza",
    "a painting of a violin", "a painting of a violin", "an origami of a violin",
    "a cartoon of a panda", "a sculpture of a panda", "a sketch of a panda",
    "an embroidery of a hummingbird", "a cartoon of a hummingbird",
    "an origami of a hummingbird",
]

INIT_IMGS_FALLBACK = {"a cartoon of a panda": "/ImageNetR-TI2I/panda/cartoon_30.jpg"}


def single_word_diff(source_prompt: str, target_prompt: str):
    sw, tw = source_prompt.split(" "), target_prompt.split(" ")
    assert len(sw) == len(tw)
    diff = [[s, t] for s, t in zip(sw, tw) if s != t]
    diff = [[s, t] for s, t in diff if sorted([s, t]) not in (["a", "an"],)]
    assert len(diff) == 1
    return diff[0]


def main(root="data/eval/plug_and_play"):
    root = Path(root)
    file = root / "imagenetr-ti2i" / "imnetr-ti2i.yaml"
    output_dir = root / "imagenetr-ti2i"
    img_output_dir = output_dir / "imgs"
    img_output_dir.mkdir(parents=True, exist_ok=True)

    with open(file, "r") as f:
        data = yaml.safe_load(f)

    idx = 0
    out_data = []
    for source_prompt_idx, sample in enumerate(data):
        source_prompt = sample.get("source_prompt") or \
            SOURCE_PROMPTS_FALLBACK[source_prompt_idx]
        init_img = sample.get("init_img") or INIT_IMGS_FALLBACK[source_prompt]
        shutil.copy(str(root) + init_img.lower(),
                    img_output_dir / (source_prompt + ".png"))
        for target_prompt in sample["target_prompts"][:3]:
            out_data.append({
                "idx": idx,
                "source_prompt_idx": source_prompt_idx,
                "source_prompt": source_prompt,
                "target_prompt": target_prompt,
                "edit": [["replace", single_word_diff(source_prompt, target_prompt)]],
            })
            idx += 1

    with open(output_dir / "prompts.yaml", "w") as f:
        yaml.dump(out_data, f)
    print(f"wrote {len(out_data)} samples")


if __name__ == "__main__":
    main()
