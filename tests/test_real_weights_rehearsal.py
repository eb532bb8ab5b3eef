"""Real-weights dress rehearsal: prove that a diffusers-layout checkpoint
directory loads through the ACTUAL `load_diffusion_model(weights_dir=...)`
file path into a working end-to-end edit — zero code changes needed the day
real weights appear.

What a real checkpoint directory looks like (the reference gets it implicitly
via diffusers' `StableDiffusionPipeline.from_pretrained`,
/root/reference/modules/models/__init__.py:104-138):

    unet/diffusion_pytorch_model.safetensors         (possibly sharded with
        diffusion_pytorch_model.safetensors.index.json)
    vae/diffusion_pytorch_model.safetensors          (often fp16 exports)
    text_encoder/model.safetensors                   (+ legacy position_ids)
    tokenizer/vocab.json, tokenizer/merges.txt

This module synthesizes exactly that layout (random values, real key sets via
the declared inverse transforms) and drives it through the loader, the
tokenizer, and one full edit.  The tokenizer is additionally pinned against
`transformers.CLIPTokenizer` over the same synthetic vocab/merges pair
(byte-level pretokenizer, merge order, bos/eos/pad conventions — the reference
tokenizer arrives through the SD pipeline,
/root/reference/modules/inversion/diffusion_inversion.py:222-229).
"""

import json

import numpy as np
import pytest

from eta_inversion_tpu.models import TINY, init_random_params
from eta_inversion_tpu.models.tokenizer import (ClipBpeTokenizer,
                                                _bytes_to_unicode)
from eta_inversion_tpu.models.weights import (clip_text_key_map, unet_key_map,
                                              vae_key_map, write_safetensors)

from tests.test_weights import to_torch_state  # noqa: E402  (shared helpers)

STEPS = 3


# ---------------------------------------------------------------------------
# synthetic vocab/merges: a full byte-level BPE vocabulary (every byte unit,
# every unit+</w>, a handful of overlapping merges, both special tokens) —
# structurally identical to openai/clip's vocab.json + merges.txt, just small.
# ---------------------------------------------------------------------------

MERGES = [("c", "a"), ("ca", "t</w>"), ("t", "i"), ("ti", "g"),
          ("tig", "er</w>"), ("e", "r</w>"), ("a", "t</w>"), ("i", "n"),
          ("in", "g</w>"), ("m", "i"), ("mi", "r"), ("t", "o</w>")]


def build_vocab_files(d):
    units = list(_bytes_to_unicode().values())
    vocab, i = {}, 0
    for u in units:
        vocab[u] = i
        i += 1
    for u in units:
        vocab[u + "</w>"] = i
        i += 1
    for a, b in MERGES:
        vocab[a + b] = i
        i += 1
    vocab["<|startoftext|>"] = i
    vocab["<|endoftext|>"] = i + 1
    d.mkdir(parents=True, exist_ok=True)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "".join(f"{a} {b}\n" for a, b in MERGES))
    return vocab


# ---------------------------------------------------------------------------
# synthetic checkpoint directory (diffusers layout, tiny preset)
# ---------------------------------------------------------------------------

@pytest.fixture()
def checkpoint_dir(tmp_path):
    params = init_random_params(TINY)

    # unet: SHARDED into two files + the index json real large checkpoints
    # ship (the loader merges every *.safetensors in the dir; the index file
    # must not confuse it)
    unet_state = to_torch_state(params["unet"], unet_key_map(TINY.unet))
    keys = sorted(unet_state)
    half = len(keys) // 2
    shards = {
        "diffusion_pytorch_model-00001-of-00002.safetensors":
            {k: unet_state[k] for k in keys[:half]},
        "diffusion_pytorch_model-00002-of-00002.safetensors":
            {k: unet_state[k] for k in keys[half:]},
    }
    (tmp_path / "unet").mkdir()
    weight_map = {}
    for fname, part in shards.items():
        write_safetensors(str(tmp_path / "unet" / fname), part)
        weight_map.update({k: fname for k in part})
    (tmp_path / "unet" / "diffusion_pytorch_model.safetensors.index.json"
     ).write_text(json.dumps({"metadata": {}, "weight_map": weight_map}))

    # vae: single file, FP16 export (common HF distribution dtype)
    vae_state = {k: v.astype(np.float16) for k, v in
                 to_torch_state(params["vae"], vae_key_map(TINY.vae)).items()}
    (tmp_path / "vae").mkdir()
    write_safetensors(str(tmp_path / "vae" / "diffusion_pytorch_model.safetensors"),
                      vae_state)

    # text encoder: modern file name + the legacy extra key old transformers
    # exports carry (must be ignored, not a strict-mode failure)
    text_state = to_torch_state(params["text"], clip_text_key_map(TINY.text))
    text_state["text_model.embeddings.position_ids"] = np.arange(
        77, dtype=np.int64)[None]
    (tmp_path / "text_encoder").mkdir()
    write_safetensors(str(tmp_path / "text_encoder" / "model.safetensors"),
                      text_state)

    build_vocab_files(tmp_path / "tokenizer")
    return tmp_path, params


def test_checkpoint_dir_loads_and_matches(checkpoint_dir):
    """load_diffusion_model(weights_dir=...) resolves shards, fp16, extra keys
    and the tokenizer/ subdir; loaded params equal the originals."""
    from eta_inversion_tpu.models import load_diffusion_model

    ckpt, params = checkpoint_dir
    model, (pre, post) = load_diffusion_model("tiny", weights_dir=str(ckpt))

    assert isinstance(model.tokenizer, ClipBpeTokenizer)

    import jax

    flat_want = jax.tree_util.tree_leaves_with_path(params)
    got = model.params
    for path, want in flat_want:
        node = got
        for p in path:
            node = node[p.key]
        np.testing.assert_allclose(
            np.asarray(node), np.asarray(want, dtype=np.asarray(node).dtype),
            rtol=1e-3, atol=1e-3,  # vae went through fp16
            err_msg=str(path))


def test_checkpoint_dir_end_to_end_edit(checkpoint_dir):
    """The full production path with file-loaded weights: preprocess -> invert
    -> ptp edit -> postprocess, exactly as edit_image.py wires it."""
    from eta_inversion_tpu import load_editor, load_inverter
    from eta_inversion_tpu.models import load_diffusion_model

    ckpt, _ = checkpoint_dir
    model, (pre, post) = load_diffusion_model("tiny", weights_dir=str(ckpt))
    inverter = load_inverter(model, "diffinv", num_inference_steps=STEPS)
    editor = load_editor(inverter, "ptp")

    rs = np.random.RandomState(3)
    img = (rs.rand(16, 16, 3) * 255).astype(np.uint8)
    arr = pre(img)[None] if pre(img).ndim == 3 else pre(img)
    res = editor.edit(arr, "a cat sitting", "a tiger sitting",
                      cfg={"is_replace_controller": True,
                           "cross_replace_steps": 0.8,
                           "self_replace_steps": 0.5})
    assert res is not None
    out = post(res["image"])
    assert out.shape == (model.image_size, model.image_size, 3)
    assert out.dtype == np.uint8
    assert np.isfinite(np.asarray(res["latent"], dtype=np.float32)).all()


def test_missing_component_dir_is_a_clear_error(tmp_path):
    from eta_inversion_tpu.models.weights import load_pretrained_params

    (tmp_path / "unet").mkdir()
    with pytest.raises(FileNotFoundError, match="unet"):
        load_pretrained_params(str(tmp_path), TINY)


# ---------------------------------------------------------------------------
# tokenizer equivalence vs transformers.CLIPTokenizer
# ---------------------------------------------------------------------------

EQUIV_TEXTS = [
    "a cat sitting next to a mirror",
    "A Tiger In The Mirror",                 # casing
    "hello, world!! (a photo)",              # punctuation runs
    "café naïve résumé",                     # non-ASCII letters (\\p{L})
    "  lots \t of\n whitespace  ",           # whitespace cleanup
    "the cat's toy isn't here, we'll see",   # contraction pretokens
    "a photo of 42 cats and 7 dogs",         # digits tokenize one by one
    "cat " * 100,                            # > 77 tokens: truncation
    "",                                      # empty prompt = bos + eos + pads
    "Ünïcödé mix: ßharp & Ω",                # mixed scripts
]


@pytest.fixture(scope="module")
def tokenizer_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("vocab")
    build_vocab_files(d)
    from transformers import CLIPTokenizer

    ours = ClipBpeTokenizer(str(d / "vocab.json"), str(d / "merges.txt"))
    hf = CLIPTokenizer(str(d / "vocab.json"), str(d / "merges.txt"))
    return ours, hf


def test_tokenizer_special_ids_match(tokenizer_pair):
    ours, hf = tokenizer_pair
    assert ours.bos_token_id == hf.bos_token_id
    assert ours.eos_token_id == hf.eos_token_id
    assert ours.pad_token_id == hf.pad_token_id  # CLIP pads with eos


@pytest.mark.parametrize("text", EQUIV_TEXTS, ids=lambda t: t[:24] or "<empty>")
def test_tokenizer_matches_transformers(tokenizer_pair, text):
    """Byte-level pretokenizer, merge order, truncation and eos padding all
    agree with transformers' slow CLIPTokenizer over the same vocab files.

    Known, deliberate divergence (not tested here): HTML entities.  This
    tokenizer follows the openai/CLIP + ftfy convention (the reference's env
    installs openai/CLIP, which requires ftfy) and html-unescapes; a
    transformers install WITHOUT ftfy does not."""
    ours, hf = tokenizer_pair
    want = hf([text], padding="max_length", max_length=77,
              truncation=True)["input_ids"][0]
    got = ours([text])[0].tolist()
    assert got == want, f"{text!r}\n hf: {want[:16]}\nour: {got[:16]}"


def test_tokenizer_decode_roundtrip(tokenizer_pair):
    ours, _ = tokenizer_pair
    ids = ours.encode("a cat sitting in a mirror")
    assert ours.decode(ids) == "a cat sitting in a mirror"
