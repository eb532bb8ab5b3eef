"""BLIP captioner tests (tiny preset; random-init offline discipline)."""

import numpy as np
import pytest

from eta_inversion_tpu.models.blip import (
    BlipCaptioner,
    captioner_preset_for_model,
    get_blip_captioner,
)
from eta_inversion_tpu.models.tokenizer import (
    HashWordTokenizer,
    WordPieceTokenizer,
    load_wordpiece_tokenizer,
)


def test_wordpiece_tokenizer_roundtrip(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "photo", "of", "cat",
             "##s", "un", "##believ", "##able"]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab))
    tok = WordPieceTokenizer(str(p))
    ids = tok.encode("a photo of cats")
    assert ids == [4, 5, 6, 7, 8]
    assert tok.decode(ids) == "a photo of cats"
    # greedy longest-match subwords
    assert tok.encode("unbelievable") == [9, 10, 11]
    assert tok.decode(tok.encode("unbelievable")) == "unbelievable"
    # unknown characters -> [UNK]
    assert tok.encode("xyzzy") == [tok.unk_token_id]


def test_hash_word_tokenizer_avoids_specials():
    tok = HashWordTokenizer(vocab_size=16, specials=range(12))
    ids = tok.encode("the quick brown fox jumps over twelve lazy dogs today")
    assert ids and all(i >= 12 for i in ids)


def test_captioner_deterministic_tokens():
    cap = get_blip_captioner("tiny")
    rs = np.random.RandomState(3)
    img = rs.rand(1, 20, 24, 3).astype("float32") * 2 - 1
    c1 = cap.caption(img, prompt="a picture of", include_prompt=False)
    c2 = cap.caption(img, prompt="a picture of", include_prompt=False)
    assert c1 == c2 and isinstance(c1[0], str) and c1[0]
    # prompt-included convention (pix2pix_zero / HF generate)
    c3 = cap(img)
    assert c3.startswith("a photography of")
    # different image -> (almost surely) different caption under random init
    img2 = rs.rand(1, 20, 24, 3).astype("float32")
    assert cap.caption(img2) != c1 or True  # smoke: just must not crash


def test_captioner_batched_matches_single():
    cap = get_blip_captioner("tiny")
    rs = np.random.RandomState(5)
    imgs = rs.rand(3, 16, 16, 3).astype("float32") * 2 - 1
    batch = cap.caption(imgs)
    singles = [cap.caption(imgs[i: i + 1])[0] for i in range(3)]
    assert batch == singles


def test_preset_selection_and_errors():
    assert captioner_preset_for_model("tiny") == "tiny"
    assert captioner_preset_for_model("sd15") == "base"
    with pytest.raises(ValueError):
        get_blip_captioner("nope")


def test_clip_text_text_uses_captioner():
    from eta_inversion_tpu.metrics.clip_similarity import CLIPSimilarity

    tiny = dict(backbone_kwargs=dict(image_size=32, hidden=32, layers=2, heads=2,
                                     text_hidden=32, text_layers=2, text_heads=2),
                captioner="tiny")
    m = CLIPSimilarity(metric="text_text", **tiny)
    rs = np.random.RandomState(0)
    img = rs.rand(1, 32, 32, 3).astype("float32") * 2 - 1  # NHWC metric input
    v1 = float(m(target_image=img, source_prompt="a cat", target_prompt="a dog"))
    v2 = float(m(target_image=img, source_prompt="an elk", target_prompt="a dog"))
    assert np.isfinite(v1)
    # caption now comes from the image, not the source prompt: changing the
    # source prompt must not change the metric (round-1 degradation removed)
    assert v1 == pytest.approx(v2)


def test_pix2pix_generate_caption_uses_blip(tiny_model):
    from eta_inversion_tpu import load_editor, load_inverter

    inv = load_inverter(tiny_model, "diffinv", num_inference_steps=2)
    editor = load_editor(inv, "pix2pix_zero")
    rs = np.random.RandomState(1)
    img = rs.rand(1, 16, 16, 3).astype("float32") * 2 - 1
    cap = editor.generate_caption(img)
    assert cap.startswith("a photography of")
    assert cap == editor.generate_caption(img)
