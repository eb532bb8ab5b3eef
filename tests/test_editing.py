"""Editing tests: the inverter x editor grid on the tiny model (reference
strategy: test_edit.py's 8x5 grid + bitwise consistency checks)."""

import jax.numpy as jnp
import numpy as np
import pytest

from eta_inversion_tpu import load_editor, load_inverter

SRC = "a cat sitting next to a mirror"
TGT = "a tiger sitting next to a mirror"
STEPS = 6

EDITORS = ["simple", "ptp", "masactrl", "pnp", "invedit", "pix2pix_zero"]

PTP_CFG = {
    "is_replace_controller": True,
    "cross_replace_steps": 0.8,
    "self_replace_steps": 0.5,
}


INV_TEST_KWARGS = {
    "nti": {"num_inner_steps": 2},
    "regdiffinv": {"num_reg_steps": 1, "num_ac_rolls": 2},
}


def run_edit(editor_name, model, image, inverter_name="diffinv"):
    inv = load_inverter(model, inverter_name, num_inference_steps=STEPS,
                        **INV_TEST_KWARGS.get(inverter_name, {}))
    editor = load_editor(inv, editor_name)
    cfg = dict(PTP_CFG) if editor_name == "ptp" else None
    inv_cfg = {"edit_word_idx": (1, 1)} if inverter_name == "etainv" else None
    res = editor.edit(jnp.asarray(image), SRC, TGT, cfg=cfg, inv_cfg=inv_cfg)
    if res is None:
        return None
    return float(np.asarray(res["image"]).mean())


@pytest.mark.parametrize("name", EDITORS)
def test_editor_golden(name, tiny_model, test_image, goldens):
    val = run_edit(name, tiny_model, test_image)
    key = f"edit_{name}"
    if key in goldens:
        assert val == pytest.approx(goldens[key], abs=1e-4)
    else:
        pytest.skip(f"no golden for {key}; run tests/gen_goldens.py")


def test_ptp_blend_changes_output(tiny_model, test_image):
    a = run_edit("ptp", tiny_model, test_image)
    inv = load_inverter(tiny_model, "diffinv", num_inference_steps=STEPS)
    editor = load_editor(inv, "ptp")
    res = editor.edit(jnp.asarray(test_image), SRC, TGT,
                      cfg={**PTP_CFG, "blend_words": [["cat"], ["tiger"]]})
    b = float(np.asarray(res["image"]).mean())
    assert a != b


def test_ptp_refine_mode(tiny_model, test_image):
    inv = load_inverter(tiny_model, "diffinv", num_inference_steps=STEPS)
    editor = load_editor(inv, "ptp")
    res = editor.edit(jnp.asarray(test_image), SRC,
                      "a big cat sitting next to a mirror",
                      cfg={**PTP_CFG, "is_replace_controller": False})
    assert res is not None and res["image"].shape[0] == 1


def test_serving_mode_contract(tiny_model, test_image):
    """no_source_backward (serving mode): exact for simple+deterministic
    inverters — the dropped source rows only feed the discarded
    reconstruction — and warns for controller-based editors, whose pair-row
    substitutions are inert without the source rows."""
    import warnings

    inv = load_inverter(tiny_model, "diffinv", num_inference_steps=STEPS)
    full = load_editor(inv, "simple").edit(jnp.asarray(test_image), SRC, TGT)
    srv = load_editor(inv, "simple", no_source_backward=True).edit(
        jnp.asarray(test_image), SRC, TGT)
    np.testing.assert_allclose(np.asarray(srv["image"]),
                               np.asarray(full["image"]), atol=1e-3)
    assert "image_inv" not in srv
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        load_editor(inv, "ptp", no_source_backward=True)
    assert any("inert" in str(x.message) for x in w)

    # source-anchored inverters are rejected outright: their backward snaps
    # rows [:B] to the forward trajectory, so single-prompt serving would
    # return the reconstruction with the UNet dead-code-eliminated
    eta = load_inverter(tiny_model, "etainv", num_inference_steps=STEPS,
                        noise_sample_count=2)
    with pytest.raises(ValueError, match="anchors source rows"):
        load_editor(eta, "simple", no_source_backward=True)


def test_edit_consistency(tiny_model, test_image):
    """Same edit twice with an unrelated edit in between must be bitwise
    identical (reference test_edit.py:258-289)."""
    a = run_edit("ptp", tiny_model, test_image)
    run_edit("simple", tiny_model, test_image)
    b = run_edit("ptp", tiny_model, test_image)
    assert a == b


def test_masactrl_differs_from_simple(tiny_model, test_image):
    # tiny model has 4 self-attn layers; the SD default start_layer=10 would be
    # a no-op here, so start control at layer 1 / step 1
    from eta_inversion_tpu import load_editor, load_inverter

    inv = load_inverter(tiny_model, "diffinv", num_inference_steps=STEPS)
    editor = load_editor(inv, "masactrl", layer=1, step=1)
    res = editor.edit(jnp.asarray(test_image), SRC, TGT)
    a = float(np.asarray(res["image"]).mean())
    b = run_edit("simple", tiny_model, test_image)
    assert a != b
    # and the SD-default layer threshold is indeed inert on the tiny model
    assert run_edit("masactrl", tiny_model, test_image) == b


def _masactrl_mean(model, image, **cfg):
    inv = load_inverter(model, "diffinv", num_inference_steps=STEPS)
    editor = load_editor(inv, "masactrl", layer=1, step=1)
    res = editor.edit(jnp.asarray(image), SRC, TGT, cfg=cfg or None)
    return float(np.asarray(res["image"]).mean())


def test_masactrl_union_inactive_equals_plain(tiny_model, test_image):
    """With the gate never active, the union variant's own-half probability
    renormalization over duplicated/concat keys must be EXACTLY plain
    attention (softmax(sim+log m) == p*m/sum(p*m) identity)."""
    inv = load_inverter(tiny_model, "diffinv", num_inference_steps=STEPS)
    editor = load_editor(inv, "masactrl", layer=1, step=STEPS + 1)
    res = editor.edit(jnp.asarray(test_image), SRC, TGT, cfg={"mode": "union"})
    b = run_edit("simple", tiny_model, test_image)
    assert float(np.asarray(res["image"]).mean()) == pytest.approx(b, abs=2e-6)


def test_masactrl_variants(tiny_model, test_image):
    base = _masactrl_mean(tiny_model, test_image)
    union = _masactrl_mean(tiny_model, test_image, mode="union")
    assert union != base  # union keys genuinely change the target branch

    # all-foreground masks: fg renormalization over all keys is the identity,
    # so mask mode must equal plain k/v substitution exactly
    ones = np.ones((8, 8), np.float32)
    masked_ones = _masactrl_mean(tiny_model, test_image, mode="mask",
                                 mask_s=ones, mask_t=ones)
    assert masked_ones == pytest.approx(base, abs=2e-6)

    # a real fg/bg split changes the result
    half = np.zeros((8, 8), np.float32)
    half[:, :4] = 1.0
    masked = _masactrl_mean(tiny_model, test_image, mode="mask",
                            mask_s=half, mask_t=half)
    assert masked != base

    # thres=0 binarizes every auto-mask to all-foreground -> same identity
    auto_ones = _masactrl_mean(tiny_model, test_image, mode="mask_auto",
                               thres=0.0)
    assert auto_ones == pytest.approx(base, abs=2e-6)

    # a real threshold derives a nontrivial mask from cross-attention
    auto = _masactrl_mean(tiny_model, test_image, mode="mask_auto", thres=0.5)
    assert np.isfinite(auto)
    assert auto == _masactrl_mean(tiny_model, test_image, mode="mask_auto",
                                  thres=0.5)  # deterministic


def test_pnp_source_branch_unconditional(tiny_model, test_image):
    res = run_edit("pnp", tiny_model, test_image)
    assert res is not None


def test_fake_edit_uses_gt_latent(tiny_model, test_image):
    """fake_edit skips inversion and denoises from a provided zT
    (reference editor.py:86-91; used by imagenetr-fake-ti2i)."""
    import jax

    from eta_inversion_tpu import load_editor, load_inverter

    inv = load_inverter(tiny_model, "diffinv", num_inference_steps=STEPS)
    editor = load_editor(inv, "ptp", fake_edit=True)
    zT = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    res = editor.edit(None, SRC, TGT, cfg={**PTP_CFG, "zT_gt": zT})
    assert res is not None and res["image"].shape == (1, 16, 16, 3)


def test_generate_text_to_image(tiny_model):
    import jax
    import numpy as np

    from eta_inversion_tpu import load_inverter

    inv = load_inverter(tiny_model, "diffinv", num_inference_steps=STEPS)
    a = inv.generate("a cat", rng=jax.random.PRNGKey(3))
    b = inv.generate("a cat", rng=jax.random.PRNGKey(3))
    c = inv.generate("a cat", rng=jax.random.PRNGKey(4))
    assert a["image"].shape == (1, 16, 16, 3)
    np.testing.assert_array_equal(np.asarray(a["image"]), np.asarray(b["image"]))
    assert not np.allclose(np.asarray(a["image"]), np.asarray(c["image"]))


def test_pix2pix_zero_incompatible_combos(tiny_model, test_image):
    assert run_edit("pix2pix_zero", tiny_model, test_image, "dirinv") is None
    assert run_edit("pix2pix_zero", tiny_model, test_image, "etainv") is None


def test_editor_with_other_inverters(tiny_model, test_image):
    for inverter in ["npi", "ddpminv"]:
        val = run_edit("ptp", tiny_model, test_image, inverter)
        assert val is not None and np.isfinite(val), inverter


# cross-method grid: combinations exercising unique composition paths
# (reference test_edit.py runs the full 8x5 grid; these are the seams)
# the FULL supported inverter x editor grid (the reference regression-tests
# its 8x5 grid at /root/reference/test/test_edit.py:66-108; ours covers all
# 10 inverters x 6 editors = 54 non-diffinv combos + the 6 diffinv combos via
# test_editor_golden).  Combos the reference declares unsupported return None
# (test_edit.py:240-242 semantics: pix2pix_zero cannot ride dirinv/etainv,
# modules/editing/pix2pix_zero.py:300-301).
ALL_INVERTERS = ["npi", "proxnpi", "dirinv", "nti", "edict", "ddpminv",
                 "cyclediff", "etainv", "regdiffinv"]
UNSUPPORTED = {("dirinv", "pix2pix_zero"), ("etainv", "pix2pix_zero")}
GRID = [(inv, ed) for inv in ALL_INVERTERS for ed in EDITORS
        if (inv, ed) not in UNSUPPORTED]


@pytest.mark.parametrize("inverter,editor", sorted(UNSUPPORTED))
def test_unsupported_combos_return_none(inverter, editor, tiny_model, test_image):
    assert run_edit(editor, tiny_model, test_image, inverter) is None


def test_etainv_bwd_mask_modes(tiny_model, test_image):
    """bwd_* eta masks come from the live ptp controller's accumulated
    attention store (reference eta_inversion.py:176-183)."""
    from eta_inversion_tpu import load_editor, load_inverter

    inv = load_inverter(
        tiny_model, "etainv", num_inference_steps=STEPS,
        mask_mode_cfg={"mask_eta": "bwd_source", "mask_dirinv": "bwd_target",
                       "target_dirinv": 0.5, "attn_res": 8})
    editor = load_editor(inv, "ptp")
    res = editor.edit(jnp.asarray(test_image), SRC, TGT, cfg=dict(PTP_CFG),
                      inv_cfg={"edit_word_idx": (1, 1)})
    assert res is not None
    val = float(np.asarray(res["image"]).mean())
    assert np.isfinite(val)
    # differs from the default fwd_mean configuration
    base = run_edit("ptp", tiny_model, test_image, "etainv")
    assert val != base


@pytest.mark.parametrize("inverter,editor", GRID)
def test_cross_method_grid(inverter, editor, tiny_model, test_image, goldens):
    val = run_edit(editor, tiny_model, test_image, inverter)
    assert val is not None and np.isfinite(val), (inverter, editor)
    key = f"grid_{inverter}_{editor}"
    if key in goldens:
        assert val == pytest.approx(goldens[key], abs=1e-4)


# ---------------------------------------------------------------------------
# cross-attention value folding (PtpHooks.cross_fold)
# ---------------------------------------------------------------------------

def _fold_vs_materialized(mode, equalizer, B=2, H=2, S=16, K=8, D=4):
    """Folded cross edit must equal the materialized `probs` edit."""
    import numpy as np
    import jax.numpy as jnp

    from eta_inversion_tpu.editing.controller import BatchLayout
    from eta_inversion_tpu.editing.ptp import PtpHooks
    from eta_inversion_tpu.ops.attn_ctrl import AttnLayerMeta
    from eta_inversion_tpu.ops.flash_attention import attention, attention_probs

    rs = np.random.RandomState(42)
    layout = BatchLayout(2 * B, True)  # [u x 2B, s_1..s_B, t_1..t_B]
    n = layout.cond_start
    rows = n + 2 * B
    q = jnp.asarray(rs.randn(rows, H, S, D), jnp.float32)
    k = jnp.asarray(rs.randn(rows, H, K, D), jnp.float32)
    v = jnp.asarray(rs.randn(rows, H, K, D), jnp.float32)
    meta = AttnLayerMeta(1, True, "down", 4, -1, 0, H)
    kw = dict(
        layout=layout, mode=mode,
        alpha_i=jnp.asarray(rs.rand(B, 1, 1, K), jnp.float32),
        self_gate=jnp.asarray(True),
        mapper_mat=jnp.asarray(rs.rand(B, K, K), jnp.float32),
        mapper_idx=jnp.asarray(rs.randint(0, K, (B, K))),
        refine_alphas=jnp.asarray(rs.rand(B, K), jnp.float32),
        equalizer=jnp.asarray(rs.rand(B, K), jnp.float32) if equalizer else None,
    )
    scale = D ** -0.5

    # materialized reference path
    hooks_mat = PtpHooks(fold_cross_attn=False, **kw)
    p = hooks_mat.probs(meta, attention_probs(q, k, scale))
    o_ref = jnp.einsum("bhqk,bhkd->bhqd", p, v)

    hooks_fold = PtpHooks(fold_cross_attn=True, **kw)
    folded = hooks_fold.cross_fold(meta, q, k, v)
    assert folded is not None
    q2, k2, v2, combine = folded
    o_fold = combine(attention(q2, k2, v2, scale))

    np.testing.assert_allclose(np.asarray(o_fold), np.asarray(o_ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("mode", ["replace", "refine", "none"])
@pytest.mark.parametrize("equalizer", [False, True])
def test_cross_fold_matches_materialized(mode, equalizer):
    _fold_vs_materialized(mode, equalizer)


def test_cross_fold_respects_store_and_gates():
    """Folding must decline on store layers and non-pair layouts."""
    import numpy as np
    import jax.numpy as jnp

    from eta_inversion_tpu.editing.controller import BatchLayout
    from eta_inversion_tpu.editing.ptp import PtpHooks
    from eta_inversion_tpu.ops.attn_ctrl import AttnLayerMeta

    meta = AttnLayerMeta(1, True, "down", 4, -1, 0, 2)
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(8, 2, 16, 4), jnp.float32)
    kv = jnp.asarray(rs.randn(8, 2, 8, 4), jnp.float32)
    base = dict(
        layout=BatchLayout(4, True), mode="replace",
        alpha_i=jnp.ones((2, 1, 1, 8)), self_gate=jnp.asarray(True),
        mapper_mat=jnp.zeros((2, 8, 8)), fold_cross_attn=True,
    )
    assert PtpHooks(**base).cross_fold(meta, q, kv, kv) is not None
    stored = PtpHooks(**{**base, "store_keys": (meta.store_key,)})
    assert stored.cross_fold(meta, q, kv, kv) is None
    off = PtpHooks(**{**base, "fold_cross_attn": False})
    assert off.cross_fold(meta, q, kv, kv) is None


def test_cfg_prefix_safe_gates():
    """Shared-prefix dedup gating: ptp by threshold, masactrl by start layer."""
    import jax.numpy as jnp

    from eta_inversion_tpu.editing.controller import BatchLayout
    from eta_inversion_tpu.editing.masactrl import MasaCtrlHooks
    from eta_inversion_tpu.editing.ptp import PtpHooks
    from eta_inversion_tpu.ops.attn_ctrl import AttnHooks, AttnLayerMeta

    first_self = AttnLayerMeta(0, False, "down", 64, 0, -1, 8)
    layout = BatchLayout(2, True)
    base = dict(layout=layout, mode="replace", alpha_i=jnp.ones((1, 1, 1, 77)),
                self_gate=jnp.asarray(True), mapper_mat=jnp.zeros((1, 77, 77)))

    # ptp: safe iff the first self layer is above the replacement threshold
    assert PtpHooks(attn_replace_thres=32 * 32, **base).cfg_prefix_safe(first_self)
    assert not PtpHooks(attn_replace_thres=64 * 64, **base).cfg_prefix_safe(first_self)
    assert PtpHooks(attn_replace_thres=64 * 64, do_edit=False,
                    **base).cfg_prefix_safe(first_self)

    # masactrl: safe iff control starts past the first self layer
    mk = dict(layout=layout, gate=jnp.asarray(True))
    assert MasaCtrlHooks(start_layer=10, **mk).cfg_prefix_safe(first_self)
    assert MasaCtrlHooks(start_layer=1, **mk).cfg_prefix_safe(first_self)
    assert not MasaCtrlHooks(start_layer=0, **mk).cfg_prefix_safe(first_self)

    # conservative default for arbitrary hooks
    assert not AttnHooks().cfg_prefix_safe(first_self)


def test_parse_mesh_spec():
    from eval import _parse_mesh

    assert _parse_mesh(None) is None
    assert _parse_mesh("") is None
    assert _parse_mesh("8") == (8, 1)
    assert _parse_mesh("4x2") == (4, 2)


def test_passthrough_attn_consistency():
    """passthrough_attn=True must imply the hooks truly don't intervene:
    qkv and probs are identity and nothing materializes/stores — the packed
    fast path (models/attention.py) skips the hook calls based on it."""
    import numpy as np
    import jax.numpy as jnp

    from eta_inversion_tpu.editing.controller import BatchLayout
    from eta_inversion_tpu.editing.masactrl import MasaCtrlHooks
    from eta_inversion_tpu.editing.pnp import PnpHooks
    from eta_inversion_tpu.editing.ptp import PtpHooks
    from eta_inversion_tpu.ops.attn_ctrl import AttnLayerMeta, ComposedHooks

    B = 2
    layout = BatchLayout(2 * B, True)
    rs = np.random.RandomState(7)

    ptp = PtpHooks(layout=layout, mode="replace",
                   alpha_i=jnp.asarray(rs.rand(B, 1, 1, 77), jnp.float32),
                   self_gate=jnp.asarray(True),
                   mapper_mat=jnp.asarray(rs.rand(B, 77, 77), jnp.float32))
    masa = MasaCtrlHooks(layout=layout, gate=jnp.asarray(True), start_layer=10)
    pnp = PnpHooks(qk_gate=jnp.asarray(True), conv_gate=jnp.asarray(True))
    composed = ComposedHooks(ptp, masa)

    metas = []
    idx = 0
    for place, ress in (("down", (64, 32, 16)), ("mid", (8,)),
                        ("up", (16, 32, 64))):
        for res in ress:
            for is_cross in (False, True):
                metas.append(AttnLayerMeta(idx, is_cross, place, res,
                                           idx // 2, idx // 2, 8))
                idx += 1

    for hooks in (ptp, masa, pnp, composed):
        for meta in metas:
            if not hooks.passthrough_attn(meta):
                continue
            rows = layout.cond_start + 2 * B if hasattr(layout, "cond_start") \
                else 3 * B
            q = jnp.asarray(rs.randn(rows, 8, 16, 4), jnp.float32)
            k, v = q * 0.5, q * 0.25
            q2, k2, v2 = hooks.qkv(meta, q, k, v)
            np.testing.assert_array_equal(np.asarray(q2), np.asarray(q))
            np.testing.assert_array_equal(np.asarray(k2), np.asarray(k))
            np.testing.assert_array_equal(np.asarray(v2), np.asarray(v))
            assert not hooks.wants_probs(meta), (type(hooks).__name__, meta)
            assert not hooks.store(meta), (type(hooks).__name__, meta)
            p = jnp.asarray(rs.rand(rows, 8, 16, 16), jnp.float32)
            np.testing.assert_array_equal(np.asarray(hooks.probs(meta, p)),
                                          np.asarray(p))
            o2 = hooks.out(meta, q)
            np.testing.assert_array_equal(np.asarray(o2), np.asarray(q))

    # flagship expectations: ptp leaves the 64x64 self layers alone (they ride
    # the packed kernel) but touches 32x32 self and all cross layers
    self64 = AttnLayerMeta(0, False, "down", 64, 0, -1, 8)
    self32 = AttnLayerMeta(2, False, "down", 32, 1, -1, 8)
    cross64 = AttnLayerMeta(1, True, "down", 64, -1, 0, 8)
    assert ptp.passthrough_attn(self64)
    assert not ptp.passthrough_attn(self32)
    assert not ptp.passthrough_attn(cross64)
    # masactrl: self layers below start_layer pass through, up-block 64x64
    # self layers (self_idx >= 10) do not
    up64 = AttnLayerMeta(30, False, "up", 64, 14, -1, 8)
    assert masa.passthrough_attn(self64)
    assert not masa.passthrough_attn(up64)


def test_sd2_geometry_flagship_edit(tiny21_model, test_image):
    """Second model family (SD2.x geometry: per-stage head counts, linear
    transformer projections): the flagship etainv+ptp edit — attention-map
    stores sized by per-LAYER head counts, masks, candidate-noise argmin —
    runs end-to-end and is deterministic."""
    a = run_edit("ptp", tiny21_model, test_image, inverter_name="etainv")
    b = run_edit("ptp", tiny21_model, test_image, inverter_name="etainv")
    assert a is not None and np.isfinite(a)
    assert a == b


def test_sdxl_geometry_flagship_edit(tinyxl_model, test_image):
    """Third model family (SDXL geometry: depth-2 transformers, dual text
    towers, text_time added conditioning): the flagship etainv+ptp edit runs
    end-to-end through the packed 78-row context and is deterministic."""
    a = run_edit("ptp", tinyxl_model, test_image, inverter_name="etainv")
    b = run_edit("ptp", tinyxl_model, test_image, inverter_name="etainv")
    assert a is not None and np.isfinite(a)
    assert a == b


@pytest.mark.parametrize("preset", ["tiny21", "tinyxl", "tinyv"])
@pytest.mark.parametrize("combo", [("etainv", "ptp"), ("diffinv", "simple")])
def test_family_golden(preset, combo, test_image, goldens):
    """Golden regression for the non-SD1.x model families (SD2.x geometry,
    SDXL geometry, v-prediction): flagship etainv+ptp and baseline
    diffinv+simple pinned per family."""
    from eta_inversion_tpu.models import load_diffusion_model

    inverter, editor = combo
    model, _ = load_diffusion_model(preset)
    val = run_edit(editor, model, test_image, inverter_name=inverter)
    key = f"fam_{preset}_{inverter}_{editor}"
    if key in goldens:
        assert val == pytest.approx(goldens[key], abs=1e-4)
    else:
        pytest.skip(f"no golden for {key}; run tests/gen_goldens.py")
