"""Prompt-to-prompt editing (registry key "ptp") as functional attention hooks.

Counterpart of /root/reference/modules/utils/ptp.py + ptp_utils.py +
modules/editing/ptp_editor.py.  The reference's mutable AttentionControl
callbacks (per-layer counters, step stores, monkey-patched forwards) become:

  * `PtpHooks` — pure per-layer edits on materialized attention probabilities
    (cross-attention replace/refine/reweight at every resolution, self-attention
    replace below the 32^2 threshold), applied to the conditional half of the
    CFG batch only (reference ptp.py:107-119);
  * `PtpController` — scan-carried state: accumulated attention-map sums (for
    LocalBlend and mask extraction), time-dependent cross-replace alphas, and
    the LocalBlend latent blending in `end_step` (reference ptp.py:18-73);
  * precomputed host-side numpy tables (word alphas, seq_aligner mappers).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attn_ctrl import AttnHooks, AttnLayerMeta
from . import seq_aligner
from .controller import BatchLayout, Controller
from .editor import ControllerBasedEditor

MAX_NUM_WORDS = 77


# ---------------------------------------------------------------------------
# host-side alpha tables (reference ptp_utils.py:326-357)
# ---------------------------------------------------------------------------

def update_alpha_time_word(alpha: np.ndarray, bounds, prompt_ind: int,
                           word_inds: Optional[np.ndarray] = None) -> np.ndarray:
    if isinstance(bounds, float):
        bounds = (0.0, bounds)
    start, end = int(bounds[0] * alpha.shape[0]), int(bounds[1] * alpha.shape[0])
    if word_inds is None:
        word_inds = np.arange(alpha.shape[2])
    alpha[:start, prompt_ind, word_inds] = 0
    alpha[start:end, prompt_ind, word_inds] = 1
    alpha[end:, prompt_ind, word_inds] = 0
    return alpha


def get_time_words_attention_alpha(prompts: Sequence[str], num_steps: int,
                                   cross_replace_steps, tokenizer,
                                   max_num_words: int = MAX_NUM_WORDS) -> np.ndarray:
    if not isinstance(cross_replace_steps, dict):
        cross_replace_steps = {"default_": cross_replace_steps}
    if "default_" not in cross_replace_steps:
        cross_replace_steps["default_"] = (0.0, 1.0)
    alpha = np.zeros((num_steps + 1, len(prompts) - 1, max_num_words), dtype=np.float32)
    for i in range(len(prompts) - 1):
        alpha = update_alpha_time_word(alpha, cross_replace_steps["default_"], i)
    for key, item in cross_replace_steps.items():
        if key != "default_":
            inds = [seq_aligner.get_word_inds(prompts[i], key, tokenizer)
                    for i in range(1, len(prompts))]
            for i, ind in enumerate(inds):
                if len(ind) > 0:
                    alpha = update_alpha_time_word(alpha, item, i, ind)
    return alpha.reshape(num_steps + 1, len(prompts) - 1, 1, 1, max_num_words)


def get_equalizer(text: str, word_select, values, tokenizer) -> np.ndarray:
    if isinstance(word_select, (int, str)):
        word_select = (word_select,)
    eq = np.ones((1, MAX_NUM_WORDS), dtype=np.float32)
    for word, val in zip(word_select, values):
        inds = seq_aligner.get_word_inds(text, word, tokenizer)
        eq[:, inds] = val
    return eq


# ---------------------------------------------------------------------------
# store aggregation (reference ptp.py:288-303 aggregate_attention)
# ---------------------------------------------------------------------------

def store_keys_for(metas, res: int, places: Sequence[str], cross: bool = True) -> List[str]:
    """Store keys (in forward layer order) matching resolution + places."""
    flat = sorted((m for pair in metas.values() for m in pair), key=lambda m: m.idx)
    return [m.store_key for m in flat
            if m.is_cross == cross and m.res == res and m.place in places]


def nearest_cross_res(metas, want: int, places: Sequence[str]) -> int:
    """Closest resolution that has cross-attention layers in `places` (SD has
    16x16; tiny test models may not)."""
    avail = sorted({m.res for pair in metas.values() for m in pair
                    if m.is_cross and m.place in places})
    if want in avail:
        return want
    return min(avail, key=lambda r: abs(r - want))


def aggregate_store(store: Dict[str, jnp.ndarray], keys: List[str], res: int,
                    n_prompts: int, select: int) -> jnp.ndarray:
    """Average stored maps over (layers, heads) -> (res, res, 77).  Works on
    per-step maps or across-step sums (downstream consumers max-normalize)."""
    maps = []
    for k in keys:
        m = store[k]  # (n*H, hw, 77) or (n, H, hw, 77)
        # The reshape below is only shape-correct when the leading dims
        # actually factor as n_prompts * heads * res * res — make callers'
        # normalization a checked contract rather than an assumption.
        lead = 1
        for d in m.shape[:-1]:
            lead *= d
        assert lead % (n_prompts * res * res) == 0, \
            f"store shape {m.shape} not factorable as (n={n_prompts}, H, {res}x{res}, ·)"
        maps.append(m.reshape(n_prompts, -1, res, res, m.shape[-1])[select])
    out = jnp.concatenate(maps, axis=0)
    return out.mean(axis=0)


def aggregate_store_batched(store: Dict[str, jnp.ndarray], keys: List[str],
                            res: int, n_prompts: int) -> jnp.ndarray:
    """Per-sample aggregation: -> (n_prompts, res, res, 77)."""
    maps = []
    for k in keys:
        m = store[k]
        maps.append(m.reshape(n_prompts, -1, res, res, m.shape[-1]))
    out = jnp.concatenate(maps, axis=1)
    return out.mean(axis=1)


def attention_map_for_token(agg: jnp.ndarray, token_idx, resize: Optional[int] = 64
                            ) -> jnp.ndarray:
    """Normalized (and optionally bicubic-resized) map for one token channel
    (reference ptp_editor.py:43-85 get_attention_map)."""
    m = agg[..., token_idx] if isinstance(token_idx, int) else \
        jnp.take(agg, token_idx, axis=-1)
    m = m / jnp.maximum(m.max(), 1e-12)
    if resize is not None and m.shape[-1] != resize:
        m = jax.image.resize(m, (resize, resize), method="cubic")
        m = jnp.clip(m, 0.0, 1.0)
    return m


def normalized_token_maps(agg: jnp.ndarray, resize: int = 64) -> jnp.ndarray:
    """All-token version: (res, res, 77) -> (resize, resize, 77), each channel
    max-normalized then bicubic-resized (used by eta-inversion's per-step
    forward masks)."""
    m = agg / jnp.maximum(agg.max(axis=(0, 1), keepdims=True), 1e-12)
    if agg.shape[0] != resize:
        m = jax.image.resize(m, (resize, resize, m.shape[-1]), method="cubic")
        m = jnp.clip(m, 0.0, 1.0)
    return m


def max_pool_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 same-padded max pool over the last two spatial dims of
    (..., H, W) (LocalBlend's nnf.max_pool2d, reference ptp.py:24)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1,) * (x.ndim - 2) + (3, 3),
        window_strides=(1,) * x.ndim,
        padding=[(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)])


# ---------------------------------------------------------------------------
# hooks
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PtpHooks(AttnHooks):
    """Per-step ptp attention intervention (pure; arrays are traced values)."""

    layout: BatchLayout
    mode: str  # "replace" | "refine" | "none"
    alpha_i: Any  # (n_t, 1, 1, 77) cross-replace alpha for this step
    self_gate: Any  # traced bool: self-replace active this step
    mapper_mat: Any = None  # (n_t, 77, 77) for replace
    mapper_idx: Any = None  # (n_t, 77) for refine
    refine_alphas: Any = None  # (n_t, 77) for refine
    equalizer: Any = None  # (1, 77) or None
    attn_replace_thres: int = 32 * 32
    store_keys: Tuple[str, ...] = ()
    do_edit: bool = True
    fold_cross_attn: bool = False

    def wants_probs(self, meta: AttnLayerMeta) -> bool:
        # Only cross-attention needs materialized probabilities (word-level
        # alpha blending).  Self-attention replacement is algebraically a q/k
        # substitution (see `qkv`), so the (B, H, hw, hw) probs tensor — 1024^2
        # per head at the 32x32 threshold resolution — is never built.
        return self.do_edit and meta.is_cross

    def store(self, meta: AttnLayerMeta) -> bool:
        return meta.store_key in self.store_keys

    def passthrough_attn(self, meta: AttnLayerMeta) -> bool:
        # self-attention above the replacement threshold (SD: the 64x64
        # layers) is untouched — `qkv` substitution gates on
        # res^2 <= attn_replace_thres, probs/fold act on cross layers only
        return (not meta.is_cross and not self.store(meta)
                and (not self.do_edit or self.layout.n_prompts < 2
                     or meta.res * meta.res > self.attn_replace_thres))

    def cfg_prefix_safe(self, first_self_meta: AttnLayerMeta) -> bool:
        # ptp touches self-attention only at res^2 <= attn_replace_thres
        # (`qkv`), stores only cross maps, and leaves hidden/out identity —
        # so the prefix through the first self layer is hook-free whenever
        # that layer sits above the replacement threshold (SD: 64^2 > 32^2).
        return (not self.do_edit
                or first_self_meta.res ** 2 > self.attn_replace_thres)

    def replace_cross(self, base, repl):
        """Pair-batched: base (B, H, hw, 77) sources; repl (B, H, hw, 77)
        targets (B = layout.n_pairs; the reference's single edit is B=1)."""
        if self.mode == "replace":
            new = jnp.einsum("bhpw,bwn->bhpn", base,
                             self.mapper_mat.astype(base.dtype))
        elif self.mode == "refine":
            idx = self.mapper_idx[:, None, None, :]  # (B, 1, 1, 77)
            gathered = jnp.take_along_axis(
                base, jnp.broadcast_to(idx, base.shape[:3] + (idx.shape[-1],)),
                axis=-1)
            a = self.refine_alphas[:, None, None, :].astype(base.dtype)
            new = gathered * a + repl * (1 - a)
        else:
            new = repl
        if self.equalizer is not None:
            # reference AttentionReweight: scale the (possibly replaced) base
            new = new * self.equalizer[:, None, None, :].astype(base.dtype)
        return new

    def qkv(self, meta: AttnLayerMeta, q, k, v):
        """Self-attention replacement as q/k substitution: replacing a target
        row's probability map with the source row's (reference
        replace_self_attention, ptp.py:194-199) equals computing
        softmax(q_src k_src^T) v_tgt — so substitute q and k of the target
        cond rows and let the (unmaterialized) attention kernel do the rest."""
        if (not self.do_edit or meta.is_cross or self.layout.n_prompts < 2
                or meta.res * meta.res > self.attn_replace_thres):
            return q, k, v
        n = self.layout.cond_start
        B = self.layout.n_pairs

        def subst(x):
            base, repl = x[n: n + B], x[n + B:]
            reps = repl.shape[0] // B
            base_t = jnp.tile(base, (reps,) + (1,) * (base.ndim - 1)) \
                if reps > 1 else base
            new = jnp.where(self.self_gate, base_t, repl)
            return jnp.concatenate([x[: n + B], new], axis=0)

        return subst(q), subst(k), v

    def probs(self, meta: AttnLayerMeta, p):
        if not self.do_edit or not meta.is_cross:
            return p
        n = self.layout.cond_start
        if self.layout.n_prompts < 2:
            return p
        B = self.layout.n_pairs
        cond = p[n:]
        base, repl = cond[:B], cond[B:]
        a = self.alpha_i.astype(p.dtype)  # (B, 1, 1, 77)
        new = self.replace_cross(base, repl)
        new = new * a + (1 - a) * repl
        return jnp.concatenate([p[: n + B], new.astype(p.dtype)], axis=0)

    def _fold_terms(self):
        """The per-key-token linear algebra of the `probs` cross edit:
        out_tgt = P_src @ (M2 @ V_tgt) + P_tgt @ (s_t * V_tgt), where all
        per-token scalings (time-word alpha, refine alphas, reweight
        equalizer) fold into M2 (B, 77, 77) / s_t (B, 77)."""
        B = self.layout.n_pairs
        K = self.alpha_i.shape[-1]
        a = self.alpha_i.reshape(B, K).astype(jnp.float32)  # (B, 77)
        eq = jnp.ones((B, K), jnp.float32) if self.equalizer is None \
            else self.equalizer.astype(jnp.float32)
        if self.mode == "replace":
            m2 = self.mapper_mat.astype(jnp.float32) * (eq * a)[:, None, :]
            s_t = 1.0 - a
        elif self.mode == "refine":
            g = jax.nn.one_hot(self.mapper_idx, K, axis=1, dtype=jnp.float32)
            ra = self.refine_alphas.astype(jnp.float32)
            m2 = g * (ra * eq * a)[:, None, :]
            s_t = (1.0 - ra) * eq * a + (1.0 - a)
        else:  # pure reweight: new = repl * eq
            m2 = None
            s_t = eq * a + (1.0 - a)
        return m2, s_t

    def cross_fold(self, meta: AttnLayerMeta, q, k, v):
        """`probs` re-expressed without materializing the fp32 (B, H, Sq, 77)
        probability tensor: per-token scalings fold into the target value
        matrix, and the P_src-probability component rides B extra batch rows
        (q_src, k_src, M2 @ V_tgt) summed back into the target rows.  The win
        comes from staying on the fused XLA einsum path (softmax folded into
        the two contractions, no 80 MB probability intermediate) — short-K
        shapes route to XLA, not Pallas (see attention() dispatch).  Exact in
        exact arithmetic; enabled on TPU (fold_cross_attn) where the
        materialized path costs 2.9 ms vs 1.3 ms per 64x64 layer-call at
        batch 32 (scripts/attn_microbench3.py)."""
        if (not self.fold_cross_attn or not self.do_edit or not meta.is_cross
                or self.layout.n_prompts < 2
                or meta.store_key in self.store_keys):
            return None
        n = self.layout.cond_start
        B = self.layout.n_pairs
        if q.shape[0] != n + 2 * B:
            return None
        m2, s_t = self._fold_terms()
        # scale only the target rows' values: a full-batch row/token scale
        # (ones elsewhere) instead of slicing + concatenating 80 MB tensors —
        # the concat glue measured 5 ms/step at SD batch 8 (trace r2)
        ones = jnp.ones((n + B, 1, s_t.shape[-1]), s_t.dtype)
        rowscale = jnp.concatenate([ones, s_t[:, None, :]], axis=0)
        v2 = v * rowscale[..., None].astype(v.dtype)
        if m2 is None:
            return q, k, v2, (lambda o: o)
        v_t = v[n + B:]
        extra_v = jnp.einsum("bwn,bhnd->bhwd", m2, v_t,
                             preferred_element_type=jnp.float32).astype(v.dtype)
        q_s, k_s = q[n: n + B], k[n: n + B]

        def combine(o, _extra=(q_s, k_s, extra_v)):
            from ..ops.flash_attention import attention
            qs, ks, ev = _extra
            d = qs.shape[-1]
            o_extra = attention(qs, ks, ev, d ** -0.5)
            return o.at[n + B:].add(o_extra.astype(o.dtype))

        return q, k, v2, combine


# ---------------------------------------------------------------------------
# controllers
# ---------------------------------------------------------------------------

def _store_heads_by_key(engine, latent):
    """Per-layer head counts for sizing store buffers (uniform on SD1.x,
    per-stage on SD2.x/SDXL), plus the native-geometry guard: buffers are
    sized from the preset's STATIC layer metadata, so a non-native input size
    would desync them from the sown shapes.  The spatial axis is checked
    (latent may carry leading stack dims, e.g. EDICT's (2, B, h, w, c) pair)."""
    assert latent.shape[-3] == engine.model.latent_size, (
        f"attention stores are sized for the preset's native latent "
        f"geometry ({engine.model.latent_size}^2); got {latent.shape[-3]}"
        f" — preprocess inputs to the preset's image_size")
    return {m.store_key: m.heads
            for pair in engine.model.attn_metas.values() for m in pair}


class PtpController(Controller):
    """Full prompt-to-prompt edit controller (replace/refine [+reweight]
    [+LocalBlend]), reference ptp.py:186-320 make_controller semantics.

    Pair-batched: `source_prompt`/`target_prompt` may be lists of B prompts
    (with per-pair `blend_words`/`equilizer_params` lists) — all B edits run in
    one diffusion scan with the conditional batch laid out
    [s_1..s_B, t_1..t_B].  The reference edits one pair at a time; B=1
    reproduces it exactly.
    """

    def __init__(self, engine, source_prompt, target_prompt,
                 is_replace_controller: bool = True,
                 cross_replace_steps: Union[float, Dict[str, Any]] = 0.8,
                 self_replace_steps: Union[float, Tuple[float, float]] = 0.4,
                 blend_words: Optional[Sequence] = None,
                 equilizer_params: Optional[Union[Dict[str, Any], Sequence]] = None,
                 attn_replace_thres: Optional[int] = None,
                 store_res: Optional[Tuple[int, ...]] = None,
                 store_places: Tuple[str, ...] = ("down", "up"),
                 fold_cross: Optional[bool] = None):
        self.engine = engine
        tokenizer = engine.model.tokenizer
        batched = isinstance(source_prompt, (list, tuple))
        sources = list(source_prompt) if batched else [source_prompt]
        targets = list(target_prompt) if batched else [target_prompt]
        assert len(sources) == len(targets)
        B = len(sources)
        self.n_pairs = B
        S = engine.num_inference_steps
        self.num_steps = S
        self.prompts = [sources[0], targets[0]]
        self.attn_replace_thres = attn_replace_thres or 32 * 32

        # normalize per-pair option lists
        blend_list = blend_words if batched else [blend_words]
        if not batched:
            eq_list = [equilizer_params]
        else:
            eq_list = equilizer_params if equilizer_params is not None else [None] * B
        if blend_list is None:
            blend_list = [None] * B
        assert len(blend_list) == B and len(eq_list) == B

        self.mode = "replace" if is_replace_controller else "refine"
        self.cross_alpha = np.concatenate([
            get_time_words_attention_alpha([s, t], S, cross_replace_steps, tokenizer)
            for s, t in zip(sources, targets)], axis=1)  # (S+1, B, 1, 1, 77)
        if isinstance(self_replace_steps, float):
            self_replace_steps = (0.0, self_replace_steps)
        self.self_range = (int(S * self_replace_steps[0]), int(S * self_replace_steps[1]))

        if self.mode == "replace":
            self.mapper_mat = np.concatenate([
                seq_aligner.get_replacement_mapper([s, t], tokenizer)
                for s, t in zip(sources, targets)], axis=0)  # (B, 77, 77)
            self.mapper_idx = None
            self.refine_alphas = None
        else:
            pairs = [seq_aligner.get_refinement_mapper([s, t], tokenizer)
                     for s, t in zip(sources, targets)]
            self.mapper_idx = np.concatenate([m for m, _ in pairs], axis=0)
            self.refine_alphas = np.concatenate([a for _, a in pairs], axis=0)
            self.mapper_mat = None

        self.equalizer = None
        if any(eq is not None for eq in eq_list):
            eqs = []
            for tgt, eq in zip(targets, eq_list):
                if eq is None:
                    eqs.append(np.ones((1, MAX_NUM_WORDS), dtype=np.float32))
                else:
                    eqs.append(get_equalizer(tgt, eq["words"], eq["values"], tokenizer))
            self.equalizer = np.concatenate(eqs, axis=0)  # (B, 77)

        # LocalBlend (reference ptp.py:18-73); alpha rows follow the latent
        # layout [s_1..s_B, t_1..t_B]
        self.blend = None
        if any(bw is not None for bw in blend_list):
            alpha_layers = np.zeros((2 * B, MAX_NUM_WORDS), dtype=np.float32)
            for i, (s, t, bw) in enumerate(zip(sources, targets, blend_list)):
                if bw is None:
                    continue
                for row, prompt, words in ((i, s, bw[0]), (B + i, t, bw[1])):
                    if isinstance(words, str):
                        words = [words]
                    for word in words:
                        ind = seq_aligner.get_word_inds(prompt, word, tokenizer)
                        alpha_layers[row, ind] = 1
            self.blend = {
                "alpha_layers": alpha_layers,
                "start_blend": int(0.2 * S),
                "th": (0.3, 0.3),
            }

        # store: cross maps at 16x16 from down+up (LocalBlend's layer set,
        # reference ptp.py:37); small models fall back to the nearest
        # resolution that has cross layers.  The reference accumulates these
        # maps unconditionally (ptp.py:143-183); here they are only
        # materialized when something consumes them — LocalBlend, or a caller
        # that passed store_res explicitly (e.g. eta-inversion bwd_* masks).
        metas = engine.model.attn_metas
        explicit_store = store_res is not None
        if store_res is None:
            want = max(engine.model.preset.unet.sample_size // 4, 1)
            store_res = (nearest_cross_res(metas, want, store_places),)
        if self.blend is not None or explicit_store:
            self.store_keys = tuple(
                k for res in store_res
                for k in store_keys_for(metas, res, store_places))
        else:
            self.store_keys = ()
        self.store_res = store_res
        self.store_places = store_places
        # value-folded cross edit (PtpHooks.cross_fold): default on for the
        # TPU kernel path, off on CPU where the materialized path is the
        # reference numerics (tests force it on to check equivalence)
        from ..ops.flash_attention import on_tpu
        self.fold_cross = on_tpu() if fold_cross is None else fold_cross

    # -- protocol ------------------------------------------------------------

    def static_key(self):
        return ("ptp", self.mode, self.n_pairs, self.self_range,
                self.attn_replace_thres, self.equalizer is not None,
                None if self.blend is None else self.blend["start_blend"],
                self.store_keys, self.num_steps, self.fold_cross)

    def collect_store(self) -> bool:
        return len(self.store_keys) > 0

    def init_state(self, engine, latent, contexts):
        heads_by_key = _store_heads_by_key(engine, latent)
        n = 2 * self.n_pairs  # [s_1..s_B, t_1..t_B]
        state: Dict[str, Any] = {
            "cross_alpha": jnp.asarray(self.cross_alpha),
            "store_sum": {
                k: jnp.zeros((n, heads_by_key[k], int(k.split("_")[2]) ** 2,
                              MAX_NUM_WORDS), jnp.float32)
                for k in self.store_keys},
        }
        if self.mapper_mat is not None:
            state["mapper_mat"] = jnp.asarray(self.mapper_mat)
        if self.mapper_idx is not None:
            state["mapper_idx"] = jnp.asarray(self.mapper_idx)
            state["refine_alphas"] = jnp.asarray(self.refine_alphas)
        if self.equalizer is not None:
            state["equalizer"] = jnp.asarray(self.equalizer)
        if self.blend is not None:
            state["alpha_layers"] = jnp.asarray(self.blend["alpha_layers"])
        return state

    def hooks(self, i, state, layout: BatchLayout) -> AttnHooks:
        lo, hi = self.self_range
        return PtpHooks(
            layout=layout,
            mode=self.mode,
            alpha_i=state["cross_alpha"][i],
            self_gate=jnp.logical_and(i >= lo, i < hi),
            mapper_mat=state.get("mapper_mat"),
            mapper_idx=state.get("mapper_idx"),
            refine_alphas=state.get("refine_alphas"),
            equalizer=state.get("equalizer"),
            attn_replace_thres=self.attn_replace_thres,
            store_keys=self.store_keys,
            fold_cross_attn=self.fold_cross,
        )

    def end_step(self, i, t, latent, eps, store, state):
        state = dict(state)
        if self.store_keys:
            n = latent.shape[0]
            sums = dict(state["store_sum"])
            for k in self.store_keys:
                m = store[k]  # (B, H, hw, 77); cond half only (reference
                # AttentionControl.__call__ stores attn[h//2:], ptp.py:112-113)
                cond = m[-n:]
                sums[k] = sums[k] + cond.astype(jnp.float32)
            state["store_sum"] = sums
        if self.blend is not None:
            latent = self._local_blend(i, latent, state)
        return latent, state

    def _local_blend(self, i, x_t, state):
        """LocalBlend (reference ptp.py:20-47), pair-batched: per pair, build a
        word-attention mask, pool, upsample, threshold, union with the source
        mask, and blend non-masked regions back to that pair's source latent.
        Rows without blend words pass through untouched."""
        b, h, w, c = x_t.shape  # b = 2B, rows [s_1..s_B, t_1..t_B]
        B = self.n_pairs
        res = self.store_res[0]
        maps = []
        for k in self.store_keys:
            if f"_{res}_" not in k:
                continue
            m = state["store_sum"][k]  # (2B, H, hw, 77)
            maps.append(m.reshape(b, -1, 1, res, res, MAX_NUM_WORDS))
        maps = jnp.concatenate(maps, axis=1)
        alpha = state["alpha_layers"][:, None, None, None, None, :]
        mask = (maps * alpha).sum(-1).mean(1)  # (2B, 1, 16, 16)
        mask = max_pool_3x3(mask)
        mask = jax.image.resize(mask, (b, 1, h, w), method="nearest")
        mask = mask / jnp.maximum(mask.max(axis=(2, 3), keepdims=True), 1e-12)
        mask = (mask > self.blend["th"][0])
        # union each target's mask with its pair's source mask (reference
        # `mask[:1] + mask` generalized per pair)
        src_mask = jnp.concatenate([mask[:B], mask[:B]], axis=0)
        mask = jnp.logical_or(src_mask, mask).astype(x_t.dtype)
        mask = mask.transpose(0, 2, 3, 1)  # NHWC
        base = jnp.concatenate([x_t[:B], x_t[:B]], axis=0)
        blended = base + mask * (x_t - base)
        has_blend = jnp.asarray(
            (np.asarray(self.blend["alpha_layers"]).any(axis=-1)),
            x_t.dtype).reshape(b, 1, 1, 1)
        blended = has_blend * blended + (1 - has_blend) * x_t
        # counter semantics: blend once step index exceeds start_blend
        # (reference ptp.py:34-36 counts calls before comparing)
        return jnp.where(i + 1 > self.blend["start_blend"], blended, x_t)


class AttnStoreController(Controller):
    """Accumulate cross-attention maps without editing (reference
    PromptToPromptControllerAttentionStore, ptp_editor.py:132-145)."""

    def __init__(self, engine, store_res: Tuple[int, ...] = (16,),
                 store_places: Tuple[str, ...] = ("down", "up"),
                 n_prompts: int = 1, per_step_maps: bool = False, resize: int = 64):
        self.engine = engine
        metas = engine.model.attn_metas
        store_res = tuple(nearest_cross_res(metas, r, store_places) for r in store_res)
        self.store_keys = tuple(
            k for res in store_res for k in store_keys_for(metas, res, store_places))
        self.store_res = store_res
        self.n_prompts = n_prompts
        self.per_step_maps = per_step_maps
        self.resize = resize

    def static_key(self):
        return ("attnstore", self.store_keys, self.n_prompts, self.per_step_maps,
                self.resize)

    def collect_store(self) -> bool:
        return True

    def hooks(self, i, state, layout: BatchLayout) -> AttnHooks:
        keys = self.store_keys

        class _StoreHooks(AttnHooks):
            def store(self, meta):
                return meta.store_key in keys

            def passthrough_attn(self, meta):
                return meta.store_key not in keys

        return _StoreHooks()

    def init_state(self, engine, latent, contexts):
        heads_by_key = _store_heads_by_key(engine, latent)
        state = {
            "store_sum": {
                k: jnp.zeros((self.n_prompts, heads_by_key[k],
                              int(k.split("_")[2]) ** 2, MAX_NUM_WORDS),
                             jnp.float32)
                for k in self.store_keys},
            "count": jnp.zeros((), jnp.float32),
        }
        if self.per_step_maps:
            # running sum of per-step normalized token maps (eta-inversion's
            # forward "mean" masks, reference eta_inversion.py:36-49, 388-396);
            # kept per sample for batched editing
            state["norm_map_sum"] = jnp.zeros(
                (self.n_prompts, self.resize, self.resize, MAX_NUM_WORDS),
                jnp.float32)
        return state

    def end_step(self, i, t, latent, eps, store, state):
        state = dict(state)
        sums = dict(state["store_sum"])
        n = self.n_prompts
        for k in self.store_keys:
            m = store[k]
            cond = m[-n:] if m.shape[0] > n else m
            sums[k] = sums[k] + cond.astype(jnp.float32)
        state["store_sum"] = sums
        state["count"] = state["count"] + 1.0
        if self.per_step_maps:
            # normalize THIS step's aggregated map, not the running sum — the
            # reference stores per-step maps and means their normalizations
            # (eta_inversion.py:36-49 ControllerAttentionStorePerStep,
            # :388-396 mean over per-step normalized maps)
            res = self.store_res[0]
            step_maps = {
                k: (store[k][-n:] if store[k].shape[0] > n else store[k]
                    ).astype(jnp.float32)
                for k in self.store_keys}
            agg = aggregate_store_batched(step_maps, list(self.store_keys), res, n)
            state["norm_map_sum"] = state["norm_map_sum"] + jax.vmap(
                lambda a: normalized_token_maps(a, self.resize))(agg)
        return latent, state


class PromptToPromptEditor(ControllerBasedEditor):
    """Counterpart of reference PromptToPromptEditor (ptp_editor.py:148-157)."""

    def make_controller(self, image, source_prompt, target_prompt, inv_res,
                        **kwargs) -> Controller:
        kwargs.pop("prompts", None)
        inv = self.inverter
        # eta-inversion bwd_* mask modes read this controller's attention
        # store — force it on even without LocalBlend
        if getattr(inv, "mask_mode_cfg", None) is not None and (
                inv._mask_mode_is_bwd("mask_eta")
                or inv._mask_mode_is_bwd("mask_dirinv")):
            kwargs.setdefault("store_res", (inv._attn_res(),))
            kwargs.setdefault("store_places",
                              tuple(inv.mask_mode_cfg["attn_from_where"]))
        return PtpController(inv, source_prompt, target_prompt, **kwargs)
