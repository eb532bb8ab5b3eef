"""End-to-end torch mini-reference oracle (round-4 verdict item 4).

An INDEPENDENT torch implementation of the reference's two canonical edit
pipelines, run at tiny geometry against the JAX engine with SHARED weights:

  * diffinv + simple  — /root/reference/modules/inversion/
    diffusion_inversion.py:314-436 (DDIM fwd/bwd loops, CFG batching
    cat_context :462-491) + modules/editing/simple_editor.py:9-49;
  * etainv + ptp      — /root/reference/modules/inversion/
    eta_inversion.py:207-403 (candidate variance-noise selection, spatial eta
    masks from forward cross-attention, source-row replacement) +
    modules/utils/ptp.py:18-232 (AttentionControlEdit cross/self replacement,
    AttentionStore accumulation, LocalBlend) + AttentionReweight (:261-274).

The per-block crosschecks (test_torch_crosscheck.py / _neural_crosscheck.py)
pin the math of every building block; THIS module pins whole-pipeline
semantics those cannot see: step ordering, timestep grids, CFG row layout
[u_src, u_tgt, c_src, c_tgt], controller timing (store-then-edit, end-of-step
LocalBlend), the eta candidate argmin, and the forward-trajectory snap.

Scope note on randomness: the torch pipelines consume the same random draws as
the engine (re-derived host-side via jax.random's deterministic key-splitting
sequence).  RNG parity is explicitly out of scope (SURVEY §7 hard-part 3);
everything downstream of the draws is implemented independently in torch.

Shared host-side config (not re-derived): the controller's precomputed numpy
tables (time-word alphas, seq_aligner mappers, equalizer, eta table).  These
are data computed before the pipelines run; both sides consume them.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

STEPS = 10
GROUPS = 8  # tiny preset norm groups


# ---------------------------------------------------------------------------
# small torch helpers (flax param tree -> torch ops)
# ---------------------------------------------------------------------------

def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def _conv_w(k):
    """Flax conv kernel (H, W, I, O) -> torch conv weight (O, I, H, W)."""
    return _t(np.transpose(np.asarray(k), (3, 2, 0, 1)))


def _lin_w(k):
    return _t(np.asarray(k).T)


def _conv(p, x, stride=1, padding=0):
    return F.conv2d(x, _conv_w(p["kernel"]), _t(p["bias"]), stride=stride,
                    padding=padding)


def _dense(p, x):
    return F.linear(x, _lin_w(p["kernel"]), _t(p["bias"]))


def _gn(p, x, groups, eps):
    return F.group_norm(x, groups, _t(p["scale"]), _t(p["bias"]), eps=eps)


def _ln(p, x):
    return F.layer_norm(x, (x.shape[-1],), _t(p["scale"]), _t(p["bias"]),
                        eps=1e-5)


def _resnet(p, x, temb, groups):
    """Diffusers ResnetBlock2D semantics (torch replica; NCHW)."""
    h = F.silu(_gn(p["norm1"], x, groups, 1e-5))
    h = _conv(p["conv1"], h, padding=1)
    if temb is not None:
        h = h + _dense(p["time_emb_proj"], F.silu(temb))[:, :, None, None]
    h = F.silu(_gn(p["norm2"], h, groups, 1e-5))
    h = _conv(p["conv2"], h, padding=1)
    if "conv_shortcut" in p:
        x = _conv(p["conv_shortcut"], x)
    return x + h


# ---------------------------------------------------------------------------
# torch VAE (encoder/decoder replicas of models/vae.py's diffusers semantics)
# ---------------------------------------------------------------------------

def _vae_attention(p, x, groups):
    b, c, h, w = x.shape
    res = x
    y = _gn(p["group_norm"], x, groups, 1e-6)
    y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
    q, k, v = _dense(p["to_q"], y), _dense(p["to_k"], y), _dense(p["to_v"], y)
    probs = torch.softmax(q @ k.transpose(-1, -2) * c ** -0.5, dim=-1)
    o = _dense(p["to_out"], probs @ v)
    return res + o.reshape(b, h, w, c).permute(0, 3, 1, 2)


def torch_vae_encode(vp, img_nchw, scaling):
    ep = vp["encoder"]
    x = _conv(ep["conv_in"], img_nchw, padding=1)
    x = _resnet(ep["down_0_resnet_0"], x, None, GROUPS)
    x = F.pad(x, (0, 1, 0, 1))
    x = _conv(ep["down_0_downsample"]["conv"], x, stride=2)
    x = _resnet(ep["down_1_resnet_0"], x, None, GROUPS)
    x = _resnet(ep["mid_resnet_0"], x, None, GROUPS)
    x = _vae_attention(ep["mid_attn"], x, GROUPS)
    x = _resnet(ep["mid_resnet_1"], x, None, GROUPS)
    x = F.silu(_gn(ep["conv_norm_out"], x, GROUPS, 1e-6))
    x = _conv(ep["conv_out"], x, padding=1)
    moments = _conv(vp["quant_conv"], x)
    mean = moments[:, : moments.shape[1] // 2]  # posterior mean (deterministic)
    return mean * scaling


def torch_vae_decode(vp, z_nchw, scaling):
    dp = vp["decoder"]
    x = _conv(vp["post_quant_conv"], z_nchw / scaling)
    x = _conv(dp["conv_in"], x, padding=1)
    x = _resnet(dp["mid_resnet_0"], x, None, GROUPS)
    x = _vae_attention(dp["mid_attn"], x, GROUPS)
    x = _resnet(dp["mid_resnet_1"], x, None, GROUPS)
    for j in range(2):  # up_0: stage 1 (ch 32) + upsample
        x = _resnet(dp[f"up_0_resnet_{j}"], x, None, GROUPS)
    x = F.interpolate(x, scale_factor=2, mode="nearest")
    x = _conv(dp["up_0_upsample"]["conv"], x, padding=1)
    for j in range(2):  # up_1: stage 0 (ch 16), no upsample
        x = _resnet(dp[f"up_1_resnet_{j}"], x, None, GROUPS)
    x = F.silu(_gn(dp["conv_norm_out"], x, GROUPS, 1e-6))
    return _conv(dp["conv_out"], x, padding=1)


# ---------------------------------------------------------------------------
# torch CLIP text encoder (models/clip.py semantics: causal, quick-gelu,
# final LayerNorm hidden states)
# ---------------------------------------------------------------------------

def torch_text_encode(tp, ids, num_layers=2, heads=2):
    emb = _t(tp["token_embedding"]["embedding"])
    x = emb[torch.from_numpy(np.asarray(ids, np.int64))]
    x = x + _t(tp["position_embedding"])[None, : x.shape[1]]
    b, s, c = x.shape
    hd = c // heads
    causal = torch.tril(torch.ones(s, s, dtype=torch.bool))
    for i in range(num_layers):
        lp = tp[f"layers_{i}"]
        h = _ln(lp["layer_norm1"], x)
        ap = lp["self_attn"]
        q = _dense(ap["q_proj"], h).view(b, s, heads, hd).permute(0, 2, 1, 3)
        k = _dense(ap["k_proj"], h).view(b, s, heads, hd).permute(0, 2, 1, 3)
        v = _dense(ap["v_proj"], h).view(b, s, heads, hd).permute(0, 2, 1, 3)
        logits = q @ k.transpose(-1, -2) * hd ** -0.5
        logits = torch.where(causal, logits, torch.tensor(-1e30))
        o = (torch.softmax(logits, dim=-1) @ v).permute(0, 2, 1, 3).reshape(b, s, c)
        x = x + _dense(ap["out_proj"], o)
        h = _ln(lp["layer_norm2"], x)
        h = _dense(lp["fc1"], h)
        h = h * torch.sigmoid(1.702 * h)  # quick-gelu
        x = x + _dense(lp["fc2"], h)
    return _ln(tp["final_layer_norm"], x)


# ---------------------------------------------------------------------------
# torch tiny UNet with reference-style attention controller callbacks
# ---------------------------------------------------------------------------

class UNetHooks:
    """Reference-style attention interception points.  `key` identifies the
    transformer in forward order: down_0, mid, up_1_0, up_1_1."""

    def qkv_self(self, key, q, k, v):  # (B, H, S, D) each
        return q, k, v

    def cross_probs(self, key, p):  # (B, H, S, 77) raw probabilities
        return p


def _mh(x, heads):
    b, s, c = x.shape
    return x.view(b, s, heads, c // heads).permute(0, 2, 1, 3)


def _mh_merge(x):
    b, h, s, d = x.shape
    return x.permute(0, 2, 1, 3).reshape(b, s, h * d)


def _attention_block(bp, x, ctx, heads, hooks, key):
    """BasicTransformerBlock: LN -> self-attn -> LN -> cross-attn -> LN -> GEGLU."""
    b, s, c = x.shape
    hd = c // heads
    # self-attention (hooks may substitute q/k of target rows)
    h = _ln(bp["norm1"], x)
    q = _mh(F.linear(h, _lin_w(bp["attn1"]["to_q"]["kernel"])), heads)
    k = _mh(F.linear(h, _lin_w(bp["attn1"]["to_k"]["kernel"])), heads)
    v = _mh(F.linear(h, _lin_w(bp["attn1"]["to_v"]["kernel"])), heads)
    if hooks is not None:
        q, k, v = hooks.qkv_self(key, q, k, v)
    p = torch.softmax(q @ k.transpose(-1, -2) * hd ** -0.5, dim=-1)
    x = x + _dense(bp["attn1"]["to_out"], _mh_merge(p @ v))
    # cross-attention (hooks may store + edit the probabilities)
    h = _ln(bp["norm2"], x)
    q = _mh(F.linear(h, _lin_w(bp["attn2"]["to_q"]["kernel"])), heads)
    k = _mh(F.linear(ctx, _lin_w(bp["attn2"]["to_k"]["kernel"])), heads)
    v = _mh(F.linear(ctx, _lin_w(bp["attn2"]["to_v"]["kernel"])), heads)
    p = torch.softmax(q @ k.transpose(-1, -2) * hd ** -0.5, dim=-1)
    if hooks is not None:
        p = hooks.cross_probs(key, p)
    x = x + _dense(bp["attn2"]["to_out"], _mh_merge(p @ v))
    # GEGLU feed-forward (exact erf gelu)
    h = _ln(bp["norm3"], x)
    h = _dense(bp["ff"]["geglu_proj"], h)
    h, gate = h.chunk(2, dim=-1)
    return x + _dense(bp["ff"]["proj_out"], h * F.gelu(gate))


def _transformer(p, x, ctx, heads, hooks, key):
    b, c, hh, ww = x.shape
    residual = x
    h = _gn(p["norm"], x, GROUPS, 1e-6)
    h = _conv(p["proj_in"], h)
    h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, -1)
    h = _attention_block(p["blocks_0"], h, ctx, heads, hooks, key)
    h = h.reshape(b, hh, ww, -1).permute(0, 3, 1, 2)
    return _conv(p["proj_out"], h) + residual


def _timestep_embedding(t, dim):
    """diffusers sinusoid, flip_sin_to_cos=True, shift=0 (models/layers.py)."""
    half = dim // 2
    freqs = torch.exp(-np.log(10000.0) * torch.arange(half, dtype=torch.float32)
                      / half)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def torch_unet(up, z_nchw, t, ctx, hooks=None, heads=2):
    """Tiny UNet forward (models/unet.py TINY wiring), NCHW in/out."""
    b = z_nchw.shape[0]
    temb = _timestep_embedding(torch.full((b,), float(t)), 32)
    te = up["time_embedding"]
    temb = _dense(te["linear_2"], F.silu(_dense(te["linear_1"], temb)))

    x = _conv(up["conv_in"], z_nchw, padding=1)
    skips = [x]
    x = _resnet(up["down_0_resnet_0"], x, temb, GROUPS)
    x = _transformer(up["down_0_attn_0"], x, ctx, heads, hooks, "down_0")
    skips.append(x)
    x = _conv(up["down_0_downsample"]["conv"], x, stride=2, padding=1)
    skips.append(x)
    x = _resnet(up["down_1_resnet_0"], x, temb, GROUPS)
    skips.append(x)
    x = _resnet(up["mid_resnet_0"], x, temb, GROUPS)
    x = _transformer(up["mid_attn"], x, ctx, heads, hooks, "mid")
    x = _resnet(up["mid_resnet_1"], x, temb, GROUPS)
    for j in range(2):
        x = _resnet(up[f"up_0_resnet_{j}"], torch.cat([x, skips.pop()], dim=1),
                    temb, GROUPS)
    x = F.interpolate(x, scale_factor=2, mode="nearest")
    x = _conv(up["up_0_upsample"]["conv"], x, padding=1)
    for j in range(2):
        x = _resnet(up[f"up_1_resnet_{j}"], torch.cat([x, skips.pop()], dim=1),
                    temb, GROUPS)
        x = _transformer(up[f"up_1_attn_{j}"], x, ctx, heads, hooks,
                         f"up_1_{j}")
    assert not skips
    x = F.silu(_gn(up["conv_norm_out"], x, GROUPS, 1e-5))
    return _conv(up["conv_out"], x, padding=1)


# ---------------------------------------------------------------------------
# torch DDIM schedule (independent of eta_inversion_tpu.schedulers)
# ---------------------------------------------------------------------------

class TorchSchedule:
    """scaled_linear betas, set_alpha_to_one=False (diffusers DDIM cfg the
    reference pins at modules/models/__init__.py:134)."""

    def __init__(self, steps):
        betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000,
                            dtype=np.float64) ** 2
        self.alphas_cumprod = np.cumprod(1.0 - betas).astype(np.float32)
        self.final_alpha = float(self.alphas_cumprod[0])
        self.ratio = 1000 // steps
        ts = (np.arange(steps) * self.ratio).round().astype(np.int64)[::-1]
        self.ts_bwd = ts.copy()          # descending
        self.ts_fwd = ts[::-1].copy()    # ascending (sameshift eval grid)

    def alpha_at(self, t):
        if t < 0:
            return self.final_alpha
        return float(self.alphas_cumprod[min(int(t), 999)])

    def ddim_to(self, z, eps, t_from, t_to):
        """Deterministic DDIM update t_from -> t_to (either direction)."""
        a_f, a_t = self.alpha_at(t_from), self.alpha_at(t_to)
        x0 = (z - np.sqrt(1.0 - a_f) * eps) / np.sqrt(a_f)
        return np.sqrt(a_t) * x0 + np.sqrt(1.0 - a_t) * eps

    def step_fwd(self, z, eps, t):
        return self.ddim_to(z, eps, t - self.ratio, t)  # sameshift

    def variance(self, t):
        a, ap = self.alpha_at(t), self.alpha_at(t - self.ratio)
        return ((1.0 - ap) / (1.0 - a)) * (1.0 - a / ap)

    def step_bwd(self, z, eps, t, eta=0.0, noise=None):
        a, ap = self.alpha_at(t), self.alpha_at(t - self.ratio)
        x0 = (z - np.sqrt(1.0 - a) * eps) / np.sqrt(a)
        std = eta * float(np.sqrt(self.variance(t)))  # scalar or (B,1,h,w)
        if isinstance(std, torch.Tensor):
            direction = torch.sqrt(1.0 - ap - std ** 2) * eps
        else:
            direction = np.sqrt(1.0 - ap - std ** 2) * eps
        prev = np.sqrt(ap) * x0 + direction
        if noise is not None:
            prev = prev + std * noise
        return prev


# ---------------------------------------------------------------------------
# oracle pipeline 1: diffinv + simple
# ---------------------------------------------------------------------------

def _embed_pair(tp, tokenizer, prompt):
    """[uncond; cond] context rows, create_context semantics."""
    ids_c = np.asarray(tokenizer([prompt]))
    ids_u = np.asarray(tokenizer([""]))
    cond = torch_text_encode(tp, ids_c)
    uncond = torch_text_encode(tp, ids_u)
    return torch.cat([uncond, cond], dim=0)  # (2, 77, D)


def run_oracle_diffinv_simple(params, tokenizer, image_nhwc, src, tgt,
                              steps=STEPS, gs_bwd=7.5):
    sched = TorchSchedule(steps)
    up, vp, tp = params["unet"], params["vae"], params["text"]
    src_ctx = _embed_pair(tp, tokenizer, src)
    tgt_ctx = _embed_pair(tp, tokenizer, tgt)

    z = torch_vae_encode(vp, _t(image_nhwc).permute(0, 3, 1, 2), 0.18215)
    # forward DDIM inversion, CFG=1 -> cond-only UNet branch
    with torch.no_grad():
        for t in sched.ts_fwd:
            eps = torch_unet(up, z, t, src_ctx[1:2])
            z = sched.step_fwd(z, eps, int(t))
        zT = z
        # backward: rows [z_s, z_t], contexts [u_s, u_t, c_s, c_t]
        lat = torch.cat([zT, zT], dim=0)
        ctx4 = torch.cat([src_ctx[0:1], tgt_ctx[0:1],
                          src_ctx[1:2], tgt_ctx[1:2]], dim=0)
        for t in sched.ts_bwd:
            eps_all = torch_unet(up, torch.cat([lat, lat], dim=0), t, ctx4)
            eps = eps_all[:2] + gs_bwd * (eps_all[2:] - eps_all[:2])
            lat = sched.step_bwd(lat, eps, int(t))
        img = torch_vae_decode(vp, lat, 0.18215)
    return {"zT": zT.permute(0, 2, 3, 1).numpy(),
            "latent": lat.permute(0, 2, 3, 1).numpy(),
            "image": img.permute(0, 2, 3, 1).numpy()}


# ---------------------------------------------------------------------------
# oracle pipeline 2: etainv + ptp (replace controller + reweight + LocalBlend)
# ---------------------------------------------------------------------------

STORE_KEYS = ("down_0", "up_1_0", "up_1_1")  # cross layers at res 8, down+up


class FwdStoreHooks(UNetHooks):
    """Eta-inversion forward store: per-step normalized token maps
    (reference ControllerAttentionStorePerStep, eta_inversion.py:36-49)."""

    def __init__(self):
        self.step_maps = []
        self.sum_maps = None
        self.count = 0

    def cross_probs(self, key, p):
        if key in STORE_KEYS:
            self.step_maps.append(p.clone())  # (1, H, 64, 77) raw
        return p

    def end_step(self):
        maps = torch.cat(self.step_maps, dim=1)  # (1, layers*H, 64, 77)
        agg = maps.reshape(1, -1, 8, 8, 77).mean(dim=1)  # (1, 8, 8, 77)
        norm = agg / agg.amax(dim=(1, 2), keepdim=True).clamp_min(1e-12)
        self.sum_maps = norm if self.sum_maps is None else self.sum_maps + norm
        self.count += 1
        self.step_maps = []

    def token_maps(self):
        return self.sum_maps / max(self.count, 1)


class TorchPtpHooks(UNetHooks):
    """Reference AttentionControlEdit + AttentionReweight semantics, rows
    [u_s, u_t, c_s, c_t] (cond half edited only, ptp.py:107-119)."""

    def __init__(self, cross_alpha, mapper_mat, equalizer, self_range,
                 n_heads, store=True):
        self.cross_alpha = _t(cross_alpha)      # (S+1, 1, 1, 1, 77)
        self.mapper = _t(mapper_mat)            # (1, 77, 77)
        self.equalizer = None if equalizer is None else _t(equalizer)  # (1, 77)
        self.self_range = self_range
        self.i = 0
        self.store_sum = {k: torch.zeros(2, n_heads, 64, 77) for k in STORE_KEYS}
        self._step = {}
        self.store = store

    def qkv_self(self, key, q, k, v):
        if self.self_range[0] <= self.i < self.self_range[1]:
            # target cond row (3) takes source cond row (2)'s q/k == replacing
            # its probability map with the source's (ptp.py:194-199)
            q = torch.cat([q[:3], q[2:3]], dim=0)
            k = torch.cat([k[:3], k[2:3]], dim=0)
        return q, k, v

    def cross_probs(self, key, p):
        if self.store and key in STORE_KEYS:
            self._step[key] = p[2:].clone()  # raw cond half (store-then-edit)
        base, repl = p[2:3], p[3:4]
        new = torch.einsum("bhpw,bwn->bhpn", base, self.mapper)
        if self.equalizer is not None:
            new = new * self.equalizer[:, None, None, :]
        a = self.cross_alpha[self.i]  # (1, 1, 1, 77)
        new = new * a + (1 - a) * repl
        return torch.cat([p[:3], new], dim=0)

    def end_step(self):
        if self.store:
            for k in STORE_KEYS:
                self.store_sum[k] = self.store_sum[k] + self._step[k]
            self._step = {}
        self.i += 1


def _local_blend(x_t, store_sum, alpha_layers, th=0.3):
    """Reference LocalBlend (ptp.py:20-47) for the B=1 pair, NCHW latent."""
    maps = torch.cat([store_sum[k].reshape(2, -1, 1, 8, 8, 77)
                      for k in STORE_KEYS], dim=1)
    alpha = _t(alpha_layers)[:, None, None, None, None, :]  # (2,1,1,1,1,77)
    mask = (maps * alpha).sum(-1).mean(1)  # (2, 1, 8, 8)
    mask = F.max_pool2d(mask, 3, 1, padding=1)
    mask = F.interpolate(mask, size=x_t.shape[2:], mode="nearest")
    mask = mask / mask.amax(dim=(2, 3), keepdim=True).clamp_min(1e-12)
    mask = (mask > th)
    mask = (mask[:1] | mask).to(x_t.dtype)
    return x_t[:1] + mask * (x_t - x_t[:1])


def run_oracle_etainv_ptp(params, tokenizer, image_nhwc, src, tgt, tables,
                          steps=STEPS, gs_bwd=7.5, count=4, thres=0.2):
    """tables: host-side config shared with the engine — dict with keys
    eta_table (1000,), cross_alpha, mapper_mat, equalizer, alpha_layers,
    self_range, start_blend, widx (src_word_idx, tgt_word_idx)."""
    sched = TorchSchedule(steps)
    up, vp, tp = params["unet"], params["vae"], params["text"]
    src_ctx = _embed_pair(tp, tokenizer, src)
    tgt_ctx = _embed_pair(tp, tokenizer, tgt)

    with torch.no_grad():
        z = torch_vae_encode(vp, _t(image_nhwc).permute(0, 3, 1, 2), 0.18215)
        # ---- forward: CFG=1 cond branch, per-step attention stores ----
        fwd_hooks = FwdStoreHooks()
        latents = [z]
        for t in sched.ts_fwd:
            eps = torch_unet(up, z, t, src_ctx[1:2], hooks=fwd_hooks)
            fwd_hooks.end_step()
            z = sched.step_fwd(z, eps, int(t))
            latents.append(z)
        zT = z

        # ---- eta mask from forward token maps (fwd_mean + threshold) ----
        maps = fwd_hooks.token_maps()[0]  # (8, 8, 77)
        m = maps[..., tables["widx"][0] + 1]
        m = m / m.max().clamp_min(1e-12)
        mask_eta = (m > thres).float().reshape(1, 1, 8, 8)  # NCHW

        # ---- candidate noises: same draws as the engine (PRNGKey(seed+1),
        # one split per step; jax.random is platform-deterministic) ----
        rng = jax.random.PRNGKey(1)
        step_noises = []
        for _ in range(steps):
            rng, k = jax.random.split(rng)
            n = jax.random.normal(k, (count, 1, 8, 8, 4), jnp.float32)
            step_noises.append(_t(np.asarray(n)).permute(0, 1, 4, 2, 3))

        # ---- backward: etainv step + ptp controller ----
        hooks = TorchPtpHooks(tables["cross_alpha"], tables["mapper_mat"],
                              tables["equalizer"], tables["self_range"],
                              n_heads=2)
        eta_table = tables["eta_table"]
        lat = torch.cat([zT, zT], dim=0)
        ctx4 = torch.cat([src_ctx[0:1], tgt_ctx[0:1],
                          src_ctx[1:2], tgt_ctx[1:2]], dim=0)
        src_prev_seq = latents[::-1][1:]  # [z_{S-1} .. z_0]
        for i, t in enumerate(sched.ts_bwd):
            eps_all = torch_unet(up, torch.cat([lat, lat], dim=0), t, ctx4,
                                 hooks=hooks)
            eps = eps_all[:2] + gs_bwd * (eps_all[2:] - eps_all[:2])
            src_prev = src_prev_seq[i]
            eta_t = float(eta_table[min(int(t), 999)])
            # closed-form optimal variance noise + nearest-candidate argmin
            # (reference eta_inversion.py:296-375)
            rec0 = sched.step_bwd(lat[:1], eps[:1], int(t), eta=eta_t)
            std = eta_t * np.sqrt(sched.variance(int(t)))
            if std > 0:
                opt = (src_prev - rec0) / max(std, 1e-20)
            else:
                opt = torch.zeros_like(src_prev)
            noises = step_noises[i]  # (count, 1, 4, 8, 8)
            losses = ((noises - opt[None]) ** 2).mean(dim=(2, 3, 4))  # (count,1)
            best = int(losses[:, 0].argmin())
            vn = noises[best]  # (1, 4, 8, 8)
            vn_full = torch.cat([vn, vn], dim=0)
            eta_map = torch.cat([mask_eta, mask_eta], dim=0) * eta_t
            new_lat = sched.step_bwd(lat, eps, int(t), eta=eta_map,
                                     noise=vn_full)
            # source row snaps to the forward trajectory (reference :245-261)
            new_lat = torch.cat([src_prev, new_lat[1:]], dim=0)
            # controller end-of-step: store accumulation + LocalBlend
            hooks.end_step()
            if tables["alpha_layers"] is not None and \
                    (i + 1) > tables["start_blend"]:
                new_lat = _local_blend(new_lat, hooks.store_sum,
                                       tables["alpha_layers"])
            lat = new_lat
        img = torch_vae_decode(vp, lat, 0.18215)
    return {"zT": zT.permute(0, 2, 3, 1).numpy(),
            "latent": lat.permute(0, 2, 3, 1).numpy(),
            "image": img.permute(0, 2, 3, 1).numpy(),
            "mask_eta": mask_eta.numpy()}


# ---------------------------------------------------------------------------
# the tests
# ---------------------------------------------------------------------------

SRC = "a cat sitting next to a mirror"
TGT = "a tiger sitting next to a mirror"


def _np_params(model):
    return jax.tree_util.tree_map(np.asarray, model.params)


def test_diffinv_simple_matches_torch_oracle(tiny_model, test_image):
    from eta_inversion_tpu import load_editor, load_inverter

    inv = load_inverter(tiny_model, "diffinv", num_inference_steps=STEPS)
    editor = load_editor(inv, "simple")
    got = editor.edit(jnp.asarray(test_image), SRC, TGT)

    # the engine's zT for the same inversion (separate call; compile-cached)
    inv_res = inv.invert(jnp.asarray(test_image),
                         context=inv.create_context(SRC), guidance_scale_fwd=1)

    want = run_oracle_diffinv_simple(_np_params(tiny_model),
                                     tiny_model.tokenizer, test_image, SRC, TGT)
    np.testing.assert_allclose(np.asarray(inv_res["zT_inv"]), want["zT"][:1],
                               rtol=2e-4, atol=2e-4)
    got_lat = np.concatenate([np.asarray(got["latent_inv"]),
                              np.asarray(got["latent"])], axis=0)
    np.testing.assert_allclose(got_lat, want["latent"], rtol=5e-4, atol=5e-4)
    got_img = np.concatenate([np.asarray(got["image_inv"]),
                              np.asarray(got["image"])], axis=0)
    np.testing.assert_allclose(got_img, want["image"], rtol=5e-4, atol=5e-4)


def test_etainv_ptp_matches_torch_oracle(tiny_model, test_image):
    from eta_inversion_tpu import load_editor, load_inverter
    from eta_inversion_tpu.editing.ptp import PtpController

    eta_spec = ((0.6, 0.0), (1.0, 0.7))  # the paper's piecewise-power ramp
    inv = load_inverter(tiny_model, "etainv", num_inference_steps=STEPS,
                        eta=eta_spec, noise_sample_count=4)
    editor = load_editor(inv, "ptp")
    cfg = {"is_replace_controller": True, "cross_replace_steps": 0.8,
           "self_replace_steps": 0.4,
           "blend_words": (("cat",), ("tiger",)),
           "equilizer_params": {"words": ("tiger",), "values": (2.0,)}}
    inv_cfg = {"edit_word_idx": (1, 1)}
    got = editor.edit(jnp.asarray(test_image), SRC, TGT, cfg=dict(cfg),
                      inv_cfg=dict(inv_cfg))
    assert got is not None

    # shared host-side tables: build the controller once to read them
    ctrl = PtpController(inv, SRC, TGT, **cfg)
    assert ctrl.mode == "replace" and ctrl.blend is not None
    tables = {
        "eta_table": np.asarray(inv.etas),
        "cross_alpha": ctrl.cross_alpha.reshape(STEPS + 1, 1, 1, 1, 77),
        "mapper_mat": np.asarray(ctrl.mapper_mat),
        "equalizer": np.asarray(ctrl.equalizer),
        "alpha_layers": np.asarray(ctrl.blend["alpha_layers"]),
        "start_blend": ctrl.blend["start_blend"],
        "self_range": ctrl.self_range,
        "widx": (1, 1),
    }
    want = run_oracle_etainv_ptp(_np_params(tiny_model), tiny_model.tokenizer,
                                 test_image, SRC, TGT, tables, count=4)

    got_lat = np.concatenate([np.asarray(got["latent_inv"]),
                              np.asarray(got["latent"])], axis=0)
    np.testing.assert_allclose(got_lat, want["latent"], rtol=1e-3, atol=1e-3)
    got_img = np.concatenate([np.asarray(got["image_inv"]),
                              np.asarray(got["image"])], axis=0)
    np.testing.assert_allclose(got_img, want["image"], rtol=1e-3, atol=1e-3)


def test_etainv_fwd_mask_matches_torch_oracle(tiny_model, test_image):
    """The forward attention-store -> token-map -> threshold mask path in
    isolation (reference eta_inversion.py:159-205 get_mask)."""
    from eta_inversion_tpu import load_inverter

    inv = load_inverter(tiny_model, "etainv", num_inference_steps=STEPS,
                        eta=(0.0, 0.4), noise_sample_count=2)
    inv_res = inv.invert(jnp.asarray(test_image), prompt=SRC,
                         inv_cfg={"edit_word_idx": (1, 1)})
    got_maps = np.asarray(inv_res["fwd_token_maps"])  # (1, 8, 8, 77)
    got_mask = np.asarray(inv._static_mask(inv_res, "mask_eta"))

    params = _np_params(tiny_model)
    src_ctx = _embed_pair(params["text"], tiny_model.tokenizer, SRC)
    sched = TorchSchedule(STEPS)
    with torch.no_grad():
        z = torch_vae_encode(params["vae"],
                             _t(test_image).permute(0, 3, 1, 2), 0.18215)
        hooks = FwdStoreHooks()
        for t in sched.ts_fwd:
            eps = torch_unet(params["unet"], z, t, src_ctx[1:2], hooks=hooks)
            hooks.end_step()
            z = sched.step_fwd(z, eps, int(t))
    want_maps = hooks.token_maps().numpy()
    np.testing.assert_allclose(got_maps, want_maps, rtol=2e-4, atol=2e-4)
    m = want_maps[0][..., 2]
    want_mask = (m / max(m.max(), 1e-12) > 0.2).astype(np.float32)
    np.testing.assert_array_equal(got_mask[0, :, :, 0], want_mask)
