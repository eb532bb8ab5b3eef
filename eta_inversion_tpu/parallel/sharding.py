"""Parameter/activation sharding rules + the batched sharded edit step.

Design point (SURVEY.md §2.12): the edit workload is embarrassingly parallel
over dataset samples — the primary axis is "data" (batch) over ICI, replacing
the reference's process pool and additionally enabling multi-sample batching
the reference cannot do.  A "model" axis is also wired: attention q/k/v and
MLP-in kernels shard on their output dimension, out-projections on their input
dimension (Megatron-style), so XLA emits a single all-reduce per block when
model_parallel > 1.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def active_data_mesh() -> Optional[Mesh]:
    """The Mesh installed by `with mesh:` if it has a "data" axis of size > 1,
    else None.  This is how the engine's jit entry points discover that an
    eval sweep (eval.py --mesh) or dryrun put them under a device mesh."""
    try:
        from jax._src import mesh as _mesh_lib

        m = _mesh_lib.thread_resources.env.physical_mesh
    except Exception:  # pragma: no cover - jax internals moved
        return None
    if m is None or m.empty or m.shape.get("data", 1) <= 1:
        return None
    return m


def shard_batch(x, mesh: Optional[Mesh] = None):
    """Place one batch-leading array so its dim 0 splits over the "data" axis.

    No-op when no data mesh is active or the leading dim doesn't divide by the
    axis size (e.g. a trailing partial batch).  This is the explicit input
    placement that makes eval.py --mesh genuinely data-parallel: without it,
    GSPMD replicates un-annotated inputs and every "data" device computes the
    full batch redundantly."""
    mesh = mesh if mesh is not None else active_data_mesh()
    if mesh is None or x is None:
        return x
    dp = mesh.shape["data"]
    if getattr(x, "ndim", 0) < 1 or x.shape[0] % dp != 0:
        return x
    return jax.device_put(x, NamedSharding(mesh, P("data")))

# kernel-name suffixes -> which matmul dimension shards over "model"
_COL_PARALLEL = ("to_q", "to_k", "to_v", "geglu_proj", "fc1", "q_proj", "k_proj",
                 "v_proj")
_ROW_PARALLEL = ("to_out", "proj_out", "fc2", "out_proj")


def param_spec(path_names, leaf) -> P:
    """PartitionSpec for one parameter leaf given its module path."""
    if leaf.ndim < 2:
        return P()
    parent = [p for p in path_names if not p.endswith("kernel")]
    name = parent[-1] if parent else ""
    is_kernel = path_names and path_names[-1] == "kernel"
    if not is_kernel:
        return P()
    if name in _COL_PARALLEL:
        return P(*([None] * (leaf.ndim - 1)), "model")
    if name in _ROW_PARALLEL:
        return P(*([None] * (leaf.ndim - 2)), "model", None)
    return P()


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a param pytree on the mesh with tensor-parallel specs."""

    def place(path, leaf):
        names = [p.key for p in path]
        spec = param_spec(names, leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def make_batched_edit_fn(engine, mesh: Mesh):
    """Build a jitted, mesh-sharded batched invert+edit step.

    Takes B images (sharded over "data") with per-image source/target context
    embeddings and runs inversion + [source, target] denoising + decode as a
    sequence of the engine's compiled programs (params stay mesh-placed
    arguments, never baked constants).  Hook-free editors (simple/invedit
    reconstruction) only — attention-intervention editors batch per-pair.
    """
    data = NamedSharding(mesh, P("data"))

    def fn(images, ctx_src, ctx_tgt, rng):
        # images: (B, H, W, 3); ctx_*: (B, 2, 77, D) [uncond, cond] per image
        images = jax.device_put(jnp.asarray(images), data)
        b = images.shape[0]
        latent = engine.encode(images)
        # inversion with source contexts, CFG=1 (cond rows only)
        ctx_full_inv = jnp.concatenate([ctx_src[:, 0], ctx_src[:, 1]], axis=0)
        fwd = engine.diffusion_forward(latent, ctx_full_inv, guidance_scale_fwd=1)
        zT = fwd["zT_inv"]
        # batched [src, tgt] denoise: rows [u_s(B), u_t(B), c_s(B), c_t(B)]
        ctx_bwd = jnp.concatenate(
            [ctx_src[:, 0], ctx_tgt[:, 0], ctx_src[:, 1], ctx_tgt[:, 1]], axis=0)
        lat2 = jnp.concatenate([zT, zT], axis=0)
        z0 = engine.diffusion_backward(lat2, ctx_bwd, fwd, rng=rng)
        img = engine.decode(z0)
        return {"image_inv": img[:b], "image": img[b:], "latent": z0[b:]}

    return fn


def embed_pair_contexts(engine, prompts_src, prompts_tgt):
    """Per-image [uncond, cond] contexts: (B, 2, 77, D) each."""
    out = []
    for prompts in (prompts_src, prompts_tgt):
        ctxs = [engine.create_context(p) for p in prompts]
        out.append(jnp.stack(ctxs, axis=0))
    return out[0], out[1]
