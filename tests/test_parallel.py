"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eta_inversion_tpu.inversion.base import DiffusionInversion
from eta_inversion_tpu.models import DiffusionModel, load_diffusion_model
from eta_inversion_tpu.parallel.mesh import make_mesh
from eta_inversion_tpu.parallel.sharding import (
    embed_pair_contexts,
    make_batched_edit_fn,
    param_spec,
    shard_params,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_partition_grid_and_device_pool():
    from eta_inversion_tpu.parallel.eval_pool import DevicePool, partition_grid

    cfgs = [{"i": i} for i in range(7)]
    parts = [partition_grid(cfgs, h, 3) for h in range(3)]
    assert sorted(c["i"] for p in parts for c in p) == list(range(7))
    assert all(len(p) in (2, 3) for p in parts)

    # inline (no-device) execution path (reference device_pool.py:42-46)
    out = []
    DevicePool([]).run([{"target": out.append, "args": (i,)} for i in range(4)])
    assert out == [0, 1, 2, 3]


def test_mesh_shapes():
    m = make_mesh(8)
    assert dict(m.shape) == {"data": 8, "model": 1}
    m2 = make_mesh(8, model_parallel=2)
    assert dict(m2.shape) == {"data": 4, "model": 2}


def test_param_spec_rules():
    from jax.sharding import PartitionSpec as P

    k = np.zeros((32, 64))
    assert param_spec(["attn1", "to_q", "kernel"], k) == P(None, "model")
    assert param_spec(["attn1", "to_out", "kernel"], k) == P("model", None)
    assert param_spec(["ff", "geglu_proj", "kernel"], k) == P(None, "model")
    assert param_spec(["conv1", "kernel"], np.zeros((3, 3, 4, 8))) == P()
    assert param_spec(["norm1", "scale"], np.zeros((32,))) == P()


def test_tensor_parallel_matches_single_device(tiny_model, test_image):
    """The 2-way tensor-parallel model must produce the same numbers as the
    unsharded one (collectives are exact)."""
    mesh = make_mesh(8, model_parallel=2)
    params = shard_params(tiny_model.params, mesh)
    sharded = DiffusionModel(tiny_model.preset, params, tiny_model.tokenizer,
                             dtype=tiny_model.dtype,
                             schedule=tiny_model.schedule_config)
    z = jnp.zeros((2, 8, 8, 4))
    ctx = jnp.zeros((2, 77, 32))
    with mesh:
        eps_sharded = np.asarray(sharded.apply_unet(z, 10, ctx))
    eps_single = np.asarray(tiny_model.apply_unet(z, 10, ctx))
    np.testing.assert_allclose(eps_sharded, eps_single, rtol=2e-5, atol=2e-6)


def test_batched_sharded_edit(tiny_model):
    """8-way data-parallel batched invert+edit: per-sample results must match
    running each sample alone (batching is semantically transparent)."""
    mesh = make_mesh(8)
    params = shard_params(tiny_model.params, mesh)
    model = DiffusionModel(tiny_model.preset, params, tiny_model.tokenizer,
                           dtype=tiny_model.dtype,
                           schedule=tiny_model.schedule_config)
    with mesh:
        engine = DiffusionInversion(model, num_inference_steps=3)
        step = make_batched_edit_fn(engine, mesh)
        rs = np.random.RandomState(0)
        images = jnp.asarray(rs.rand(8, 16, 16, 3).astype("float32") * 2 - 1)
        srcs = [f"a cat number {i}" for i in range(8)]
        tgts = [f"a dog number {i}" for i in range(8)]
        ctx_s, ctx_t = embed_pair_contexts(engine, srcs, tgts)
        out = step(images, ctx_s, ctx_t, jax.random.PRNGKey(0))
        batched = np.asarray(out["image"])
    assert batched.shape == (8, 16, 16, 3)
    assert np.isfinite(batched).all()

    # single-sample run of element 3 (unsharded model, same math)
    from eta_inversion_tpu.editing.simple import SimpleEditor

    engine1 = DiffusionInversion(tiny_model, num_inference_steps=3)
    res = SimpleEditor(engine1).edit(images[3:4], srcs[3], tgts[3])
    np.testing.assert_allclose(batched[3], np.asarray(res["image"][0]),
                               rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_batched_hook_editor_sharded(tiny_model, model_parallel):
    """Pair-batched ptp (a hook-carrying editor) under the device mesh: the
    conditional-half pair layout shards over the data axis and must match an
    unsharded single-sample run."""
    from eta_inversion_tpu import load_editor, load_inverter
    from eta_inversion_tpu.editing.batched import edit_batch

    mesh = make_mesh(8, model_parallel=model_parallel)
    params = shard_params(tiny_model.params, mesh)
    model = DiffusionModel(tiny_model.preset, params, tiny_model.tokenizer,
                           dtype=tiny_model.dtype,
                           schedule=tiny_model.schedule_config)
    rs = np.random.RandomState(7)
    images = jnp.asarray(rs.rand(8, 16, 16, 3).astype("float32") * 2 - 1)
    srcs = [f"a cat number {i}" for i in range(8)]
    tgts = [f"a tiger number {i}" for i in range(8)]
    cfg = {"is_replace_controller": True, "cross_replace_steps": 0.8,
           "self_replace_steps": 0.5}
    with mesh:
        inv = load_inverter(model, "diffinv", num_inference_steps=3)
        editor = load_editor(inv, "ptp")
        res = edit_batch(editor, images, srcs, tgts, cfgs=[cfg] * 8)
        out = np.asarray(res["image"])
    assert out.shape == (8, 16, 16, 3) and np.isfinite(out).all()

    inv1 = load_inverter(tiny_model, "diffinv", num_inference_steps=3)
    single = load_editor(inv1, "ptp").edit(images[3:4], srcs[3], tgts[3],
                                           cfg=cfg)
    np.testing.assert_allclose(out[3], np.asarray(single["image"][0]),
                               rtol=5e-4, atol=5e-5)


def _spec_names(arr):
    spec = getattr(arr.sharding, "spec", None) or ()
    return {n for part in spec
            for n in (part if isinstance(part, tuple) else (part,))
            if n is not None}


def test_active_data_mesh_and_shard_batch(tiny_model):
    from eta_inversion_tpu.parallel.sharding import active_data_mesh, shard_batch

    assert active_data_mesh() is None  # no mesh context
    x = jnp.zeros((8, 4))
    assert shard_batch(x) is x  # no-op outside a mesh
    mesh = make_mesh(8, model_parallel=2)
    with mesh:
        m = active_data_mesh()
        assert m is not None and m.shape["data"] == 4
        y = shard_batch(x)
        assert "data" in _spec_names(y)
        # indivisible leading dim: left alone (trailing partial batch)
        z = shard_batch(jnp.zeros((3, 4)))
        assert "data" not in _spec_names(z)


def test_eval_mesh_path_actually_partitions(tiny_model):
    """The PRODUCTION batched-edit path (edit_batch under `with mesh:`, the
    exact eval.py --mesh flow) must genuinely split the batch over the "data"
    axis: outputs carry a "data" sharding spec and each device holds only
    B/data_parallel rows — not a replicated copy (redundant compute would
    still be value-correct, which is why value tests can't catch this)."""
    from eta_inversion_tpu import load_editor, load_inverter
    from eta_inversion_tpu.editing.batched import edit_batch

    mesh = make_mesh(8, model_parallel=2)
    dp = mesh.shape["data"]
    params = shard_params(tiny_model.params, mesh)
    model = DiffusionModel(tiny_model.preset, params, tiny_model.tokenizer,
                           dtype=tiny_model.dtype,
                           schedule=tiny_model.schedule_config)
    rs = np.random.RandomState(3)
    B = 4
    images = jnp.asarray(rs.rand(B, 16, 16, 3).astype("float32") * 2 - 1)
    cfg = {"is_replace_controller": True, "cross_replace_steps": 0.8,
           "self_replace_steps": 0.5}
    with mesh:
        inv = load_inverter(model, "etainv", num_inference_steps=2,
                            eta=((0.6, 0.0), (1.0, 0.7)), noise_sample_count=2)
        editor = load_editor(inv, "ptp")
        # engine-level entry points place their batch inputs explicitly
        lat = inv.encode(images)
        assert "data" in _spec_names(lat)
        res = edit_batch(editor, images, [f"a cat {i}" for i in range(B)],
                         [f"a dog {i}" for i in range(B)], cfgs=[cfg] * B,
                         inv_cfgs=[{"edit_word_idx": (1, 1)}] * B)
        for key in ("image", "image_inv", "latent", "latent_inv"):
            arr = res[key]
            assert "data" in _spec_names(arr), (key, arr.sharding)
            shard_rows = {s.data.shape[0] for s in arr.addressable_shards}
            assert shard_rows == {B // dp}, (key, shard_rows)
        assert np.isfinite(np.asarray(res["image"])).all()


def test_dryrun_multichip_driver_invocation():
    """Run dryrun_multichip exactly the way the driver does: a clean shell
    with no XLA_FLAGS pre-set and the ambient (possibly single-device)
    platform — the entry point must self-provision the virtual CPU mesh.
    Regression for the round-1 MULTICHIP rc=1."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=580)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout, proc.stdout


def test_ring_attention_matches_full():
    """Sequence-parallel ring attention over the 8-device mesh must equal
    single-device attention, and its output must actually be sequence-sharded
    (one S/8 block per device)."""
    from eta_inversion_tpu.ops.flash_attention import xla_attention
    from eta_inversion_tpu.parallel.ring_attention import ring_attention

    mesh = make_mesh(8, model_parallel=8)  # 8-way "model" axis
    rs = np.random.RandomState(3)
    b, h, s, d = 2, 4, 256, 16
    q = jnp.asarray(rs.randn(b, h, s, d), jnp.float32)
    k = jnp.asarray(rs.randn(b, h, s, d), jnp.float32)
    v = jnp.asarray(rs.randn(b, h, s, d), jnp.float32)

    out = ring_attention(q, k, v, mesh, axis="model")
    want = xla_attention(q, k, v, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # the sequence dim is genuinely split: 8 shards of 32 rows each
    names = {n for ax in out.sharding.spec if ax for n in
             ((ax,) if isinstance(ax, str) else ax)}
    assert "model" in names, out.sharding
    assert {sh.data.shape[2] for sh in out.addressable_shards} == {s // 8}

    # indivisible S is a loud error, not silent wrong math
    with pytest.raises(ValueError):
        ring_attention(q[:, :, :100], k[:, :, :100], v[:, :, :100], mesh)


def test_ring_attention_bf16_and_odd_axis():
    """bf16 inputs accumulate in fp32; a 4-way axis on the (4, 2) mesh works
    with the other axis left for data."""
    from eta_inversion_tpu.ops.flash_attention import xla_attention
    from eta_inversion_tpu.parallel.ring_attention import ring_attention

    mesh = make_mesh(8, model_parallel=2)  # data=4, model=2
    rs = np.random.RandomState(4)
    b, h, s, d = 1, 2, 128, 8
    q = jnp.asarray(rs.randn(b, h, s, d), jnp.bfloat16)
    k = jnp.asarray(rs.randn(b, h, s, d), jnp.bfloat16)
    v = jnp.asarray(rs.randn(b, h, s, d), jnp.bfloat16)
    out = ring_attention(q, k, v, mesh, axis="model")
    want = xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32), d ** -0.5)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("preset", ["tiny21", "tinyxl"])
def test_new_family_flagship_partitions_on_mesh(preset):
    """The second/third model families (SD2.x per-stage heads; SDXL depth>1
    transformers + dual towers + packed added-cond context row) run the
    flagship etainv+ptp batched edit under the (4,2) mesh with the batch
    genuinely split over the data axis — incl. the packed (B, 78, D) SDXL
    context surviving data sharding."""
    from eta_inversion_tpu import load_editor, load_inverter
    from eta_inversion_tpu.editing.batched import edit_batch

    base, _ = load_diffusion_model(preset)
    mesh = make_mesh(8, model_parallel=2)
    dp = mesh.shape["data"]
    params = shard_params(base.params, mesh)
    model = DiffusionModel(base.preset, params, base.tokenizer,
                           dtype=base.dtype, schedule=base.schedule_config)
    rs = np.random.RandomState(5)
    B = 4
    images = jnp.asarray(rs.rand(B, 16, 16, 3).astype("float32") * 2 - 1)
    cfg = {"is_replace_controller": True, "cross_replace_steps": 0.8,
           "self_replace_steps": 0.5}
    with mesh:
        inv = load_inverter(model, "etainv", num_inference_steps=2,
                            eta=((0.6, 0.0), (1.0, 0.7)), noise_sample_count=2)
        editor = load_editor(inv, "ptp")
        res = edit_batch(editor, images, [f"a cat {i}" for i in range(B)],
                         [f"a dog {i}" for i in range(B)], cfgs=[cfg] * B,
                         inv_cfgs=[{"edit_word_idx": (1, 1)}] * B)
        arr = res["image"]
        assert "data" in _spec_names(arr), arr.sharding
        assert {s.data.shape[0] for s in arr.addressable_shards} == {B // dp}
        assert np.isfinite(np.asarray(arr)).all()


def test_ring_attention_wired_into_unet_at_sdxl_top_stage():
    """The MODEL PATH reaches the ring: a UNet forward at the SDXL top-stage
    sequence length (64x64 tokens after one downsample of the 128x128 latent,
    S=4096 — narrow channels so CPU stays cheap) traced under
    `sequence_parallel` must (a) actually route its long self-attention
    through parallel/ring_attention, (b) produce the same numbers as the
    un-meshed forward, (c) work inside jit.  This is the wiring the standalone
    ring tests above cannot see."""
    from eta_inversion_tpu.models.unet import UNet2DCondition, UNetConfig
    from eta_inversion_tpu.parallel import ring_attention as ra

    cfg = UNetConfig(sample_size=128, block_out_channels=(16, 32, 32),
                     layers_per_block=1, cross_attention_dim=32, head_dim=16,
                     use_linear_projection=True, norm_num_groups=8,
                     attn_down=(False, True, True))
    unet = UNet2DCondition(cfg, dtype=jnp.float32)
    rs = np.random.RandomState(7)
    B = 2
    x = jnp.asarray(rs.randn(B, 128, 128, 4), jnp.float32)
    ctx = jnp.asarray(rs.randn(B, 77, 32), jnp.float32)
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), x, 10, ctx)

    want = jax.jit(unet.apply)(params, x, 10, ctx)

    calls = []
    real = ra.ring_attention_bhsd

    def spy(q, k, v, sp, scale):
        calls.append(q.shape)
        return real(q, k, v, sp, scale)

    mesh = make_mesh(8, model_parallel=4)  # data=2, model=4
    ra.ring_attention_bhsd, orig = spy, ra.ring_attention_bhsd
    try:
        with mesh, ra.sequence_parallel(mesh, axis="model", min_seq=4096):
            got = jax.jit(unet.apply)(params, x, 10, ctx)
    finally:
        ra.ring_attention_bhsd = orig

    # only the S=4096 self-attention layers are admitted (down_1, up_1 x2 at
    # 64x64); the S=1024 stage-2/mid layers and all cross-attention stay on
    # the single-chip path
    assert calls and all(s[2] == 4096 for s in calls), calls
    assert len(calls) == 3, calls
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_engine_compile_cache_keys_on_parallel_contexts(tiny_model):
    """ADVICE r4 (medium): DiffusionInversion._cached keyed only on
    config/shapes, so a program traced OUTSIDE `sequence_parallel` (or a data
    mesh) was silently reused INSIDE it — the ring never ran.  The cache key
    must now fold a static fingerprint of the active trace-time contexts."""
    from eta_inversion_tpu.parallel import ring_attention as ra

    inv = DiffusionInversion(tiny_model, num_inference_steps=2)

    def fn(x):
        return x + 1.0

    plain = inv._cached("ctx_key_probe", (), fn)
    mesh = make_mesh(8, model_parallel=4)
    with mesh, ra.sequence_parallel(mesh, axis="model", min_seq=4096):
        inside = inv._cached("ctx_key_probe", (), fn)
        # different min_seq -> different static program
        with ra.sequence_parallel(mesh, axis="model", min_seq=1024):
            inside2 = inv._cached("ctx_key_probe", (), fn)
    with mesh:  # data mesh only, no ring
        meshed = inv._cached("ctx_key_probe", (), fn)
    again = inv._cached("ctx_key_probe", (), fn)

    assert plain is again  # same context -> cache hit
    assert inside is not plain
    assert inside2 is not inside
    assert meshed is not plain and meshed is not inside
