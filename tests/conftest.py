"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh; numerics tests
use highest matmul precision for determinism.  Must run before any JAX backend
initialization (the axon sitecustomize registers a TPU backend otherwise).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import json  # noqa: E402
import pathlib  # noqa: E402

import pytest  # noqa: E402

GOLDENS_PATH = pathlib.Path(__file__).parent / "goldens.json"


@pytest.fixture(scope="session")
def goldens():
    if GOLDENS_PATH.exists():
        return json.loads(GOLDENS_PATH.read_text())
    return {}


@pytest.fixture(scope="session")
def tiny_model():
    from eta_inversion_tpu.models import load_diffusion_model

    model, (pre, post) = load_diffusion_model("tiny")
    return model


@pytest.fixture(scope="session")
def tiny21_model():
    """SD2.x-geometry homologue: per-stage head counts (fixed head_dim) and
    linear transformer projections."""
    from eta_inversion_tpu.models import load_diffusion_model

    model, (pre, post) = load_diffusion_model("tiny21")
    return model


@pytest.fixture(scope="session")
def tinyxl_model():
    """SDXL-geometry homologue: per-stage transformer depth, dual text towers
    with a packed added-cond context row, text_time added embedding."""
    from eta_inversion_tpu.models import load_diffusion_model

    model, (pre, post) = load_diffusion_model("tinyxl")
    return model


@pytest.fixture(scope="session")
def test_image():
    """Deterministic 16x16 synthetic test image in [-1, 1] NHWC."""
    import numpy as np

    rs = np.random.RandomState(0)
    return (rs.rand(1, 16, 16, 3).astype("float32") * 2 - 1)
