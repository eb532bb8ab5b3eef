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

# ---------------------------------------------------------------------------
# Full-suite runs are sharded into one pytest subprocess per test module.
#
# A single long-lived pytest process accumulates hundreds of XLA-CPU-compiled
# executables and the compiler can segfault late in the run (reproduced twice
# around test ~90, in backend_compile_and_load).  tests/test_all.sh always ran
# per-module processes; this hook makes the *naive* `pytest tests/` invocation
# do the same automatically, so a newcomer's first run exits cleanly.
# Single-module invocations (`pytest tests/test_models.py`) run in-process as
# usual.
# ---------------------------------------------------------------------------

_SHARD_ENV = "ETA_TPU_TEST_SHARD_CHILD"


# pytest options that consume the NEXT argv entry as their value when given
# space-separated (`-k expr`).  Their value must stay paired with the flag and
# must not be mistaken for a positional test path.
_VALUE_OPTS = {
    "-k", "-m", "-p", "-o", "-W", "-c", "-n", "-r",
    "--deselect", "--ignore", "--rootdir", "--confcutdir", "--basetemp",
    "--junitxml", "--maxfail", "--tb", "--durations", "--timeout",
    "--import-mode", "--log-level", "--log-cli-level", "--cache-dir",
}


def _split_args(args):
    """Split pytest argv into (flags, positional test paths).

    Value-taking options keep their space-separated argument attached to the
    flags list (ADVICE r4: `pytest tests/ -k expr` used to strip `expr`,
    making every shard child die with 'expected one argument').
    """
    import os as _os

    flags, paths = [], []
    it = iter(args)
    for a in it:
        if a.startswith("-"):
            flags.append(a)
            if "=" not in a and a in _VALUE_OPTS:
                try:
                    flags.append(next(it))
                except StopIteration:
                    pass
            continue
        if _os.path.exists(a.split("::", 1)[0]):
            paths.append(a)
        else:
            # unknown non-path positional (could be a value of an option we
            # don't know): pass it through to every child rather than drop it
            flags.append(a)
    return flags, paths


def _collect_module_paths(paths):
    """Positional test paths -> the list of test modules they cover (or None
    if the invocation is already narrow enough to run in one process)."""
    here = pathlib.Path(__file__).parent
    files = []
    for a in paths:
        p = pathlib.Path(a.split("::", 1)[0])
        if p.is_dir():
            files.extend(sorted(p.glob("test_*.py")))
        else:
            files.append(p)
    if not paths:  # bare `pytest` -> whole tests/ dir
        files = sorted(here.glob("test_*.py"))
    uniq = sorted({str(f) for f in files})
    return uniq if len(uniq) > 3 else None


def pytest_cmdline_main(config):
    import os as _os

    if _os.environ.get(_SHARD_ENV):
        return None  # already inside a shard subprocess
    raw = list(config.invocation_params.args)
    flags, paths = _split_args(raw)
    modules = _collect_module_paths(paths)
    if modules is None:
        return None  # narrow run: normal in-process pytest

    import subprocess
    import sys

    stop_on_fail = "-x" in flags or "--exitfirst" in flags
    env = dict(_os.environ, **{_SHARD_ENV: "1"})
    print(f"[conftest] sharding {len(modules)} test modules into one pytest "
          "subprocess each (XLA-CPU executable accumulation segfaults very "
          "long single-process runs; see tests/test_all.sh)")
    worst = 0
    for m in modules:
        rc = subprocess.call([sys.executable, "-m", "pytest", m, *flags],
                             env=env)
        # exit code 5 = "no tests collected" (e.g. everything deselected by
        # -k) — not a failure of the sharded run
        if rc not in (0, 5):
            worst = max(worst, rc if rc < 128 else 1)
            if stop_on_fail:
                break
    return worst


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
