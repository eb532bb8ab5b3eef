"""Regenerate golden regression values (reference pattern: invoking test files
with `gen`, /root/reference/test/test_inv.py:180-188).

Usage: python tests/gen_goldens.py
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402


def family_goldens():
    """Flagship + baseline goldens for the non-SD1.x model families
    (tiny21 = SD2.x geometry, tinyxl = SDXL geometry, tinyv = v-prediction)."""
    from tests import test_editing as te
    from eta_inversion_tpu.models import load_diffusion_model

    rs = np.random.RandomState(0)
    image = rs.rand(1, 16, 16, 3).astype("float32") * 2 - 1
    goldens = {}
    for preset in ("tiny21", "tinyxl", "tinyv"):
        model, _ = load_diffusion_model(preset)
        for inverter, editor in (("etainv", "ptp"), ("diffinv", "simple")):
            val = te.run_edit(editor, model, image, inverter)
            goldens[f"fam_{preset}_{inverter}_{editor}"] = val
            print(f"fam_{preset}_{inverter}_{editor}: {val}", flush=True)
    return goldens


def main():
    from tests import test_inversion as ti
    from eta_inversion_tpu.models import load_diffusion_model

    if "--families-only" in sys.argv:
        goldens = family_goldens()
        path = pathlib.Path(__file__).parent / "goldens.json"
        existing = json.loads(path.read_text()) if path.exists() else {}
        existing.update(goldens)
        path.write_text(json.dumps(existing, indent=2, sort_keys=True) + "\n")
        print(f"wrote {path}")
        return

    model, _ = load_diffusion_model("tiny")
    rs = np.random.RandomState(0)
    image = rs.rand(1, 16, 16, 3).astype("float32") * 2 - 1

    goldens = {}
    for name in sorted(ti.INVERTERS):
        goldens[f"inv_{name}"] = ti.run_invert(name, model, image)
        print(f"inv_{name}: {goldens[f'inv_{name}']}")

    try:
        from tests import test_editing as te

        for name in sorted(te.EDITORS):
            val = te.run_edit(name, model, image)
            if val is not None:
                goldens[f"edit_{name}"] = val
                print(f"edit_{name}: {val}", flush=True)
        for inverter, editor in te.GRID:
            val = te.run_edit(editor, model, image, inverter)
            if val is not None:
                goldens[f"grid_{inverter}_{editor}"] = val
                print(f"grid_{inverter}_{editor}: {val}", flush=True)
    except ImportError:
        pass

    goldens.update(family_goldens())

    path = pathlib.Path(__file__).parent / "goldens.json"
    existing = json.loads(path.read_text()) if path.exists() else {}
    existing.update(goldens)
    path.write_text(json.dumps(existing, indent=2, sort_keys=True) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
