"""eta_inversion_tpu: TPU-native real-image editing with latent diffusion.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
furiosa-ai/eta-inversion (ECCV 2024): diffusion inversion methods, attention-
level editing, metrics, datasets and an evaluation harness — architected for
TPU (NHWC, lax.scan diffusion loops, Pallas flash attention, pjit sharding).

Registry counterpart of /root/reference/modules/__init__.py:31-111.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional

__version__ = "0.1.0"


def _inverter_registry() -> Dict[str, Callable]:
    from .inversion.base import DiffusionInversion
    from .inversion.ddpm import DDPMInversion
    from .inversion.direct import DirectInversion
    from .inversion.edict import EdictInversion
    from .inversion.eta import EtaInversion
    from .inversion.npi import NegativePromptInversion
    from .inversion.nti import NullTextInversion
    from .inversion.proxnpi import ProximalNegativePromptInversion
    from .inversion.regularized import RegularizedDiffusionInversion

    return {
        "diffinv": DiffusionInversion,
        "nti": NullTextInversion,
        "npi": NegativePromptInversion,
        "proxnpi": ProximalNegativePromptInversion,
        "edict": EdictInversion,
        "ddpminv": DDPMInversion,
        "cyclediff": functools.partial(DDPMInversion, markovian_forward=True),
        "dirinv": DirectInversion,
        "etainv": EtaInversion,
        "regdiffinv": RegularizedDiffusionInversion,
    }


def _editor_registry() -> Dict[str, Callable]:
    from .editing.inv_editor import InversionEditor
    from .editing.masactrl import MasactrlEditor
    from .editing.pnp import PlugAndPlayEditor
    from .editing.pix2pix_zero import Pix2PixZeroEditor
    from .editing.ptp import PromptToPromptEditor
    from .editing.simple import SimpleEditor

    return {
        "simple": SimpleEditor,
        "ptp": PromptToPromptEditor,
        "masactrl": MasactrlEditor,
        "pnp": PlugAndPlayEditor,
        "pix2pix_zero": Pix2PixZeroEditor,
        "invedit": InversionEditor,
    }


_extra_editors: Dict[str, Callable] = {}


def register_editor(name: str, editor_cls: Callable) -> None:
    """Register an additional editor (reference modules/__init__.py:57-66)."""
    _extra_editors[name] = editor_cls


def get_inversion_methods() -> List[str]:
    return list(_inverter_registry().keys())


def get_edit_methods() -> List[str]:
    return list(_editor_registry().keys()) + list(_extra_editors.keys())


def load_inverter(model, type: str = "diffinv", **kwargs):
    """Create an inverter by registry key (reference modules/__init__.py:88-99)."""
    registry = _inverter_registry()
    if type not in registry:
        raise ValueError(f"unknown inverter {type!r}; available: {sorted(registry)}")
    return registry[type](model=model, **kwargs)


def load_editor(inverter, type: str = "simple", **kwargs):
    """Create an editor by registry key (reference modules/__init__.py:101-111)."""
    registry = {**_editor_registry(), **_extra_editors}
    if type not in registry:
        raise ValueError(f"unknown editor {type!r}; available: {sorted(registry)}")
    return registry[type](inverter=inverter, **kwargs)
