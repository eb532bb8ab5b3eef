"""Shared CLI argument registry (counterpart of /root/reference/utils/utils.py:19-57)."""

from __future__ import annotations

import argparse

_ARGS = {
    "inv_method": dict(
        flags=["--inv_method"],
        type=str,
        default="diffinv",
        choices=["diffinv", "nti", "npi", "proxnpi", "edict", "ddpminv",
                 "cyclediff", "dirinv", "etainv", "regdiffinv"],
        help=("Inversion method: diffinv (naive DDIM), nti (null-text), npi "
              "(negative-prompt), proxnpi (proximal NPI), edict, ddpminv "
              "(edit-friendly DDPM), cyclediff (markovian ddpminv), dirinv "
              "(direct), etainv (eta inversion), regdiffinv (pix2pix-zero "
              "regularized)"),
    ),
    "edit_method": dict(
        flags=["--edit_method"],
        type=str,
        default="simple",
        choices=["simple", "ptp", "masactrl", "pnp", "pix2pix_zero", "invedit"],
        help=("Editing method: simple (target-prompt denoise), ptp "
              "(prompt-to-prompt), masactrl, pnp (plug-and-play), pix2pix_zero, "
              "invedit (reconstruction only)"),
    ),
    "model": dict(
        flags=["--model"],
        type=str,
        default="sd15",
        help="Model preset (sd15, sd21, sd21v, sdxl, tiny, tiny21, tinyxl, tinyv) or weights directory",
    ),
    "steps": dict(flags=["--steps"], type=int, default=50,
                  help="Number of diffusion steps"),
    "dtype": dict(flags=["--dtype"], type=str, default="float32",
                  choices=["float32", "bfloat16"], help="Compute dtype"),
    "seed": dict(flags=["--seed"], type=int, default=0, help="PRNG seed"),
}


def add_argparse_arg(parser: argparse.ArgumentParser, name: str, **overrides) -> None:
    spec = dict(_ARGS[name.lstrip("-")])
    flags = spec.pop("flags")
    spec.update(overrides)
    parser.add_argument(*flags, **spec)
