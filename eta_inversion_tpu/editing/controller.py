"""Engine-level diffusion controllers (functional).

Counterpart of /root/reference/modules/editing/controller.py (ControllerBase /
ControllerEmpty) and of the mutable per-step hooks the reference threads through
`predict_step_*` (diffusion_inversion.py:330-339,359-368).  Here a controller
is a *static-structure* object whose per-step behavior is expressed with array
ops over a traced step index, so the whole diffusion loop stays inside one
`lax.scan`:

  * `init_state(...)`     -> pytree carried through the scan
  * `hooks(i, state, layout)` -> AttnHooks | None  (static structure; any
    step-dependence must be via arrays indexed with traced `i`)
  * `begin_step(i, t, latent, state)` -> latent
  * `end_step(i, t, latent, eps, store, state)` -> (latent, state)
  * `static_key()`        -> hashable id used by the engine's jit cache
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

from ..ops.attn_ctrl import AttnHooks


@dataclasses.dataclass(frozen=True)
class BatchLayout:
    """Static description of the UNet batch the hooks see.

    With classifier-free guidance the batch is [u_1..u_n, c_1..c_n]; editing
    interventions apply to the conditional half only (the reference edits
    `attn[h//2:]`, /root/reference/modules/utils/ptp.py:107-119).  Without CFG
    duplication the whole batch is conditional.

    Pair-batched editing (a TPU-native capability the reference lacks): the
    conditional half holds B (source, target) pairs laid out
    [s_1..s_B, t_1..t_B]; `n_pairs` = B.  The reference's single edit is the
    B=1 special case ([source, target]).
    """

    n_prompts: int
    cfg_dup: bool

    @property
    def cond_start(self) -> int:
        return self.n_prompts if self.cfg_dup else 0

    @property
    def batch(self) -> int:
        return self.n_prompts * (2 if self.cfg_dup else 1)

    @property
    def n_pairs(self) -> int:
        return max(self.n_prompts // 2, 1)


class Controller:
    """Base controller: no-op at every site."""

    def init_state(self, engine, latent, contexts) -> Any:
        return ()

    def hooks(self, i, state, layout: BatchLayout) -> Optional[AttnHooks]:
        return None

    def collect_store(self) -> bool:
        """Static: does end_step consume sown attention maps?"""
        return False

    def begin_step(self, i, t, latent, state):
        return latent

    def end_step(self, i, t, latent, eps, store: Dict[str, Any], state) -> Tuple[Any, Any]:
        return latent, state

    def static_key(self):
        return type(self).__name__


class ControllerEmpty(Controller):
    pass
