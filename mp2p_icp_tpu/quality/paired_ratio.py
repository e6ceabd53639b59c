"""Paired-ratio quality evaluator.

Reference parity: mp2p_icp/src/QualityEvaluator_PairedRatio.cpp:27-73 —
quality = found pairings / potential pairings. With ``reuse_icp_pairings``
it reads the ICP loop's final pairings; otherwise it re-runs its own
embedded distance-threshold matcher with
``allowMatchAlreadyMatchedGlobalPoints=true``.
``absolute_minimum_pairing_ratio`` triggers a hard discard (quality = 0).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mp2p_icp_tpu.core.pairings import Pairings
from mp2p_icp_tpu.matchers.distance_threshold import MatcherPointsDistanceThreshold


class QualityResult(NamedTuple):
    quality: jax.Array  # scalar in [0, 1]
    hard_discard: jax.Array  # scalar bool


@dataclasses.dataclass(frozen=True)
class QualityPairedRatio:
    """Params (reference: QualityEvaluator_PairedRatio.h)."""

    reuse_icp_pairings: bool = True
    absolute_minimum_pairing_ratio: float = 0.0
    weight: float = 1.0
    # used when reuse_icp_pairings is False:
    matcher: Optional[MatcherPointsDistanceThreshold] = None

    def evaluate(
        self,
        pairings: Pairings,
        grids=None,
        global_map=None,
        local_map=None,
        pose=None,
        ctx=None,
    ) -> QualityResult:
        if not self.reuse_icp_pairings and self.matcher is not None:
            from mp2p_icp_tpu.matchers.base import MatchState

            state = MatchState.create(local_map, global_map)
            blocks, _, potential = self.matcher.match(
                grids, global_map, local_map, pose, state, ctx
            )
            n = blocks["pt2pt"].count()
            pot = potential
        else:
            n = pairings.size()
            pot = pairings.potential_pairings
        q = n.astype(jnp.float32) / jnp.maximum(pot.astype(jnp.float32), 1.0)
        hard = q < self.absolute_minimum_pairing_ratio
        return QualityResult(quality=jnp.clip(q, 0.0, 1.0), hard_discard=hard)
