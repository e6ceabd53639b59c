"""Solver wrapper modules with gating, for the ICP loop.

Reference parity: mp2p_icp/include/mp2p_icp/Solver.h:43-102 — gating by
``enabled``, iteration window, and ``runUntilTranslationCorrectionSmallerThan``
(skip once the translation correction from the guess falls below a bound);
Solver_Horn converts pt2ln/pt2pl to virtual pt2pt first (Solver_Horn.cpp:41-61).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from mp2p_icp_tpu.core.pairings import Pairings
from mp2p_icp_tpu.core.se3 import Pose
from mp2p_icp_tpu.solvers.common import WeightParameters
from mp2p_icp_tpu.solvers.gauss_newton import (
    GNParams,
    SE3Prior,
    optimal_tf_gauss_newton,
)
from mp2p_icp_tpu.solvers.horn import optimal_tf_horn
from mp2p_icp_tpu.solvers.olae import optimal_tf_olae
from mp2p_icp_tpu.solvers.pt2_conversions import pt2ln_pl_to_pt2pt


@dataclasses.dataclass(frozen=True)
class Solver:
    enabled: bool = True
    run_from_iteration: int = 0
    run_up_to_iteration: int = 0  # 0 = unbounded
    run_until_translation_correction_smaller_than: float = 0.0

    def gate(self, iteration):
        """Static iteration-window gate (Solver.cpp:40-42). The dynamic
        runUntilTranslationCorrectionSmallerThan latch lives in
        ICP._run_solvers — it needs the last step increment and the
        persistent per-solver 'finished' state from the align loop carry
        (Solver.cpp:44-60)."""
        on = jnp.asarray(self.enabled)
        on = on & (iteration >= self.run_from_iteration)
        if self.run_up_to_iteration > 0:
            on = on & (iteration <= self.run_up_to_iteration)
        return on


@dataclasses.dataclass(frozen=True)
class SolverHorn(Solver):
    """Reference: Solver_Horn.cpp:41-61."""

    weight_params: WeightParameters = dataclasses.field(
        default_factory=WeightParameters
    )
    # fill ICPResults.optimal_scale from the final pairings (reference:
    # Results.h:35-36 optimalScale / optimal_tf_horn.cpp:177-195 scale
    # expression). Reporting-only — the solved pose stays rigid, exactly
    # like the reference's forceScaleToUnity default.
    estimate_scale: bool = False

    def solve(
        self, pairings: Pairings, guess: Pose,
        prior: Optional[SE3Prior] = None, iteration=None,
    ) -> Pose:
        p = pt2ln_pl_to_pt2pt(pairings, guess)
        return optimal_tf_horn(p, self.weight_params, current_estimate=guess)


@dataclasses.dataclass(frozen=True)
class SolverOLAE(Solver):
    """Reference: Solver_OLAE (same conversion need as Horn)."""

    weight_params: WeightParameters = dataclasses.field(
        default_factory=WeightParameters
    )

    def solve(
        self, pairings: Pairings, guess: Pose,
        prior: Optional[SE3Prior] = None, iteration=None,
    ) -> Pose:
        p = pt2ln_pl_to_pt2pt(pairings, guess)
        return optimal_tf_olae(p, self.weight_params, current_estimate=guess)


@dataclasses.dataclass(frozen=True)
class SolverGaussNewton(Solver):
    """Reference: Solver_GaussNewton.cpp:29-67."""

    gn_params: GNParams = dataclasses.field(default_factory=GNParams)

    def solve(
        self, pairings: Pairings, guess: Pose,
        prior: Optional[SE3Prior] = None, iteration=None,
    ) -> Pose:
        gp = self.gn_params
        # Parameterizable solver field (reference: DECLARE_PARAMETER in
        # Solver_GaussNewton — any numeric field may be an ICP_ITERATION
        # expression, Parameterizable.h:51-186): evaluate in-trace
        from mp2p_icp_tpu.core.params import Expression

        if isinstance(gp.kernel_param, Expression):
            env = {
                "ICP_ITERATION": (
                    iteration.astype(jnp.float32)
                    if iteration is not None else 0.0
                )
            }
            gp = dataclasses.replace(gp, kernel_param=gp.kernel_param(env))
        return optimal_tf_gauss_newton(pairings, guess, gp, prior)
