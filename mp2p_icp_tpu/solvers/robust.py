"""Robust kernel weight functions.

Reference parity: mp2p_icp/include/mp2p_icp/robust_kernels.h:33-103. The
functions return the *sqrt-weight* w(e²) applied multiplicatively to each
pairing's weight, exactly as the reference defines them:

- GemanMcClure: w = c² / (e² + c)²   (note: the reference adds the
  *unsquared* parameter c inside the square — we reproduce that formula
  verbatim for parity, quirk included).
- Cauchy:       w = c² / (e² + c²)

Implemented as pure jnp so they vectorise over the whole pairing set at once
(the reference evaluates a std::function per pair).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class RobustKernel(enum.Enum):
    NONE = "None"
    GEMAN_MCCLURE = "GemanMcClure"
    CAUCHY = "Cauchy"

    @staticmethod
    def from_string(s: str) -> "RobustKernel":
        """Parse YAML enum strings, accepting the reference's
        'RobustKernel::GemanMcClure' spelling as well as bare names."""
        s = s.split("::")[-1]
        for k in RobustKernel:
            if k.value.lower() == s.lower():
                return k
        raise ValueError(f"Unknown robust kernel: {s!r}")


def robust_sqrt_weight(
    kernel: RobustKernel, err_sqr: jnp.ndarray, param: float
) -> jnp.ndarray:
    """Vectorised sqrt-weight for an array of squared errors."""
    if kernel == RobustKernel.NONE:
        return jnp.ones_like(err_sqr)
    c = jnp.asarray(param, dtype=err_sqr.dtype)
    if kernel == RobustKernel.GEMAN_MCCLURE:
        return (c * c) / jnp.square(err_sqr + c)
    if kernel == RobustKernel.CAUCHY:
        return (c * c) / (err_sqr + c * c)
    raise ValueError(f"Unknown robust kernel: {kernel}")
