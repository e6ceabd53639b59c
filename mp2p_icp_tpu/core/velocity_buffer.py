"""Time-windowed velocity buffer for precise deskew.

Reference parity: mp2p_icp_map/include/mp2p_icp/LocalVelocityBuffer.h:33-97 —
a window of timestamped linear/angular velocities (IMU / odometry) and
``reconstruct_poses_around_reference_time``: forward/backward integration of
the twist samples into a short relative trajectory around a reference time.
"""

from __future__ import annotations

import bisect
import dataclasses
from typing import Dict, List, Tuple

import numpy as np


@dataclasses.dataclass
class LocalVelocityBuffer:
    max_time_window: float = 1.0  # seconds kept around the newest sample

    def __post_init__(self):
        self._lin: Dict[float, np.ndarray] = {}
        self._ang: Dict[float, np.ndarray] = {}

    def add_linear_velocity(self, t: float, v) -> None:
        self._lin[float(t)] = np.asarray(v, np.float64)
        self._trim()

    def add_angular_velocity(self, t: float, w) -> None:
        self._ang[float(t)] = np.asarray(w, np.float64)
        self._trim()

    def _trim(self):
        ts = list(self._lin) + list(self._ang)
        if not ts:
            return
        newest = max(ts)
        lo = newest - self.max_time_window
        self._lin = {t: v for t, v in self._lin.items() if t >= lo}
        self._ang = {t: v for t, v in self._ang.items() if t >= lo}

    def empty(self) -> bool:
        return not self._lin and not self._ang

    def clear(self) -> None:
        self._lin.clear()
        self._ang.clear()

    def _twist_at(self, t: float) -> np.ndarray:
        """Nearest-sample twist [vx vy vz wx wy wz] at time t."""
        out = np.zeros(6)
        for src, sl in ((self._lin, slice(0, 3)), (self._ang, slice(3, 6))):
            if src:
                ts = sorted(src)
                i = bisect.bisect_left(ts, t)
                if i >= len(ts):
                    i = len(ts) - 1
                elif i > 0 and abs(ts[i - 1] - t) < abs(ts[i] - t):
                    i -= 1
                out[sl] = src[ts[i]]
        return out

    def reconstruct_poses_around_reference_time(
        self, reference_time: float, half_window: float, dt: float = 5e-3
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Integrate the twist samples into a relative trajectory.

        Returns (times [T], tangents [T, 6]): pose(t) = exp(tangent[t]) is
        the motion from the reference time to t (identity at t_ref).
        Forward integration for t > t_ref, backward for t < t_ref
        (reference: LocalVelocityBuffer.h:89).
        """
        from mp2p_icp_tpu.core import se3
        import jax.numpy as jnp

        n_side = max(1, int(round(half_window / dt)))
        times = reference_time + dt * np.arange(-n_side, n_side + 1)
        T = len(times)
        ref_idx = n_side
        poses = [None] * T
        eye = se3.identity()
        poses[ref_idx] = eye
        # forward
        cur = eye
        for i in range(ref_idx + 1, T):
            tw = self._twist_at(times[i - 1])
            cur = se3.compose(cur, se3.exp(jnp.asarray(tw * dt, jnp.float32)))
            poses[i] = cur
        # backward
        cur = eye
        for i in range(ref_idx - 1, -1, -1):
            tw = self._twist_at(times[i])
            cur = se3.compose(
                cur, se3.inverse(se3.exp(jnp.asarray(tw * dt, jnp.float32)))
            )
            poses[i] = cur
        tangents = np.stack([np.asarray(se3.log(p)) for p in poses])
        return times, tangents

    def to_yaml_dict(self) -> dict:
        return {
            "max_time_window": self.max_time_window,
            "linear": {str(t): v.tolist() for t, v in self._lin.items()},
            "angular": {str(t): v.tolist() for t, v in self._ang.items()},
        }

    @staticmethod
    def from_yaml_dict(d: dict) -> "LocalVelocityBuffer":
        buf = LocalVelocityBuffer(
            max_time_window=float(d.get("max_time_window", 1.0))
        )
        for t, v in (d.get("linear") or {}).items():
            buf.add_linear_velocity(float(t), v)
        for t, v in (d.get("angular") or {}).items():
            buf.add_angular_velocity(float(t), v)
        return buf
