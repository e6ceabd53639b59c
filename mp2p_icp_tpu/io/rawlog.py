"""Rawlog: a flat, ordered stream of sensor observations.

Reference parity: mrpt::obs::CRawlog as consumed/produced by
apps/rawlog-filter (reference: apps/rawlog-filter/main.cpp:92-245) and by
icp-run's ``.rawlog:N`` input syntax (apps/icp-run/main.cpp:117-178).

TPU-native container: instead of MRPT's gz binary archive of CSerializable
observations, a ``.rawlog.npz`` holds the observation stream as numpy
arrays + one JSON metadata blob — the same storage pattern as
``SimpleMap`` (`filters/sm2mm.py`), but flat (no keyframe grouping): a
rawlog is a *time-ordered sensor log*, a simplemap is a *keyframe map*.

Sensory-frame grouping (the reference's CSensoryFrame entries) is encoded
with a per-observation ``frame`` index: observations sharing a frame id
belong to one sensory frame. Plain observation entries get unique ids.
"""

from __future__ import annotations

import dataclasses
import json
from typing import List, Optional

import numpy as np

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.filters.generator import Observation

_CHANNELS = ("xyz", "intensity", "ring", "time")


@dataclasses.dataclass
class Rawlog:
    """Ordered observation stream (reference analogue: mrpt CRawlog)."""

    observations: List[Observation] = dataclasses.field(default_factory=list)
    # sensory-frame id per observation (same id = same frame); parallel list
    frames: List[int] = dataclasses.field(default_factory=list)

    def __len__(self) -> int:
        return len(self.observations)

    def append(self, obs: Observation, frame: Optional[int] = None) -> None:
        if frame is None:
            frame = (max(self.frames) + 1) if self.frames else 0
        self.observations.append(obs)
        self.frames.append(int(frame))

    def save(self, path: str) -> None:
        arrays = {}
        meta = []
        for i, o in enumerate(self.observations):
            entry = {
                "class_name": o.class_name,
                "sensor_label": o.sensor_label,
                "timestamp": float(o.timestamp),
                "frame": int(self.frames[i]) if i < len(self.frames) else i,
                "has": [c for c in _CHANNELS if getattr(o, c) is not None],
                "text": o.text,
                "angular_velocity": (
                    list(o.angular_velocity) if o.angular_velocity else None
                ),
                "has_sensor_pose": o.sensor_pose is not None,
            }
            for c in entry["has"]:
                arrays[f"obs{i}/{c}"] = np.asarray(getattr(o, c))
            if o.sensor_pose is not None:
                arrays[f"obs{i}/R"] = np.asarray(o.sensor_pose.R)
                arrays[f"obs{i}/t"] = np.asarray(o.sensor_pose.t)
            meta.append(entry)
        arrays["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )
        np.savez_compressed(path, **arrays)

    @staticmethod
    def load(path: str) -> "Rawlog":
        import jax.numpy as jnp

        rl = Rawlog()
        with np.load(path) as data:
            meta = json.loads(bytes(data["__meta__"]).decode())
            for i, entry in enumerate(meta):
                kw = {c: data[f"obs{i}/{c}"] for c in entry["has"]}
                pose = None
                if entry.get("has_sensor_pose"):
                    pose = se3.Pose(
                        jnp.asarray(data[f"obs{i}/R"]),
                        jnp.asarray(data[f"obs{i}/t"]),
                    )
                av = entry.get("angular_velocity")
                rl.observations.append(
                    Observation(
                        class_name=entry["class_name"],
                        sensor_label=entry["sensor_label"],
                        timestamp=entry["timestamp"],
                        sensor_pose=pose,
                        text=entry.get("text"),
                        angular_velocity=tuple(av) if av else None,
                        **kw,
                    )
                )
                rl.frames.append(int(entry.get("frame", i)))
        return rl


def pointcloud_to_observation(
    pc, *, sensor_label: str = "", timestamp: float = 0.0
) -> Observation:
    """PointCloud layer -> CObservationPointCloud-style record, trimmed to
    the valid count (reference: rawlog-filter output path,
    apps/rawlog-filter/main.cpp:210-224)."""
    n = int(pc.count)

    def trim(ch):
        return None if ch is None else np.asarray(ch)[:n]

    return Observation(
        class_name="CObservationPointCloud",
        sensor_label=sensor_label,
        timestamp=timestamp,
        xyz=np.asarray(pc.xyz)[:n],
        intensity=trim(pc.intensity),
        ring=trim(pc.ring),
        time=trim(pc.time),
    )
