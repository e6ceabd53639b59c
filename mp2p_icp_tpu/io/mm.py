"""Metric-map serialisation (.mm.npz).

Reference parity: the gzipped MRPT-archive ``.mm`` format (v5,
metricmap.cpp:48-178 serialize + :651-677 file IO). The TPU-native container
is a compressed .npz of the layer pytrees + a small JSON header for
metadata/georeferencing — versioned for forward compatibility.

(Reading the reference's binary .mm files requires MRPT's serialisation
substrate; converters ship as apps — txt2mm / kitti2mm / mm2txt — so data
moves through open formats instead.)
"""

from __future__ import annotations

import json

import numpy as np

from mp2p_icp_tpu.core.metric_map import (
    Georeferencing,
    LineSet,
    MetricMap,
    PlaneSet,
    VoxelGridLayer,
)
from mp2p_icp_tpu.core.pointcloud import PointCloud

FORMAT_VERSION = 1


def save_mm_file(path: str, mm: MetricMap) -> None:
    arrays = {}
    meta = {
        "version": FORMAT_VERSION,
        "id": mm.id,
        "label": mm.label,
        "layers": {},
    }
    for name, layer in mm.layers.items():
        if isinstance(layer, PointCloud):
            meta["layers"][name] = {"type": "points"}
            arrays[f"layer/{name}/xyz"] = np.asarray(layer.xyz)
            arrays[f"layer/{name}/count"] = np.asarray(layer.count)
            for ch in ("intensity", "ring", "time"):
                v = getattr(layer, ch)
                if v is not None:
                    arrays[f"layer/{name}/{ch}"] = np.asarray(v)
        elif isinstance(layer, VoxelGridLayer):
            meta["layers"][name] = {
                "type": "voxelgrid",
                "resolution": layer.resolution,
            }
            arrays[f"layer/{name}/keys"] = np.asarray(layer.keys)
            arrays[f"layer/{name}/occupancy"] = np.asarray(layer.occupancy)
            arrays[f"layer/{name}/valid"] = np.asarray(layer.valid)
    import dataclasses as _dc

    for set_name, s in (("lines", mm.lines), ("planes", mm.planes)):
        if int(s.count):
            for f in _dc.fields(s):
                arrays[f"{set_name}/{f.name}"] = np.asarray(getattr(s, f.name))
    if mm.georeferencing is not None:
        meta["georeferencing"] = {
            "latitude": mm.georeferencing.latitude,
            "longitude": mm.georeferencing.longitude,
            "height": mm.georeferencing.height,
            "t_enu_to_map_xyz": list(mm.georeferencing.t_enu_to_map_xyz),
            "t_enu_to_map_quat_wxyz": list(
                mm.georeferencing.t_enu_to_map_quat_wxyz
            ),
        }
        if mm.georeferencing.t_enu_to_map_cov is not None:
            meta["georeferencing"]["t_enu_to_map_cov"] = [
                list(row) for row in mm.georeferencing.t_enu_to_map_cov
            ]
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_mm_file(path: str) -> MetricMap:
    import jax.numpy as jnp

    # reference binary .mm files (gzipped MRPT archives, magic 1f8b, or the
    # raw archive starting with the 0x80|len class-name byte) route to the
    # read-only MRPT parser (io.mrpt_mm); our native format is .mm.npz (zip)
    with open(path, "rb") as f:
        head = f.read(2)
    if head != b"PK":  # not a zip -> not an npz
        from mp2p_icp_tpu.io.mrpt_mm import load_mrpt_mm

        return load_mrpt_mm(path)

    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        if meta["version"] > FORMAT_VERSION:
            raise ValueError(
                f"mm file version {meta['version']} newer than supported "
                f"{FORMAT_VERSION}"
            )
        mm = MetricMap(id=meta.get("id"), label=meta.get("label"))
        for name, info in meta["layers"].items():
            if info["type"] == "points":
                kw = {}
                for ch in ("intensity", "ring", "time"):
                    key = f"layer/{name}/{ch}"
                    if key in data:
                        kw[ch] = jnp.asarray(data[key])
                mm.layers[name] = PointCloud(
                    xyz=jnp.asarray(data[f"layer/{name}/xyz"]),
                    count=jnp.asarray(data[f"layer/{name}/count"]),
                    **kw,
                )
            elif info["type"] == "voxelgrid":
                mm.layers[name] = VoxelGridLayer(
                    keys=jnp.asarray(data[f"layer/{name}/keys"]),
                    occupancy=jnp.asarray(data[f"layer/{name}/occupancy"]),
                    valid=jnp.asarray(data[f"layer/{name}/valid"]),
                    resolution=info["resolution"],
                )
        if "lines/point" in data:
            mm.lines = LineSet(
                point=jnp.asarray(data["lines/point"]),
                direction=jnp.asarray(data["lines/direction"]),
                count=jnp.asarray(data["lines/count"]),
            )
        if "planes/normal" in data:
            mm.planes = PlaneSet(
                normal=jnp.asarray(data["planes/normal"]),
                centroid=jnp.asarray(data["planes/centroid"]),
                count=jnp.asarray(data["planes/count"]),
            )
        if "georeferencing" in meta:
            g = meta["georeferencing"]
            mm.georeferencing = Georeferencing(
                latitude=g["latitude"],
                longitude=g["longitude"],
                height=g["height"],
                t_enu_to_map_xyz=tuple(g["t_enu_to_map_xyz"]),
                t_enu_to_map_quat_wxyz=tuple(g["t_enu_to_map_quat_wxyz"]),
                t_enu_to_map_cov=(
                    tuple(tuple(row) for row in g["t_enu_to_map_cov"])
                    if "t_enu_to_map_cov" in g
                    else None
                ),
            )
    return mm
