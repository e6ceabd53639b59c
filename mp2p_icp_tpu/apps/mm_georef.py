"""mm-georef — extract / inject metric-map georeferencing metadata.

Reference parity: apps/mm-georef/main.cpp:197 (binary .georef / YAML forms).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import yaml


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mm-georef")
    ap.add_argument("input", help=".mm.npz metric map")
    ap.add_argument("--extract", default=None, help="write georef YAML here")
    ap.add_argument("--inject", default=None, help="read georef YAML from here")
    ap.add_argument("-o", "--output", default=None,
                    help="output map (required with --inject/--to-enu)")
    ap.add_argument(
        "--to-enu", action="store_true",
        help="transform all point layers into the map's ENU frame by "
             "applying T_enu_to_map^-1 (WGS-84 geodesy: core/geodesy.py; "
             "reference semantics: mrpt::topography + metricmap.cpp "
             "georeferencing_t)",
    )
    ap.add_argument(
        "--geodetic-to-map", default=None, metavar="LAT,LON,H",
        help="convert a WGS-84 geodetic fix to map coordinates via the "
             "stored anchor + T_enu_to_map (prints x y z)",
    )
    ap.add_argument(
        "--map-to-geodetic", default=None, metavar="X,Y,Z",
        help="convert a map point to a WGS-84 geodetic fix (prints "
             "lat lon h)",
    )
    args = ap.parse_args(argv)

    from mp2p_icp_tpu.core.metric_map import Georeferencing
    from mp2p_icp_tpu.io.mm import load_mm_file, save_mm_file

    mm = load_mm_file(args.input)

    if args.extract:
        if mm.georeferencing is None:
            print("map has no georeferencing")
            return 1
        g = mm.georeferencing
        with open(args.extract, "w") as f:
            yaml.safe_dump(
                {
                    "georeferencing": {
                        "latitude": g.latitude,
                        "longitude": g.longitude,
                        "height": g.height,
                        "t_enu_to_map": {
                            "translation": list(g.t_enu_to_map_xyz),
                            "quaternion_wxyz": list(g.t_enu_to_map_quat_wxyz),
                        },
                    }
                },
                f,
            )
        print(f"georeferencing written to {args.extract}")
        return 0

    if args.inject:
        if not args.output:
            raise SystemExit("error: --inject requires -o/--output")
        with open(args.inject) as f:
            d = yaml.safe_load(f)["georeferencing"]
        mm.georeferencing = Georeferencing(
            latitude=float(d["latitude"]),
            longitude=float(d["longitude"]),
            height=float(d.get("height", 0.0)),
            t_enu_to_map_xyz=tuple(
                d.get("t_enu_to_map", {}).get("translation", (0, 0, 0))
            ),
            t_enu_to_map_quat_wxyz=tuple(
                d.get("t_enu_to_map", {}).get(
                    "quaternion_wxyz", (1, 0, 0, 0)
                )
            ),
        )
        save_mm_file(args.output, mm)
        print(f"georeferencing injected; wrote {args.output}")
        return 0

    if args.geodetic_to_map or args.map_to_geodetic or args.to_enu:
        if mm.georeferencing is None:
            print("map has no georeferencing")
            return 1
        from mp2p_icp_tpu.core import geodesy

        g = mm.georeferencing
        if args.geodetic_to_map:
            lat, lon, h = (float(v) for v in
                           args.geodetic_to_map.split(","))
            p = geodesy.geodetic_to_map(lat, lon, h, g)
            print(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}")
            return 0
        if args.map_to_geodetic:
            xyz = [float(v) for v in args.map_to_geodetic.split(",")]
            lat, lon, h = geodesy.map_to_geodetic(
                np.asarray(xyz, np.float64), g
            )
            print(f"{float(lat):.8f} {float(lon):.8f} {float(h):.3f}")
            return 0
        # --to-enu: rewrite every point layer in the ENU frame
        if not args.output:
            raise SystemExit("error: --to-enu requires -o/--output")
        import dataclasses as _dc

        import jax.numpy as jnp

        from mp2p_icp_tpu.core.pointcloud import PointCloud

        for name, layer in list(mm.layers.items()):
            if not isinstance(layer, PointCloud):
                continue
            n = int(layer.count)
            xyz = np.asarray(layer.xyz)
            enu = geodesy.map_to_enu(xyz[:n], mm.georeferencing)
            new_xyz = xyz.copy()
            new_xyz[:n] = enu.astype(np.float32)
            mm.layers[name] = _dc.replace(
                layer, xyz=jnp.asarray(new_xyz)
            )
        # the rewritten map IS the ENU frame: identity transform
        mm.georeferencing = _dc.replace(
            mm.georeferencing,
            t_enu_to_map_xyz=(0.0, 0.0, 0.0),
            t_enu_to_map_quat_wxyz=(1.0, 0.0, 0.0, 0.0),
        )
        save_mm_file(args.output, mm)
        print(f"point layers rewritten in ENU frame; wrote {args.output}")
        return 0

    # default: print
    if mm.georeferencing is None:
        print("map has no georeferencing")
    else:
        g = mm.georeferencing
        print(
            f"lat={g.latitude} lon={g.longitude} h={g.height} "
            f"t_enu_to_map={g.t_enu_to_map_xyz}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
