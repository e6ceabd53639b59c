"""mm-georef — extract / inject metric-map georeferencing metadata.

Reference parity: apps/mm-georef/main.cpp:197 (binary .georef / YAML forms).
"""

from __future__ import annotations

import argparse
import sys

import yaml


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mm-georef")
    ap.add_argument("input", help=".mm.npz metric map")
    ap.add_argument("--extract", default=None, help="write georef YAML here")
    ap.add_argument("--inject", default=None, help="read georef YAML from here")
    ap.add_argument("-o", "--output", default=None,
                    help="output map (required with --inject)")
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
