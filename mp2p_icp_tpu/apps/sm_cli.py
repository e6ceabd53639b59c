"""sm-cli — simple-map (keyframe map) toolbox.

Reference parity: apps/sm-cli (info / join / cut / trim / level / tf /
export-kfs subcommands, ~800 LoC).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _load(path):
    from mp2p_icp_tpu.filters.sm2mm import SimpleMap

    return SimpleMap.load(path)


def cmd_info(args):
    sm = _load(args.input)
    n_obs = sum(len(kf.observations) for kf in sm.keyframes)
    n_pts = sum(
        o.xyz.shape[0]
        for kf in sm.keyframes
        for o in kf.observations
        if o.xyz is not None
    )
    print(f"keyframes: {len(sm.keyframes)}")
    print(f"observations: {n_obs}")
    print(f"total points: {n_pts}")
    if sm.keyframes:
        ts = [np.asarray(kf.pose.t) for kf in sm.keyframes]
        ts = np.stack(ts)
        d = np.linalg.norm(np.diff(ts, axis=0), axis=1).sum()
        print(f"trajectory length: {d:.2f} m")
        print(f"bbox: {ts.min(0).round(2)} .. {ts.max(0).round(2)}")
    return 0


def cmd_join(args):
    from mp2p_icp_tpu.filters.sm2mm import SimpleMap

    out = SimpleMap()
    for p in args.inputs:
        out.keyframes.extend(_load(p).keyframes)
    out.save(args.output)
    print(f"wrote {args.output}: {len(out.keyframes)} keyframes")
    return 0


def cmd_cut(args):
    sm = _load(args.input)
    sm.keyframes = sm.keyframes[args.from_index : args.to_index]
    sm.save(args.output)
    print(f"wrote {args.output}: {len(sm.keyframes)} keyframes")
    return 0


def cmd_tf(args):
    """Left-multiply every keyframe pose by a transform."""
    from mp2p_icp_tpu.core import se3

    sm = _load(args.input)
    vals = [float(x) for x in args.transform.split()]
    T = se3.from_xyz_ypr(*vals)
    for kf in sm.keyframes:
        kf.pose = se3.compose(T, kf.pose)
    sm.save(args.output)
    print(f"wrote {args.output} (transformed {len(sm.keyframes)} keyframes)")
    return 0


def cmd_level(args):
    """Rotate so the average trajectory plane becomes horizontal
    (reference: sm-cli level)."""
    from mp2p_icp_tpu.core import se3
    import jax.numpy as jnp

    sm = _load(args.input)
    ts = np.stack([np.asarray(kf.pose.t) for kf in sm.keyframes])
    if len(ts) >= 3:
        c = ts.mean(0)
        u, s, vt = np.linalg.svd(ts - c)
        normal = vt[2]
        if normal[2] < 0:
            normal = -normal
        z = np.array([0.0, 0.0, 1.0])
        v = np.cross(normal, z)
        sv = np.linalg.norm(v)
        if sv > 1e-9:
            ang = np.arctan2(sv, normal @ z)
            axis = v / sv
            R = np.asarray(se3.so3_exp(jnp.asarray(axis * ang, jnp.float32)))
            T = se3.Pose(jnp.asarray(R), jnp.zeros(3))
            for kf in sm.keyframes:
                kf.pose = se3.compose(T, kf.pose)
    sm.save(args.output)
    print(f"wrote {args.output} (levelled)")
    return 0


def cmd_trim(args):
    """Keep only keyframes whose pose translation lies inside a bounding box
    (reference: apps/sm-cli/sm-cli-trim.cpp:37-46)."""
    sm = _load(args.input)
    lo = np.array([float(x) for x in args.min_corner.split()])
    hi = np.array([float(x) for x in args.max_corner.split()])
    kept = [
        kf
        for kf in sm.keyframes
        if np.all(np.asarray(kf.pose.t) >= lo) and np.all(np.asarray(kf.pose.t) <= hi)
    ]
    sm.keyframes = kept
    sm.save(args.output)
    print(f"wrote {args.output}: {len(kept)} keyframes (trimmed)")
    return 0


def cmd_export_kfs(args):
    """Export keyframe poses in TUM format (x y z qx qy qz qw)."""
    from mp2p_icp_tpu.core import se3

    sm = _load(args.input)
    with open(args.output, "w") as f:
        for i, kf in enumerate(sm.keyframes):
            t = np.asarray(kf.pose.t)
            q = np.asarray(se3.rot_to_quat(kf.pose.R))  # wxyz
            f.write(
                f"{i} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n"
            )
    print(f"wrote {args.output}: {len(sm.keyframes)} poses (TUM format)")
    return 0


def cmd_export_rawlog(args):
    """Export keyframes as a flat observation stream (.rawlog.npz).

    Reference parity: apps/sm-cli/sm-cli-export-rawlog.cpp:39-88 — each
    keyframe becomes one sensory frame holding its observations plus a
    'pose' CObservationRobotPose and, when the KF stores one, a 'twist'
    comment observation.
    """
    from mp2p_icp_tpu.filters.generator import Observation
    from mp2p_icp_tpu.io.rawlog import Rawlog

    sm = _load(args.input)
    rl = Rawlog()
    for i, kf in enumerate(sm.keyframes):
        ts = next(
            (o.timestamp for o in kf.observations if o.timestamp), 0.0
        )
        for o in kf.observations:
            rl.append(o, frame=i)
        rl.append(
            Observation(
                class_name="CObservationRobotPose",
                sensor_label="pose",
                timestamp=ts,
                sensor_pose=kf.pose,
            ),
            frame=i,
        )
        if kf.twist is not None:
            rl.append(
                Observation(
                    class_name="CObservationComment",
                    sensor_label="twist",
                    timestamp=ts,
                    text="Twist stored in the simplemap keyframe:\n"
                    + " ".join(f"{v:.6g}" for v in kf.twist),
                ),
                frame=i,
            )
    rl.save(args.output)
    print(
        f"wrote {args.output}: {len(rl)} observations from "
        f"{len(sm.keyframes)} keyframes"
    )
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="sm-cli")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("info")
    p.add_argument("input")
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("join")
    p.add_argument("inputs", nargs="+")
    p.add_argument("-o", "--output", required=True)
    p.set_defaults(fn=cmd_join)

    p = sub.add_parser("cut")
    p.add_argument("input")
    p.add_argument("--from-index", type=int, default=0)
    p.add_argument("--to-index", type=int, default=None)
    p.add_argument("-o", "--output", required=True)
    p.set_defaults(fn=cmd_cut)

    p = sub.add_parser("tf")
    p.add_argument("input")
    p.add_argument("-t", "--transform", required=True,
                   help="'x y z yaw pitch roll' (radians)")
    p.add_argument("-o", "--output", required=True)
    p.set_defaults(fn=cmd_tf)

    p = sub.add_parser("level")
    p.add_argument("input")
    p.add_argument("-o", "--output", required=True)
    p.set_defaults(fn=cmd_level)

    p = sub.add_parser("trim")
    p.add_argument("input")
    p.add_argument("--min-corner", required=True, help="'xmin ymin zmin'")
    p.add_argument("--max-corner", required=True, help="'xmax ymax zmax'")
    p.add_argument("-o", "--output", required=True)
    p.set_defaults(fn=cmd_trim)

    p = sub.add_parser("export-kfs")
    p.add_argument("input")
    p.add_argument("-o", "--output", required=True)
    p.set_defaults(fn=cmd_export_kfs)

    p = sub.add_parser("export-rawlog")
    p.add_argument("input")
    p.add_argument("-o", "--output", required=True)
    p.set_defaults(fn=cmd_export_rawlog)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
