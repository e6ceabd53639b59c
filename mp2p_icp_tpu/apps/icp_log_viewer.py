"""icp-log-viewer — render an .icplog record to images / text report.

Reference parity: apps/icp-log-viewer/main.cpp (1203 LoC nanogui/OpenGL
browser). Headless TPU pods have no GL stack, so the TPU-native viewer
renders matplotlib images (before/after registration overlays + pairing
statistics) and a text report — the same inspection information without a
GUI dependency.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="icp-log-viewer")
    ap.add_argument("input", help=".icplog.npz record")
    ap.add_argument("-o", "--output-prefix", default=None,
                    help="write <prefix>_overlay.png")
    ap.add_argument("-i", "--iteration", type=int, default=None,
                    help="render the recorded pairings of iteration N "
                         "(requires -o for the output path and a log "
                         "written with record_pairings; reference GUI "
                         "equivalent: the iteration slider + pairing "
                         "lines, icp-log-viewer/main.cpp)")
    ap.add_argument("--html", default=None,
                    help="write a standalone INTERACTIVE WebGL viewer: "
                         "live iteration slider re-posing the local map "
                         "+ pairing lines (apps/html_viewer.py) — the "
                         "reference icp-log-viewer GUI equivalent")
    args = ap.parse_args(argv)
    if args.iteration is not None and not args.output_prefix:
        ap.error("-i/--iteration renders a PNG frame and needs "
                 "-o/--output-prefix")

    import numpy as np

    from mp2p_icp_tpu.core import se3
    from mp2p_icp_tpu.io.icplog import load_log

    log = load_log(args.input)
    if args.html:
        from mp2p_icp_tpu.apps.html_viewer import export_icplog_html

        export_icplog_html(log, args.html)
        print(f"wrote {args.html}")
    meta = log["meta"]
    print("ICP log record:")
    print(f"  iterations : {meta['n_iterations']}")
    print(f"  reason     : {meta['termination_reason']}")
    print(f"  quality    : {meta['quality']:.4f}")
    print(f"  pairings   : {meta['n_pairings']}")
    t = np.asarray(log["result"].t)
    print(f"  result t   : {t.round(4).tolist()}")
    cov_diag = np.diag(np.asarray(log["covariance"]))
    print(f"  cov diag   : {cov_diag.round(6).tolist()}")
    if "iterations" in log:
        its = log["iterations"]
        ts = np.asarray(its["poses"].t)
        cnts = np.asarray(its["pair_counts"])
        print("  per-iteration trace:")
        for i in range(len(ts)):
            line = (
                f"    it {i:3d}: t={ts[i].round(4).tolist()} "
                f"pairs={int(cnts[i])}"
            )
            if "pairings" in its:
                # residual stats over the recorded (decimated) pt2pt pairs
                # at that iteration's pose
                import jax.numpy as jnp

                blk = its["pairings"].pt2pt
                w = np.asarray(blk.weight[i])
                sel = w > 0
                if sel.any():
                    pose_i = se3.Pose(its["poses"].R[i], its["poses"].t[i])
                    loc = np.array(
                        se3.apply(pose_i, jnp.asarray(blk.local[i]))
                    )
                    d = np.linalg.norm(
                        loc[sel] - np.asarray(blk.globl[i])[sel], axis=1
                    )
                    line += (
                        f" rec={int(sel.sum())}"
                        f" d_mean={d.mean():.4f} d_max={d.max():.4f}"
                    )
            print(line)

    if args.output_prefix:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(12, 6))
        gl = next(iter(log["global"].values()))
        ll = next(iter(log["local"].values()))
        g = gl.to_numpy()
        l_raw = ll.to_numpy()
        import jax.numpy as jnp

        l_guess = np.array(se3.apply(log["guess"], jnp.asarray(l_raw)))
        l_final = np.array(se3.apply(log["result"], jnp.asarray(l_raw)))
        for ax, local, title in (
            (axes[0], l_guess, "initial guess"),
            (axes[1], l_final, "registered"),
        ):
            ax.scatter(g[:, 0], g[:, 1], s=1, c="gray", label="global")
            ax.scatter(local[:, 0], local[:, 1], s=1, c="red", label="local")
            ax.set_title(title)
            ax.set_aspect("equal")
            ax.legend(markerscale=8)
        out = f"{args.output_prefix}_overlay.png"
        fig.savefig(out, dpi=110, bbox_inches="tight")
        print(f"  overlay    : {out}")

        # iteration playback frame: pairing lines local->global at the
        # selected iteration's pose (reference: icp-log-viewer's pairing
        # line rendering over the iteration slider)
        if args.iteration is not None:
            if "iterations" not in log or "pairings" not in log["iterations"]:
                print("  (no recorded per-iteration pairings in this log)")
            else:
                import jax.numpy as jnp

                its = log["iterations"]
                i = args.iteration
                n_it = np.asarray(its["poses"].t).shape[0]
                if not (0 <= i < n_it):
                    raise SystemExit(
                        f"iteration {i} out of range [0, {n_it})"
                    )
                blk = its["pairings"].pt2pt
                w = np.asarray(blk.weight[i])
                sel = w > 0
                pose_i = se3.Pose(its["poses"].R[i], its["poses"].t[i])
                loc = np.array(se3.apply(pose_i, jnp.asarray(blk.local[i])))
                glb = np.asarray(blk.globl[i])
                fig2, ax = plt.subplots(figsize=(8, 8))
                ax.scatter(g[:, 0], g[:, 1], s=1, c="gray", label="global")
                li = np.array(
                    se3.apply(pose_i, jnp.asarray(l_raw))
                )
                ax.scatter(li[:, 0], li[:, 1], s=1, c="red", label="local")
                for a_, b_ in zip(loc[sel], glb[sel]):
                    ax.plot(
                        [a_[0], b_[0]], [a_[1], b_[1]],
                        c="tab:blue", lw=0.4, alpha=0.6,
                    )
                ax.set_title(
                    f"iteration {i}: {int(sel.sum())} recorded pairings"
                )
                ax.set_aspect("equal")
                ax.legend(markerscale=8)
                out2 = f"{args.output_prefix}_iter{i:03d}.png"
                fig2.savefig(out2, dpi=110, bbox_inches="tight")
                print(f"  iter frame : {out2}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
