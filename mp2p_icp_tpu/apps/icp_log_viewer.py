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
    args = ap.parse_args(argv)

    import numpy as np

    from mp2p_icp_tpu.core import se3
    from mp2p_icp_tpu.io.icplog import load_log

    log = load_log(args.input)
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
            print(
                f"    it {i:3d}: t={ts[i].round(4).tolist()} "
                f"pairs={int(cnts[i])}"
            )

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
    return 0


if __name__ == "__main__":
    sys.exit(main())
