"""ICP run log records (.icplog.npz).

Reference parity: mp2p_icp/include/mp2p_icp/LogRecord.h:38-102 — a
serialisable record of one ICP run: both maps, initial guess, result pose +
quality + termination, final pairing counts — enabling post-hoc inspection
(the reference's icp-log-viewer GUI consumes these).
"""

from __future__ import annotations

import json

import numpy as np

from mp2p_icp_tpu.core import se3


def save_log(path, local_mm, global_mm, guess, results) -> None:
    from mp2p_icp_tpu.core.metric_map import MetricMap
    from mp2p_icp_tpu.matchers.base import point_layers

    def layers_of(m):
        return point_layers(m) if not isinstance(m, dict) else m

    arrays = {}
    meta = {
        "version": 1,
        "n_iterations": int(results.n_iterations),
        "termination_reason": int(results.termination_reason),
        "quality": float(results.quality),
        "n_pairings": int(results.final_pairings.size()),
    }
    arrays["guess/R"] = np.asarray(guess.R)
    arrays["guess/t"] = np.asarray(guess.t)
    arrays["result/R"] = np.asarray(results.optimal_tf.R)
    arrays["result/t"] = np.asarray(results.optimal_tf.t)
    arrays["result/cov"] = np.asarray(results.covariance)
    # per-iteration detail (reference: LogRecord iterationsDetails) when the
    # align ran with record_iterations
    if getattr(results, "iteration_poses", None) is not None:
        arrays["iters/R"] = np.asarray(results.iteration_poses.R)
        arrays["iters/t"] = np.asarray(results.iteration_poses.t)
        arrays["iters/pair_counts"] = np.asarray(
            results.iteration_pair_counts
        )
    # per-iteration decimated Pairings (reference: LogRecord.h:58-71 keeps
    # full Pairings per iteration for icp-log-viewer playback)
    import dataclasses as _dc

    ip = getattr(results, "iteration_pairings", None)
    if ip is not None:
        for block_name in ("pt2pt", "pt2ln", "pt2pl", "ln2ln", "pl2pl"):
            block = getattr(ip, block_name)
            for f in _dc.fields(block):
                arrays[f"iters/pairings/{block_name}/{f.name}"] = np.asarray(
                    getattr(block, f.name)
                )
    for prefix, mm in (("local", local_mm), ("global", global_mm)):
        for name, pc in layers_of(mm).items():
            arrays[f"{prefix}/{name}/xyz"] = np.asarray(pc.xyz)
            arrays[f"{prefix}/{name}/count"] = np.asarray(pc.count)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_log(path):
    import jax.numpy as jnp

    from mp2p_icp_tpu.core.pointcloud import PointCloud

    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        out = {
            "meta": meta,
            "guess": se3.Pose(
                jnp.asarray(data["guess/R"]), jnp.asarray(data["guess/t"])
            ),
            "result": se3.Pose(
                jnp.asarray(data["result/R"]), jnp.asarray(data["result/t"])
            ),
            "covariance": jnp.asarray(data["result/cov"]),
            "local": {},
            "global": {},
        }
        if "iters/t" in data.files:
            out["iterations"] = {
                "poses": se3.Pose(
                    jnp.asarray(data["iters/R"]), jnp.asarray(data["iters/t"])
                ),
                "pair_counts": jnp.asarray(data["iters/pair_counts"]),
            }
        if "iters/pairings/pt2pt/weight" in data.files:
            import dataclasses as _dc

            from mp2p_icp_tpu.core import pairings as _pairings

            blocks = {}
            for block_name, cls in (
                ("pt2pt", _pairings.PairsPt2Pt),
                ("pt2ln", _pairings.PairsPt2Ln),
                ("pt2pl", _pairings.PairsPt2Pl),
                ("ln2ln", _pairings.PairsLn2Ln),
                ("pl2pl", _pairings.PairsPl2Pl),
            ):
                blocks[block_name] = cls(**{
                    f.name: jnp.asarray(
                        data[f"iters/pairings/{block_name}/{f.name}"]
                    )
                    for f in _dc.fields(cls)
                })
            out["iterations"]["pairings"] = _pairings.Pairings(
                potential_pairings=jnp.asarray(0, jnp.int32), **blocks
            )
        for key in data.files:
            for prefix in ("local", "global"):
                if key.startswith(prefix + "/") and key.endswith("/xyz"):
                    name = key.split("/")[1]
                    out[prefix][name] = PointCloud(
                        xyz=jnp.asarray(data[key]),
                        count=jnp.asarray(data[f"{prefix}/{name}/count"]),
                    )
    return out
