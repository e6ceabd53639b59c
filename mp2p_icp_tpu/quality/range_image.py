"""Range-image similarity quality evaluator (Bogoslavskyi & Stachniss,
IROS 2017).

Reference parity: mp2p_icp/src/QualityEvaluator_RangeImageSimilarity.cpp:47-223
— pinhole-project both clouds into range images from both viewpoints
(I11, I12, I21, I22), score each pixel pair with a Gaussian error model plus
a not-visible penalty, return the mean score.

TPU-first: projection is a scatter-min over pixel indices (z-buffer) — one
fused op per image; the per-pixel scoring is elementwise.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.core.se3 import Pose
from mp2p_icp_tpu.quality.paired_ratio import QualityResult

_BIG = 3.0e37


def project_range_image(
    xyz, valid, ncols: int, nrows: int, fx: float, fy: float, cx: float, cy: float
):
    """Pinhole z-buffer projection: returns [nrows, ncols] ranges (0 where
    empty). Camera looks along +x, image plane (y, z) (MRPT convention)."""
    x = xyz[:, 0]
    y = xyz[:, 1]
    z = xyz[:, 2]
    in_front = (x > 0.01) & valid
    u = (cx - fx * y / jnp.maximum(x, 1e-6)).astype(jnp.int32)
    v = (cy - fy * z / jnp.maximum(x, 1e-6)).astype(jnp.int32)
    in_img = in_front & (u >= 0) & (u < ncols) & (v >= 0) & (v < nrows)
    rng = jnp.linalg.norm(xyz, axis=-1)
    flat = jnp.where(in_img, v * ncols + u, nrows * ncols)
    img = jnp.full((nrows * ncols + 1,), _BIG, jnp.float32)
    img = img.at[flat].min(jnp.where(in_img, rng, _BIG))
    img = img[:-1].reshape(nrows, ncols)
    return jnp.where(img < _BIG, img, 0.0)


def _score_images(I: jnp.ndarray, J: jnp.ndarray, sigma: float,
                  penalty_not_visible: float = 2.0):
    """Per-pixel agreement between two range images — the reference's
    exact formulas (QualityEvaluator_RangeImageSimilarity.cpp:183-223):
    both visible -> 1 - erf(|dr|/(sigma*sqrt(2))); visible from exactly
    one viewpoint -> 1 - erf(penalty_not_visible/sqrt(2)) (the penalty is
    expressed in SIGMAS, a constant occlusion mismatch); empty in both ->
    excluded. Returns (sum, count) so the caller can pool the mean over
    ALL counted pixels of every image pair, like the reference's single
    `scores` vector."""
    from jax.scipy.special import erf

    both = (I > 0) & (J > 0)
    one = (I > 0) ^ (J > 0)
    x = jnp.abs(I - J) / (sigma * jnp.sqrt(2.0))
    val_both = 1.0 - erf(x)
    val_one = 1.0 - erf(penalty_not_visible / jnp.sqrt(2.0))
    score = jnp.where(both, val_both, jnp.where(one, val_one, 0.0))
    return jnp.sum(score), jnp.sum((both | one).astype(jnp.float32))


@dataclasses.dataclass(frozen=True)
class QualityRangeImageSimilarity:
    """Params (reference: QualityEvaluator_RangeImageSimilarity.h)."""

    ncols: int = 100
    nrows: int = 60
    fx: float = 50.0
    fy: float = 50.0
    cx: float = 50.0
    cy: float = 30.0
    sigma: float = 0.1
    # in SIGMAS (reference: QualityEvaluator_RangeImageSimilarity.h:76)
    penalty_not_visible: float = 2.0
    weight: float = 1.0

    def evaluate_clouds(
        self, global_pc: PointCloud, local_pc: PointCloud, pose: Pose
    ) -> QualityResult:
        # I11: global from global viewpoint; I21: transformed local from
        # global viewpoint; I12/I22: both from the local viewpoint.
        proj = lambda xyz, valid: project_range_image(
            xyz, valid, self.ncols, self.nrows, self.fx, self.fy, self.cx, self.cy
        )
        lv = local_pc.valid_mask()
        gv = global_pc.valid_mask()
        local_in_g = se3.apply(pose, local_pc.xyz)
        inv = se3.inverse(pose)
        global_in_l = se3.apply(inv, global_pc.xyz)
        I11 = proj(global_pc.xyz, gv)
        I21 = proj(local_in_g, lv)
        I12 = proj(global_in_l, gv)
        I22 = proj(local_pc.xyz, lv)
        s1, n1 = _score_images(I11, I21, self.sigma,
                               self.penalty_not_visible)
        s2, n2 = _score_images(I12, I22, self.sigma,
                               self.penalty_not_visible)
        # pooled mean over every counted pixel of both pairs (reference
        # concatenates s1+s2 and divides by the total count)
        q = (s1 + s2) / jnp.maximum(n1 + n2, 1.0)
        return QualityResult(quality=q, hard_discard=jnp.asarray(False))

    def evaluate(self, pairings, grids=None, global_map=None, local_map=None,
                 pose=None, ctx=None) -> QualityResult:
        gl = global_map.get("raw") if hasattr(global_map, "get") else None
        ll = local_map.get("raw") if hasattr(local_map, "get") else None
        if gl is None or ll is None:
            return QualityResult(quality=jnp.asarray(0.5),
                                 hard_discard=jnp.asarray(False))
        return self.evaluate_clouds(gl, ll, pose)
