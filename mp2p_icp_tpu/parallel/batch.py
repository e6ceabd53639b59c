"""Batched (data-parallel) registration.

Replaces the reference's per-frame CLI scale-out (scripts/kitti-run-seq.py
drives ``icp-run`` once per scan pair) with one vmapped/sharded XLA program:
a whole batch of independent ICP registrations runs as a single fused
computation; placed on a Mesh, XLA SPMD splits the batch across devices over
the 'data' axis with zero code changes. Matchers use the brute-force MXU NN
(ops.nn_bruteforce), so there is no per-pair spatial index to build.
"""

from __future__ import annotations

import jax

from mp2p_icp_tpu.icp import ICP, ICPParameters


def make_batched_align(icp: ICP, params: ICPParameters,
                       broadcast_globals: bool = False):
    """Returns a jitted function
        (batched_local_layers, batched_global_layers, batched_guess)
        -> batched ICPResults
    (same argument order as ICP.align); every array input carries a leading
    batch axis.

    ``broadcast_globals=True`` shares ONE un-batched global map across the
    whole batch (pass the plain layer dict, no leading axis) — the
    multi-robot / multi-hypothesis localisation pattern: B scans register
    against the same large map in one program, each with its own in-jit
    bbox crop, without materialising B copies of the map in HBM."""
    matchers = tuple(icp.matchers)

    def single(l_layers, g_layers, guess):
        # _align_full = crop-large-globals + _align_core, both vmap-safe
        return icp._align_full(
            params, matchers, g_layers, l_layers, guess, None
        )

    in_axes = (0, None, 0) if broadcast_globals else 0
    return jax.jit(jax.vmap(single, in_axes=in_axes))


def stack_pytrees(trees):
    """Stack a list of identically-shaped pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jax.numpy.stack(xs), *trees)
