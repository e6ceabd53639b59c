"""Automatic per-align ICP debug-file generation.

Reference parity: mp2p_icp/include/mp2p_icp/Parameters.h:66-96 (the
``generateDebugFiles`` knob family) and mp2p_icp/src/ICP.cpp:384-467
(``ICP::save_log_file``) — the reference's primary field-debugging
workflow: every align() drops a LogRecord to a filename produced from
``debugFileNameFormat`` by substituting ``$UNIQUE_ID`` (a global
process-wide counter), ``$GLOBAL_ID``/``$GLOBAL_LABEL`` and
``$LOCAL_ID``/``$LOCAL_LABEL`` (metric_map_t metadata), decimated by
``decimationDebugFiles``; per-iteration detail inside each record is
decimated by ``decimationIterationDetails``; user functors may shrink the
maps before logging.

TPU note: this is a pure host-side post-dispatch step — the fused align
program is untouched (except that ``save_iteration_details`` flips the
recording scan on, see ``ICP.align``). Records are ``.icplog.npz``
(io/icplog.py), the repo-native LogRecord format.
"""

from __future__ import annotations

import os
import threading

import jax

_counter_lock = threading.Lock()
_log_file_counter = 0


def reset_unique_id_counter(value: int = 0) -> None:
    """Reset the process-wide $UNIQUE_ID counter (tests / new sessions)."""
    global _log_file_counter
    with _counter_lock:
        _log_file_counter = value


def _id_label(mm):
    """(id, label) of a MetricMap — dict-of-layers inputs have neither
    (reference: LogRecord's pcGlobal/pcLocal optional id/label,
    ICP.cpp:410-441 substitutes 0 / '' when absent)."""
    mid = getattr(mm, "id", None)
    label = getattr(mm, "label", None)
    return (int(mid) if mid is not None else 0), (label or "")


def format_debug_filename(fmt: str, unique_id: int, local_mm, global_mm) -> str:
    """Substitute the reference's filename template variables
    (ICP.cpp:403-441)."""
    lid, llabel = _id_label(local_mm)
    gid, glabel = _id_label(global_mm)
    out = fmt
    out = out.replace("$UNIQUE_ID", f"{unique_id:05d}")
    out = out.replace("$GLOBAL_ID", f"{gid:05d}")
    out = out.replace("$GLOBAL_LABEL", glabel)
    out = out.replace("$LOCAL_ID", f"{lid:05d}")
    out = out.replace("$LOCAL_LABEL", llabel)
    return out


def _decimate_iteration_details(results, n: int):
    """Keep 1 of n recorded iterations (Parameters.h:79-83
    decimationIterationDetails)."""
    if n <= 1 or results.iteration_poses is None:
        return results
    sl = (
        lambda x: x[::n]
        if hasattr(x, "ndim") and getattr(x, "ndim", 0) >= 1
        else x
    )
    return results._replace(
        iteration_poses=jax.tree.map(sl, results.iteration_poses),
        iteration_pair_counts=sl(results.iteration_pair_counts),
        iteration_pairings=(
            jax.tree.map(sl, results.iteration_pairings)
            if results.iteration_pairings is not None
            else None
        ),
    )


def _apply_functor(fn, mm):
    """Reference functors mutate the metric_map_t in place
    (Parameters.h:94-96); ours may instead RETURN a replacement (pure-JAX
    maps are immutable pytrees). None return keeps the (possibly mutated)
    input."""
    if fn is None:
        return mm
    out = fn(mm)
    return mm if out is None else out


def save_icp_debug_file(params, local_mm, global_mm, guess, results):
    """The ICP::save_log_file equivalent: returns the written path, or
    None when this record was skipped by decimationDebugFiles."""
    global _log_file_counter
    with _counter_lock:
        unique_id = _log_file_counter
        _log_file_counter += 1
    if (
        params.decimation_debug_files > 1
        and unique_id % params.decimation_debug_files != 0
    ):
        return None  # skip due to decimation (ICP.cpp:398-400)

    filename = format_debug_filename(
        params.debug_file_name_format, unique_id, local_mm, global_mm
    )
    base_dir = os.path.dirname(filename)
    if base_dir and not os.path.isdir(base_dir):
        os.makedirs(base_dir, exist_ok=True)  # ICP.cpp:443-459

    local_out = _apply_functor(params.functor_before_logging_local, local_mm)
    global_out = _apply_functor(
        params.functor_before_logging_global, global_mm
    )
    results_out = _decimate_iteration_details(
        results, params.decimation_iteration_details
    )

    from mp2p_icp_tpu.io.icplog import save_log

    save_log(filename, local_out, global_out, guess, results_out)
    return filename
