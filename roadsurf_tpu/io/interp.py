"""Time interpolation of raw weather series onto the simulation grid.

Replicates JsonSource::interpolate (examples/example1/src/JsonSource.cpp:49-176):
 * exact time match (tolerance 0.01 s) copies the raw value if not missing;
 * otherwise linear interpolation between the bracketing raw samples, only
   when BOTH endpoints are valid (per variable);
 * PrecPhase takes the NEXT raw sample (nearest-next, :171-172);
 * sim times before the first / after the last raw sample stay missing.

Vectorized numpy; the C++ columnar decoder (native/) provides the same
function for large station counts.
"""
from __future__ import annotations

import numpy as np

MISSING = -9999.9

# per-variable missing thresholds (JsonSource.cpp:88-110: > -100 except
# lw_net which uses > -1000)
_THRESH = {"lw_net": -1000.0}


def _valid(name, arr):
    return arr > _THRESH.get(name, -100.0)


def interpolate_series(raw_times: np.ndarray, sim_times: np.ndarray,
                       values: dict, int_names=("prec_phase",)) -> dict:
    """values: {name: [..., R] float}; returns {name: [..., S] float} on the
    sim grid.  Leading axes (e.g. a points axis) are broadcast -- all rows
    share the same raw time axis."""
    raw_times = np.asarray(raw_times, np.int64)
    sim_times = np.asarray(sim_times, np.int64)
    R = raw_times.shape[0]
    S = sim_times.shape[0]
    out = {}

    # bracketing indices
    idx = np.searchsorted(raw_times, sim_times, side="left")
    exact = (idx < R) & (np.take(raw_times, np.clip(idx, 0, R - 1)) == sim_times)
    i0 = np.clip(idx - 1, 0, R - 1)
    i1 = np.clip(idx, 0, R - 1)
    in_range = (idx > 0) & (idx < R)
    # the reference loop stops at rawPos+1 == rawLen, so a sim time exactly at
    # the LAST raw sample is still copied; beyond it, missing
    exact_ok = exact & (idx < R)
    denom = (np.take(raw_times, i1) - np.take(raw_times, i0)).astype(np.float64)
    denom = np.where(denom == 0, 1.0, denom)
    w = (sim_times - np.take(raw_times, i0)).astype(np.float64) / denom
    iex = np.clip(idx, 0, R - 1)

    for name, arr in values.items():
        arr = np.asarray(arr, np.float64)
        res = np.full(arr.shape[:-1] + (S,), MISSING)
        if name in int_names:
            # nearest-next (JsonSource.cpp:171-172); exact match copies
            nxt = arr[..., i1]
            ok = in_range & _valid(name, nxt)
            res = np.where(ok & ~exact_ok, nxt, res)
            ex = arr[..., iex]
            res = np.where(exact_ok & _valid(name, ex), ex, res)
        else:
            v0 = arr[..., i0]
            v1 = arr[..., i1]
            ok = in_range & _valid(name, v0) & _valid(name, v1)
            res = np.where(ok & ~exact_ok, v0 + w * (v1 - v0), res)
            ex = arr[..., iex]
            res = np.where(exact_ok & _valid(name, ex), ex, res)
        out[name] = res
    return out
