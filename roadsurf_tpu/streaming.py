"""Time-chunked streaming execution for production-scale runs.

At 1M+ points the full forcing tensor (T=8881 x ~13 channels) is hundreds of
GB -- far beyond HBM (SURVEY.md section 6: ~390 GB at float32).  This driver
keeps only the prognostic state resident on device and streams forcing in
time chunks, double-buffering host->device transfers against compute, exactly
the pattern the Pallas kernel uses on-chip for HBM->VMEM.

The chunk boundary is invisible to the physics: the scan step consumes
prepared forcing rows; chunking only slices the prepared [T, P] tensors.
Output is collected at the configured output stride per chunk and gathered to
host incrementally (the reference writes outputs after the whole run;
here each chunk's rows land as they finish).
"""
from __future__ import annotations

from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelSettings, PhysicsParams
from .forcing import Prepared
from .grid import LayerGrid
from .model import Model, scan_steps
from .state import PointParams, State
from .step import StepConfig


def _slice_prep(prep: Prepared, t0: int, t1: int) -> Prepared:
    return Prepared(*(x[t0:t1] for x in prep))


def run_streamed(model: Model, state: State, prep_chunks: Iterator[Prepared],
                 coupling_tsurf, sw_cof_fn=None, lw_cof_fn=None,
                 out_stride: int = 1, donate: bool = True):
    """Run the scan chunk by chunk.

    prep_chunks: iterator of Prepared chunks ([Tc, P] channels, host or
    device).  The next chunk's device transfer overlaps the current chunk's
    compute (JAX dispatch is async: device_put of chunk k+1 is enqueued while
    chunk k runs).

    Returns (final_state, outputs dict of [T_out, P] numpy arrays).
    """
    cfg, grid, params = model.cfg, model.grid, model.params

    @jax.jit
    def run_chunk(st, prep, sw, lw):
        return scan_steps(st, prep, sw, lw, coupling_tsurf, cfg, grid,
                          params, collect=True)

    outs = []
    t_base = 0
    pending = None
    it = iter(prep_chunks)
    nxt = next(it, None)
    while nxt is not None:
        prep = jax.device_put(nxt)              # async enqueue
        nxt = next(it, None)
        Tc = prep.tair.shape[0]
        ones = jnp.ones(prep.tair.shape, prep.tair.dtype)
        sw = sw_cof_fn(t_base, Tc) if sw_cof_fn else ones
        lw = lw_cof_fn(t_base, Tc) if lw_cof_fn else ones
        state, out = run_chunk(state, prep, sw, lw)
        # subsample at the global output stride
        offs = (-t_base) % out_stride
        sel = slice(offs, None, out_stride)
        outs.append(jax.tree.map(lambda x: x[sel], out))
        t_base += Tc
    # gather to host
    fields = {}
    for name in ("tsurf", "wat", "snow", "ice", "ice2", "dep"):
        fields[name] = np.concatenate(
            [np.asarray(getattr(o, name)) for o in outs], axis=0)
    return state, fields


def chunk_prepared(prep: Prepared, chunk_t: int) -> Iterator[Prepared]:
    """Slice an already-prepared forcing tensor into time chunks (host-side
    numpy slices; cheap views)."""
    T = prep.tair.shape[0]
    for t0 in range(0, T, chunk_t):
        yield _slice_prep(prep, t0, min(t0 + chunk_t, T))
