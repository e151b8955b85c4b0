"""Simulation drivers: the lax.scan time loop and the model facade.

``simulate`` runs the full trajectory as one ``lax.scan`` over prepared
forcing -- the TPU-native equivalent of the reference's per-point Fortran
``do while`` (examples/example1/src/Simulation.f90:58-95), batched over all
points at once.  Coupling (the only rewinding control flow) lives in
roadsurf_tpu.coupling.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelSettings, PhysicsParams
from .forcing import Calendar, Prepared, RawForcing, cof_schedule, prepare
from .grid import LayerGrid, depth_interp_coeffs, make_grid
from .state import PointParams, State, init_state
from .step import StepConfig, StepForcing, step, step_output


class SimOutput(NamedTuple):
    """Trajectories, time-major [T, P]."""
    tsurf: jnp.ndarray
    wat: jnp.ndarray
    snow: jnp.ndarray
    ice: jnp.ndarray
    ice2: jnp.ndarray
    dep: jnp.ndarray


def _depth_config(settings: ModelSettings, grid: LayerGrid) -> StepConfig:
    use_depth = settings.tsurf_output_depth >= 0.0
    if use_depth:
        idx, w = depth_interp_coeffs(grid, settings.tsurf_output_depth)
        # weak-typed python scalars: an np.float64 weight would promote the
        # float32 state through surface_average
        idx, w = int(idx), float(w)
    else:
        idx, w = 1, 0.0
    return StepConfig.from_settings(settings, depth_idx=idx, depth_w=w,
                                    use_depth=use_depth)


def scan_steps(state: State, prep: Prepared, sw_cof, lw_cof, coupling_tsurf,
               cfg: StepConfig, grid: LayerGrid, p: PhysicsParams,
               collect: bool = True, depth=None):
    """Scan the step over the time axis of ``prep``.

    sw_cof/lw_cof: [T, P] radiation-coefficient schedules (ones when
    uncoupled).  Returns (final_state, SimOutput | None).
    """
    dtype = state.tmp.dtype
    dyc = jnp.asarray(grid.dyc, dtype)
    cond_dz = jnp.asarray(grid.cond_dz, dtype)
    wcont = jnp.asarray(grid.wcont, dtype)

    def body(carry, xs):
        (tair, vz, rhz, rain, snow, sw, lw, tsurf_obs, valid, in_coupling,
         trf, swc, lwc) = xs
        f = StepForcing(tair, vz, rhz, rain, snow, sw, lw, tsurf_obs, valid,
                        in_coupling, trf, swc, lwc)
        new = step(carry, f, coupling_tsurf, cfg, dyc, cond_dz, wcont, p,
                   depth=depth)
        out = step_output(new, carry.failed) if collect else None
        return new, out

    xs = (prep.tair, prep.vz, prep.rhz, prep.rain, prep.snow, prep.sw,
          prep.lw, prep.tsurf_obs, prep.valid, prep.in_coupling,
          prep.trf_fric, sw_cof, lw_cof)
    final, outs = jax.lax.scan(body, state, xs)
    if collect:
        return final, SimOutput(*outs)
    return final, None


class Model:
    """Facade tying config, grid, forcing prep and the scan together."""

    def __init__(self, settings: ModelSettings, params: Optional[PhysicsParams] = None):
        self.settings = settings
        self.params = (params or PhysicsParams()).derive(settings.dt)
        self.grid = make_grid(self.params, settings.nlayers)
        self.cfg = _depth_config(settings, self.grid)

    def prepare(self, raw: RawForcing, pts: PointParams, cal: Calendar) -> Prepared:
        return prepare(raw, pts, cal, self.settings, self.params)

    def depth_arrays(self, pts: PointParams, dtype=None):
        """Per-point output-depth gather arrays, or None.  The global
        settings.tsurf_output_depth wins when set (InputOutput.f90:125-130);
        otherwise per-point depths come from pts.out_depth (ex2's
        modelInput%depth)."""
        if self.cfg.use_depth:
            return None
        import jax

        from .parallel.distributed import host_any
        od = pts.out_depth
        if jnp.ndim(od) == 0 or np.shape(od)[0] == 0:
            return None
        if not host_any(jnp.asarray(od) >= 0.0):
            return None
        if isinstance(od, jax.Array) and not od.is_fully_addressable:
            # multi-process global array with depths set: gather to every
            # host before the numpy coefficient derivation below
            from jax.experimental import multihost_utils
            od = np.asarray(multihost_utils.process_allgather(od,
                                                              tiled=True))
        else:
            od = np.asarray(od)
        from .grid import depth_interp_coeffs_vec
        idx, w, use = depth_interp_coeffs_vec(self.grid, od)
        return (jnp.asarray(idx), jnp.asarray(w, dtype or jnp.float64),
                jnp.asarray(use))

    def init(self, raw: RawForcing, cal: Calendar, dtype=None,
             pts: Optional[PointParams] = None) -> State:
        date0 = (int(cal.year[0]), int(cal.month[0]), int(cal.day[0]))
        depth = self.depth_arrays(pts, dtype) if pts is not None else None
        didx, dw, duse = depth if depth is not None else (
            self.cfg.depth_idx, self.cfg.depth_w, self.cfg.use_depth)
        return init_state(self.settings, self.params, self.grid,
                          raw.tair[..., 0], raw.vz[..., 0], raw.rhz[..., 0],
                          raw.tsurf_obs[..., 0], date0,
                          depth_idx=didx, depth_w=dw,
                          use_depth=duse, dtype=dtype)

    def run(self, raw: RawForcing, pts: PointParams, cal: Calendar,
            collect: bool = True):
        """Uncoupled batched simulation (use_coupling handled by
        roadsurf_tpu.coupling.run_coupled)."""
        prep = self.prepare(raw, pts, cal)
        state = self.init(raw, cal, dtype=prep.tair.dtype, pts=pts)
        ones = jnp.ones(prep.tair.shape, prep.tair.dtype)
        depth = self.depth_arrays(pts, prep.tair.dtype)
        return scan_steps(state, prep, ones, ones, pts.coupling_tsurf,
                          self.cfg, self.grid, self.params, collect=collect,
                          depth=depth)

    def run_coupled(self, raw: RawForcing, pts: PointParams, cal: Calendar,
                    out_stride: int = 1):
        """Full simulation with observation coupling (per-point-PC engine;
        see roadsurf_tpu.coupling)."""
        from .coupling import run_coupled
        prep = self.prepare(raw, pts, cal)
        state = self.init(raw, cal, dtype=prep.tair.dtype, pts=pts)
        depth = self.depth_arrays(pts, prep.tair.dtype)
        return run_coupled(state, prep, pts, self.settings, self.cfg,
                           self.grid, self.params, out_stride=out_stride,
                           depth=depth)
