"""Model state and per-point parameters as batched pytrees.

The reference scatters per-point state across 16 Fortran derived types
(src/RoadSurfVariables.f90); the prognostic subset -- exactly what the
coupling snapshot saves/restores (src/Coupling.f90:172-255) plus the
boundary-layer warm start -- becomes one struct-of-arrays pytree batched over
points.  Everything else in the reference's types is either static
configuration (config.py / grid.py) or per-step temporaries.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .config import ModelSettings, PhysicsParams, MISSING
from .grid import LayerGrid, day_of_year
from .physics.boundary_layer import bl_cond_and_le
from .physics.soil import surface_average


class State(NamedTuple):
    """Prognostic per-point state; all leaves shaped [...] (batch) except
    ``tmp``: [..., nlayers+2] with node 0 = air, node N+1 = climatology."""
    tmp: jnp.ndarray
    tsurf_ave: jnp.ndarray
    wat: jnp.ndarray        #: SrfWatmms
    snow: jnp.ndarray       #: SrfSnowmms
    ice: jnp.ndarray        #: SrfIcemms
    ice2: jnp.ndarray       #: SrfIce2mms
    dep: jnp.ndarray        #: SrfDepmms
    q2melt: jnp.ndarray
    t4melt: jnp.ndarray
    very_cold: jnp.ndarray  #: bool
    evap: jnp.ndarray       #: EvapmmTS
    blcond: jnp.ndarray     #: boundary-layer conductance warm start
    albedo: jnp.ndarray
    failed: jnp.ndarray     #: bool, per-point failure containment


class PointParams(NamedTuple):
    """Per-point static inputs (the reference's LocalParameters,
    src/LocalParameters.f90.inc)."""
    lat: jnp.ndarray
    lon: jnp.ndarray
    sky_view: jnp.ndarray          #: 1.0 disables modification
    horizons: jnp.ndarray          #: [..., 360]
    init_len: jnp.ndarray          #: InitLenI, 1-based step count, int32
    tair_relax: jnp.ndarray
    vz_relax: jnp.ndarray
    rh_relax: jnp.ndarray
    coupling_start: jnp.ndarray    #: 1-based window start step, int32
    coupling_end: jnp.ndarray      #: 1-based window end step (obs index), int32
    coupling_tsurf: jnp.ndarray    #: observed Tsurf for coupling / melting guard
    out_depth: jnp.ndarray         #: per-point output depth m (ex2
                                   #: modelInput%%depth); -9999.9 = use
                                   #: (T1+T2)/2 unless a global depth is set


def default_point_params(nposts: int, lat=60.2, lon=24.9,
                         init_len: int = 1) -> PointParams:
    f = lambda v: np.full((nposts,), v, dtype=np.float64)
    i = lambda v: np.full((nposts,), v, dtype=np.int32)
    return PointParams(
        lat=f(lat), lon=f(lon), sky_view=f(1.0),
        horizons=np.zeros((nposts, 360), dtype=np.float64),
        init_len=i(init_len),
        tair_relax=f(MISSING), vz_relax=f(MISSING), rh_relax=f(MISSING),
        coupling_start=i(-99), coupling_end=i(-99), coupling_tsurf=f(MISSING),
        out_depth=f(MISSING),
    )


def init_profile(tair0, tsurf_obs0, julday, grid: LayerGrid,
                 p: PhysicsParams, dtype=None):
    """Initial temperature profile (initTemp, src/Initialization.f90:238-287).

    tair0/tsurf_obs0: [...] batch; returns [..., N+2].
    """
    tair0 = jnp.asarray(tair0, dtype=dtype)
    tsurf_obs0 = jnp.asarray(tsurf_obs0, dtype=dtype)
    n = grid.nlayers
    z = jnp.asarray(grid.zdepth, dtype=tair0.dtype)

    top = jnp.where(tsurf_obs0 > -100.0, tsurf_obs0, tair0)
    # bottom node: climatological sinusoid (:266-268)
    t_bot = p.t_clim_g + p.az * jnp.sin(
        p.omega * julday + p.omega * (-170.0) - z[n] / p.damp_depth)
    t_bot = jnp.broadcast_to(t_bot, top.shape)

    # layers 5..N: linear blend in depth between layer 4 and the bottom node
    # (:272-276).  z index k (0-based) = ZDpth(k+1) (1-based).
    layers = [top, top, top, top]                       # layers 1..4
    z4 = z[3]
    zbot = z[n]
    for k in range(5, n + 1):
        frac = (z[k - 1] - z4) / (zbot - z4)
        layers.append(top + (t_bot - top) * frac)
    prof = jnp.stack([tair0] + layers + [t_bot], axis=-1)
    return prof


def init_state(settings: ModelSettings, p: PhysicsParams, grid: LayerGrid,
               tair0, vz0, rhz0, tsurf_obs0, date0, depth_idx=1,
               depth_w=0.0, use_depth: bool = False, dtype=None) -> State:
    """Build the initial state (Initialization.f90 semantics).

    date0: (year, month, day) ints of the first simulation step.
    tair0/vz0/rhz0/tsurf_obs0: [...] batched first-step forcing values.
    """
    julday = day_of_year(*date0)
    tmp = init_profile(tair0, tsurf_obs0, julday, grid, p, dtype=dtype)
    tsurf_ave = surface_average(tmp, depth_idx, depth_w, use_depth)
    zeros = jnp.zeros_like(tsurf_ave)

    # first boundary-layer evaluation (Initialization.f90:119-139): wind
    # floored at 0.4, conductance cold-started from the sentinel.
    vz0c = jnp.maximum(jnp.asarray(vz0, dtype=tmp.dtype), 0.4)
    bl = bl_cond_and_le(
        jnp.full_like(tsurf_ave, -99.9), tsurf_ave, zeros, settings.dt,
        zeros, jnp.asarray(tair0, tmp.dtype), vz0c,
        jnp.asarray(rhz0, tmp.dtype), p)

    return State(
        tmp=tmp,
        tsurf_ave=tsurf_ave,
        wat=zeros, snow=zeros, ice=zeros, ice2=zeros, dep=zeros,
        q2melt=zeros,
        t4melt=jnp.full_like(zeros, p.t4melt_normal),
        very_cold=jnp.zeros_like(zeros, dtype=bool),
        evap=bl.evap,
        blcond=bl.blcond,
        albedo=jnp.full_like(zeros, p.albedo),
        failed=jnp.zeros_like(zeros, dtype=bool),
    )
