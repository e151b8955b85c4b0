"""Production-scale streamed execution: the operational nationwide run.

The reference's operational path is an async thread-pool driver over the full
data plane (examples/example2/src/roadrunner.cpp:595-719).  The TPU-first
re-design here:

 * compact forcing sources (station time series; NWP grids) ship to device
   ONCE, replicated; per-point forcing is expanded chunk by chunk ON DEVICE,
   sharded over the points mesh.  The full [T, P] forcing tensor (~568 GB at
   1M points, SURVEY.md section 6) never exists anywhere -- host, HBM or disk.
 * each streaming chunk is one fused jit: expand -> forcing.prepare_window ->
   pack_forcing -> shard_map'd whole-scan Pallas kernel
   (ops.pallas_step.pallas_scan).  Prognostic state stays on device in packed
   kernel layout between chunks (zero host round trips for state).
 * dispatch is pipelined two deep (block on chunk k-2) to hide the host
   dispatch round trip (see bench_full.py's measurement of the same pattern).
 * outputs are collected in-kernel at the output cadence and drained to host
   incrementally.

This is the engine behind ``runner.py --engine pallas`` and
``bench_production.py``.
"""
from __future__ import annotations

import time as timelib
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .config import MISSING
from .forcing import Calendar, Prepared, RawForcing, prepare_window, relax_anchors
from .model import Model
from .observability import Progress, RunMetrics
from .ops import pallas_step as ps
from .parallel.sharding import POINTS, make_mesh, pallas_scan_sharded
from .state import PointParams, State

OUT_FIELD_ROWS = {"tsurf": ps.R_TSURF, "wat": ps.R_WAT, "snow": ps.R_SNOW,
                  "ice": ps.R_ICE, "ice2": ps.R_ICE2, "dep": ps.R_DEP}


def padded_points(n_points: int, mesh) -> int:
    """Points must divide the mesh and fill whole kernel lanes."""
    mult = int(np.prod(mesh.devices.shape)) * ps.LANE
    return -(-n_points // mult) * mult


def _pad_tail(x: np.ndarray, n: int, axis: int = 0) -> np.ndarray:
    """Edge-pad ``axis`` to length n."""
    x = np.asarray(x)
    rem = n - x.shape[axis]
    if rem <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, rem)
    return np.pad(x, widths, mode="edge")


class StationExpander:
    """On-device station->point forcing expansion.

    The data plane's station-keyed series ([S, T], a few thousand stations)
    replicate to every device; the nearest-station index map (the NearTree
    radius pattern, examples/example2/src/RoadSurfSource.cpp:516-616 /
    io.points.nearest_station_forcing) is sharded over points, so each chunk's
    [Tc, P] raw forcing materializes only as per-device blocks inside the
    chunk jit.
    """

    def __init__(self, raw_st: RawForcing, st_idx, mesh, chunk_t: int,
                 dtype=jnp.float32):
        st_idx = np.asarray(st_idx)
        self.num_points = len(st_idx)
        self.mesh = mesh
        S, T = np.asarray(raw_st.tair).shape
        self.sim_len = T
        t_pad = -(-T // chunk_t) * chunk_t
        rep = NamedSharding(mesh, P())
        shp = NamedSharding(mesh, P(POINTS))

        def put(x, dt):
            x = _pad_tail(np.asarray(x).T, t_pad, axis=0)   # [T_pad, S]
            return jax.device_put(np.asarray(x, dt), rep)

        self.channels = RawForcing(
            *(put(getattr(raw_st, n),
                  np.int32 if n == "prec_phase" else dtype)
              for n in RawForcing._fields))
        ok = st_idx >= 0
        self.ok = jax.device_put(ok, shp)
        self.st_idx = jax.device_put(
            np.where(ok, st_idx, 0).astype(np.int32), shp)
        self.dtype = dtype

    def raw_window(self, t0, tc: int) -> RawForcing:
        """[Tc, P] raw forcing for global steps [t0, t0+tc); called inside
        the chunk jit with traced t0."""
        def expand(ch, name):
            sl = jax.lax.dynamic_slice_in_dim(ch, t0, tc, axis=0)  # [Tc, S]
            v = jnp.take(sl, self.st_idx, axis=1)                  # [Tc, P]
            miss = -9999 if name == "prec_phase" else jnp.asarray(
                MISSING, v.dtype)
            return jnp.where(self.ok[None, :], v, miss)
        return RawForcing(*(expand(getattr(self.channels, n), n)
                            for n in RawForcing._fields))


class ProductionResult(NamedTuple):
    state: State                 #: final prognostic state, [P] (unpadded)
    out_steps: np.ndarray        #: [n_out] global 0-based step indices
    fields: dict                 #: name -> [n_out, P] numpy
    point_steps_per_s: float     #: sustained streaming rate (real points)


def run_production(model: Model, expander, pts: PointParams, cal: Calendar,
                   state: State, *, anchors=None, mesh=None,
                   chunk_t: int = 64, out_stride: Optional[int] = None,
                   interpret: Optional[bool] = None, bl_iters: int = 40,
                   inner_chunk_t: int = 8, tile_p: Optional[int] = None,
                   metrics: Optional[RunMetrics] = None,
                   progress: Optional[Progress] = None) -> ProductionResult:
    """Run the full forecast through the streamed sharded Pallas engine.

    pts/state: [P_real] (padded internally to the mesh x LANE multiple; the
    expander must already be built at the padded count).  anchors: the
    per-point relaxation anchor triple (forcing.relax_anchors), required when
    settings.use_relaxation.  Returns outputs at the global ``out_stride``
    cadence (default settings.output_stride).
    """
    settings, params, cfg, grid = (model.settings, model.params, model.cfg,
                                   model.grid)
    T = settings.sim_len
    mesh = mesh or make_mesh()
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    os_ = int(out_stride or settings.output_stride)
    metrics = metrics or RunMetrics()

    if cfg.use_depth is False and np.any(np.asarray(pts.out_depth) >= 0.0):
        raise ValueError(
            "per-point out_depth is not supported by the fused kernel; use "
            "the scan engine (runner --engine scan) or set the global "
            "model.tsurfOutputDepth")

    n_real = int(np.asarray(pts.lat).shape[0])
    P_pad = padded_points(n_real, mesh)
    assert expander.num_points == P_pad, (
        f"expander built for {expander.num_points} points, need {P_pad}")
    nchunks = -(-T // chunk_t)
    assert chunk_t % inner_chunk_t == 0, (chunk_t, inner_chunk_t)

    with metrics.phase("setup"):
        dtype = expander.dtype
        skyview_active = ((np.asarray(pts.sky_view) < 1.0)
                          & (np.asarray(pts.sky_view) > -0.01))
        enable_sky = bool(skyview_active.any())

        shp = NamedSharding(mesh, P(POINTS))
        sh2 = NamedSharding(mesh, P(POINTS, None))
        rep = NamedSharding(mesh, P())

        def put_pts(x, spec, dt=None):
            x = _pad_tail(np.asarray(x), P_pad, axis=0)
            if dt is not None:
                x = x.astype(dt)
            return jax.device_put(x, spec)

        fdt = np.float32 if dtype == jnp.float32 else np.float64
        pts_dev = PointParams(
            lat=put_pts(pts.lat, shp, fdt), lon=put_pts(pts.lon, shp, fdt),
            sky_view=put_pts(pts.sky_view, shp, fdt),
            horizons=(put_pts(pts.horizons, sh2, fdt) if enable_sky else
                      jax.device_put(np.zeros((P_pad, 1), fdt), sh2)),
            init_len=put_pts(pts.init_len, shp, np.int32),
            tair_relax=put_pts(pts.tair_relax, shp, fdt),
            vz_relax=put_pts(pts.vz_relax, shp, fdt),
            rh_relax=put_pts(pts.rh_relax, shp, fdt),
            coupling_start=put_pts(pts.coupling_start, shp, np.int32),
            coupling_end=put_pts(pts.coupling_end, shp, np.int32),
            coupling_tsurf=put_pts(pts.coupling_tsurf, shp, fdt),
            out_depth=put_pts(pts.out_depth, shp, fdt))
        obs_dev = pts_dev.coupling_tsurf

        anchors_dev = None
        if settings.use_relaxation:
            # anchor series values (X_initEnd, src/Relaxation.f90:10-47) are
            # per-point scalars gathered host-side once
            if anchors is None:
                raise ValueError(
                    "settings.use_relaxation requires anchors; pass "
                    "run_production(..., anchors=forcing.relax_anchors(...))")
            anchors_dev = tuple(
                jax.device_put(_pad_tail(np.asarray(a, fdt), P_pad), shp)
                for a in anchors)

        t_pad = nchunks * chunk_t
        hour_dev = jax.device_put(
            _pad_tail(np.asarray(cal.hour, np.int32), t_pad), rep)
        jde_dev = None
        if enable_sky:
            jde_dev = jax.device_put(
                _pad_tail(np.asarray(cal.jde, fdt), t_pad), rep)

        # packed state; padded points marked failed so they freeze at step 0
        tmp0, scal0 = ps.pack_state(_pad_state(state, P_pad))
        tmp0 = jax.device_put(np.asarray(tmp0), sh_cols(mesh))
        scal = np.array(scal0)
        scal[ps.R_FAILED, n_real:] = 1.0
        scal0 = jax.device_put(scal, sh_cols(mesh))

    fn_cache = {}
    # fixed output-row allocation: the max stride hits any chunk can contain
    # (keeps the jit variant count at <= 2: main + ragged last chunk)
    k_alloc = (chunk_t - 1) // os_ + 1

    def get_chunk_fn(nsteps: int):
        """One fused jit per chunk length: expand -> prepare_window -> pack
        -> sharded whole-scan kernel; the kernel writes exactly the
        run-level output-stride rows (traced global offset), so each chunk
        is ONE device dispatch."""
        key = nsteps
        if key in fn_cache:
            return fn_cache[key]

        @jax.jit
        def chunk_fn(tmp, scal, t0):
            rawT = expander.raw_window(t0, chunk_t)
            hr = jax.lax.dynamic_slice_in_dim(hour_dev, t0, chunk_t)
            jd = (jax.lax.dynamic_slice_in_dim(jde_dev, t0, chunk_t)
                  if enable_sky else None)
            prep = prepare_window(
                rawT, pts_dev, hr, settings, params, t_offset=t0, t_total=T,
                anchors=anchors_dev, jde=jd, enable_skyview=enable_sky)
            ones = jnp.ones(prep.tair.shape, jnp.float32)
            forc = ps.pack_forcing(prep, ones, ones, obs_dev)
            forc = jax.lax.with_sharding_constraint(
                forc, NamedSharding(mesh, P(None, None, POINTS)))
            tmp2, scal2, out = pallas_scan_sharded(
                tmp, scal, forc, cfg, params, grid, mesh, out_stride=os_,
                chunk_t=inner_chunk_t, tile_p=tile_p, bl_iters=bl_iters,
                interpret=interpret, nsteps=nsteps,
                out_offset=t0, n_out=k_alloc)
            return tmp2, scal2, out[:, :6]

        fn_cache[key] = chunk_fn
        return chunk_fn

    last_steps = T - (nchunks - 1) * chunk_t
    with metrics.phase("compile"):
        # AOT-compile every chunk variant before the timed stream
        shapes = (jax.ShapeDtypeStruct(tmp0.shape, tmp0.dtype,
                                       sharding=tmp0.sharding),
                  jax.ShapeDtypeStruct(scal0.shape, scal0.dtype,
                                       sharding=scal0.sharding),
                  jax.ShapeDtypeStruct((), jnp.int32))
        for ns in sorted({chunk_t, last_steps}):
            get_chunk_fn(ns).lower(*shapes).compile()

    tmp, scal = tmp0, scal0
    pending = []
    collected = []          # (global_steps list, host array [k, 6, P]) pairs

    def drain(item):
        steps, probe = item
        if steps:
            collected.append((steps, np.asarray(probe)[:len(steps)]))
        else:
            probe.block_until_ready()   # backpressure even with no output row
        if progress:
            progress.update(chunk_t)

    import os as _os
    debug = _os.environ.get("ROADSURF_PROD_DEBUG")

    with metrics.phase("stream"):
        t_start = timelib.perf_counter()
        for k in range(nchunks):
            t0 = k * chunk_t
            nsteps_c = min(chunk_t, T - t0)
            first_hit = -(-t0 // os_) * os_
            steps = list(range(first_hit, t0 + nsteps_c, os_))
            td0 = timelib.perf_counter()
            fn = get_chunk_fn(nsteps_c)
            td1 = timelib.perf_counter()
            tmp, scal, rows = fn(tmp, scal, np.int32(t0))
            td2 = timelib.perf_counter()
            pending.append((steps, rows if steps else scal))
            if len(pending) > 1:
                drain(pending.pop(0))
            if debug:
                td3 = timelib.perf_counter()
                print(f"chunk {k}: compile/lookup {td1-td0:.3f}s "
                      f"dispatch {td2-td1:.3f}s drain {td3-td2:.3f}s",
                      file=__import__('sys').stderr)
        for item in pending:
            drain(item)
        scal.block_until_ready()
        wall = timelib.perf_counter() - t_start

    with metrics.phase("output"):
        rate = n_real * T / wall
        metrics.count("point_steps_per_s", round(rate, 1))
        metrics.count("points", n_real)
        metrics.count("steps", T)
        all_steps = np.concatenate(
            [np.asarray(s, np.int64) for s, _ in collected]) \
            if collected else np.zeros(0, np.int64)
        stacked = (np.concatenate([a for _, a in collected], axis=0)
                   if collected else np.zeros((0, 6, P_pad), np.float32))
        order = np.argsort(all_steps)
        all_steps = all_steps[order]
        stacked = stacked[order][:, :, :n_real]
        fields = {name: stacked[:, r] for name, r in OUT_FIELD_ROWS.items()}

        final = ps.unpack_state(
            np.asarray(tmp), np.asarray(scal), grid.nlayers,
            jax.tree.map(jnp.asarray, state))
        final = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[:n_real]),
                             final)
    return ProductionResult(state=final, out_steps=all_steps, fields=fields,
                            point_steps_per_s=rate)


def sh_cols(mesh):
    """Sharding for [rows, P]-shaped packed state."""
    return NamedSharding(mesh, P(None, POINTS))


def _pad_state(state: State, n: int) -> State:
    return jax.tree.map(lambda x: jnp.asarray(_pad_tail(np.asarray(x), n)),
                        state)
