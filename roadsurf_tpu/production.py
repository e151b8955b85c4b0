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
 * coupled runs (src/Coupling.f90) run the same streamed kernel up to the
   coupling window, execute the window with the iteration-major masked-scan
   engine (coupling.run_window_passes) in ONE device dispatch, then stream
   the remainder with the decayed radiation coefficients folded into the
   kernel's sw_cof/lw_cof forcing channels (forcing.cof_window).

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
from .forcing import (Calendar, Prepared, RawForcing, cof_window,
                      prepare_window, relax_anchors)
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


def auto_chunk_t(n_points: int, inner_chunk_t: int = 8,
                 target_point_steps: int = 64 * 1048576,
                 max_chunk: int = 1024) -> int:
    """Streaming chunk length sized so each chunk dispatch carries enough
    compute to amortize the host dispatch round trip (~50 ms on the remote
    tunnel).  chunk_t * P is held near 64 steps x 1M points, the measured
    sweet spot (~65 ms of kernel work; two such forcing chunks = 8.6 GB HBM,
    the feasible double-buffer budget); small point counts stream longer
    chunks, 1M+ points stay at 64."""
    tc = max(64, target_point_steps // max(n_points, 1))
    tc = min(max_chunk, tc)
    return (tc // inner_chunk_t) * inner_chunk_t


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
        # one extra chunk of tail padding: phase boundaries of the coupled
        # driver start chunks at non-aligned offsets, so a window may overhang
        # T by up to chunk_t - 1 rows (masked off by the kernel's nsteps)
        t_pad = (-(-T // chunk_t) + 1) * chunk_t
        self.t_pad = t_pad
        rep = NamedSharding(mesh, P())
        shp = NamedSharding(mesh, P(POINTS))

        def put(x, dt):
            # stations-MAJOR [S, T_pad]: the per-chunk expansion then gathers
            # whole station rows (contiguous time slices) instead of scalar
            # elements along the minor axis -- minor-axis gathers serialize
            # on the TPU scalar core (~0.5 s per 1M-point chunk measured)
            x = _pad_tail(np.asarray(x), t_pad, axis=1)     # [S, T_pad]
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

    @staticmethod
    def window_from(channels: RawForcing, ok, st_idx, t0, tc: int
                    ) -> RawForcing:
        """[Tc, P] raw forcing for global steps [t0, t0+tc) from explicit
        arrays.  channels/ok/st_idx MUST be traced jit arguments, never
        closures -- closed-over arrays are baked into the HLO as constants,
        and at production station counts that overflows compile-request
        limits (hundreds of MB)."""
        def expand(ch, name):
            sl = jax.lax.dynamic_slice_in_dim(ch, t0, tc, axis=1)  # [S, Tc]
            v = jnp.take(sl, st_idx, axis=0)                       # [P, Tc]
            miss = -9999 if name == "prec_phase" else jnp.asarray(
                MISSING, v.dtype)
            return jnp.where(ok[:, None], v, miss).T               # [Tc, P]
        return RawForcing(*(expand(getattr(channels, n), n)
                            for n in RawForcing._fields))

    def raw_window(self, t0, tc: int) -> RawForcing:
        """[Tc, P] raw forcing for global steps [t0, t0+tc); called inside
        the chunk jit with traced t0."""
        return self.window_from(self.channels, self.ok, self.st_idx, t0, tc)


class ProductionResult(NamedTuple):
    state: State                 #: final prognostic state, [P] (unpadded)
    out_steps: np.ndarray        #: [n_out] global 0-based step indices
    fields: dict                 #: name -> [n_out, P] numpy
    point_steps_per_s: float     #: sustained streaming rate (real points)


class _Engine:
    """Device placement + chunk-fn compilation + range streaming shared by
    the uncoupled and coupled production drivers."""

    def __init__(self, model: Model, expander, pts: PointParams,
                 cal: Calendar, state: State, *, anchors=None, mesh=None,
                 chunk_t: int = 64, out_stride: Optional[int] = None,
                 interpret: Optional[bool] = None, bl_iters: int = 40,
                 inner_chunk_t: int = 8, tile_p: Optional[int] = None,
                 metrics: Optional[RunMetrics] = None):
        settings, params, cfg, grid = (model.settings, model.params,
                                       model.cfg, model.grid)
        self.model = model
        self.expander = expander
        self.settings, self.params, self.cfg, self.grid = (settings, params,
                                                           cfg, grid)
        self.T = settings.sim_len
        self.mesh = mesh or make_mesh()
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        self.os_ = int(out_stride or settings.output_stride)
        self.metrics = metrics or RunMetrics()
        self.chunk_t = chunk_t
        self.inner_chunk_t = inner_chunk_t
        self.tile_p = tile_p
        self.bl_iters = bl_iters
        assert chunk_t % inner_chunk_t == 0, (chunk_t, inner_chunk_t)

        if cfg.use_depth is False and np.any(np.asarray(pts.out_depth) >= 0.0):
            raise ValueError(
                "per-point out_depth is not supported by the fused kernel; "
                "use the scan engine (runner --engine scan) or set the "
                "global model.tsurfOutputDepth")

        mesh_ = self.mesh
        self.n_real = int(np.asarray(pts.lat).shape[0])
        self.P_pad = padded_points(self.n_real, mesh_)
        assert expander.num_points == self.P_pad, (
            f"expander built for {expander.num_points} points, need "
            f"{self.P_pad}")

        with self.metrics.phase("setup"):
            dtype = expander.dtype
            self.dtype = dtype
            skyview_active = ((np.asarray(pts.sky_view) < 1.0)
                              & (np.asarray(pts.sky_view) > -0.01))
            self.enable_sky = bool(skyview_active.any())

            shp = NamedSharding(mesh_, P(POINTS))
            sh2 = NamedSharding(mesh_, P(POINTS, None))
            rep = NamedSharding(mesh_, P())

            def put_pts(x, spec, dt=None):
                x = _pad_tail(np.asarray(x), self.P_pad, axis=0)
                if dt is not None:
                    x = x.astype(dt)
                return jax.device_put(x, spec)

            fdt = np.float32 if dtype == jnp.float32 else np.float64
            self.pts_dev = PointParams(
                lat=put_pts(pts.lat, shp, fdt),
                lon=put_pts(pts.lon, shp, fdt),
                sky_view=put_pts(pts.sky_view, shp, fdt),
                horizons=(put_pts(pts.horizons, sh2, fdt) if self.enable_sky
                          else jax.device_put(
                              np.zeros((self.P_pad, 1), fdt), sh2)),
                init_len=put_pts(pts.init_len, shp, np.int32),
                tair_relax=put_pts(pts.tair_relax, shp, fdt),
                vz_relax=put_pts(pts.vz_relax, shp, fdt),
                rh_relax=put_pts(pts.rh_relax, shp, fdt),
                coupling_start=put_pts(pts.coupling_start, shp, np.int32),
                coupling_end=put_pts(pts.coupling_end, shp, np.int32),
                coupling_tsurf=put_pts(pts.coupling_tsurf, shp, fdt),
                out_depth=put_pts(pts.out_depth, shp, fdt))
            self.obs_dev = self.pts_dev.coupling_tsurf

            self.anchors_dev = None
            if settings.use_relaxation:
                # anchor series values (X_initEnd, src/Relaxation.f90:10-47)
                # are per-point scalars gathered host-side once
                if anchors is None:
                    raise ValueError(
                        "settings.use_relaxation requires anchors; pass "
                        "anchors=forcing.relax_anchors(...)")
                self.anchors_dev = tuple(
                    jax.device_put(_pad_tail(np.asarray(a, fdt), self.P_pad),
                                   shp)
                    for a in anchors)

            t_pad = expander.t_pad
            self.hour_dev = jax.device_put(
                _pad_tail(np.asarray(cal.hour, np.int32), t_pad), rep)
            self.jde_dev = None
            if self.enable_sky:
                self.jde_dev = jax.device_put(
                    _pad_tail(np.asarray(cal.jde, fdt), t_pad), rep)

            # packed state; padded points marked failed -> frozen at step 0
            state_pad = _pad_state(state, self.P_pad)
            tmp0, scal0 = ps.pack_state(state_pad)
            self.tmp0 = jax.device_put(np.asarray(tmp0), sh_cols(mesh_))
            scal = np.array(scal0)
            scal[ps.R_FAILED, self.n_real:] = 1.0
            self.scal0 = jax.device_put(scal, sh_cols(mesh_))
            # unpack template for phase transitions (coupled driver): only
            # the pytree structure and dtypes matter (unpack_state replaces
            # every leaf), so keep it scalar -- a full-size template would be
            # baked into the phase-B HLO as constants
            self.template = jax.tree.map(
                lambda x: jnp.zeros((), jnp.asarray(x).dtype), state_pad)

        self.fn_cache = {}
        # fixed output-row allocation: the max stride hits any chunk can
        # contain (keeps the jit variant count small: main + ragged chunks)
        self.k_alloc = (chunk_t - 1) // self.os_ + 1

        # every device array the chunk fns consume travels as an EXPLICIT jit
        # argument: closed-over jax.Arrays are lowered as HLO constants, and
        # the station channels alone reach hundreds of MB at production scale
        # -- overflowing compile-request limits (and bloating every cache key)
        self.data = {
            "ch": expander.channels, "ok": expander.ok,
            "sidx": expander.st_idx, "hour": self.hour_dev,
            "jde": self.jde_dev, "pts": self.pts_dev,
            "anchors": self.anchors_dev, "obs": self.obs_dev,
        }
        self.data_shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=x.sharding), self.data)

    # -- chunk functions ----------------------------------------------------

    def chunk_fn(self, nsteps: int, with_cofs: bool):
        """One fused jit per (chunk length, cof mode): expand ->
        prepare_window -> pack -> sharded whole-scan kernel; the kernel
        writes exactly the run-level output-stride rows (traced global
        offset), so each chunk is ONE device dispatch."""
        key = (nsteps, with_cofs)
        if key in self.fn_cache:
            return self.fn_cache[key]
        settings, params, cfg, grid = (self.settings, self.params, self.cfg,
                                       self.grid)
        chunk_t, T = self.chunk_t, self.T
        mesh, enable_sky = self.mesh, self.enable_sky

        def prep_chunk(t0, data):
            rawT = StationExpander.window_from(
                data["ch"], data["ok"], data["sidx"], t0, chunk_t)
            hr = jax.lax.dynamic_slice_in_dim(data["hour"], t0, chunk_t)
            jd = (jax.lax.dynamic_slice_in_dim(data["jde"], t0, chunk_t)
                  if enable_sky else None)
            return prepare_window(
                rawT, data["pts"], hr, settings, params, t_offset=t0,
                t_total=T, anchors=data["anchors"], jde=jd,
                enable_skyview=enable_sky)

        def launch(tmp, scal, forc, t0, nsteps):
            forc = jax.lax.with_sharding_constraint(
                forc, NamedSharding(mesh, P(None, None, POINTS)))
            tmp2, scal2, out = pallas_scan_sharded(
                tmp, scal, forc, cfg, params, grid, mesh,
                out_stride=self.os_, chunk_t=self.inner_chunk_t,
                tile_p=self.tile_p, bl_iters=self.bl_iters,
                interpret=self.interpret, nsteps=nsteps,
                out_offset=t0, n_out=self.k_alloc)
            return tmp2, scal2, out[:, :6]

        if with_cofs:
            @jax.jit
            def fn(tmp, scal, t0, data, sw_corr, lw_corr):
                prep = prep_chunk(t0, data)
                swc, lwc = cof_window(
                    sw_corr, lw_corr, data["pts"].coupling_end, t0, chunk_t,
                    T, settings, jnp.float32)
                forc = ps.pack_forcing(prep, swc, lwc, data["obs"])
                return launch(tmp, scal, forc, t0, nsteps)
        else:
            @jax.jit
            def fn(tmp, scal, t0, data):
                prep = prep_chunk(t0, data)
                ones = jnp.ones(prep.tair.shape, jnp.float32)
                forc = ps.pack_forcing(prep, ones, ones, data["obs"])
                return launch(tmp, scal, forc, t0, nsteps)

        self.fn_cache[key] = fn
        return fn

    def _chunk_grid(self, t_lo: int, t_hi: int):
        n = t_hi - t_lo
        if n <= 0:
            return []
        nchunks = -(-n // self.chunk_t)
        return [(t_lo + k * self.chunk_t,
                 min(self.chunk_t, t_hi - t_lo - k * self.chunk_t))
                for k in range(nchunks)]

    def compile_range(self, t_lo: int, t_hi: int, with_cofs: bool):
        """AOT-compile every chunk variant of a stream range."""
        shapes = [jax.ShapeDtypeStruct(self.tmp0.shape, self.tmp0.dtype,
                                       sharding=self.tmp0.sharding),
                  jax.ShapeDtypeStruct(self.scal0.shape, self.scal0.dtype,
                                       sharding=self.scal0.sharding),
                  jax.ShapeDtypeStruct((), jnp.int32), self.data_shapes]
        if with_cofs:
            corr = jax.ShapeDtypeStruct(
                (self.P_pad,), jnp.float32,
                sharding=NamedSharding(self.mesh, P(POINTS)))
            shapes += [corr, corr]
        for ns in sorted({ns for _, ns in self._chunk_grid(t_lo, t_hi)}):
            self.chunk_fn(ns, with_cofs).lower(*shapes).compile()

    def stream(self, tmp, scal, t_lo: int, t_hi: int, cofs=None,
               progress: Optional[Progress] = None, collected=None):
        """Stream global forcing rows [t_lo, t_hi) through the kernel with
        two-deep pipelined dispatch.  ``cofs``: optional (sw_corr, lw_corr)
        device arrays enabling the decayed-coefficient channels.  Returns
        (tmp, scal, collected) with collected = [(steps, [k, 6, P] np)]."""
        collected = collected if collected is not None else []
        pending = []

        def drain(item):
            steps, probe = item
            if steps:
                collected.append((steps, np.asarray(probe)[:len(steps)]))
            else:
                probe.block_until_ready()   # backpressure without output rows
            if progress:
                progress.update(self.chunk_t)

        for t0, nsteps_c in self._chunk_grid(t_lo, t_hi):
            first_hit = -(-t0 // self.os_) * self.os_
            steps = list(range(first_hit, t0 + nsteps_c, self.os_))
            fn = self.chunk_fn(nsteps_c, cofs is not None)
            args = (tmp, scal, np.int32(t0), self.data) \
                + (tuple(cofs) if cofs else ())
            tmp, scal, rows = fn(*args)
            pending.append((steps, rows if steps else scal))
            if len(pending) > 1:
                drain(pending.pop(0))
        for item in pending:
            drain(item)
        return tmp, scal, collected

    def assemble(self, collected, tmp, scal, wall: float) -> ProductionResult:
        with self.metrics.phase("output"):
            rate = self.n_real * self.T / wall
            self.metrics.count("point_steps_per_s", round(rate, 1))
            self.metrics.count("points", self.n_real)
            self.metrics.count("steps", self.T)
            all_steps = np.concatenate(
                [np.asarray(s, np.int64) for s, _ in collected]) \
                if collected else np.zeros(0, np.int64)
            stacked = (np.concatenate([a for _, a in collected], axis=0)
                       if collected else
                       np.zeros((0, 6, self.P_pad), np.float32))
            order = np.argsort(all_steps)
            all_steps = all_steps[order]
            stacked = stacked[order][:, :, :self.n_real]
            fields = {name: stacked[:, r]
                      for name, r in OUT_FIELD_ROWS.items()}

            final = ps.unpack_state(
                np.asarray(tmp), np.asarray(scal), self.grid.nlayers,
                self.template)
            final = jax.tree.map(
                lambda x: jnp.asarray(np.asarray(x)[:self.n_real]), final)
        return ProductionResult(state=final, out_steps=all_steps,
                                fields=fields, point_steps_per_s=rate)


def run_production(model: Model, expander, pts: PointParams, cal: Calendar,
                   state: State, *, anchors=None, mesh=None,
                   chunk_t: int = 64, out_stride: Optional[int] = None,
                   interpret: Optional[bool] = None, bl_iters: int = 40,
                   inner_chunk_t: int = 8, tile_p: Optional[int] = None,
                   metrics: Optional[RunMetrics] = None,
                   progress: Optional[Progress] = None) -> ProductionResult:
    """Run the full (uncoupled) forecast through the streamed sharded Pallas
    engine.

    pts/state: [P_real] (padded internally to the mesh x LANE multiple; the
    expander must already be built at the padded count).  anchors: the
    per-point relaxation anchor triple (forcing.relax_anchors), required when
    settings.use_relaxation.  Returns outputs at the global ``out_stride``
    cadence (default settings.output_stride).
    """
    eng = _Engine(model, expander, pts, cal, state, anchors=anchors,
                  mesh=mesh, chunk_t=chunk_t, out_stride=out_stride,
                  interpret=interpret, bl_iters=bl_iters,
                  inner_chunk_t=inner_chunk_t, tile_p=tile_p, metrics=metrics)
    with eng.metrics.phase("compile"):
        eng.compile_range(0, eng.T, False)
    with eng.metrics.phase("stream"):
        t_start = timelib.perf_counter()
        tmp, scal, collected = eng.stream(eng.tmp0, eng.scal0, 0, eng.T,
                                          progress=progress)
        scal.block_until_ready()
        wall = timelib.perf_counter() - t_start
    return eng.assemble(collected, tmp, scal, wall)


def run_production_coupled(model: Model, expander, pts: PointParams,
                           cal: Calendar, state: State, *, anchors=None,
                           mesh=None, chunk_t: int = 64,
                           out_stride: Optional[int] = None,
                           interpret: Optional[bool] = None,
                           bl_iters: int = 40, inner_chunk_t: int = 8,
                           tile_p: Optional[int] = None,
                           metrics: Optional[RunMetrics] = None,
                           progress: Optional[Progress] = None,
                           wchunk: Optional[int] = None) -> ProductionResult:
    """Coupled production run: streamed Pallas phases around the
    iteration-major coupling window (coupling.run_window_passes).

    Phase split (1-based steps; ws/we_b from the per-point coupling windows):
      A [1, ws-1]    streamed kernel, coefficients 1
      B [ws, we_b]   ONE jit: unpack -> window passes (first / re-runs /
                     tail) -> repack; forcing expanded on device per chunk
      C [we_b+1, T]  streamed kernel with forcing.cof_window coefficients

    Matches src/Coupling.f90:292-481 semantics via run_window_passes (see
    tests/test_coupling_segmented.py for the engine-level parity chain).
    """
    from .coupling import run_window_passes, window_out_rows

    eng = _Engine(model, expander, pts, cal, state, anchors=anchors,
                  mesh=mesh, chunk_t=chunk_t, out_stride=out_stride,
                  interpret=interpret, bl_iters=bl_iters,
                  inner_chunk_t=inner_chunk_t, tile_p=tile_p, metrics=metrics)
    settings = eng.settings
    T, os_ = eng.T, eng.os_

    start_np = np.asarray(pts.coupling_start)
    end_np = np.asarray(pts.coupling_end)
    coupled_np = (bool(settings.use_coupling) & (end_np >= 1)
                  & (np.asarray(pts.coupling_tsurf) > -100.0))
    have_window = bool(coupled_np.any())
    if have_window:
        ws = max(int(start_np[coupled_np].min()), 1)
        we_b = int(min(end_np[coupled_np].max(), T - 1))
        have_window = ws <= we_b
    if not have_window:
        with eng.metrics.phase("compile"):
            eng.compile_range(0, T, False)
        with eng.metrics.phase("stream"):
            t_start = timelib.perf_counter()
            tmp, scal, col = eng.stream(eng.tmp0, eng.scal0, 0, T,
                                        progress=progress)
            scal.block_until_ready()
            wall = timelib.perf_counter() - t_start
        return eng.assemble(col, tmp, scal, wall)

    W = we_b - ws + 1
    wck = wchunk or min(chunk_t, W)
    rows_b = window_out_rows(ws, we_b, os_)

    @jax.jit
    def phase_b(tmp, scal, data):
        def provider(t0):
            rawT = StationExpander.window_from(
                data["ch"], data["ok"], data["sidx"], t0, wck)
            hr = jax.lax.dynamic_slice_in_dim(data["hour"], t0, wck)
            jd = (jax.lax.dynamic_slice_in_dim(data["jde"], t0, wck)
                  if eng.enable_sky else None)
            return prepare_window(rawT, data["pts"], hr, settings,
                                  eng.params, t_offset=t0, t_total=T,
                                  anchors=data["anchors"], jde=jd,
                                  enable_skyview=eng.enable_sky)

        st = ps.unpack_state(tmp, scal, eng.grid.nlayers, eng.template)
        nv = -(-(W + 1) // wck)
        t0s = ws - 1 + wck * jnp.arange(nv, dtype=jnp.int32)
        vw = jax.lax.map(lambda t0: provider(t0).valid, t0s)
        valid_win = vw.reshape(-1, vw.shape[-1])[:W + 1]
        res = run_window_passes(st, provider, valid_win, ws, we_b,
                                data["pts"], settings, eng.cfg, eng.grid,
                                eng.params, out_stride=os_, wchunk=wck)
        tmp2, scal2 = ps.pack_state(res.state, lpad=tmp.shape[0])
        cst = lambda x: jax.lax.with_sharding_constraint(x, sh_cols(eng.mesh))
        return (cst(tmp2), cst(scal2), res.cv.sw_corr, res.cv.lw_corr,
                jnp.transpose(res.out, (0, 2, 1)).astype(jnp.float32),
                res.reruns)

    with eng.metrics.phase("compile"):
        eng.compile_range(0, ws - 1, False)
        eng.compile_range(we_b, T, True)
        shapes = (jax.ShapeDtypeStruct(eng.tmp0.shape, eng.tmp0.dtype,
                                       sharding=eng.tmp0.sharding),
                  jax.ShapeDtypeStruct(eng.scal0.shape, eng.scal0.dtype,
                                       sharding=eng.scal0.sharding),
                  eng.data_shapes)
        phase_b_c = phase_b.lower(*shapes).compile()

    with eng.metrics.phase("stream"):
        t_start = timelib.perf_counter()
        tmp, scal, col = eng.stream(eng.tmp0, eng.scal0, 0, ws - 1,
                                    progress=progress)
        tmp, scal, sw_corr, lw_corr, out_b, reruns = phase_b_c(
            tmp, scal, eng.data)
        if len(rows_b):
            col.append((list(rows_b), np.asarray(out_b)[:len(rows_b)]))
        if progress:
            progress.update(W)
        tmp, scal, col = eng.stream(tmp, scal, we_b, T,
                                    cofs=(sw_corr, lw_corr),
                                    progress=progress, collected=col)
        scal.block_until_ready()
        wall = timelib.perf_counter() - t_start
    eng.metrics.count("coupling_window_steps", W)
    eng.metrics.count("coupling_reruns", int(reruns))
    return eng.assemble(col, tmp, scal, wall)


def sh_cols(mesh):
    """Sharding for [rows, P]-shaped packed state."""
    return NamedSharding(mesh, P(None, POINTS))


def _pad_state(state: State, n: int) -> State:
    return jax.tree.map(lambda x: jnp.asarray(_pad_tail(np.asarray(x), n)),
                        state)
