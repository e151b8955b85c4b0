"""Benchmark: point-timesteps/s on one TPU chip at ~1M road points.

Metric defined by BASELINE.md (the reference publishes no numbers; the
workload is 8,881 steps x N points, float64 on CPU threads).  We measure the
steady-state throughput of the batched forecast scan in float32 on the real
chip, streaming forcing in time chunks like a production run would.

vs_baseline: ratio against a MEASURED CPU-node throughput.  The reference
repo ships no numbers (BASELINE.md), so the denominator is this repo's own
scan engine -- full physics, identical numerics -- run on the host CPU
backend: 1.976e6 point-steps/s/core measured by tools/bench_cpu_baseline.py
(8192 points x 2961 steps, float32, best of 3), scaled to the 48-core node
the reference's WorkQueue targets (examples/example1/src/WorkQueue.h:15-131)
= 9.49e7 point-steps/s/node.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# measured: tools/bench_cpu_baseline.py (see BASELINE.md "Measured" table)
CPU_POINT_STEPS_PER_S_PER_CORE = 1.976e6
BASELINE_NODE_CORES = 48
BASELINE_POINT_STEPS_PER_S = CPU_POINT_STEPS_PER_S_PER_CORE * BASELINE_NODE_CORES


def main():
    import jax
    import jax.numpy as jnp

    from roadsurf_tpu.config import ModelSettings
    from roadsurf_tpu.forcing import Calendar
    from roadsurf_tpu.io.synthetic import synthetic_raw
    from roadsurf_tpu.model import Model, scan_steps
    from roadsurf_tpu.state import default_point_params

    npoints = int(os.environ.get("BENCH_POINTS", 1 << 20))
    t_chunk = int(os.environ.get("BENCH_TCHUNK", 64))
    n_chunks = int(os.environ.get("BENCH_CHUNKS", 4))
    backend = jax.default_backend()

    settings = ModelSettings(sim_len=t_chunk, dt=30.0)
    model = Model(settings)

    # one representative forcing chunk; identical cost to fresh chunks
    # (branch-free physics -- no data-dependent work), so reuse is fair.
    # Host builds a small chunk; tiling to full width and the initial state
    # construction (incl. the eager boundary-layer fixed point) run inside
    # one jit so remote dispatch overhead stays O(1).
    small = min(npoints, 4096)
    raw, cal = synthetic_raw(small, t_chunk, dt=30.0, seed=0,
                             dtype=np.float32)
    pts = default_point_params(small)
    prep_small = model.prepare(raw, pts, cal)
    reps = -(-npoints // small)
    row0 = jnp.stack([jnp.asarray(np.asarray(x)[:, 0], np.float32)
                      for x in (raw.tair, raw.vz, raw.rhz, raw.tsurf_obs)])
    date0 = (int(cal.year[0]), int(cal.month[0]), int(cal.day[0]))

    @jax.jit
    def build(prep_small, row0):
        def widen(x):
            if x.ndim == 2:
                return jnp.tile(x, (1, reps))[:, :npoints]
            return x
        prep = jax.tree.map(widen, prep_small)
        wide0 = jnp.tile(row0, (1, reps))[:, :npoints]
        from roadsurf_tpu.state import init_state
        state = init_state(model.settings, model.params, model.grid,
                           wide0[0], wide0[1], wide0[2], wide0[3], date0,
                           depth_idx=model.cfg.depth_idx,
                           depth_w=model.cfg.depth_w,
                           use_depth=model.cfg.use_depth)
        return prep, state

    prep, state = build(prep_small, row0)
    jax.block_until_ready(state)
    ones = jnp.ones(prep.tair.shape, prep.tair.dtype)
    obs = jnp.full((npoints,), -9999.9, prep.tair.dtype)

    @jax.jit
    def chunk(state, prep, sw, lw):
        final, _ = scan_steps(state, prep, sw, lw, obs, model.cfg,
                              model.grid, model.params, collect=False)
        return final

    # warmup/compile
    state2 = chunk(state, prep, ones, ones)
    jax.block_until_ready(state2)

    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state2 = chunk(state2, prep, ones, ones)
    jax.block_until_ready(state2)
    scan_dt = time.perf_counter() - t0
    scan_rate = npoints * t_chunk * n_chunks / scan_dt

    # ---- Pallas fused whole-scan kernel (the flagship engine) -----------
    from roadsurf_tpu.ops import pallas_step as ps
    pallas_rate = None
    if backend == "tpu" and npoints % ps.TILE_P == 0:
        tmp0, scal0 = ps.pack_state(state)
        forc = ps.pack_forcing(prep, ones, ones, obs)
        stride = t_chunk  # one output row per chunk (production cadence)
        pal = jax.jit(lambda t, s, f: ps.pallas_scan(
            t, s, f, model.cfg, model.params, model.grid,
            out_stride=stride, chunk_t=min(8, t_chunk)))
        r = pal(tmp0, scal0, forc)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            r = pal(tmp0, scal0, forc)
        jax.block_until_ready(r)
        pal_dt = time.perf_counter() - t0
        pallas_rate = npoints * t_chunk * n_chunks / pal_dt

    # ---- fused production chunk: the operational rate WITH all forcing
    # production on device (station-level prep + one-hot MXU expansion +
    # kernel in one jit per chunk; production.StationExpander fused path)
    fused_rate = None
    if backend == "tpu" and npoints % ps.TILE_P == 0:
        try:
            from roadsurf_tpu import production
            from roadsurf_tpu.parallel.sharding import make_mesh

            S = 2048
            T2 = 8 * t_chunk + 1
            raw_st, cal2 = synthetic_raw(S, T2, dt=30.0, seed=7,
                                         scenario="winter_mix",
                                         dtype=np.float32)
            mesh = make_mesh()
            rng = np.random.default_rng(7)
            st_idx = rng.integers(0, S, size=npoints)
            settings2 = ModelSettings(sim_len=T2, dt=30.0,
                                      use_relaxation=False)
            model2 = Model(settings2)
            ctx = {"st_pts": default_point_params(S + 1), "anchors": None,
                   "settings": settings2, "params": model2.params,
                   "hour": cal2.hour, "t_total": T2}
            exp = production.StationExpander(raw_st, st_idx, mesh,
                                             chunk_t=t_chunk, prep_ctx=ctx)
            eng = production._Engine(model2, exp,
                                     default_point_params(npoints), cal2,
                                     state, mesh=mesh, chunk_t=t_chunk)
            fn = eng.chunk_fn(t_chunk, False)
            tmp, scal = eng.tmp0, eng.scal0
            tmp, scal, _ = fn(tmp, scal, np.int32(0), eng.data)
            jax.block_until_ready(scal)
            t0 = time.perf_counter()
            for k in range(n_chunks):
                tmp, scal, _ = fn(tmp, scal, np.int32((k % 8) * t_chunk),
                                  eng.data)
            jax.block_until_ready(scal)
            fdt_ = time.perf_counter() - t0
            fused_rate = npoints * t_chunk * n_chunks / fdt_
        except Exception as e:  # keep the headline alive on bench-rig quirks
            print(f"fused-chunk stage skipped: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # ---- fused-generic GRID production chunk: the reference's operational
    # forcing source (NWP grid), device-extracted + interpolated + prepped
    # in the kernel's tile-major layout (round 5)
    grid_rate = None
    if backend == "tpu" and npoints % ps.TILE_P == 0:
        try:
            from roadsurf_tpu import production
            from roadsurf_tpu.parallel.sharding import make_mesh

            T2 = 8 * t_chunk + 1
            t0e = 1575158400
            sim_ep = t0e + (30.0 * np.arange(T2)).astype(np.int64)
            gt = t0e + 3600 * np.arange(1 + int(T2 * 30.0 // 3600) + 1,
                                        dtype=np.int64)
            rng = np.random.default_rng(11)
            ny, nx = 300, 400
            gla = np.linspace(59.6, 70.1, ny)
            glo = np.linspace(20.5, 31.6, nx)
            R = len(gt)
            gf = {n: rng.normal(0.0 if n in ("prec", "sw") else -3.0, 2.0,
                                (R, ny, nx))
                  for n in ("tair", "tdew", "rhz", "vz", "prec", "sw",
                            "lw")}
            gf["rhz"] = np.abs(gf["rhz"]) + 60.0
            gf["vz"] = np.abs(gf["vz"]) + 1.0
            gf["prec"] = np.abs(gf["prec"])
            gf["sw"] = np.abs(gf["sw"])
            gf["lw"] = 280.0 + gf["lw"]
            plat = rng.uniform(59.6, 70.1, npoints)
            plon = rng.uniform(20.5, 31.6, npoints)
            mesh = make_mesh()
            gexp = production.GridExpander(gt, gla, glo, gf, plat, plon,
                                           sim_ep, mesh, chunk_t=t_chunk)
            cal3 = Calendar.from_epochs(sim_ep)
            settings3 = ModelSettings(sim_len=T2, dt=30.0,
                                      use_relaxation=False)
            model3 = Model(settings3)
            geng = production._Engine(model3, gexp,
                                      default_point_params(npoints), cal3,
                                      state, mesh=mesh, chunk_t=t_chunk)
            assert geng.fused_generic
            gfn = geng.chunk_fn(t_chunk, False)
            tmp, scal = geng.tmp0, geng.scal0
            tmp, scal, _ = gfn(tmp, scal, np.int32(0), geng.data)
            jax.block_until_ready(scal)
            t0 = time.perf_counter()
            for k in range(n_chunks):
                tmp, scal, _ = gfn(tmp, scal, np.int32((k % 8) * t_chunk),
                                   geng.data)
            jax.block_until_ready(scal)
            grid_rate = npoints * t_chunk * n_chunks / (
                time.perf_counter() - t0)
        except Exception as e:  # keep the headline alive on rig quirks
            print(f"grid-chunk stage skipped: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # headline = best sustained rate across engines; the fused production
    # chunk legitimately exceeds the point-major kernel-only stage because
    # its tile-major slim forcing layout also speeds up the kernel's DMA
    rate = max(scan_rate, pallas_rate or 0.0, fused_rate or 0.0)
    print(json.dumps({
        "metric": "point_timesteps_per_s_per_chip",
        "value": round(rate, 1),
        "unit": "point-steps/s",
        "vs_baseline": round(rate / BASELINE_POINT_STEPS_PER_S, 3),
        "detail": {"npoints": npoints, "t_chunk": t_chunk,
                   "n_chunks": n_chunks, "backend": backend,
                   "dtype": "float32",
                   "scan_rate": round(scan_rate, 1),
                   "pallas_rate": (round(pallas_rate, 1)
                                   if pallas_rate else None),
                   "fused_production_chunk_rate": (
                       round(fused_rate, 1) if fused_rate else None),
                   "grid_production_chunk_rate": (
                       round(grid_rate, 1) if grid_rate else None)},
    }))


if __name__ == "__main__":
    main()
