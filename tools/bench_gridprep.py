"""Bisect the fused-generic grid-chunk prep cost on the real TPU.

The round-5 fused-generic grid chunk measured 104.2 ms (kernel-only 58.1,
prep 68.1 checksum) -- the tile-major interp+prep chain costs ~46 ms of
marginal time, far above its ~3 GB theoretical traffic.  This tool times
sub-chains with checksum outputs to find the materialization hot spots:

  interp      window_tm alone (gap-capped interpolation, all channels)
  interp1     window_tm with a single continuous variable
  prep        window_tm + prepare_window (no slim stack)
  slim        the full slim_forcing chain (interp + prep + thermo + stack)

Usage: python tools/bench_gridprep.py [--points 1048576] [--reps 20]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1048576)
    ap.add_argument("--chunk-t", type=int, default=64)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--grid-ny", type=int, default=300)
    ap.add_argument("--grid-nx", type=int, default=400)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from roadsurf_tpu import production
    from roadsurf_tpu.config import ModelSettings
    from roadsurf_tpu.forcing import Calendar, prepare_window
    from roadsurf_tpu.model import Model
    from roadsurf_tpu.ops import pallas_step as ps
    from roadsurf_tpu.parallel.sharding import make_mesh
    from roadsurf_tpu.state import default_point_params

    P0, chunk_t = args.points, args.chunk_t
    T = 8 * chunk_t + 1
    dt = 30.0
    settings = ModelSettings(sim_len=T, dt=dt, use_relaxation=False)
    model = Model(settings)
    rng = np.random.default_rng(7)
    mesh = make_mesh()
    p_pad = production.padded_points(P0, mesh)

    t0e = 1575158400
    sim = t0e + (dt * np.arange(T)).astype(np.int64)
    times = t0e + 3600 * np.arange(1 + int(T * dt // 3600) + 1,
                                   dtype=np.int64)
    ny, nx = args.grid_ny, args.grid_nx
    glats = np.linspace(59.6, 70.1, ny)
    glons = np.linspace(20.5, 31.6, nx)
    R = len(times)
    fields = {n: rng.normal(0.0 if n in ("prec", "sw", "sw_dir") else
                            -3.0, 2.0, (R, ny, nx))
              for n in ("tair", "tdew", "rhz", "vz", "prec", "sw", "lw")}
    fields["rhz"] = np.abs(fields["rhz"]) + 60.0
    fields["vz"] = np.abs(fields["vz"]) + 1.0
    fields["prec"] = np.abs(fields["prec"])
    fields["sw"] = np.abs(fields["sw"])
    fields["lw"] = 280.0 + fields["lw"]
    fields["prec_phase"] = rng.integers(0, 4, (R, ny, nx)).astype(float)
    plat = rng.uniform(59.6, 70.1, p_pad)
    plon = rng.uniform(20.5, 31.6, p_pad)
    exp = production.GridExpander(times, glats, glons, fields, plat, plon,
                                  sim, mesh, chunk_t=chunk_t)
    print(f"built: KW={exp.KW} SPAN={exp.SPAN} tile_geom={exp.tile_geom}",
          file=sys.stderr)

    from roadsurf_tpu.state import init_state

    pts = default_point_params(P0)
    cal = Calendar.from_epochs(sim)
    state0 = init_state(
        settings, model.params, model.grid,
        np.full(P0, -3.0), np.full(P0, 3.0), np.full(P0, 80.0),
        np.full(P0, -9999.9),
        (int(cal.year[0]), int(cal.month[0]), int(cal.day[0])),
        depth_idx=model.cfg.depth_idx, depth_w=model.cfg.depth_w,
        use_depth=model.cfg.use_depth, dtype=jnp.float32)
    eng = production._Engine(model, exp, pts, cal, state0,
                             mesh=mesh, chunk_t=chunk_t)
    assert eng.fused_generic

    @jax.jit
    def f_interp(t0, data):
        raw = exp.window_tm(data["exp"], t0, chunk_t)
        return sum(jnp.sum(jnp.asarray(getattr(raw, n), jnp.float32))
                   for n in raw._fields)

    @jax.jit
    def f_interp_cont(t0, data):
        raw = exp.window_tm(data["exp"], t0, chunk_t)
        return jnp.sum(raw.tair) + jnp.sum(raw.sw)

    @jax.jit
    def f_prep(t0, data):
        raw = exp.window_tm(data["exp"], t0, chunk_t)
        hr = jax.lax.dynamic_slice_in_dim(data["hour"], t0, chunk_t)
        prep = prepare_window(raw, data["pts_tm"], hr, settings,
                              model.params, t_offset=t0, t_total=T,
                              anchors=data["anchors_tm"],
                              enable_skyview=False, time_axis=1)
        return sum(jnp.sum(jnp.asarray(x, jnp.float32))
                   for x in (prep.tair, prep.vz, prep.rhz, prep.rain,
                             prep.snow, prep.sw, prep.lw, prep.tsurf_obs,
                             prep.valid, prep.in_coupling))

    @jax.jit
    def f_slim(t0, data):
        return eng.slim_forcing(t0, data)[0].sum()

    def sync(x):
        return np.asarray(jax.tree.leaves(x)[0])

    def loop(label, fn, depth=2):
        for w in range(2):
            sync(fn(np.int32((w % 4) * chunk_t), eng.data))
        t0w = time.perf_counter()
        pend = []
        for r in range(args.reps):
            pend.append(fn(np.int32((r % 4) * chunk_t), eng.data))
            if len(pend) >= depth:
                sync(pend.pop(0))
        for o in pend:
            sync(o)
        ms = (time.perf_counter() - t0w) / args.reps * 1e3
        print(f"{label}: {ms:.1f} ms/chunk", file=sys.stderr)
        sys.stderr.flush()
        return ms

    out = {
        "interp1": loop("interp 2-var", f_interp_cont),
        "interp": loop("interp all", f_interp),
        "prep": loop("interp+prep", f_prep),
        "slim": loop("slim full", f_slim),
    }
    print(json.dumps({k: round(v, 1) for k, v in out.items()}))


if __name__ == "__main__":
    main(sys.argv[1:] if len(sys.argv) > 1 else [])
