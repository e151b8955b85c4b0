"""Dissect the production stream chunk cost on the real TPU.

One streaming chunk = expand (station->point gather) -> prepare_window ->
pack_forcing -> whole-scan Pallas kernel, fused in one jit
(production._Engine.chunk_fn).  This tool times the pieces:

  kernel   pallas_scan_sharded alone on a fixed packed forcing chunk
  prep     expand + prepare_window + pack_forcing alone (forcing production)
  full     the real chunk fn (prep + kernel in one jit)

Rates are point-steps/s over chunk_t * P.  Run after the chip is idle.

Usage: python tools/bench_chunk.py [--points 1048576] [--chunk-t 64]
         [--stations 2048] [--reps 20] [--grid]   (--grid: GridExpander)
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
    ap.add_argument("--stations", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--grid", action="store_true",
                    help="bench the GridExpander path instead of stations")
    ap.add_argument("--composite", action="store_true",
                    help="grid forecast + station overlay through the "
                         "fused-generic CompositeExpander (the reference's "
                         "operational config)")
    ap.add_argument("--no-tm", action="store_true",
                    help="with --grid/--composite: disable the tile-major "
                         "fused-generic path (generic per-point prep)")
    ap.add_argument("--extract", choices=("device", "host"),
                    default="device", help="grid spatial extraction site")
    ap.add_argument("--fast", action="store_true",
                    help="station-level prepared channels (prep_ctx path; "
                         "fused MXU expansion unless --no-fused)")
    ap.add_argument("--no-fused", action="store_true",
                    help="with --fast: force the row-gather expansion "
                         "instead of the fused tile-major MXU path")
    ap.add_argument("--skyview", action="store_true",
                    help="per-point sky-view radiation correction active "
                         "(svf=0.7, flat horizons): the generic-prep "
                         "fallback path incl. per-chunk sun position")
    ap.add_argument("--sorted", action="store_true",
                    help="station-sorted point order (monotone gather "
                         "experiment; throughput-only, no output remap)")
    ap.add_argument("--grid-ny", type=int, default=300)
    ap.add_argument("--grid-nx", type=int, default=400)
    ap.add_argument("--tile-p", type=int, default=0,
                    help="kernel point-tile size override (e.g. 12288 = "
                         "96 sublanes; slim fbuf must fit VMEM)")
    ap.add_argument("--inner-chunk-t", type=int, default=8,
                    help="kernel double-buffered forcing chunk length")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from roadsurf_tpu import production
    from roadsurf_tpu.config import ModelSettings
    from roadsurf_tpu.forcing import Calendar
    from roadsurf_tpu.io.synthetic import synthetic_raw
    from roadsurf_tpu.model import Model
    from roadsurf_tpu.parallel.sharding import make_mesh
    from roadsurf_tpu.state import default_point_params, init_state

    P0, S, chunk_t = args.points, args.stations, args.chunk_t
    T = 8 * chunk_t + 1
    dt = 30.0
    settings = ModelSettings(sim_len=T, dt=dt, use_relaxation=False)
    model = Model(settings)
    rng = np.random.default_rng(7)
    raw_st, cal = synthetic_raw(S, T, dt=dt, seed=7, scenario="winter_mix",
                                dtype=np.float32)

    mesh = make_mesh()
    p_pad = production.padded_points(P0, mesh)
    if args.grid or args.composite:
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
        t0w = time.perf_counter()
        tile_p_g = 100 if args.no_tm else None   # non-LANE multiple = flat
        shared_perm = None
        sexp = None
        if args.composite:
            st_idx_pad = rng.integers(0, S, size=p_pad)
            # operational shape: the grid is the forecast, stations carry
            # only the obs channel (roadrunner.cpp:763-792 source stack)
            from roadsurf_tpu.forcing import RawForcing as _RF
            raw_obs = _RF(*((getattr(raw_st, n) if n == "tsurf_obs"
                             else np.full_like(
                                 np.asarray(getattr(raw_st, n)),
                                 -9999 if n == "prec_phase" else -9999.9))
                            for n in _RF._fields))
            sexp = production.StationExpander(raw_obs, st_idx_pad, mesh,
                                              chunk_t=chunk_t,
                                              raw_tm=not args.no_tm)
            shared_perm = sexp.point_perm
            if shared_perm is not None:
                tile_p_g = sexp._fused_plan["tile_p"]
        gexp = production.GridExpander(times, glats, glons, fields,
                                       plat, plon, sim, mesh,
                                       chunk_t=chunk_t, tile_p=tile_p_g,
                                       point_perm=shared_perm,
                                       extract=args.extract)
        expander = (production.CompositeExpander([gexp, sexp])
                    if args.composite else gexp)
        build_s = time.perf_counter() - t0w
        print(f"{'Composite' if args.composite else 'Grid'}Expander build "
              f"({len(fields)} vars x {R} samples x {p_pad} pts, "
              f"extract={args.extract}): {build_s:.1f}s  "
              f"KW={gexp.KW} SPAN={gexp.SPAN}", file=sys.stderr)
    else:
        st_idx_pad = rng.integers(0, S, size=p_pad)
        if args.sorted:
            st_idx_pad = np.sort(st_idx_pad)
        prep_ctx = None
        if args.fast:
            st_pts1 = default_point_params(S + 1)
            prep_ctx = {"st_pts": st_pts1, "anchors": None,
                        "settings": settings, "params": model.params,
                        "hour": cal.hour, "t_total": T}
        expander = production.StationExpander(raw_st, st_idx_pad, mesh,
                                              chunk_t=chunk_t,
                                              prep_ctx=prep_ctx,
                                              fused=not args.no_fused,
                                              tile_p=args.tile_p or None,
                                              raw_tm=(args.skyview
                                                      and not args.no_tm))

    pts = default_point_params(P0)._replace(
        lat=58.0 + rng.uniform(0, 6, P0), lon=20.0 + rng.uniform(0, 10, P0))
    if args.skyview:
        pts = pts._replace(sky_view=np.full(P0, 0.7),
                           horizons=np.zeros((P0, 360)))
    first = {n: np.asarray(expander.first_host[n][:P0], np.float64)
             for n in ("tair", "vz", "rhz", "tsurf_obs")}
    date0 = (int(cal.year[0]), int(cal.month[0]), int(cal.day[0]))
    state0 = jax.jit(lambda a, b, c, d: init_state(
        settings, model.params, model.grid, a, b, c, d, date0,
        depth_idx=model.cfg.depth_idx, depth_w=model.cfg.depth_w,
        use_depth=model.cfg.use_depth, dtype=jnp.float32))(
            np.where(first["tair"] > -100, first["tair"], -3.0),
            np.where(first["vz"] > -100, first["vz"], 3.0),
            np.where(first["rhz"] > -100, first["rhz"], 80.0),
            first["tsurf_obs"])

    eng = production._Engine(model, expander, pts, cal, state0, mesh=mesh,
                             chunk_t=chunk_t, tile_p=args.tile_p or None,
                             inner_chunk_t=args.inner_chunk_t)
    fn = eng.chunk_fn(chunk_t, False)

    # prep-only jit: identical expansion work, no kernel
    from roadsurf_tpu.forcing import prepare_window
    from roadsurf_tpu.ops import pallas_step as ps

    @jax.jit
    def prep_full_fn(t0, data):
        if eng.fused:
            return expander.fused_window(data["exp"], t0, chunk_t)
        if eng.fused_generic:
            return eng.slim_forcing(t0, data)[0]
        if eng.fast:
            ones = jnp.ones((chunk_t, expander.num_points), jnp.float32)
            return expander.packed_window(data["exp"], t0, chunk_t,
                                          ones, ones, data["obs"])
        rawT = expander.window(data["exp"], t0, chunk_t)
        hr = jax.lax.dynamic_slice_in_dim(data["hour"], t0, chunk_t)
        jd = (jax.lax.dynamic_slice_in_dim(data["jde"], t0, chunk_t)
              if eng.enable_sky else None)
        prep = prepare_window(rawT, data["pts"], hr, settings, eng.params,
                              t_offset=t0, t_total=eng.T, anchors=None,
                              jde=jd, enable_skyview=eng.enable_sky,
                              flat_horizons=getattr(eng, "flat_horizons",
                                                    False))
        ones = jnp.ones(prep.tair.shape, jnp.float32)
        return ps.pack_forcing(prep, ones, ones, data["obs"])

    @jax.jit
    def prep_fn(t0, data):
        # checksum output: a [chunk_t, NF, P] f32 forcing chunk is 4.3 GB at
        # 1M points -- two of them in flight OOMs the 16 GB HBM (measured),
        # so the timing loop reduces to a scalar.  XLA may elide the final
        # HBM store of the full chunk, so this slightly UNDERestimates prep
        # (by ~1 HBM write pass); the full-chunk row carries the true cost.
        return prep_full_fn(t0, data).sum()

    # kernel-only jit on a fixed forcing chunk
    from roadsurf_tpu.parallel.sharding import pallas_scan_sharded

    @jax.jit
    def kernel_fn(tmp, scal, forc, t0, data):
        kw = {}
        if eng.fused or eng.fused_generic:
            obs = jnp.asarray(data["obs"], jnp.float32)
            zero = jnp.zeros_like(obs)
            trf = (data["exp"]["prep"]["trf"] if eng.fused
                   else data["trf"])
            kw = {"slim_trf": trf,
                  "aux_rows": jnp.stack([zero, zero, zero, obs])}
        return pallas_scan_sharded(
            tmp, scal, forc, eng.cfg, eng.params, eng.grid, mesh,
            out_stride=eng.os_, chunk_t=eng.inner_chunk_t,
            bl_iters=eng.bl_iters, interpret=eng.interpret,
            nsteps=chunk_t, out_offset=t0, n_out=eng.k_alloc, **kw)

    def sync(out):
        # on the remote-device backend block_until_ready does not force
        # execution -- a (1-element) data FETCH does, exactly like the
        # production drain's row pulls
        leaf = jax.tree.leaves(out)[0]
        return np.asarray(leaf[(slice(0, 1),) * leaf.ndim])

    def time_loop(label, step, warm=2, depth=2):
        # pipelined dispatch like production._Engine.stream.  depth=1 for
        # steps whose OUTPUT is a full 4.3 GB forcing chunk: two pending
        # outputs plus one being freed asynchronously is 12.9 GB -- over
        # the 16 GB HBM budget at 1M points (measured ResourceExhausted)
        for w in range(warm):
            sync(step(w % 4))
        t0w = time.perf_counter()
        pending = []
        for r in range(args.reps):
            pending.append(step(r % 4))
            if len(pending) >= depth:
                sync(pending.pop(0))
        for o in pending:
            sync(o)
        dtw = (time.perf_counter() - t0w) / args.reps
        rate = P0 * chunk_t / dtw
        print(f"{label}: {dtw * 1e3:.1f} ms/chunk = {rate / 1e6:.0f} M "
              f"point-steps/s", file=sys.stderr)
        sys.stderr.flush()
        return dtw

    state = {"tmp": eng.tmp0, "scal": eng.scal0}

    def full_step(k):
        tmp, scal, rows = fn(state["tmp"], state["scal"],
                             np.int32(k * chunk_t), eng.data)
        state["tmp"], state["scal"] = tmp, scal
        return scal

    def prep_step(k):
        return prep_fn(np.int32(k * chunk_t), eng.data)

    t_full = time_loop("full chunk (prep+kernel)", full_step)
    t_prep = time_loop("prep only (expand+prepare+pack, checksum out)",
                       prep_step, warm=1, depth=1)

    forc0 = prep_full_fn(np.int32(0), eng.data)
    sync(forc0)

    def kernel_step(k):
        tmp, scal, rows = kernel_fn(state["tmp"], state["scal"], forc0,
                                    np.int32(k * chunk_t), eng.data)
        state["tmp"], state["scal"] = tmp, scal
        return scal

    t_kern = time_loop("kernel only", kernel_step)

    print(json.dumps({
        "mode": ("composite" if args.composite
                 else "grid" if args.grid else "stations"),
        "fast": bool(eng.fast), "fused": bool(getattr(eng, "fused", False)),
        "fused_generic": bool(getattr(eng, "fused_generic", False)),
        "skyview": bool(args.skyview),
        "points": P0, "chunk_t": chunk_t,
        "full_ms": round(t_full * 1e3, 1),
        "kernel_ms": round(t_kern * 1e3, 1),
        "prep_ms": round(t_prep * 1e3, 1),
        "full_Mpts_per_s": round(P0 * chunk_t / t_full / 1e6, 1),
    }))


if __name__ == "__main__":
    main(sys.argv[1:] if len(sys.argv) > 1 else [])
