"""Tile-geometry sweep for the fused Pallas kernel (tuning tool, real TPU).

Layout knobs only -- (SUBL, chunk_t) change VMEM residency and DMA cadence,
never results (bitwise-identical per point).  Run:

    PALLAS_AXON_REMOTE_COMPILE=1 python tools/bench_tile.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from roadsurf_tpu.config import ModelSettings
    from roadsurf_tpu.io.synthetic import synthetic_raw
    from roadsurf_tpu.model import Model
    from roadsurf_tpu.ops import pallas_step as ps
    from roadsurf_tpu.state import default_point_params, init_state

    npoints = int(os.environ.get("BENCH_POINTS", 1 << 20))
    t_chunk = int(os.environ.get("BENCH_TCHUNK", 64))
    n_chunks = int(os.environ.get("BENCH_CHUNKS", 8))

    settings = ModelSettings(sim_len=t_chunk, dt=30.0)
    model = Model(settings)
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
    tmp0, scal0 = ps.pack_state(state)
    forc = ps.pack_forcing(prep, ones, ones, obs)
    jax.block_until_ready(forc)

    # The full sweep behind the numbers documented in BASELINE.md/CLAUDE.md:
    # sublane counts 8..64 measure the VPU-latency-hiding curve, 96/128 probe
    # the VMEM ceiling (expected to fail remote compile).  Override with e.g.
    # BENCH_TILE_VARIANTS="64:8,96:4" for a targeted run.
    env = os.environ.get("BENCH_TILE_VARIANTS")
    if env:
        variants = [tuple(int(v) for v in pair.split(":"))
                    for pair in env.split(",")]
    else:
        variants = [(8, 8), (16, 8), (32, 8), (64, 8), (64, 4), (64, 16),
                    (96, 8), (96, 4), (128, 2)]
    for subl, ct in variants:
        tile_p = subl * 128
        if npoints % tile_p or t_chunk % ct:
            continue
        try:
            pal = jax.jit(lambda t, s, f, tp=tile_p, c=ct: ps.pallas_scan(
                t, s, f, model.cfg, model.params, model.grid,
                out_stride=t_chunk, chunk_t=c, tile_p=tp))
            r = pal(tmp0, scal0, forc)
            jax.block_until_ready(r)
        except Exception as e:  # compile failure (VMEM) -> report + continue
            print(json.dumps({"subl": subl, "chunk_t": ct,
                              "error": str(e)[:160]}))
            continue
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            r = pal(tmp0, scal0, forc)
        jax.block_until_ready(r)
        dt = time.perf_counter() - t0
        rate = npoints * t_chunk * n_chunks / dt
        print(json.dumps({"subl": subl, "chunk_t": ct,
                          "rate_Mpts": round(rate / 1e6, 1)}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
