"""Weak-scaling benchmark: point-steps/s vs device count over a points mesh.

BASELINE.md's scaling target is >=80% linear scaling of point-steps/s at 1M+
points.  Columns are independent, so the production kernel runs under
``shard_map`` with zero hot-loop collectives (parallel/sharding.py
``pallas_scan_sharded``); this harness measures throughput on 1, 2, 4, ...
up to every visible device, keeping points-per-device constant (weak
scaling -- the production regime: more chips -> more road network).

On this image only one real TPU chip is visible, so the sweep degenerates to
the single-chip measurement; on a pod slice the same script produces the full
curve.  Prints one JSON line per device count plus a final summary line with
the parallel efficiency of the largest mesh vs one device.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from roadsurf_tpu.config import ModelSettings
    from roadsurf_tpu.io.synthetic import synthetic_raw
    from roadsurf_tpu.model import Model
    from roadsurf_tpu.ops import pallas_step as ps
    from roadsurf_tpu.parallel.sharding import (make_mesh, pallas_scan_sharded,
                                                shard_prepared)
    from roadsurf_tpu.state import default_point_params

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    per_device = int(os.environ.get("BENCH_POINTS_PER_DEVICE",
                                    (1 << 20) if on_tpu else 1024))
    t_chunk = int(os.environ.get("BENCH_TCHUNK", 64 if on_tpu else 16))
    n_chunks = int(os.environ.get("BENCH_CHUNKS", 4 if on_tpu else 1))
    devices = jax.devices()

    settings = ModelSettings(sim_len=t_chunk, dt=30.0)
    model = Model(settings)

    results = []
    ndev = 1
    while ndev <= len(devices):
        npoints = per_device * ndev
        small = min(npoints, 4096)
        raw, cal = synthetic_raw(small, t_chunk, dt=30.0, seed=0,
                                 dtype=np.float32)
        pts = default_point_params(small)
        prep_small = model.prepare(raw, pts, cal)
        reps = -(-npoints // small)
        mesh = make_mesh(devices[:ndev])

        def widen(x):
            x = jnp.asarray(np.asarray(x), jnp.float32)
            if x.ndim == 2:
                return jnp.tile(x, (1, reps))[:, :npoints]
            return x

        prep = shard_prepared(jax.tree.map(widen, prep_small), mesh)
        state = model.init(
            jax.tree.map(lambda x: np.tile(np.asarray(x), (reps, 1))[:npoints]
                         if np.ndim(x) == 2 else x, raw),
            cal, dtype=jnp.float32)
        ones = jnp.ones(prep.tair.shape, jnp.float32)
        obs = jnp.full((npoints,), -9999.9, jnp.float32)
        tmp0, scal0 = ps.pack_state(state)
        forc = ps.pack_forcing(prep, ones, ones, obs)
        jax.block_until_ready(forc)

        run = jax.jit(lambda t, s, f: pallas_scan_sharded(
            t, s, f, model.cfg, model.params, model.grid, mesh,
            out_stride=t_chunk, chunk_t=min(8, t_chunk),
            interpret=not on_tpu))
        r = run(tmp0, scal0, forc)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            r = run(tmp0, scal0, forc)
        jax.block_until_ready(r)
        dt = time.perf_counter() - t0
        rate = npoints * t_chunk * n_chunks / dt
        results.append((ndev, rate))
        print(json.dumps({"devices": ndev, "points": npoints,
                          "rate_Mpts": round(rate / 1e6, 1)}))
        ndev *= 2

    r1 = results[0][1]
    nd, rn = results[-1]
    eff = rn / (nd * r1) if nd > 1 else 1.0
    print(json.dumps({
        "metric": "weak_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "fraction of linear",
        "vs_baseline": round(eff / 0.80, 3),
        "detail": {"devices": nd, "backend": backend,
                   "per_device_points": per_device,
                   "rates_Mpts": {str(d): round(r / 1e6, 1)
                                  for d, r in results}},
    }))


if __name__ == "__main__":
    main()
