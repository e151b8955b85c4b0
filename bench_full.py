"""Full-horizon production benchmark: 1M points x 8,881 steps (the reference's
48 h analysis + 26 h forecast at 30 s) end to end on one chip.

Forcing is generated on device per time chunk (a production deployment
streams chunks from its data plane; generation cost here is measured and
reported separately).  State is carried across chunks in packed kernel
layout -- no host round trips.

Prints one JSON line like bench.py but for the complete workload.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _baseline():
    """Measured CPU-node denominator -- single source of truth in bench.py."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import BASELINE_POINT_STEPS_PER_S
    return BASELINE_POINT_STEPS_PER_S


def main():
    import jax
    import jax.numpy as jnp

    from roadsurf_tpu.config import ModelSettings
    from roadsurf_tpu.io.synthetic import synthetic_raw
    from roadsurf_tpu.model import Model
    from roadsurf_tpu.ops import pallas_step as ps
    from roadsurf_tpu.state import default_point_params

    P = int(os.environ.get("BENCH_POINTS", 1 << 20))
    T_TOTAL = int(os.environ.get("BENCH_STEPS", 8881))
    CHUNK = int(os.environ.get("BENCH_TCHUNK", 64))
    OUT_STRIDE = int(os.environ.get("BENCH_OUT_STRIDE", 64))  # ~30 min cadence

    nchunks = -(-T_TOTAL // CHUNK)
    T = nchunks * CHUNK

    settings = ModelSettings(sim_len=CHUNK, dt=30.0)
    model = Model(settings)

    # small host seed chunk -> tiled on device; per-chunk forcing varies by a
    # phase shift so chunks are not byte-identical (defeats any caching)
    small = 4096
    raw, cal = synthetic_raw(small, CHUNK, dt=30.0, seed=0, dtype=np.float32)
    pts = default_point_params(small)
    prep_small = model.prepare(raw, pts, cal)
    reps = P // small
    ones_small = jnp.ones((CHUNK, small), jnp.float32)
    obs = jnp.full((P,), -9999.9, jnp.float32)

    state_small = model.init(raw, cal, dtype=jnp.float32)

    @jax.jit
    def build_state():
        wide = jax.tree.map(
            lambda x: jnp.tile(x, (reps,) + (1,) * (x.ndim - 1)), state_small)
        return ps.pack_state(wide)

    @jax.jit
    def build_chunk(k):
        # widen the seed chunk and modulate by the chunk index
        def widen(x):
            return jnp.tile(x, (1, reps)) if x.ndim == 2 else x
        prep = jax.tree.map(widen, prep_small)
        shift = (0.1 * k).astype(jnp.float32)
        prep = prep._replace(tair=prep.tair + jnp.sin(shift),
                             lw=prep.lw + 2.0 * jnp.sin(shift))
        ones = jnp.ones(prep.tair.shape, jnp.float32)
        return ps.pack_forcing(prep, ones, ones, obs)

    pal = jax.jit(lambda t, s, f: ps.pallas_scan(
        t, s, f, model.cfg, model.params, model.grid,
        out_stride=OUT_STRIDE, chunk_t=min(8, CHUNK)))

    # One jit per chunk: forcing generation fuses with the kernel launch
    # (XLA eliminates the intermediate tile/modulate/stack materializations
    # and one dispatch round trip per chunk).
    @jax.jit
    def combo(t, s, k):
        return ps.pallas_scan(
            t, s, build_chunk.__wrapped__(k), model.cfg, model.params,
            model.grid, out_stride=OUT_STRIDE, chunk_t=min(8, CHUNK))

    import sys
    log = lambda m: (print(m, file=sys.stderr), sys.stderr.flush())
    log("building state...")
    t0 = time.perf_counter()
    tmp, scal = build_state()
    jax.block_until_ready(scal)
    log(f"state built {time.perf_counter()-t0:.1f}s")

    # measure forcing generation separately (one chunk)
    t0 = time.perf_counter()
    f0 = build_chunk(jnp.float32(0.0))
    jax.block_until_ready(f0)
    log(f"chunk gen compiled {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    f0 = build_chunk(jnp.float32(1.0))
    jax.block_until_ready(f0)
    gen_s = time.perf_counter() - t0

    # warm up the kernel, then release the warmup buffers
    t0 = time.perf_counter()
    r = pal(tmp, scal, f0)
    jax.block_until_ready(r)
    log(f"kernel compiled+warm {time.perf_counter()-t0:.1f}s")
    del r, f0
    t0 = time.perf_counter()
    r = combo(tmp, scal, jnp.float32(0.0))
    jax.block_until_ready(r)
    log(f"fused gen+kernel compiled+warm {time.perf_counter()-t0:.1f}s")
    del r

    outs_host = []
    t0 = time.perf_counter()
    # Pipelined dispatch: the per-call round trip to the (remote) chip is
    # comparable to the compute itself, so blocking every chunk serializes
    # RTT + gen + kernel.  Keep two chunks in flight (bounded HBM: 2 forcing
    # chunks x ~4 GB) and block on chunk k-2 while k dispatches.
    inflight = []
    for k in range(nchunks):
        tmp, scal, out = combo(tmp, scal, jnp.float32(k))
        inflight.append((k, None, out))
        if len(inflight) > 1:
            k0, f0_, out0 = inflight.pop(0)
            out0.block_until_ready()
            if k0 % 16 == 0:
                outs_host.append(np.asarray(out0[:1, 0, :4096]))  # sampled IO
                log(f"chunk {k0}/{nchunks} t={time.perf_counter()-t0:.1f}s")
    for k0, f0_, out0 in inflight:
        out0.block_until_ready()
        if k0 % 16 == 0:
            outs_host.append(np.asarray(out0[:1, 0, :4096]))
    jax.block_until_ready(scal)
    wall = time.perf_counter() - t0

    rate = P * T / wall
    full_forecast_s = wall
    print(json.dumps({
        "metric": "full_forecast_point_timesteps_per_s_per_chip",
        "value": round(rate, 1),
        "unit": "point-steps/s",
        "vs_baseline": round(rate / _baseline(), 3),
        "detail": {
            "npoints": P, "steps": T, "chunk_t": CHUNK,
            "out_stride": OUT_STRIDE,
            "wall_s_full_forecast": round(full_forecast_s, 2),
            "forcing_gen_s_per_chunk": round(gen_s, 4),
            "backend": jax.default_backend(), "dtype": "float32"},
    }))


if __name__ == "__main__":
    main()
