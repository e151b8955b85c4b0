"""Compile + parity + perf of the Pallas fused kernel on the real TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from roadsurf_tpu.config import ModelSettings
from roadsurf_tpu.io.synthetic import synthetic_raw
from roadsurf_tpu.model import Model, scan_steps
from roadsurf_tpu.ops import pallas_step as ps
from roadsurf_tpu.state import default_point_params

# ---- small parity run on TPU --------------------------------------------
sim_len, npoints = 256, 1024
settings = ModelSettings(sim_len=sim_len, dt=30.0)
model = Model(settings)
raw, cal = synthetic_raw(npoints, sim_len, seed=21, scenario="winter_mix",
                         dtype=np.float32)
pts = default_point_params(npoints)
prep = model.prepare(raw, pts, cal)
prep = prep._replace(**{k: jnp.asarray(getattr(prep, k), jnp.float32)
                        for k in ("tair", "vz", "rhz", "rain", "snow",
                                  "sw", "lw", "tsurf_obs", "trf_fric")})
state = model.init(raw, cal, dtype=jnp.float32)
ones = jnp.ones(prep.tair.shape, jnp.float32)
obs = jnp.asarray(pts.coupling_tsurf, jnp.float32)

t0 = time.time()
final_ref, out_ref = jax.jit(lambda s, p: scan_steps(
    s, p, ones, ones, obs, model.cfg, model.grid, model.params))(state, prep)
jax.block_until_ready(out_ref.tsurf)
print("scan compile+run", round(time.time() - t0, 1), "s")

tmp0, scal0 = ps.pack_state(state)
forcing = ps.pack_forcing(prep, ones, ones, obs)
t0 = time.time()
tmp_f, scal_f, out = ps.pallas_scan(tmp0, scal0, forcing, model.cfg,
                                    model.params, model.grid,
                                    out_stride=1, chunk_t=64, tile_p=512)
jax.block_until_ready(out)
print("pallas compile+run", round(time.time() - t0, 1), "s")

d = np.abs(np.asarray(out[:, 0, :]) - np.asarray(out_ref.tsurf))
print("max |tsurf pallas - scan| =", d.max())
for k, name in ((1, "wat"), (2, "snow"), (3, "ice"), (5, "dep")):
    dd = np.abs(np.asarray(out[:, k, :])
                - np.asarray(getattr(out_ref, name)))
    print(f"  {name}: {dd.max():.6f}")
assert d.max() < 1e-2, "parity failure on TPU"

# ---- perf comparison at scale -------------------------------------------
P = 1 << 20
T = 64
stride = 64
settings = ModelSettings(sim_len=T, dt=30.0)
model = Model(settings)
reps = P // npoints
widen = lambda x: jnp.tile(x, (1, reps)) if x.ndim == 2 else x
prep_w = jax.tree.map(widen, prep._replace())
# build forcing [T, NCH, P] once on device
raw2, cal2 = synthetic_raw(npoints, T, seed=22, dtype=np.float32)
prep2 = model.prepare(raw2, default_point_params(npoints), cal2)
prep2 = prep2._replace(**{k: jnp.asarray(getattr(prep2, k), jnp.float32)
                          for k in ("tair", "vz", "rhz", "rain", "snow",
                                    "sw", "lw", "tsurf_obs", "trf_fric")})
prep_w = jax.tree.map(widen, prep2)
ones_w = jnp.ones((T, P), jnp.float32)
obs_w = jnp.full((P,), -9999.9, jnp.float32)
state2 = model.init(raw2, cal2, dtype=jnp.float32)
state_w = jax.tree.map(
    lambda x: (jnp.tile(x, (reps,) + (1,) * (x.ndim - 1))
               if x.ndim >= 1 else x), state2)

tmp0w, scal0w = ps.pack_state(state_w)
forc_w = ps.pack_forcing(prep_w, ones_w, ones_w, obs_w)
print("forcing bytes:", forc_w.size * 4 / 1e9, "GB")

pal = jax.jit(lambda t, s, f: ps.pallas_scan(
    t, s, f, model.cfg, model.params, model.grid, out_stride=stride,
    chunk_t=64, tile_p=512))
t0 = time.time()
r = pal(tmp0w, scal0w, forc_w)
jax.block_until_ready(r)
print("pallas 1M compile+first", round(time.time() - t0, 1), "s")
t0 = time.time()
n = 3
for _ in range(n):
    r = pal(tmp0w, scal0w, forc_w)
jax.block_until_ready(r)
dt = time.time() - t0
print(f"PALLAS: {n*P*T/dt/1e6:.1f} M point-steps/s")

scan_j = jax.jit(lambda s, p: scan_steps(
    s, p, ones_w, ones_w, obs_w, model.cfg, model.grid, model.params,
    collect=False)[0])
r2 = scan_j(state_w, prep_w)
jax.block_until_ready(r2)
t0 = time.time()
for _ in range(n):
    r2 = scan_j(state_w, prep_w)
jax.block_until_ready(r2)
dt2 = time.time() - t0
print(f"SCAN  : {n*P*T/dt2/1e6:.1f} M point-steps/s")
print(f"speedup: {dt2/dt:.2f}x")
