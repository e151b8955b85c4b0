"""Pallas fused-scan kernel parity vs the XLA-scan path (float32 vs float32,
interpret mode on CPU; the real-TPU compile path is exercised by bench)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roadsurf_tpu.config import ModelSettings
from roadsurf_tpu.io.synthetic import synthetic_raw
from roadsurf_tpu.model import Model, scan_steps
from roadsurf_tpu.ops import pallas_step as ps
from roadsurf_tpu.state import default_point_params


def _run_pair(scenario="winter_mix", sim_len=128, npoints=1024, seed=21,
              out_stride=1, chunk_t=64):
    settings = ModelSettings(sim_len=sim_len, dt=30.0)
    model = Model(settings)
    raw, cal = synthetic_raw(npoints, sim_len, seed=seed, scenario=scenario,
                             dtype=np.float32)
    pts = default_point_params(npoints)
    prep = model.prepare(raw, pts, cal)
    prep = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), prep)
    # float32 everywhere for an apples-to-apples comparison
    prep = prep._replace(**{k: jnp.asarray(getattr(prep, k), jnp.float32)
                            for k in ("tair", "vz", "rhz", "rain", "snow",
                                      "sw", "lw", "tsurf_obs", "trf_fric")})
    state = model.init(raw, cal, dtype=jnp.float32)
    ones = jnp.ones(prep.tair.shape, jnp.float32)
    obs = jnp.asarray(pts.coupling_tsurf, jnp.float32)

    final_ref, out_ref = scan_steps(state, prep, ones, ones, obs, model.cfg,
                                    model.grid, model.params)

    tmp0, scal0 = ps.pack_state(state)
    forcing = ps.pack_forcing(prep, ones, ones, obs)
    tmp_f, scal_f, out = ps.pallas_scan(
        tmp0, scal0, forcing, model.cfg, model.params, model.grid,
        out_stride=out_stride, chunk_t=chunk_t, interpret=True)
    final_pal = ps.unpack_state(tmp_f, scal_f, settings.nlayers, state)
    return final_ref, out_ref, final_pal, out, out_stride


@pytest.mark.parametrize("scenario", ["winter_mix", "cold_snow"])
def test_pallas_matches_scan(scenario):
    final_ref, out_ref, final_pal, out, stride = _run_pair(scenario=scenario)
    np.testing.assert_allclose(np.asarray(final_pal.tmp),
                               np.asarray(final_ref.tmp),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out[:, 0, :]),
                               np.asarray(out_ref.tsurf),
                               rtol=2e-5, atol=2e-4)
    for k, name in ((1, "wat"), (2, "snow"), (3, "ice"), (4, "ice2"),
                    (5, "dep")):
        np.testing.assert_allclose(np.asarray(out[:, k, :]),
                                   np.asarray(getattr(out_ref, name)),
                                   rtol=2e-5, atol=2e-3, err_msg=name)


def test_pallas_output_stride():
    final_ref, out_ref, final_pal, out, _ = _run_pair(out_stride=4,
                                                      sim_len=128)
    np.testing.assert_allclose(np.asarray(out[:, 0, :]),
                               np.asarray(out_ref.tsurf)[::4],
                               rtol=2e-5, atol=2e-4)
