"""Sharded execution tests on an 8-virtual-device CPU mesh: results must be
identical to single-device, collectives must work, and padding must be safe."""
import jax
import jax.numpy as jnp
import numpy as np

from roadsurf_tpu.config import ModelSettings
from roadsurf_tpu.io.synthetic import synthetic_raw
from roadsurf_tpu.model import Model, scan_steps
from roadsurf_tpu.parallel.sharding import (check_missing_budget,
                                            failure_stats, make_mesh,
                                            pad_points, shard_prepared,
                                            shard_state)
from roadsurf_tpu.state import default_point_params


def _setup(npoints=16, sim_len=121):
    settings = ModelSettings(sim_len=sim_len, dt=30.0)
    model = Model(settings)
    raw, cal = synthetic_raw(npoints, sim_len, seed=2)
    pts = default_point_params(npoints)
    prep = model.prepare(raw, pts, cal)
    state = model.init(raw, cal, dtype=prep.tair.dtype)
    return model, prep, state, pts


def test_sharded_matches_single_device():
    model, prep, state, pts = _setup()
    obs = jnp.asarray(pts.coupling_tsurf)
    ones = jnp.ones(prep.tair.shape, prep.tair.dtype)

    final_ref, out_ref = scan_steps(state, prep, ones, ones, obs, model.cfg,
                                    model.grid, model.params)

    mesh = make_mesh()
    assert len(mesh.devices.ravel()) == 8
    state_s = shard_state(state, mesh)
    prep_s = shard_prepared(prep, mesh)
    fn = jax.jit(lambda st, pr, sw, lw: scan_steps(
        st, pr, sw, lw, obs, model.cfg, model.grid, model.params))
    final_s, out_s = fn(state_s, prep_s, ones, ones)

    np.testing.assert_allclose(np.asarray(out_s.tsurf),
                               np.asarray(out_ref.tsurf), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(final_s.tmp),
                               np.asarray(final_ref.tmp), rtol=1e-12)
    # outputs keep the points sharding
    shard_names = {type(final_s.tsurf_ave.sharding).__name__}
    assert final_s.tsurf_ave.sharding.is_fully_replicated is False


def test_failure_stats_psum():
    mesh = make_mesh()
    failed = jnp.zeros(16, bool).at[3].set(True).at[9].set(True)
    failed = jax.device_put(
        failed, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("points")))
    cnt, ratio = failure_stats(failed, mesh)
    assert int(cnt) == 2
    assert np.isclose(float(ratio), 2 / 16)
    assert check_missing_budget(failed, 0.10, mesh) is True
    assert check_missing_budget(failed, 0.50, mesh) is False


def test_pad_points():
    model, prep, state, pts = _setup(npoints=13, sim_len=61)
    padded, orig = pad_points(state, 8)
    assert orig == 13
    assert padded.tsurf_ave.shape[0] == 16
    # edge padding repeats the last point
    np.testing.assert_array_equal(np.asarray(padded.tmp)[13:],
                                  np.broadcast_to(np.asarray(padded.tmp)[12],
                                                  (3,) + padded.tmp.shape[1:]))
