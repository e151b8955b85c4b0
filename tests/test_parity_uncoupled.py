"""Golden-trajectory parity: vectorized JAX scan vs the scalar oracle.

The oracle (roadsurf_tpu/oracle.py) replicates the reference Fortran control
flow statement-for-statement in float64; the scan path must match it to
float64 round-off over multi-hour trajectories in every physics regime.
"""
import numpy as np
import pytest

from roadsurf_tpu.config import ModelSettings, PhysicsParams
from roadsurf_tpu.model import Model
from roadsurf_tpu.oracle import Oracle, OraclePoint
from roadsurf_tpu.io.synthetic import synthetic_raw
from roadsurf_tpu.state import default_point_params


def run_both(scenario, sim_len=721, npoints=4, use_relaxation=False,
             seed=1, dt=30.0, sky_view=None):
    settings = ModelSettings(sim_len=sim_len, dt=dt,
                             use_relaxation=use_relaxation)
    raw, cal = synthetic_raw(npoints, sim_len, dt=dt, seed=seed,
                             scenario=scenario)
    pts = default_point_params(npoints)
    if sky_view is not None:
        pts = pts._replace(sky_view=np.full(npoints, sky_view))
    if use_relaxation:
        # relaxation anchored at the last obs-period step, as read_input does
        init_len = sim_len // 3
        pts = pts._replace(
            init_len=np.full(npoints, init_len, np.int32),
            tair_relax=raw.tair[:, init_len].copy(),
            vz_relax=raw.vz[:, init_len].copy(),
            rh_relax=raw.rhz[:, init_len].copy(),
        )

    model = Model(settings)
    _, out = model.run(raw, pts, cal)
    jax_out = np.stack([np.asarray(out.tsurf), np.asarray(out.wat),
                        np.asarray(out.snow), np.asarray(out.ice),
                        np.asarray(out.ice2), np.asarray(out.dep)], axis=-1)

    oracle = Oracle(settings, PhysicsParams())
    for pnt in range(npoints):
        f = {k: np.array(getattr(raw, k)[pnt], np.float64)
             for k in ("tair", "tdew", "vz", "rhz", "prec", "sw", "lw",
                       "sw_dir", "lw_net", "tsurf_obs")}
        f["prec_phase"] = np.array(raw.prec_phase[pnt])
        opt = OraclePoint(
            lat=float(pts.lat[pnt]), lon=float(pts.lon[pnt]),
            sky_view=float(pts.sky_view[pnt]),
            horizons=np.asarray(pts.horizons[pnt]),
            init_len=int(pts.init_len[pnt]),
            tair_relax=float(pts.tair_relax[pnt]),
            vz_relax=float(pts.vz_relax[pnt]),
            rh_relax=float(pts.rh_relax[pnt]),
        )
        ref = oracle.run(f, cal, opt)
        got = jax_out[:, pnt, :]
        np.testing.assert_allclose(
            got, ref, rtol=1e-9, atol=1e-9,
            err_msg=f"point {pnt} scenario {scenario}")


@pytest.mark.parametrize("scenario", ["winter_mix", "cold_snow", "warm_rain"])
def test_parity_scenarios(scenario):
    run_both(scenario)


def test_parity_with_relaxation():
    run_both("winter_mix", use_relaxation=True, seed=3)


def test_parity_with_skyview():
    run_both("winter_mix", sky_view=0.6, seed=4)


def test_parity_long_cold():
    # longer horizon, colder regime: night frost + persistent snow
    run_both("cold_snow", sim_len=1441, seed=5)


def test_parity_per_point_depth():
    """Per-point output depth (ex2's modelInput%depth) vs oracle."""
    sim_len, npoints = 481, 4
    settings = ModelSettings(sim_len=sim_len, dt=30.0)
    raw, cal = synthetic_raw(npoints, sim_len, seed=8)
    pts = default_point_params(npoints)
    depths = np.array([0.0, 0.05, -9999.9, 0.5])
    pts = pts._replace(out_depth=depths)
    from roadsurf_tpu.model import Model as _M
    model = _M(settings)
    _, out = model.run(raw, pts, cal)
    jax_out = np.stack([np.asarray(getattr(out, k))
                        for k in ("tsurf", "wat", "snow", "ice", "ice2",
                                  "dep")], axis=-1)
    oracle = Oracle(settings, PhysicsParams())
    for pnt in range(npoints):
        f = {k: np.array(getattr(raw, k)[pnt], np.float64)
             for k in ("tair", "tdew", "vz", "rhz", "prec", "sw", "lw",
                       "sw_dir", "lw_net", "tsurf_obs")}
        f["prec_phase"] = np.array(raw.prec_phase[pnt])
        ref = oracle.run(f, cal, OraclePoint(out_depth=float(depths[pnt])))
        np.testing.assert_allclose(jax_out[:, pnt, :], ref, rtol=1e-9,
                                   atol=1e-9, err_msg=f"point {pnt}")


def test_parity_global_output_depth():
    """Global tsurfOutputDepth setting vs oracle."""
    sim_len, npoints = 361, 2
    settings = ModelSettings(sim_len=sim_len, dt=30.0,
                             tsurf_output_depth=0.03)
    raw, cal = synthetic_raw(npoints, sim_len, seed=9)
    pts = default_point_params(npoints)
    from roadsurf_tpu.model import Model as _M
    model = _M(settings)
    _, out = model.run(raw, pts, cal)
    oracle = Oracle(settings, PhysicsParams())
    for pnt in range(npoints):
        f = {k: np.array(getattr(raw, k)[pnt], np.float64)
             for k in ("tair", "tdew", "vz", "rhz", "prec", "sw", "lw",
                       "sw_dir", "lw_net", "tsurf_obs")}
        f["prec_phase"] = np.array(raw.prec_phase[pnt])
        ref = oracle.run(f, cal, OraclePoint())
        np.testing.assert_allclose(np.asarray(out.tsurf)[:, pnt], ref[:, 0],
                                   rtol=1e-9, atol=1e-9)


def test_parity_forced_melting():
    """Salt-treatment forced melting switches (forceSnowMelting /
    forceIceMelting; Storage.f90:145-147, :227-230) vs oracle."""
    sim_len, npoints = 481, 4
    settings = ModelSettings(sim_len=sim_len, dt=30.0,
                             force_snow_melting=True, force_ice_melting=True)
    raw, cal = synthetic_raw(npoints, sim_len, seed=17, scenario="cold_snow")
    pts = default_point_params(npoints)
    from roadsurf_tpu.model import Model as _M
    model = _M(settings)
    _, out = model.run(raw, pts, cal)
    # with forced melting no snow/ice can persist
    assert np.asarray(out.snow)[-1].max() == 0.0
    assert np.asarray(out.ice)[-1].max() == 0.0
    oracle = Oracle(settings, PhysicsParams())
    for pnt in range(2):
        f = {k: np.array(getattr(raw, k)[pnt], np.float64)
             for k in ("tair", "tdew", "vz", "rhz", "prec", "sw", "lw",
                       "sw_dir", "lw_net", "tsurf_obs")}
        f["prec_phase"] = np.array(raw.prec_phase[pnt])
        ref = oracle.run(f, cal, OraclePoint())
        got = np.stack([np.asarray(getattr(out, k))[:, pnt]
                        for k in ("tsurf", "wat", "snow", "ice", "ice2",
                                  "dep")], axis=-1)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)
