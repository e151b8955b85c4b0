"""Coupled-mode parity: the per-point-PC while_loop engine vs the oracle.

Exercises the full coupling iteration (snapshot/rewind, secant/halving
coefficient search, success and failure paths, post-window decay) against the
scalar oracle which replicates src/Coupling.f90 statement-for-statement.
"""
import numpy as np
import pytest

from roadsurf_tpu.config import ModelSettings, PhysicsParams
from roadsurf_tpu.io.driver import derive_point_params
from roadsurf_tpu.io.synthetic import synthetic_raw
from roadsurf_tpu.model import Model
from roadsurf_tpu.oracle import Oracle, OraclePoint


def run_case(scenario, sim_len=721, npoints=4, seed=11, dt=30.0,
             coupling_minutes=60, use_relaxation=False, obs_shift=0.0):
    settings = ModelSettings(sim_len=sim_len, dt=dt, use_coupling=True,
                             use_relaxation=use_relaxation,
                             coupling_minutes=coupling_minutes)
    raw, cal = synthetic_raw(npoints, sim_len, dt=dt, seed=seed,
                             scenario=scenario)
    if obs_shift:
        # shift the observed tsurf to force larger coupling corrections
        obs = np.asarray(raw.tsurf_obs).copy()
        obs[obs > -100.0] += obs_shift
        raw = raw._replace(tsurf_obs=obs)
    obs_tair = np.where(np.asarray(raw.tsurf_obs) > -100.0,
                        np.asarray(raw.tair), -9999.9)
    pts, blanked = derive_point_params(raw, settings, obs_tair=obs_tair)
    raw = raw._replace(tsurf_obs=blanked)

    model = Model(settings)
    _, out = model.run_coupled(raw, pts, cal)
    jax_out = np.asarray(out)   # [T, P, 6]

    oracle = Oracle(settings, PhysicsParams())
    for pnt in range(npoints):
        f = {k: np.array(getattr(raw, k)[pnt], np.float64)
             for k in ("tair", "tdew", "vz", "rhz", "prec", "sw", "lw",
                       "sw_dir", "lw_net", "tsurf_obs")}
        f["prec_phase"] = np.array(raw.prec_phase[pnt])
        opt = OraclePoint(
            lat=float(pts.lat[pnt]), lon=float(pts.lon[pnt]),
            sky_view=float(pts.sky_view[pnt]),
            init_len=int(pts.init_len[pnt]),
            tair_relax=float(pts.tair_relax[pnt]),
            vz_relax=float(pts.vz_relax[pnt]),
            rh_relax=float(pts.rh_relax[pnt]),
            coupling_index=int(pts.coupling_end[pnt]),
            coupling_tsurf=float(pts.coupling_tsurf[pnt]),
        )
        ref = oracle.run(f, cal, opt)
        got = jax_out[:, pnt, :]
        np.testing.assert_allclose(
            got, ref, rtol=1e-9, atol=1e-9,
            err_msg=f"point {pnt} scenario {scenario}")
    return pts


def test_coupled_parity_winter():
    pts = run_case("winter_mix", seed=11)
    assert np.any(pts.coupling_end > 0), "coupling must be active"


def test_coupled_parity_cold():
    run_case("cold_snow", seed=12)


def test_coupled_parity_large_offset():
    # big obs offset forces many iterations / possible failure paths
    run_case("winter_mix", seed=13, obs_shift=4.0)


def test_coupled_parity_negative_offset():
    run_case("warm_rain", seed=14, obs_shift=-4.0)


def test_coupled_with_relaxation():
    run_case("winter_mix", seed=15, use_relaxation=True)


def test_coupled_window_to_end():
    # observation at the second-to-last step: window runs into the tail
    run_case("winter_mix", sim_len=481, seed=16, coupling_minutes=30)
