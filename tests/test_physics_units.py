"""Unit tests for individual physics kernels against closed-form expectations
(the reference user manual's equations and hand-computed cases)."""
import numpy as np
import jax.numpy as jnp
import pytest

from roadsurf_tpu.config import ModelSettings, PhysicsParams
from roadsurf_tpu.grid import (day_of_year, depth_grid, make_grid,
                               depth_interp_coeffs)
from roadsurf_tpu.physics import moisture, storage
from roadsurf_tpu.physics.boundary_layer import (air_properties, bl_cond_and_le,
                                                 water_density)
from roadsurf_tpu.physics.radiation import net_radiation
from roadsurf_tpu.physics.soil import soil_step
from roadsurf_tpu.physics.sun import elevation_azimuth, julian_ephemeris_day

P = PhysicsParams().derive(30.0)


def test_depth_grid_geometric():
    z = depth_grid(15)
    assert z[0] == 0.0
    # Z(2) = 0.0103*1.4^0 + 0.02
    assert np.isclose(z[1], 0.0303)
    assert np.isclose(z[2] - z[1], 0.0103 * 1.4 + 0.02)
    assert z[15] > 1.5  # deep enough for the climatology node


def test_day_of_year():
    assert day_of_year(2019, 1, 1) == 1
    assert day_of_year(2019, 12, 2) == 336
    assert day_of_year(2020, 3, 1) == 61   # leap
    assert day_of_year(1900, 3, 1) == 60   # not leap (century)
    assert day_of_year(2000, 3, 1) == 61   # leap (400)


def test_magnus_roundtrip():
    # Exact roundtrip only when tair and tdew are on the same side of 0 C:
    # CalcTDew chooses Magnus coefficients from T2m alone while CalcRh picks
    # them per variable (src/InputOutput.f90:223-229 vs :256-262), a reference
    # quirk that breaks the inverse relation across the freezing point.
    t = np.array([-20.0, -5.0, 10.0, 25.0])
    rh = np.array([30.0, 80.0, 90.0, 99.0])
    td = moisture.tdew_from_rh(t, rh)
    same_side = np.sign(np.asarray(td)) == np.sign(t)
    rh2 = moisture.rh_from_tdew(t, td)
    np.testing.assert_allclose(np.asarray(rh2)[same_side], rh[same_side],
                               rtol=1e-6)
    assert np.all(np.asarray(td) <= t + 1e-9)


def test_esat_conventions_differ_only_at_zero():
    # surface convention: ice branch strictly below 0; air convention: water at >= 0
    assert float(moisture.esat(0.0)) == float(moisture.esat_air_convention(0.0))
    assert float(moisture.esat(-0.0001)) != float(
        moisture.esat(0.0001))


def test_air_properties():
    rho, cp, vcap, psych = air_properties(jnp.float64(0.0), P)
    # 100000/(287.05*273.15) ~ 1.2754
    assert np.isclose(float(rho), 1.2754, atol=1e-3)
    assert np.isclose(float(cp), 1005.0 + 23.15 ** 2 / 3364.0)
    assert np.isclose(float(psych), 0.1 * (0.00063 * 273.15 + 0.47496))


def test_water_density_peak():
    # polynomial peaks near ~0.8C, close to 1000 kg/m3
    assert abs(float(water_density(jnp.float64(0.0))) - 1000.0028) < 1e-9
    assert float(water_density(jnp.float64(20.0))) < 1000.0


def test_bl_conductance_positive_and_warm_start():
    bl = bl_cond_and_le(jnp.float64(-99.9), jnp.float64(-2.0),
                        jnp.float64(0.0), 30.0, jnp.float64(0.0),
                        jnp.float64(-1.0), jnp.float64(4.0),
                        jnp.float64(80.0), P)
    assert float(bl.blcond) > 0.0
    # warm start converges to the same fixed point
    bl2 = bl_cond_and_le(bl.blcond, jnp.float64(-2.0), jnp.float64(0.0), 30.0,
                         jnp.float64(0.0), jnp.float64(-1.0), jnp.float64(4.0),
                         jnp.float64(80.0), P)
    assert abs(float(bl2.blcond) - float(bl.blcond)) < 2e-3


def test_le_no_water_no_evaporation():
    # positive LE (evaporation) with zero storage is zeroed
    bl = bl_cond_and_le(jnp.float64(50.0), jnp.float64(10.0), jnp.float64(0.0),
                        30.0, jnp.float64(0.0), jnp.float64(5.0),
                        jnp.float64(3.0), jnp.float64(30.0), P)
    assert float(bl.le_flux) == 0.0
    assert float(bl.evap) == 0.0


def test_net_radiation_balance():
    rn = net_radiation(jnp.float64(0.0), jnp.float64(0.1), jnp.float64(100.0),
                       jnp.float64(300.0), 1.0, 1.0, P)
    rbb = 0.95 * 5.67e-8 * 273.15 ** 4
    assert np.isclose(float(rn), 0.9 * 100.0 + 0.95 * 300.0 - rbb)


def test_stencil_conserves_at_equilibrium():
    """Uniform profile with zero net forcing stays uniform (interior layers)."""
    s = ModelSettings(sim_len=10, dt=30.0)
    g = make_grid(P, 15)
    tmp = jnp.full((17,), 5.0, dtype=jnp.float64)
    out = soil_step(tmp, jnp.asarray(g.wcont), jnp.asarray(g.dyc),
                    jnp.asarray(g.cond_dz), jnp.float64(0.0), jnp.float64(0.0),
                    jnp.float64(0.0), jnp.float64(0.0), 30.0, P)
    # zero flux everywhere -> no change
    np.testing.assert_allclose(np.asarray(out.tmp_new), 5.0, atol=1e-12)
    assert float(out.hstor) == 0.0


def test_stencil_surface_heating_direction():
    s = ModelSettings(sim_len=10, dt=30.0)
    g = make_grid(P, 15)
    tmp = jnp.full((17,), 0.0, dtype=jnp.float64)
    out = soil_step(tmp, jnp.asarray(g.wcont), jnp.asarray(g.dyc),
                    jnp.asarray(g.cond_dz), jnp.float64(0.0),
                    jnp.float64(200.0), jnp.float64(0.0), jnp.float64(0.0),
                    30.0, P)
    assert float(out.tmp_new[1]) > 0.0            # surface warms
    assert abs(float(out.tmp_new[10])) < 1e-12    # deep layers untouched in 1 step


def test_prec_type_codes():
    rain, snow, wets = storage.calc_prec_type(
        np.array([1, 3, 2, 6, 0, -9999]), np.full(6, 0.5),
        np.full(6, 5.0), np.full(6, 50.0), P)
    np.testing.assert_allclose(np.asarray(rain),
                               [0.5, 0.0, 0.25, 0.0, 0.5, 0.5])
    np.testing.assert_allclose(np.asarray(snow),
                               [0.0, 0.5, 0.25, 0.5, 0.0, 0.0])
    # warm+dryish air: Koistinen says rain for the missing-phase entry
    assert bool(np.asarray(wets)[5])


def test_prec_type_koistinen_cold():
    rain, snow, _ = storage.calc_prec_type(
        np.array([-9999]), np.array([0.5]), np.array([-5.0]),
        np.array([90.0]), P)
    assert float(snow[0]) == 0.5 and float(rain[0]) == 0.0


def test_prec_below_minimum_dropped():
    rain, snow, _ = storage.calc_prec_type(
        np.array([1]), np.array([1e-6]), np.array([5.0]), np.array([80.0]), P)
    assert float(rain[0]) == 0.0 and float(snow[0]) == 0.0


def test_storage_invariants_random():
    """Property test: storages remain non-negative & bounded through road_cond."""
    rng = np.random.default_rng(0)
    n = 256
    s = storage.Storages(
        wat=jnp.asarray(rng.uniform(0, 3, n)),
        snow=jnp.asarray(rng.uniform(0, 120, n)),
        ice=jnp.asarray(rng.uniform(0, 60, n)),
        ice2=jnp.asarray(rng.uniform(0, 60, n)),
        dep=jnp.asarray(rng.uniform(0, 3, n)))
    tsurf = jnp.asarray(rng.uniform(-30, 20, n))
    evap = jnp.asarray(rng.uniform(-0.05, 0.05, n))
    q2 = jnp.asarray(rng.uniform(0, 500, n))
    t4 = jnp.full(n, P.t4melt_normal)
    vc = jnp.zeros(n, bool)
    out, vc2, q2n, t4n = storage.road_cond(
        s, tsurf, evap, q2, t4, vc, 30.0 / 3600.0, 30.0, False, False, P)
    for name, arr in out._asdict().items():
        a = np.asarray(arr)
        assert np.all(a >= 0.0), name
    assert np.all(np.asarray(out.wat) <= P.max_wat_mms + 1e-12)
    assert np.all(np.asarray(out.ice) <= P.max_ice_mms + 1e-12)
    assert np.all(np.asarray(out.dep) <= P.max_dep_mms + 1e-12)
    assert np.all(np.asarray(q2n) >= 0.0)


def test_albedo_range():
    rng = np.random.default_rng(1)
    n = 128
    s = storage.Storages(*(jnp.asarray(rng.uniform(0, 50, n)) for _ in range(5)))
    alb = storage.albedo_update(jnp.full(n, 0.1), s, P)
    a = np.asarray(alb)
    assert np.all(a >= P.alb_dry - 1e-12) and np.all(a <= P.alb_snow + 1e-12)


def test_melting_energy_limited():
    """melting() never extracts more heat than QAvail allows: temperature is
    pinned at T4Melt+0.01 when all available heat is used."""
    g = make_grid(P, 15)
    n = 1
    s = storage.Storages(*(jnp.full(n, v) for v in (0.0, 5.0, 0.0, 0.0, 0.0)))
    tmp_new = jnp.full((n, 17), 3.0, dtype=jnp.float64)
    hs1 = jnp.full(n, 1000.0)
    q2 = jnp.full(n, 1e9)  # demand far exceeding availability
    t4 = jnp.full(n, 0.25)
    tmp_out, tsurf_out, q2_out = storage.melting_limiter(
        s, tmp_new, jnp.full(n, 1.0), q2, t4, jnp.full(n, 10.0), hs1,
        jnp.zeros(n, bool), jnp.full(n, -9999.9), 1, 0.0, False, True, P)
    assert np.isclose(float(tmp_out[0, 1]), 0.26)
    assert np.isclose(float(tmp_out[0, 2]), 0.26)
    qavail = 1000.0 * (3.0 - 0.25)
    assert np.isclose(float(q2_out[0]), qavail)


def test_sun_position_sanity():
    """Solar elevation: noon Helsinki midsummer high, midnight below horizon."""
    jde_noon = julian_ephemeris_day(np.array([2019]), np.array([6]),
                                    np.array([21]), np.array([10]),
                                    np.array([0]), np.array([0]))
    e, a = elevation_azimuth(jnp.asarray(jde_noon), 60.17, 24.94)
    assert 50.0 < float(e[0]) < 55.0
    jde_night = julian_ephemeris_day(np.array([2019]), np.array([12]),
                                     np.array([21]), np.array([22]),
                                     np.array([0]), np.array([0]))
    e2, a2 = elevation_azimuth(jnp.asarray(jde_night), 60.17, 24.94)
    assert float(e2[0]) == -9999.9


def test_depth_interp_coeffs():
    g = make_grid(P, 15)
    idx, w = depth_interp_coeffs(g, 0.0)
    assert (idx, w) == (1, 0.0)
    idx, w = depth_interp_coeffs(g, g.zdepth[1])  # exactly at layer boundary
    assert idx == 1 and np.isclose(w, 1.0)
    idx, w = depth_interp_coeffs(g, 99.0)
    assert idx == 16


def test_very_cold_hysteresis():
    vc = jnp.array([False])
    vc = storage.very_cold_update(vc, jnp.array([-22.0]), P)
    assert bool(vc[0])
    vc = storage.very_cold_update(vc, jnp.array([-20.0]), P)  # in band: hold
    assert bool(vc[0])
    vc = storage.very_cold_update(vc, jnp.array([-18.0]), P)
    assert not bool(vc[0])
