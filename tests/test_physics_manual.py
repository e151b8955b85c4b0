"""Manual-equation unit tests (round-1 review item 6).

Each test restates the governing formula INDEPENDENTLY, transcribed afresh
from the reference Fortran / user-manual equations, and checks the physics
module against it -- a third source besides the oracle and the engine, so a
shared transcription error in both cannot hide.  Citations are to the
reference files the equations come from.
"""
import numpy as np
import jax.numpy as jnp

from roadsurf_tpu.config import MISSING, ModelSettings, PhysicsParams


def P():
    return PhysicsParams().derive(30.0)


# --- WearFactors (src/Cond.f90:69-103) --------------------------------------

def test_wear_factors_formula():
    from roadsurf_tpu.physics.storage import Storages, wear_factors
    p = P()
    tph = 30.0 / 3600.0 * 120.0   # arbitrary positive factor
    for snow, ice, ice2, dep, wat in [(0.5, 0.3, 0.2, 0.1, 1.4),
                                      (0.1, 0.0, 0.0, 0.0, 0.0),
                                      (0.0, 4.0, 3.0, 2.0, 0.3)]:
        s = Storages(*(jnp.asarray([v]) for v in (wat, snow, ice, ice2, dep)))
        w = wear_factors(s, tph, p)
        # independent restatement
        snow_tran = max((0.2 + 0.25) * snow, 0.01)
        if snow < 0.2:
            snow_tran *= 3.0
        snow_tran *= tph
        ice_wear = max(1.1 * 2.0 * 0.145 * ice, 0.01) * tph
        ice_wear2 = max(1.1 * 2.0 * (4.0 * 0.290) * ice2, 0.01) * tph
        dep_wear = max(0.5 * 2.0 * (4.0 * 0.290) * dep, 0.01) * tph
        wat_wear = 10.0 * max(0.145 * wat, 0.06) * tph
        np.testing.assert_allclose(w.snow_tran[0], snow_tran, rtol=1e-12)
        np.testing.assert_allclose(w.ice_wear[0], ice_wear, rtol=1e-12)
        np.testing.assert_allclose(w.ice_wear2[0], ice_wear2, rtol=1e-12)
        np.testing.assert_allclose(w.dep_wear[0], dep_wear, rtol=1e-12)
        np.testing.assert_allclose(w.wat_wear[0], wat_wear, rtol=1e-12)


# --- Campbell heat capacity (src/BalanceModel.f90:205-236) -------------------

def test_volumetric_heat_capacity_campbell():
    from roadsurf_tpu.physics.soil import volumetric_heat_capacity
    p = P()
    temps = np.array([[-12.0, -0.5, 0.0, 4.0, 17.0]])
    wcont = np.full(5, 0.12)
    got = np.asarray(volumetric_heat_capacity(jnp.asarray(temps),
                                              jnp.asarray(wcont), p))[0]
    for li, t in enumerate(temps[0]):
        if t < 0.0:                       # ice, Oke p.44
            chwt = 920.0 * 2100.0
        else:                             # liquid water polynomials
            roo = -0.0050 * t**2 + 0.0079 * t + 1000.0028
            cwt = (0.0000102 * t**4 - 0.0017169 * t**3 + 0.11516 * t**2
                   - 3.4739 * t + 4217.2)
            chwt = roo * cwt
        dry = ((1.0 - p.poro1) * p.vsh1 if li < 2
               else (1.0 - p.poro2) * p.vsh2)
        np.testing.assert_allclose(got[li], dry + 0.12 * chwt, rtol=1e-12,
                                   err_msg=f"layer {li} T={t}")


# --- Relaxation decay (src/Relaxation.f90:33-44) -----------------------------

def test_relaxation_decay_closed_form():
    from roadsurf_tpu.forcing import prepare
    from roadsurf_tpu.io.synthetic import synthetic_raw
    from roadsurf_tpu.state import default_point_params
    T, dt = 60, 30.0
    settings = ModelSettings(sim_len=T, dt=dt, use_relaxation=True)
    raw, cal = synthetic_raw(1, T, dt=dt, seed=9)
    init_len = 10                       # anchor step t0 = init_len - 1
    pts = default_point_params(1, init_len=init_len)
    rows = np.arange(1)
    tair = np.asarray(raw.tair)
    pts = pts._replace(
        tair_relax=tair[rows, init_len - 1] + 1.5,
        vz_relax=np.asarray(raw.vz)[rows, init_len - 1] + 0.2,
        rh_relax=np.asarray(raw.rhz)[rows, init_len - 1] - 3.0)
    prep = prepare(raw, pts, cal, settings, P())
    # i > initLenI: X -= (X_R - X_initEnd) * exp(-(DTs*i - DTs*initLI)/(4*3600))
    anchor = tair[0, init_len - 1]
    for t in (init_len, init_len + 5, T - 10):
        i = t + 1                        # 1-based
        dec = np.exp(-((dt * i) - (dt * init_len)) / (4.0 * 3600.0))
        want = tair[0, t] - 1.5 * dec
        np.testing.assert_allclose(np.asarray(prep.tair)[t, 0], want,
                                   rtol=1e-12, err_msg=f"step {t}")
    # at/before the anchor step: untouched
    np.testing.assert_allclose(np.asarray(prep.tair)[init_len - 1, 0],
                               tair[0, init_len - 1], rtol=1e-12)


# --- Post-coupling decay + lastValues freeze (src/Coupling.f90:82-88) --------

def test_cof_window_closed_form():
    from roadsurf_tpu.forcing import cof_window
    T, dt, tau = 100, 30.0, 14400.0
    settings = ModelSettings(sim_len=T, dt=dt,
                             coupling_effect_reduction=tau)
    corr = jnp.asarray([0.4])
    end = jnp.asarray([50], jnp.int32)
    sw, lw = cof_window(corr, corr, end, 50, T - 50, T, settings)
    for k, row in ((0, 0), (10, 10)):
        i = 51 + k                       # 1-based step of output row
        want = 1.0 + 0.4 * np.exp(-((dt * i) - (dt * 50)) / tau)
        np.testing.assert_allclose(np.asarray(sw)[row, 0], want, rtol=1e-12)
    # lastValues: the final step reuses the step T-1 value
    want_last = 1.0 + 0.4 * np.exp(-((dt * (T - 1)) - (dt * 50)) / tau)
    np.testing.assert_allclose(np.asarray(sw)[-1, 0], want_last, rtol=1e-12)
    # a window ending at T-1 freezes the UNDECAYED trial coefficient
    sw2, _ = cof_window(corr, corr, jnp.asarray([T - 1], jnp.int32),
                        T - 1, 1, T, settings)
    np.testing.assert_allclose(np.asarray(sw2)[0, 0], 1.4, rtol=1e-12)


# --- snowIceCheck thresholds (src/Coupling.f90:259-289) ----------------------

def test_snow_ice_check_thresholds():
    from roadsurf_tpu.physics.storage import Storages, snow_ice_check
    p = P()
    s = Storages(*(jnp.asarray([1.0]) for _ in range(5)))
    warm = snow_ice_check(s, jnp.asarray([max(p.t_lim_melt_snow,
                                              p.t_lim_melt_ice,
                                              p.t_lim_melt_dep) + 1.0]), p)
    # snow/ice/deposit melt INTO water; ice2 is zeroed WITHOUT adding water
    np.testing.assert_allclose(warm.wat[0], 1.0 + 1.0 + 1.0 + 1.0)
    assert float(warm.snow[0]) == float(warm.ice[0]) == 0.0
    assert float(warm.ice2[0]) == float(warm.dep[0]) == 0.0
    cold = snow_ice_check(s, jnp.asarray([min(p.t_lim_melt_snow,
                                              p.t_lim_melt_ice,
                                              p.t_lim_melt_dep) - 1.0]), p)
    for f in cold:
        np.testing.assert_allclose(f[0], 1.0)


# --- TsurfAve (src/BalanceModel.f90:78-84, getTempAtDepth :390-417) ----------

def test_surface_average_weights():
    from roadsurf_tpu.physics.soil import surface_average
    tmp = jnp.asarray([[5.0, -1.0, -3.0, -4.0, -6.0]])
    np.testing.assert_allclose(
        np.asarray(surface_average(tmp, 1, 0.0, False))[0],
        (-1.0 + -3.0) / 2.0)
    np.testing.assert_allclose(
        np.asarray(surface_average(tmp, 2, 0.25, True))[0],
        -3.0 + 0.25 * (-4.0 - -3.0))


# --- Sky-view radiation modification (src/ModRadiation.f90:7-73) -------------

def test_modify_radiation_closed_form():
    from roadsurf_tpu.physics.radiation import modify_radiation
    p = P()
    sw, sw_dir, lw, lw_net = 500.0, 300.0, 280.0, -60.0
    sky = 0.6
    a = p.albedo_surroundings
    # sun up, horizon BLOCKS the direct beam (horizon > elevation)
    horizons = np.full(360, 45.0)
    swm, lwm = modify_radiation(
        jnp.asarray([sw]), jnp.asarray([sw_dir]), jnp.asarray([lw]),
        jnp.asarray([lw_net]), jnp.asarray([20.0]), jnp.asarray([180.0]),
        sky, jnp.asarray(horizons), p)
    dif = sw - sw_dir
    sw_dir_m = 0.0                                    # shadowed
    sw_ref = a * sw_dir_m + a * dif
    want_sw = sky * dif + (1.0 - sky) * sw_ref + sw_dir_m
    want_lw = sky * lw + (1.0 - sky) * (-(lw_net - lw))
    np.testing.assert_allclose(np.asarray(swm)[0], want_sw, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(lwm)[0], want_lw, rtol=1e-12)
    # sun below the horizon sentinel: SW passes through unmodified
    swm2, _ = modify_radiation(
        jnp.asarray([sw]), jnp.asarray([sw_dir]), jnp.asarray([lw]),
        jnp.asarray([lw_net]), jnp.asarray([-5.0]), jnp.asarray([-9999.9]),
        sky, jnp.asarray(horizons), p)
    np.testing.assert_allclose(np.asarray(swm2)[0], sw, rtol=1e-12)


# --- Koistinen phase probability (src/Cond.f90:221-245) ----------------------

def test_koistinen_sleet_band():
    from roadsurf_tpu.physics.storage import calc_prec_type
    p = P()
    # pick (T, RH) with p_lim_snow < PRain < p_lim_rain -> half rain half snow
    tair, rhz = 1.1, 95.0
    prain = 1.0 / (1.0 + np.exp(22.0 - 2.7 * tair - 0.20 * rhz))
    assert p.p_lim_snow < prain < p.p_lim_rain, prain
    rain, snow, wets = calc_prec_type(
        jnp.asarray([-9999]), jnp.asarray([1.0]), jnp.asarray([tair]),
        jnp.asarray([rhz]), p)
    np.testing.assert_allclose(rain[0], 0.5, rtol=1e-12)
    np.testing.assert_allclose(snow[0], 0.5, rtol=1e-12)
    assert bool(wets[0])


# --- Koistinen reference probability values ---------------------------------

def test_koistinen_reference_values():
    # spot values of the published formula itself
    for t, rh in [(-2.0, 95.0), (2.0, 70.0), (0.0, 90.0)]:
        pr = 1.0 / (1.0 + np.exp(22.0 - 2.7 * t - 0.20 * rh))
        assert 0.0 <= pr <= 1.0
    # cold+humid must classify snow, warm+humid rain
    pr_cold = 1.0 / (1.0 + np.exp(22.0 - 2.7 * -5.0 - 0.20 * 95.0))
    pr_warm = 1.0 / (1.0 + np.exp(22.0 - 2.7 * 8.0 - 0.20 * 95.0))
    p = P()
    assert pr_cold < p.p_lim_snow and pr_warm > p.p_lim_rain


# --- HStor quarter-weighting (src/BalanceModel.f90:311-322) ------------------

def test_hstor_quarter_weighting():
    from roadsurf_tpu.physics.soil import soil_step, volumetric_heat_capacity
    p = P()
    L = 4
    dyc = jnp.asarray([0.05, 0.1, 0.2, 0.4])
    cond_dz = jnp.asarray([10.0, 5.0, 2.0, 1.0])
    wcont = jnp.asarray([0.1, 0.1, 0.2, 0.2])
    tmp = jnp.asarray([[2.0, 1.0, 0.5, 0.2, 0.1, 0.0]])
    out = soil_step(tmp, wcont, dyc, cond_dz, jnp.asarray([8.0]),
                    jnp.asarray([50.0]), jnp.asarray([5.0]), 1.0, 30.0, p)
    t1_ave = (tmp[0, 1] + 3.0 * tmp[0, 2]) / 4.0
    tn_ave = (out.tmp_new[0, 1] + 3.0 * out.tmp_new[0, 2]) / 4.0
    vsh1 = np.asarray(volumetric_heat_capacity(tmp[:, 1:L + 1], wcont, p))[0, 0]
    hs1 = vsh1 * float(dyc[0]) / 30.0
    np.testing.assert_allclose(np.asarray(out.hstor)[0],
                               hs1 * float(tn_ave - t1_ave), rtol=1e-10)
