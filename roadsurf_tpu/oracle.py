"""Scalar float64 oracle: a literal re-derivation of the reference semantics.

This module is the framework's parity baseline.  It follows the reference's
per-point control flow statement-for-statement (plain Python ifs, in-place
mutation, one point at a time, float64) so that the vectorized branch-free
JAX path can be validated against it bit-for-bit-ish (the reference Fortran
could not be built here -- no gfortran in the image -- so this oracle stands
in for libroadsurf; every block cites the file:line it re-derives).

Not performance code.  Used by tests and for golden-trajectory generation.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import numpy as np

from .config import ModelSettings, PhysicsParams, MISSING
from .grid import LayerGrid, day_of_year, make_grid

SNOW_DRY = 1
SNOW_WET = 2


@dataclasses.dataclass
class OraclePoint:
    """Per-point inputs for the oracle (cf. LocalParameters)."""
    lat: float = 60.2
    lon: float = 24.9
    sky_view: float = 1.0
    horizons: Optional[np.ndarray] = None    # [360]
    init_len: int = 1                        # InitLenI, 1-based
    tair_relax: float = MISSING
    vz_relax: float = MISSING
    rh_relax: float = MISSING
    coupling_index: int = -9999              # 1-based obs step (couplingIndexI)
    coupling_tsurf: float = MISSING
    out_depth: float = MISSING               # per-point output depth (m)


class Oracle:
    """One-point reference simulation (examples/example1/src/Simulation.f90)."""

    def __init__(self, settings: ModelSettings, params: PhysicsParams,
                 grid: Optional[LayerGrid] = None):
        self.s = settings
        self.p = params.derive(settings.dt)
        self.grid = grid or make_grid(self.p, settings.nlayers)

    # ------------------------------------------------------------------
    def run(self, forcing: dict, cal, pt: OraclePoint) -> np.ndarray:
        """forcing: dict of [T] float64 arrays with keys tair, tdew, vz, rhz,
        prec, sw, lw, sw_dir, lw_net, tsurf_obs, prec_phase.
        cal: Calendar ([T] int arrays).  Returns [T, 6] output
        (tsurf, water, snow, ice, ice2, dep), -9999 after failure."""
        s, p, g = self.s, self.p, self.grid
        n = s.nlayers
        T = s.sim_len
        f = {k: np.array(v, dtype=np.float64) for k, v in forcing.items()}
        f["prec_phase"] = np.array(forcing["prec_phase"], dtype=np.int64)

        out = np.full((T, 6), -9999.0)

        # ---------------- Initialization (src/Initialization.f90) -------
        tph = s.dt / 3600.0
        # depth grid/static props from self.grid
        z = g.zdepth
        wcont = g.wcont
        cc = g.cc
        cond_dz = -(cc / g.dyk)

        # initTemp :238-287
        tmp = np.zeros(n + 2)
        tmp[0] = f["tair"][0]
        tsurf0 = f["tsurf_obs"][0]
        tmp[1:5] = tsurf0 if tsurf0 > -100.0 else f["tair"][0]
        juld = day_of_year(int(cal.year[0]), int(cal.month[0]), int(cal.day[0]))
        tmp[n + 1] = p.t_clim_g + p.az * math.sin(
            p.omega * juld + p.omega * (-170.0) - z[n] / p.damp_depth)
        for i in range(5, n + 1):
            tmp[i] = tmp[4] + (tmp[n + 1] - tmp[4]) / (z[n] - z[3]) * (z[i - 1] - z[3])

        # effective output depth: global setting wins, else per-point
        # (InputOutput.f90:125-130; ex2 modelInput%depth)
        eff_depth = (s.tsurf_output_depth if s.tsurf_output_depth >= 0.0
                     else (pt.out_depth if pt.out_depth >= 0.0 else None))
        self._eff_depth = eff_depth
        def tsurf_from_profile():
            if eff_depth is not None:
                return self._temp_at_depth(tmp, eff_depth)
            return 0.5 * (tmp[1] + tmp[2])

        tsurf_ave = tsurf_from_profile()

        # surface / atm state (initSurf :290-308, initVariables :361-394)
        wat = snow = ice = ice2 = dep = 0.0
        q2melt = 0.0
        t4melt = p.t4melt_normal
        very_cold = False
        evap = 0.0
        albedo = p.albedo
        blcond = -99.9
        hstor = 0.0

        # first wind clamp + first BLCond evaluation (:119-139)
        if f["vz"][0] < 0.4:
            f["vz"][0] = 0.4
        blcond, psim, psih, le_flux, evap = self._bl_cond_and_le(
            blcond, tsurf_ave, f["tair"][0], f["vz"][0], f["rhz"][0], wat)

        # relaxation setup (setInputParam, src/InputOutput.f90:4-39)
        use_relax = s.use_relaxation
        if (pt.tair_relax < -100.0 or pt.tair_relax > 100.0
                or pt.vz_relax < 0.0 or pt.vz_relax > 100.0
                or pt.rh_relax < 0.0 or pt.rh_relax > 110.0):
            use_relax = False
        tair_init_end = vz_init_end = rhz_init_end = -99.9

        # coupling setup (setInputParam :30-36, initCouplingTimes :486-534)
        use_coupling = s.use_coupling
        last_tsurf_obs = pt.coupling_tsurf
        if pt.coupling_tsurf < -100.0 or pt.coupling_index < 1:
            use_coupling = False
        coupling_end = pt.coupling_index
        coupling_len = int(s.coupling_minutes * 60 / s.dt)
        if use_coupling and coupling_end > -1:
            coupling_start = 1 if coupling_end <= coupling_len \
                else coupling_end - coupling_len
        else:
            use_coupling = False
            coupling_start = -99
        coupling_failed = last_tsurf_obs < -100.0
        # CouplingVariables (initCoupling, src/Coupling.f90:144-169)
        cpl = dict(iterations=0, t_above=-9999.0, t_below=-9999.0,
                   radcoeff=1.0, radc_above=-9999.0, radc_below=-9999.0,
                   radc_prev=1.0, sw_cof=1.0, lw_cof=1.0, again=False,
                   sw_corr=0.0, lw_corr=0.0, tsurf_end1=0.0)
        in_coupling = False
        snapshot = None

        failed = False
        trf_fric = 5.0
        tair = vz = rhz = prec_step = 0.0
        snow_type = SNOW_DRY

        sky_active = 1.0 > pt.sky_view > -0.01

        # ---------------- time loop (Simulation.f90:58-95) ---------------
        i = 1
        while i < T and not failed:
            # CheckValues (src/InputOutput.f90:45-84).  NOTE: the reference
            # does NOT exit the loop body on failure -- the failing step still
            # executes and writes its output; the `do while` guard stops the
            # NEXT iteration (Simulation.f90:58-95).
            failed = failed or self._check_values(f, i - 1, sky_active)
            if f["sw_dir"][i - 1] > f["sw"][i - 1]:
                f["sw_dir"][i - 1] = f["sw"][i - 1]
            if tsurf_ave < -100.0 or tsurf_ave > 100.0:
                failed = True

            # CouplingOperations1 (src/Coupling.f90:10-96)
            if use_coupling:
                in_coupling = coupling_start <= i <= coupling_end
                if i == coupling_start and cpl["iterations"] == 0:
                    snapshot = dict(
                        i=i, tsurf_ave=tsurf_ave, wat=wat, ice2=ice2,
                        dep=dep, snow=snow, albedo=albedo,
                        very_cold=very_cold, tmp=tmp.copy(),
                        sw=f["sw"][coupling_start - 1:coupling_end].copy(),
                        sw_dir=f["sw_dir"][coupling_start - 1:coupling_end].copy(),
                        lw=f["lw"][coupling_start - 1:coupling_end].copy())
                    cpl.update(sw_cof=1.0, lw_cof=1.0, sw_corr=0.0, lw_corr=0.0)
                if cpl["again"]:
                    # uploadDataForCoupling :213-255 (rewinds i; note ice
                    # storage is NOT restored -- the save writes Ice2 twice,
                    # a reference quirk at Coupling.f90:194-195)
                    i = snapshot["i"]
                    tsurf_ave = snapshot["tsurf_ave"]
                    wat = snapshot["wat"]
                    ice2 = snapshot["ice2"]
                    dep = snapshot["dep"]
                    snow = snapshot["snow"]
                    albedo = snapshot["albedo"]
                    very_cold = snapshot["very_cold"]
                    tmp = snapshot["tmp"].copy()
                    f["sw"][coupling_start - 1:coupling_end] = snapshot["sw"]
                    f["sw_dir"][coupling_start - 1:coupling_end] = snapshot["sw_dir"]
                    f["lw"][coupling_start - 1:coupling_end] = snapshot["lw"]
                    cpl["again"] = False
                    if (f["sw"][i - 1] > f["lw"][i - 1]) and not sky_active:
                        cpl["sw_cof"] = cpl["radcoeff"]
                        cpl["lw_cof"] = 1.0
                    else:
                        cpl["sw_cof"] = 1.0
                        cpl["lw_cof"] = cpl["radcoeff"]
                if i > coupling_end:
                    dts = s.dt
                    dec = math.exp(-((dts * i) - (dts * coupling_end))
                                   / s.coupling_effect_reduction)
                    cpl["sw_cof"] = 1.0 + cpl["sw_corr"] * dec
                    cpl["lw_cof"] = 1.0 + cpl["lw_corr"] * dec
                if in_coupling:
                    # snowIceCheck (src/Coupling.f90:259-289)
                    if last_tsurf_obs > p.t_lim_melt_snow and snow > 0.0:
                        wat += snow
                        snow = 0.0
                    if last_tsurf_obs > p.t_lim_melt_ice and ice > 0.0:
                        wat += ice
                        ice = 0.0
                    if last_tsurf_obs > p.t_lim_melt_ice and ice2 > 0.0:
                        ice2 = 0.0
                    if last_tsurf_obs > p.t_lim_melt_dep and dep > 0.0:
                        wat += dep
                        dep = 0.0

            # SetCurrentValues (src/InputOutput.f90:86-149)
            tair = f["tair"][i - 1]
            vz = f["vz"][i - 1]
            rhz = f["rhz"][i - 1]
            prec_step = f["prec"][i - 1] / 3600.0 * s.dt
            tmp[0] = tair
            if i <= pt.init_len or s.force_tsurf:
                obs = f["tsurf_obs"][i - 1]
                if obs > -100.0 and (not use_coupling or i < coupling_start):
                    tmp[1] = obs
                    tmp[2] = obs
                    tsurf_ave = tsurf_from_profile()

            # RelaxationOperations (src/Relaxation.f90:10-47)
            if use_relax:
                if i == pt.init_len:
                    tair_init_end, vz_init_end, rhz_init_end = tair, vz, rhz
                if i > pt.init_len:
                    dec = math.exp(-((s.dt * i) - (s.dt * pt.init_len)) / (4.0 * 3600.0))
                    tair = tair - (pt.tair_relax - tair_init_end) * dec
                    tmp[0] = tair
                    vz = vz - (pt.vz_relax - vz_init_end) * dec
                    rhz = rhz - (pt.rh_relax - rhz_init_end) * dec
                    rhz = min(rhz, 100.0)

            # roadModelOneStep (Simulation.f90:120-172)
            (tmp, tsurf_ave, wat, snow, ice, ice2, dep, q2melt, t4melt,
             very_cold, evap, blcond, albedo, hstor, snow_type) = \
                self._road_model_one_step(
                    f, cal, i, pt, tair, vz, rhz, prec_step, tmp, tsurf_ave,
                    wat, snow, ice, ice2, dep, q2melt, t4melt, very_cold,
                    evap, blcond, albedo, hstor, snow_type, in_coupling,
                    last_tsurf_obs, cpl, sky_active)

            out[i - 1] = (tsurf_ave, wat, snow, ice, ice2, dep)

            # CheckEndCoupling (src/Coupling.f90:98-118) ->
            # CouplingOperations2 -> Coupling_control
            if use_coupling and i == coupling_end and not coupling_failed:
                if cpl["iterations"] == 0:
                    cpl["tsurf_end1"] = tsurf_ave
                coupling_failed = self._coupling_control(
                    tsurf_ave, last_tsurf_obs, cpl, coupling_failed)
                cpl["iterations"] += 1

            i += 1

        # last step (Simulation.f90:100-113; lastValues InputOutput.f90:169-198)
        if not failed:
            tair = f["tair"][T - 1]
            vz = f["vz"][T - 1]
            rhz = f["rhz"][T - 1]
            prec_step = f["prec"][T - 1] / 3600.0 * s.dt
            tmp[0] = tair
            tsurf_ave = tsurf_from_profile()
            (tmp, tsurf_ave, wat, snow, ice, ice2, dep, q2melt, t4melt,
             very_cold, evap, blcond, albedo, hstor, snow_type) = \
                self._road_model_one_step(
                    f, cal, T, pt, tair, vz, rhz, prec_step, tmp, tsurf_ave,
                    wat, snow, ice, ice2, dep, q2melt, t4melt, very_cold,
                    evap, blcond, albedo, hstor, snow_type, in_coupling,
                    last_tsurf_obs, cpl, sky_active)
            out[T - 1] = (tsurf_ave, wat, snow, ice, ice2, dep)
        return out

    # ------------------------------------------------------------------
    def _check_values(self, f, idx, sky_active) -> bool:
        v = lambda k: f[k][idx]
        if (v("tair") < -90.0 or v("tair") > 100.0
                or v("tdew") < -90.0 or v("tdew") > 100.0
                or v("rhz") < -0.1 or v("rhz") > 120.0
                or v("vz") < -1.0 or v("vz") > 100.0
                or v("sw") < -0.1 or v("sw") > 4000.0
                or v("lw") < -0.1 or v("lw") > 1000.0
                or v("prec") < -0.1 or v("prec") > 500.0):
            return True
        if sky_active:
            if (v("sw_dir") < -0.1 or v("sw_dir") > 4000.0
                    or v("lw_net") < -1000.0 or v("lw_net") > 1000.0):
                return True
        return False

    # ------------------------------------------------------------------
    def _road_model_one_step(self, f, cal, i, pt, tair, vz, rhz, prec_step,
                             tmp, tsurf_ave, wat, snow, ice, ice2, dep,
                             q2melt, t4melt, very_cold, evap, blcond, albedo,
                             hstor, snow_type, in_coupling, last_tsurf_obs,
                             cpl, sky_active):
        s, p = self.s, self.p
        idx = i - 1

        # PrecipitationToStorage (src/Storage.f90:9-29) + CalcPrecType
        rain_ts, snow_ts, snow_type = self._calc_prec_type(
            int(f["prec_phase"][idx]), prec_step, tair, rhz, snow_type)
        wat += rain_ts
        snow += snow_ts

        # ModRadiationBySurroundings (src/ModRadiation.f90:7-73)
        if sky_active:
            self._mod_radiation(f, cal, idx, pt)

        # ---- BalanceModelOneStep (src/BalanceModel.f90:7-86) ----------
        # SetDayDependendVariables :354-387
        hour = int(cal.hour[idx])
        if hour >= p.night_on or hour <= p.night_off:
            calm_lim, trf_fric = p.calm_lim_ngt, p.trf_fric_ngt
        else:
            calm_lim, trf_fric = p.calm_lim_day, p.trf_fric_day
        if vz < calm_lim:
            vz = calm_lim

        blcond, psim, psih, le_flux, evap = self._bl_cond_and_le(
            blcond, tsurf_ave, tair, vz, rhz, wat)

        # CalcRNet :282-307
        tk = tsurf_ave + 273.15
        rbb = p.emiss * p.sb_const * tk ** 4
        rnet = ((1.0 - albedo) * f["sw"][idx] * cpl["sw_cof"]
                + p.emiss * f["lw"][idx] * cpl["lw_cof"] - rbb)

        # CalcHCapHCond :189-251 (uses TmpNw == Tmp at entry)
        g = self.grid
        n = s.nlayers
        vsh = np.zeros(n)
        for j in range(n):
            t = tmp[j + 1]
            if t >= 0.0:
                roo = -0.0050 * t * t + 0.0079 * t + 1000.0028
                cw = (0.0000102 * t ** 4 - 0.0017169 * t ** 3
                      + 0.11516 * t * t - 3.4739 * t + 4217.2)
            else:
                roo, cw = 920.0, 2100.0
            chwt = roo * cw
            if j < 2:
                vsh[j] = (1.0 - p.poro1) * p.vsh1 + g.wcont[j] * chwt
            else:
                vsh[j] = (1.0 - p.poro2) * p.vsh2 + g.wcont[j] * chwt
        hs = vsh * g.dyc / s.dt
        cap_dz = -1.0 / (g.dyc * vsh)
        cond_dz = -(g.cc / g.dyk)

        # calcProfile :90-129
        sens = blcond * (tmp[0] - tmp[1])
        gflux = np.zeros(n + 1)
        gflux[0] = rnet - le_flux + trf_fric + sens
        for j in range(1, n + 1):
            gflux[j] = cond_dz[j - 1] * (tmp[j + 1] - tmp[j])
        tmp_new = tmp.copy()
        for j in range(1, n + 1):
            tmp_new[j] = tmp[j] + s.dt * cap_dz[j - 1] * (gflux[j] - gflux[j - 1])

        # calcHStor :311-322
        t1a = (tmp[1] + 3.0 * tmp[2]) / 4.0
        tna = (tmp_new[1] + 3.0 * tmp_new[2]) / 4.0
        hstor = hs[0] * (tna - t1a)

        # melting (src/Storage.f90:319-402)
        q2melt, tsurf_ave = self._melting(
            tmp_new, tsurf_ave, wat, snow, ice, ice2, dep, q2melt, t4melt,
            hstor, hs[0], in_coupling, last_tsurf_obs)

        tmp = tmp_new
        if self._eff_depth is not None:
            tsurf_ave = self._temp_at_depth(tmp, self._eff_depth)
        else:
            tsurf_ave = 0.5 * (tmp[1] + tmp[2])

        # ---- WearFactors (src/Cond.f90:69-103) ------------------------
        tph = s.dt / 3600.0
        snow_tran = max((0.2 + 0.25) * snow, 0.01)
        if snow < 0.2:
            snow_tran *= 3.0
        snow2ice = 0.25 / (0.2 + 0.25)
        snow_tran *= tph
        ice_wear = max(1.1 * 2.0 * 0.145 * ice, 0.01) * tph
        ice_wear2 = max(1.1 * 2.0 * 4.0 * 0.290 * ice2, 0.01) * tph
        dep_wear = max(0.5 * 2.0 * 4.0 * 0.290 * dep, 0.01) * tph
        wat_wear = 10.0 * max(0.145 * wat, 0.06) * tph

        # ---- RoadCond (src/Cond.f90:9-65) -----------------------------
        snow_type = SNOW_DRY
        if very_cold and tsurf_ave > p.t_lim_cold_h:
            very_cold = False
        if not very_cold and tsurf_ave < p.t_lim_cold_l:
            very_cold = True

        # WaterStorage (src/Storage.f90:33-84)
        if snow <= 0.0 and ice <= 0.0 and dep <= 0.0 and tsurf_ave > p.t_lim_dew:
            if wat > p.max_por_mms:
                wat -= evap
            else:
                wat -= p.por_eva_f * evap
        if wat > 0.0:
            ww = 0.0 if wat < p.w_wear_lim else wat_wear
            if wat > p.w_wet_lim:
                wat -= ww
            else:
                wat -= p.damp_wear_f * ww
        if wat < p.min_wat_mms:
            wat = 0.0
        if wat > p.max_wat_mms:
            wat = p.max_wat_mms
        srf_ext = max(wat - p.max_por_mms, 0.0)

        # SnowStorage (src/Storage.f90:88-196)
        rd = srf_ext + snow
        wat_snow_rat = srf_ext / rd if rd > 0.001 else 0.0
        if snow > 0.0:
            if wat_snow_rat > p.wet_snow_form_r:
                snow_type = SNOW_WET
        else:
            snow_type = SNOW_DRY
        if snow > 0.0 and dep > 0.0:
            ice += dep
            dep = 0.0
        if snow > 0.0:
            if self.s.force_snow_melting:
                wat += snow
                snow = 0.0
            elif q2melt > 0.0 and tsurf_ave >= p.t_lim_melt_snow:
                melted = (q2melt * s.dt) / (p.wat_m_heat * p.wat_dens)
                snow -= 1000.0 * melted
                wat += 1000.0 * melted
        if snow > 0.0:
            snow -= snow_tran
            ice += snow2ice * snow_tran
            ice2 += snow2ice * snow_tran
        if snow > 0.0 and snow_type == SNOW_WET:
            if wat_snow_rat > p.wet_snow_melt_r:
                wat += snow
                snow = 0.0
                snow_type = SNOW_DRY
            if tsurf_ave < p.t_lim_freeze:
                ice += snow + wat
                ice2 += snow + wat
                snow_type = SNOW_DRY
                snow = 0.0
                wat = 0.0
        srf_ext = max(wat - p.max_por_mms, 0.0)
        if snow < p.min_snow_mms:
            snow = 0.0
        if snow > p.max_snow_mms:
            snow -= p.max_snow_mms / 2.0

        # IceStorage (src/Storage.f90:199-267)
        if tsurf_ave < p.t_lim_freeze and wat > 0.0:
            ice += wat
            ice2 += wat
            wat = 0.0
        if snow <= 0.0 and ice > 0.0:
            if self.s.force_ice_melting:
                wat += ice
                ice = 0.0
                ice2 = 0.0
            elif q2melt > 0.0 and tsurf_ave >= p.t_lim_melt_ice:
                melted = (q2melt * s.dt) / (p.wat_m_heat * p.wat_dens)
                ice -= 1000.0 * melted
                ice2 -= 1000.0 * melted
                wat += 1000.0 * melted
        if ice > 0.0:
            ice -= ice_wear
        if ice2 > 0.0:
            ice2 -= ice_wear2
        if ice < p.min_ice_mms:
            ice = 0.0
        if ice > p.max_ice_mms:
            ice = p.max_ice_mms
        if ice2 < p.min_ice_mms:
            ice2 = 0.0
        if ice2 > p.max_ice_mms:
            ice2 = p.max_ice_mms

        # DepositStorage (src/Storage.f90:271-314)
        if evap < 0.0:
            dep -= evap
        if tsurf_ave > p.t_lim_melt_dep:
            wat += dep
            dep = 0.0
        if snow <= 0.0 and dep > 0.0:
            dep -= dep_wear
        if dep < p.min_dep_mms:
            dep = 0.0
        if dep > p.max_dep_mms:
            wat += dep - p.max_dep_mms
            dep = p.max_dep_mms

        # final water clamp (src/Cond.f90:61-62)
        if wat < p.min_wat_mms:
            wat = 0.0
        if wat > p.max_wat_mms:
            wat = p.max_wat_mms

        # NewMeltFreezeHeat (src/Storage.f90:409-432)
        q2melt = 0.0
        if snow > 0.0:
            q2melt = p.wat_m_heat * p.wat_dens * (snow / 1000.0) / s.dt
            t4melt = p.t_lim_melt_snow
        if snow <= 0.0 and ice > 0.0:
            q2melt = p.wat_m_heat * p.wat_dens * (ice / 1000.0) / s.dt
            t4melt = p.t_lim_melt_ice
        if q2melt < 0.0:
            q2melt = 0.0

        # CalcAlbedo (src/Cond.f90:105-139)
        ice_sum = max(0.5 * (ice + ice2) + dep, 0.0)
        albedo = p.alb_dry
        if snow > 0.01 and snow > ice:
            albedo = p.alb_snow
        elif ice > 0.01 or dep > 0.01:
            albedo = (p.alb_dry + (ice_sum / 1.5) * (p.alb_snow - p.alb_dry)
                      if ice_sum < 1.5 else p.alb_snow)

        return (tmp, tsurf_ave, wat, snow, ice, ice2, dep, q2melt, t4melt,
                very_cold, evap, blcond, albedo, hstor, snow_type)

    # ------------------------------------------------------------------
    def _calc_prec_type(self, phase, prec_step, tair, rhz, snow_type):
        """CalcPrecType (src/Cond.f90:143-249)."""
        p = self.p
        rain = snowfall = 0.0
        use_interp = True
        if phase > p.miss_val_i:
            use_interp = False
            if prec_step <= p.min_prec_mm:
                pass
            elif phase in (0, 1, 4, 5):
                rain = prec_step
                snow_type = SNOW_WET
            elif phase == 2:
                snowfall = prec_step / 2.0
                rain = snowfall
                snow_type = SNOW_WET
            elif phase in (3, 6):
                snowfall = prec_step
            else:
                use_interp = True
        if use_interp:
            if prec_step > p.min_prec_mm:
                pexp = 22.0 - 2.7 * tair - 0.20 * rhz
                prain = 1.0 / (1.0 + math.exp(pexp))
                if prain < p.p_lim_snow:
                    snowfall = prec_step
                elif prain > p.p_lim_rain:
                    rain = prec_step
                    snow_type = SNOW_WET
                else:
                    snowfall = prec_step / 2.0
                    rain = snowfall
                    snow_type = SNOW_WET
        return rain, snowfall, snow_type

    # ------------------------------------------------------------------
    def _bl_cond_and_le(self, blcond, tsurf, tair, vz, rhz, wat):
        """CalcBLCondAndLE (src/BoundaryLayer.f90:3-109)."""
        p = self.p
        tak = tair + 273.15
        air_dens = 100000.0 / (287.05 * tak)
        air_hcap = 1005.0 + (tak - 250.0) ** 2 / 3364.0
        air_vcap = air_hcap * air_dens
        psych_c = 0.1 * (0.00063 * tak + 0.47496)
        wat_den = -0.0050 * tsurf * tsurf + 0.0079 * tsurf + 1000.0028

        psim = psih = 0.0
        for j in range(1, 41):
            old = blcond
            ustar = p.vk_const * vz / (p.log_ustar + psim)
            blcond = air_vcap * p.vk_const * ustar / (p.log_cond + psih)
            stab = (-p.vk_const * p.zref_t * p.grav * blcond * (tsurf - tair)
                    / (air_vcap * (tair + 273.15) * ustar ** 3))
            if stab > 1.0:
                stab = 1.0
            if stab > 0.0:
                psih = 4.7 * stab
                psim = psih
            else:
                psih = -2.0 * math.log((1.0 + math.sqrt(1.0 - 16.0 * stab)) / 2.0)
                psim = 0.6 * psih
            if abs(blcond - old) < 1e-3 and j >= 5:
                break

        raero = (p.log_mom + psim) * (p.log_heat + psih) / (p.vk_const ** 2 * vz)
        if raero > 30.0:
            raero = 30.0

        # CalcLE :134-190
        if tsurf < 0.0:
            esurf = 0.61078 * math.exp(21.875 * tsurf / (tsurf + 265.5))
        else:
            esurf = 0.61078 * math.exp(17.269 * tsurf / (tsurf + 237.3))
        if tair < 0.0:
            esat = 0.61078 * math.exp(21.875 * tair / (tair + 265.5))
        else:
            esat = 0.61078 * math.exp(17.269 * tair / (tair + 237.3))
        eair = min(0.01 * rhz, 1.0) * esat
        le = air_dens * air_hcap * (esurf - eair) / (psych_c * raero)
        if tsurf >= 0.0:
            evap = le / (p.lvap * wat_den) * 1000.0 * self.s.dt
        else:
            evap = le / (p.lfus * wat_den) * 1000.0 * self.s.dt
        if le > 0.0 and wat <= 0.0:
            le = 0.0
            evap = 0.0
        return blcond, psim, psih, le, evap

    # ------------------------------------------------------------------
    def _melting(self, tmp_new, tsurf_ave, wat, snow, ice, ice2, dep,
                 q2melt, t4melt, hstor, hs1, in_coupling, last_obs):
        """melting (src/Storage.f90:319-402)."""
        p = self.p
        if snow > 0.0 or ice > 0.0 or ice2 > 0.0:
            while True:
                if not self.s.melting_can_change_temperature:
                    break
                guard = (hstor <= 0.00001 or tsurf_ave <= t4melt
                         or q2melt <= 0.0
                         or (in_coupling and last_obs < t4melt))
                if guard:
                    if tsurf_ave < 0.5:
                        q2melt = 0.0
                        break
                    elif tsurf_ave > 2.0:
                        qavail = hs1 * (tmp_new[1] - t4melt)
                        if qavail < q2melt:
                            q2melt = qavail
                        break
                qavail = hs1 * (tmp_new[1] - t4melt)
                if q2melt >= qavail:
                    q2melt = qavail
                    tmp_new[1] = t4melt + 0.01
                    tmp_new[2] = t4melt + 0.01
                else:
                    qleft = qavail - q2melt
                    tmp_new[1] = t4melt + qleft / hs1
                    tmp_new[2] = t4melt + 0.01
                if self._eff_depth is not None:
                    tsurf_ave = self._temp_at_depth(tmp_new, self._eff_depth)
                else:
                    tsurf_ave = 0.5 * (tmp_new[1] + tmp_new[2])
                break
        else:
            q2melt = 0.0
        return q2melt, tsurf_ave

    # ------------------------------------------------------------------
    def _mod_radiation(self, f, cal, idx, pt):
        """ModRadiationBySurroundings (src/ModRadiation.f90:7-73)."""
        from .physics.sun import julian_ephemeris_day
        import numpy as _np
        p = self.p
        dif_sw = f["sw"][idx] - f["sw_dir"][idx]
        lw_sur = f["lw_net"][idx] - f["lw"][idx]
        jde = float(julian_ephemeris_day(
            _np.array([cal.year[idx]]), _np.array([cal.month[idx]]),
            _np.array([cal.day[idx]]), _np.array([cal.hour[idx]]),
            _np.array([cal.minute[idx]]), _np.array([cal.second[idx]]))[0])
        elev, azim = self._sun_elev_azim(jde, pt.lat, pt.lon)
        horizons = pt.horizons if pt.horizons is not None else np.zeros(360)
        azim_idx = int(round(azim)) if azim > -9999.0 else 0
        if azim_idx == 360:
            azim_idx = 0
        horizon = horizons[azim_idx] if 0 <= azim_idx < 360 else 0.0
        shadow = 0.0 if horizon > elev else 1.0
        if elev > 0.0:
            f["sw_dir"][idx] *= shadow
            sw_ref = (p.albedo_surroundings * f["sw_dir"][idx]
                      + p.albedo_surroundings * dif_sw)
            dif_sw = pt.sky_view * dif_sw + (1.0 - pt.sky_view) * sw_ref
            f["sw"][idx] = dif_sw + f["sw_dir"][idx]
        f["lw"][idx] = (pt.sky_view * f["lw"][idx]
                        + (1.0 - pt.sky_view) * (-lw_sur))

    def _sun_elev_azim(self, jde, lat, lon):
        from .physics.sun import elevation_azimuth
        import jax.numpy as jnp
        e, a = elevation_azimuth(jnp.float64(jde), jnp.float64(lat),
                                 jnp.float64(lon))
        return float(e), float(a)

    # ------------------------------------------------------------------
    def _coupling_control(self, tsurf_ave, last_obs, cpl, coupling_failed):
        """Coupling_control (src/Coupling.f90:292-481).  Mutates cpl; returns
        the new coupling_failed flag.  Works in Kelvin like the reference."""
        t = tsurf_ave + 273.16
        obs = last_obs + 273.16
        cpl["again"] = False
        if coupling_failed:
            return coupling_failed
        if cpl["iterations"] == 0:
            cpl["tsurf_end1"] = t
        if cpl["iterations"] == 25:
            if abs(cpl["tsurf_end1"] - obs) < abs(t - obs):
                cpl["again"] = True
            cpl.update(sw_cof=1.0, lw_cof=1.0, sw_corr=0.0, lw_corr=0.0,
                       radcoeff=1.0)
            return True
        if obs < -100.0 + 273.16:
            cpl.update(sw_cof=1.0, lw_cof=1.0, sw_corr=0.0, lw_corr=0.0,
                       radcoeff=1.0, again=True)
            return True
        if t < 170.0 or t > 400.0:
            cpl.update(sw_cof=1.0, lw_cof=1.0, sw_corr=0.0, lw_corr=0.0,
                       radcoeff=1.0, again=True)
            return True
        if t - obs > 0.1:
            # forecast too warm
            if cpl["t_above"] < -100.0:
                cpl["t_above"] = t
                cpl["radc_above"] = cpl["radcoeff"]
            elif cpl["t_above"] - obs > t - obs:
                cpl["t_above"] = t
                cpl["radc_above"] = cpl["radcoeff"]
            cpl["again"] = True
            if cpl["t_above"] > -100.0 and cpl["t_below"] > -100.0:
                d_above = cpl["t_above"] - obs
                d_below = obs - cpl["t_below"]
                cpl["radcoeff"] = (cpl["radc_above"]
                                   - d_above / (d_above + d_below)
                                   * (cpl["radc_above"] - cpl["radc_below"]))
            else:
                cpl["radcoeff"] = 0.5 * cpl["radcoeff"]
            if abs(cpl["radcoeff"] - cpl["radc_prev"]) < 0.00005:
                cpl["t_above"] = -9999.0
                cpl["t_below"] = -9999.0
            if cpl["radcoeff"] < 0.01:
                cpl.update(radcoeff=1.0, sw_cof=1.0, lw_cof=1.0,
                           sw_corr=0.0, lw_corr=0.0)
                cpl["radc_prev"] = cpl["radcoeff"]
                return True
            cpl["radc_prev"] = cpl["radcoeff"]
            return coupling_failed
        if obs - t > 0.1:
            # forecast too cold
            if cpl["t_below"] < -100.0:
                cpl["t_below"] = t
                cpl["radc_below"] = cpl["radcoeff"]
            elif cpl["t_below"] - obs < t - obs:
                cpl["t_below"] = t
                cpl["radc_below"] = cpl["radcoeff"]
            cpl["again"] = True
            if cpl["t_above"] > -100.0 and cpl["t_below"] > -100.0:
                d_above = cpl["t_above"] - obs
                d_below = obs - cpl["t_below"]
                cpl["radcoeff"] = (cpl["radc_above"]
                                   - d_above / (d_above + d_below)
                                   * (cpl["radc_above"] - cpl["radc_below"]))
            else:
                cpl["radcoeff"] = 2.0 * cpl["radcoeff"]
            if abs(cpl["radcoeff"] - cpl["radc_prev"]) < 0.00005:
                cpl["t_above"] = -9999.0
                cpl["t_below"] = -9999.0
            cpl["radc_prev"] = cpl["radcoeff"]
            return coupling_failed
        # success
        if cpl["radcoeff"] > 3.0:
            cpl.update(radcoeff=1.0, sw_cof=1.0, lw_cof=1.0,
                       sw_corr=0.0, lw_corr=0.0)
            return True
        cpl["sw_corr"] = cpl["sw_cof"] - 1.0
        cpl["lw_corr"] = cpl["lw_cof"] - 1.0
        cpl["iterations"] = -1
        cpl.update(t_above=-9999.0, t_below=-9999.0, radcoeff=1.0,
                   radc_above=-9999.0, radc_below=-9999.0, radc_prev=1.0)
        return False

    # ------------------------------------------------------------------
    def _temp_at_depth(self, tmp, depth):
        """getTempAtDepth (src/BalanceModel.f90:390-417)."""
        z = self.grid.zdepth
        n = self.grid.nlayers
        if abs(depth) < 1e-5:
            return tmp[1]
        if depth > z[n]:
            return tmp[n + 1]
        idx = 0
        for k in range(n):
            if z[k] < depth <= z[k + 1]:
                idx = k
                break
        w = (depth - z[idx]) / (z[idx + 1] - z[idx])
        return tmp[idx + 1] + w * (tmp[idx + 2] - tmp[idx + 1])
