"""Surface storage physics: precipitation typing, the four storage terms,
traffic wear, the melt energy limiter and albedo.

Branch-free batched re-derivation of src/Storage.f90, src/Cond.f90.  The
reference applies these as an ordered sequence of scalar guard/clamp rules per
point; every ``If`` here becomes a ``jnp.where`` applied in **exactly the
reference order** (ordering is load-bearing for parity: e.g. water overflow is
clamped both before snow handling and again at the end of RoadCond).

All functions operate on arrays of arbitrary (broadcastable) batch shape.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import (PhysicsParams, PRECIPITATION_RAIN, PRECIPITATION_SLEET,
                      PRECIPITATION_SNOW, PRECIPITATION_NONE,
                      PRECIPITATION_FREEZING_DRIZZLE,
                      PRECIPITATION_FREEZING_RAIN, PRECIPITATION_HAIL)

# WearFactors overwrites the configured Snow2IceFac unconditionally
# (src/Cond.f90:86); the effective constant is 0.25/0.45.
SNOW2ICE_FAC = 0.25 / (0.2 + 0.25)


class Storages(NamedTuple):
    wat: jnp.ndarray
    snow: jnp.ndarray
    ice: jnp.ndarray
    ice2: jnp.ndarray
    dep: jnp.ndarray


class WearF(NamedTuple):
    snow_tran: jnp.ndarray
    ice_wear: jnp.ndarray
    ice_wear2: jnp.ndarray
    dep_wear: jnp.ndarray
    wat_wear: jnp.ndarray


def calc_prec_type(prec_phase, prec_in_step, tair, rhz, p: PhysicsParams):
    """Precipitation typing (CalcPrecType, src/Cond.f90:143-249).

    Pure function of forcing (post-relaxation tair/rhz), so it is evaluated
    during vectorized forcing prep, not in the sequential scan.

    Returns (rain_ts, snow_ts, wets_snow) where wets_snow marks steps whose
    precipitation flips the snow type to wet (rain or sleet).
    """
    phase = jnp.asarray(prec_phase)
    prec = jnp.asarray(prec_in_step)
    has_phase = phase > p.miss_val_i
    known_phase = ((phase == PRECIPITATION_NONE) | (phase == PRECIPITATION_RAIN)
                   | (phase == PRECIPITATION_SLEET) | (phase == PRECIPITATION_SNOW)
                   | (phase == PRECIPITATION_FREEZING_DRIZZLE)
                   | (phase == PRECIPITATION_FREEZING_RAIN)
                   | (phase == PRECIPITATION_HAIL))
    enough = prec > p.min_prec_mm

    # phase-code path (:193-213)
    is_rain_code = ((phase == PRECIPITATION_NONE) | (phase == PRECIPITATION_RAIN)
                    | (phase == PRECIPITATION_FREEZING_DRIZZLE)
                    | (phase == PRECIPITATION_FREEZING_RAIN))
    is_sleet_code = phase == PRECIPITATION_SLEET
    is_snow_code = (phase == PRECIPITATION_SNOW) | (phase == PRECIPITATION_HAIL)
    rain_code = jnp.where(is_rain_code, prec,
                          jnp.where(is_sleet_code, prec / 2.0, 0.0))
    snow_code = jnp.where(is_snow_code, prec,
                          jnp.where(is_sleet_code, prec / 2.0, 0.0))
    wets_code = is_rain_code | is_sleet_code

    # in-built Koistinen interpretation (:221-245)
    pexp = 22.0 - 2.7 * tair - 0.20 * rhz
    prain = 1.0 / (1.0 + jnp.exp(pexp))
    interp_snowy = prain < p.p_lim_snow
    interp_rainy = prain > p.p_lim_rain
    rain_interp = jnp.where(interp_snowy, 0.0,
                            jnp.where(interp_rainy, prec, prec / 2.0))
    snow_interp = jnp.where(interp_snowy, prec,
                            jnp.where(interp_rainy, 0.0, prec / 2.0))
    wets_interp = ~interp_snowy

    use_phase = has_phase & known_phase
    rain = jnp.where(use_phase, rain_code, rain_interp)
    snow = jnp.where(use_phase, snow_code, snow_interp)
    wets = jnp.where(use_phase, wets_code, wets_interp)

    rain = jnp.where(enough, rain, 0.0)
    snow = jnp.where(enough, snow, 0.0)
    wets = wets & enough
    return rain, snow, wets


def wear_factors(s: Storages, tph, p: PhysicsParams) -> WearF:
    """Traffic wear rates in mm per timestep (WearFactors, src/Cond.f90:69-103)."""
    snow_tran = jnp.maximum((0.2 + 0.25) * s.snow, 0.01)
    snow_tran = jnp.where(s.snow < 0.2, snow_tran * 3.0, snow_tran) * tph
    ice_wear = jnp.maximum(1.1 * 2.0 * 0.145 * s.ice, 0.01) * tph
    ice_wear2 = jnp.maximum(1.1 * 2.0 * (4.0 * 0.290) * s.ice2, 0.01) * tph
    dep_wear = jnp.maximum(0.5 * 2.0 * (4.0 * 0.290) * s.dep, 0.01) * tph
    wat_wear = 10.0 * jnp.maximum(0.145 * s.wat, 0.06) * tph
    return WearF(snow_tran, ice_wear, ice_wear2, dep_wear, wat_wear)


def _water_limits(wat, p: PhysicsParams):
    wat = jnp.where(wat < p.min_wat_mms, 0.0, wat)
    wat = jnp.minimum(wat, p.max_wat_mms)
    return wat


def water_storage(s: Storages, tsurf, evap, wat_wear, wear_surf,
                  p: PhysicsParams):
    """WaterStorage (src/Storage.f90:33-84).  Returns (storages, srf_ext)."""
    wat = s.wat
    # evaporation/condensation: bare warm surface only (:52-62);
    # note ice2 is deliberately absent from the guard, as in the reference
    bare = ((s.snow <= 0.0) & (s.ice <= 0.0) & (s.dep <= 0.0)
            & (tsurf > p.t_lim_dew))
    surface_evap = wat > p.max_por_mms
    loss = jnp.where(surface_evap, evap, p.por_eva_f * evap)
    wat = jnp.where(bare, wat - loss, wat)

    # traffic wear (:65-75)
    wearing = wear_surf & (wat > 0.0)
    ww = jnp.where(wat < p.w_wear_lim, 0.0, wat_wear)
    wear_amt = jnp.where(wat > p.w_wet_lim, ww, p.damp_wear_f * ww)
    wat = jnp.where(wearing, wat - wear_amt, wat)

    wat = _water_limits(wat, p)                     # :79-80
    srf_ext = jnp.maximum(wat - p.max_por_mms, 0.0)  # :82
    return s._replace(wat=wat), srf_ext


def snow_storage(s: Storages, srf_ext, tsurf, q2melt, snow_wet, wearf: WearF,
                 dt, force_snow_melting: bool, p: PhysicsParams):
    """SnowStorage (src/Storage.f90:88-196).

    Returns (storages, snow_wet, srf_ext).  ``snow_wet`` is the boolean
    SnowType state (True == SURFACE_SNOW_WET).
    """
    wat, snow, ice, ice2, dep = s
    # water/(water+snow) ratio from the *entry* values (:115-120)
    rd = srf_ext + snow
    wat_snow_rat = jnp.where(rd > 0.001, srf_ext / rd, 0.0)

    # snow-type transitions (:129-134)
    snow_wet = jnp.where(snow > 0.0,
                         snow_wet | (wat_snow_rat > p.wet_snow_form_r),
                         jnp.zeros_like(snow_wet))

    # deposit under snow converts to ice (:136-141)
    under = snow > 0.0
    ice = jnp.where(under, ice + dep, ice)
    dep = jnp.where(under, 0.0, dep)

    # melting (:143-155)
    has_snow = snow > 0.0
    melt_forced = has_snow & force_snow_melting
    melts = (has_snow & (~melt_forced) & (q2melt > 0.0)
             & (tsurf >= p.t_lim_melt_snow))
    melted_mm = 1000.0 * (q2melt * dt) / (p.wat_m_heat * p.wat_dens)
    wat = jnp.where(melt_forced, wat + snow, jnp.where(melts, wat + melted_mm, wat))
    snow = jnp.where(melt_forced, 0.0, jnp.where(melts, snow - melted_mm, snow))

    # wear: snow grinds into ice (:156-162)
    wearing = wear_surf_mask(wearf) & (snow > 0.0)
    snow = jnp.where(wearing, snow - wearf.snow_tran, snow)
    ice = jnp.where(wearing, ice + SNOW2ICE_FAC * wearf.snow_tran, ice)
    ice2 = jnp.where(wearing, ice2 + SNOW2ICE_FAC * wearf.snow_tran, ice2)

    # wet snow block: outer guard on entry values of this block (:164-184)
    wet_block = (snow > 0.0) & snow_wet
    melting_wet = wet_block & (wat_snow_rat > p.wet_snow_melt_r)
    wat = jnp.where(melting_wet, wat + snow, wat)
    snow = jnp.where(melting_wet, 0.0, snow)
    snow_wet = snow_wet & ~melting_wet
    freezing = wet_block & (tsurf < p.t_lim_freeze)
    frozen_amt = snow + wat
    ice = jnp.where(freezing, ice + frozen_amt, ice)
    ice2 = jnp.where(freezing, ice2 + frozen_amt, ice2)
    snow_wet = snow_wet & ~freezing
    snow = jnp.where(freezing, 0.0, snow)
    wat = jnp.where(freezing, 0.0, wat)

    srf_ext = jnp.maximum(wat - p.max_por_mms, 0.0)  # :186

    snow = jnp.where(snow < p.min_snow_mms, 0.0, snow)               # :189
    snow = jnp.where(snow > p.max_snow_mms, snow - p.max_snow_mms / 2.0,
                     snow)                                            # :191-194
    return Storages(wat, snow, ice, ice2, dep), snow_wet, srf_ext


def ice_storage(s: Storages, tsurf, q2melt, wearf: WearF, dt,
                force_ice_melting: bool, p: PhysicsParams):
    """IceStorage (src/Storage.f90:199-267)."""
    wat, snow, ice, ice2, dep = s
    freezing = (tsurf < p.t_lim_freeze) & (wat > 0.0)       # :220-225
    ice = jnp.where(freezing, ice + wat, ice)
    ice2 = jnp.where(freezing, ice2 + wat, ice2)
    wat = jnp.where(freezing, 0.0, wat)

    meltable = (snow <= 0.0) & (ice > 0.0)                  # :226-240
    melt_forced = meltable & force_ice_melting
    melts = (meltable & (~melt_forced) & (q2melt > 0.0)
             & (tsurf >= p.t_lim_melt_ice))
    melted_mm = 1000.0 * (q2melt * dt) / (p.wat_m_heat * p.wat_dens)
    wat = jnp.where(melt_forced, wat + ice,
                    jnp.where(melts, wat + melted_mm, wat))
    ice = jnp.where(melt_forced, 0.0, jnp.where(melts, ice - melted_mm, ice))
    ice2 = jnp.where(melt_forced, 0.0,
                     jnp.where(melts, ice2 - melted_mm, ice2))

    wearing = wear_surf_mask(wearf)
    ice = jnp.where(wearing & (ice > 0.0), ice - wearf.ice_wear, ice)   # :241-244
    ice2 = jnp.where(wearing & (ice2 > 0.0), ice2 - wearf.ice_wear2, ice2)

    ice = jnp.where(ice < p.min_ice_mms, 0.0, ice)          # :255-259
    ice = jnp.minimum(ice, p.max_ice_mms)
    ice2 = jnp.where(ice2 < p.min_ice_mms, 0.0, ice2)       # :261-265
    ice2 = jnp.minimum(ice2, p.max_ice_mms)
    return Storages(wat, snow, ice, ice2, dep)


def deposit_storage(s: Storages, tsurf, evap, dep_wear, p: PhysicsParams):
    """DepositStorage (src/Storage.f90:271-314)."""
    wat, snow, ice, ice2, dep = s
    dep = jnp.where(evap < 0.0, dep - evap, dep)            # condensation :289-291
    melting = tsurf > p.t_lim_melt_dep                      # :293-296
    wat = jnp.where(melting, wat + dep, wat)
    dep = jnp.where(melting, 0.0, dep)
    wearing = wear_surf_mask_scalar(dep_wear) & (snow <= 0.0) & (dep > 0.0)
    dep = jnp.where(wearing, dep - dep_wear, dep)           # :298-302
    dep = jnp.where(dep < p.min_dep_mms, 0.0, dep)          # :306
    overflow = dep > p.max_dep_mms                          # :308-312
    wat = jnp.where(overflow, wat + dep - p.max_dep_mms, wat)
    dep = jnp.minimum(dep, p.max_dep_mms)
    return Storages(wat, snow, ice, ice2, dep)


# wear_surf is a per-point constant in the reference (always True for the
# library drivers: initSurf(surf, .true.), Initialization.f90:98).  We keep it
# a compile-time constant; these helpers exist so the guard structure stays
# visible at call sites.
def wear_surf_mask(wearf: WearF):
    return True


def wear_surf_mask_scalar(_):
    return True


def new_melt_freeze_heat(s: Storages, t4melt, dt, p: PhysicsParams):
    """Q2Melt / T4Melt for the next step (NewMeltFreezeHeat,
    src/Storage.f90:409-432).  T4Melt keeps its old value when no snow/ice."""
    q2 = jnp.zeros_like(s.wat)
    snowy = s.snow > 0.0
    q2 = jnp.where(snowy, p.wat_m_heat * p.wat_dens * (s.snow / 1000.0) / dt, q2)
    t4 = jnp.where(snowy, p.t_lim_melt_snow, t4melt)
    icy = (~snowy) & (s.ice > 0.0)
    q2 = jnp.where(icy, p.wat_m_heat * p.wat_dens * (s.ice / 1000.0) / dt, q2)
    t4 = jnp.where(icy, p.t_lim_melt_ice, t4)
    q2 = jnp.maximum(q2, 0.0)
    return q2, t4


def melting_limiter(s: Storages, tmp_new, tsurf, q2melt, t4melt, hstor, hs1,
                    in_coupling, last_tsurf_obs, depth_idx, depth_w,
                    use_depth, can_change_temp: bool, p: PhysicsParams):
    """The storage<->temperature energy limiter (melting,
    src/Storage.f90:319-402).

    Compares the heat demanded by melting (Q2Melt, from the previous step's
    RoadCond) against the heat available in the surface layer and either pins
    the top two layer temperatures at T4Melt or returns the leftover as
    warming.  Returns (tmp_new, tsurf_ave, q2melt).
    """
    from .soil import surface_average  # local import to avoid cycle

    has_frozen = (s.snow > 0.0) | (s.ice > 0.0) | (s.ice2 > 0.0)
    q2_out = jnp.where(has_frozen, q2melt, 0.0)             # :397-399
    if not can_change_temp:                                  # :355-357
        return tmp_new, tsurf, q2_out

    guard = ((hstor <= 0.00001) | (tsurf <= t4melt) | (q2melt <= 0.0)
             | (in_coupling & (last_tsurf_obs < t4melt)))   # :358-360
    cold_exit = guard & (tsurf < 0.5)                        # :363-366
    hot_exit = guard & (tsurf > 2.0)                         # :368-373
    # guard true with 0.5 <= tsurf <= 2.0 falls through to the pinning block
    qavail = hs1 * (tmp_new[..., 1] - t4melt)                # :376

    pin = has_frozen & (~cold_exit) & (~hot_exit)
    all_used = q2melt >= qavail                              # :377-386
    t1_pinned = jnp.where(all_used, t4melt + 0.01,
                          t4melt + (qavail - q2melt) / hs1)
    t2_pinned = t4melt + 0.01

    t1 = jnp.where(pin, t1_pinned, tmp_new[..., 1])
    t2 = jnp.where(pin, t2_pinned, tmp_new[..., 2])
    tmp_out = tmp_new.at[..., 1].set(t1).at[..., 2].set(t2)

    q2_out = jnp.where(has_frozen & cold_exit, 0.0, q2_out)
    q2_out = jnp.where(has_frozen & hot_exit,
                       jnp.minimum(q2_out, qavail), q2_out)
    q2_out = jnp.where(pin & all_used, qavail, q2_out)

    # TsurfAve recomputed only when the pinning block ran (:389-394)
    new_ave = surface_average(tmp_out, depth_idx, depth_w, use_depth)
    tsurf_out = jnp.where(pin, new_ave, tsurf)
    return tmp_out, tsurf_out, q2_out


def albedo_update(albedo, s: Storages, p: PhysicsParams):
    """CalcAlbedo (src/Cond.f90:105-139); wearing surface assumed."""
    ice_sum = jnp.maximum(0.5 * (s.ice + s.ice2) + s.dep, 0.0)
    ice_max = 1.5
    snowy = (s.snow > 0.01) & (s.snow > s.ice)
    icy = (s.ice > 0.01) | (s.dep > 0.01)
    icy_alb = jnp.where(ice_sum < ice_max,
                        p.alb_dry + (ice_sum / ice_max) * (p.alb_snow - p.alb_dry),
                        p.alb_snow)
    out = jnp.full_like(albedo, p.alb_dry)
    out = jnp.where(snowy, p.alb_snow, jnp.where(icy & ~snowy, icy_alb, out))
    return out


def very_cold_update(very_cold, tsurf, p: PhysicsParams):
    """VeryCold hysteresis (src/Cond.f90:33-39)."""
    vc = very_cold & ~(very_cold & (tsurf > p.t_lim_cold_h))
    vc = vc | ((~vc) & (tsurf < p.t_lim_cold_l))
    return vc


def snow_ice_check(s: Storages, last_tsurf_obs, p: PhysicsParams):
    """Coupling anti-stuck forced melt (snowIceCheck, src/Coupling.f90:259-289).
    Note ice2 is zeroed without adding to water, as in the reference."""
    wat, snow, ice, ice2, dep = s
    warm_snow = (last_tsurf_obs > p.t_lim_melt_snow) & (snow > 0.0)
    wat = jnp.where(warm_snow, wat + snow, wat)
    snow = jnp.where(warm_snow, 0.0, snow)
    warm_ice = (last_tsurf_obs > p.t_lim_melt_ice) & (ice > 0.0)
    wat = jnp.where(warm_ice, wat + ice, wat)
    ice = jnp.where(warm_ice, 0.0, ice)
    warm_ice2 = (last_tsurf_obs > p.t_lim_melt_ice) & (ice2 > 0.0)
    ice2 = jnp.where(warm_ice2, 0.0, ice2)
    warm_dep = (last_tsurf_obs > p.t_lim_melt_dep) & (dep > 0.0)
    wat = jnp.where(warm_dep, wat + dep, wat)
    dep = jnp.where(warm_dep, 0.0, dep)
    return Storages(wat, snow, ice, ice2, dep)


def road_cond(s: Storages, tsurf, evap, q2melt, t4melt, very_cold,
              tph, dt, settings_force_snow: bool, settings_force_ice: bool,
              p: PhysicsParams):
    """RoadCond orchestration (src/Cond.f90:9-65): VeryCold hysteresis, the
    four storages in fixed order, final water clamp, next-step melt heat.

    SnowType is reset to DRY at RoadCond entry every step (Cond.f90:32) and no
    other consumer reads it, so the wet-snow flag is local to SnowStorage --
    it is NOT carried model state (CalcPrecType's wetting is dead state in the
    reference).

    Returns (storages, very_cold, q2melt, t4melt).
    """
    very_cold = very_cold_update(very_cold, tsurf, p)
    snow_wet = jnp.zeros_like(s.snow, dtype=bool)           # :32
    wearf = wear_factors(s, tph, p)
    s, srf_ext = water_storage(s, tsurf, evap, wearf.wat_wear, True, p)
    s, snow_wet, srf_ext = snow_storage(
        s, srf_ext, tsurf, q2melt, snow_wet, wearf, dt, settings_force_snow, p)
    s = ice_storage(s, tsurf, q2melt, wearf, dt, settings_force_ice, p)
    s = deposit_storage(s, tsurf, evap, wearf.dep_wear, p)
    s = s._replace(wat=_water_limits(s.wat, p))             # :61-62
    q2, t4 = new_melt_freeze_heat(s, t4melt, dt, p)
    return s, very_cold, q2, t4
