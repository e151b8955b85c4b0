"""Boundary-layer conductance, aerodynamic resistance and latent heat flux.

Re-derivation of src/BoundaryLayer.f90 as batched, branch-free jnp with the
reference's per-point early-exit iteration preserved through masked updates
inside a ``lax.while_loop`` (exits when every point in the batch has
converged; converged points freeze, exactly matching the Fortran EXIT).

The fixed point is warm-started from the previous step's conductance, as in
the reference (atm%BLCond persists across steps).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import PhysicsParams
from .moisture import esat

CONV_LIM = 1e-3    # BoundaryLayer.f90:18
MAX_ITER = 40      # BoundaryLayer.f90:20
MIN_ITER = 5       # BoundaryLayer.f90:92


class BLResult(NamedTuple):
    blcond: jnp.ndarray    #: boundary-layer conductance (W/m2K)
    psim: jnp.ndarray      #: momentum stability correction
    psih: jnp.ndarray      #: heat stability correction
    le_flux: jnp.ndarray   #: latent heat flux (W/m2)
    evap: jnp.ndarray      #: evaporation (mm / timestep)


def air_properties(tair, p: PhysicsParams):
    """Temperature-dependent air properties (BoundaryLayer.f90:50-56)."""
    tak = tair + 273.15
    air_dens = 100000.0 / (287.05 * tak)
    air_hcap = 1005.0 + (tak - 250.0) ** 2 / 3364.0
    air_vcap = air_hcap * air_dens
    psych_c = 0.1 * (0.00063 * tak + 0.47496)
    return air_dens, air_hcap, air_vcap, psych_c


def water_density(tsurf):
    """Liquid water density polynomial (BoundaryLayer.f90:57)."""
    return -0.0050 * tsurf * tsurf + 0.0079 * tsurf + 1000.0028


def _stability_psi(stab):
    """PSIH/PSIM from the stability parameter (BoundaryLayer.f90:83-89)."""
    psih_stable = 4.7 * stab
    psih_unstable = -2.0 * jnp.log(
        (1.0 + jnp.sqrt(jnp.maximum(1.0 - 16.0 * stab, 0.0))) / 2.0)
    stable = stab > 0.0
    psih = jnp.where(stable, psih_stable, psih_unstable)
    psim = jnp.where(stable, psih, 0.6 * psih)
    return psim, psih


def bl_conductance(blcond0, tsurf, tair, vz, air_vcap, p: PhysicsParams,
                   max_iter: int = MAX_ITER):
    """Monin-Obukhov-style fixed point for boundary-layer conductance
    (BoundaryLayer.f90:60-101).  Batched over any shape; per-element early
    exit emulated with a done-mask so converged points freeze at exactly the
    reference's exit state (PSIM/PSIH updated once more after the final
    conductance, as in the Fortran loop ordering).
    """
    tak = tair + 273.15
    dt_ts = tsurf - tair

    zeros = jnp.zeros_like(blcond0)

    def body(carry):
        bl, psim, psih, done, j = carry
        ustar = p.vk_const * vz / (p.log_ustar + psim)
        bl_new = air_vcap * p.vk_const * ustar / (p.log_cond + psih)
        stab = (-p.vk_const * p.zref_t * p.grav * bl_new * dt_ts
                / (air_vcap * tak * ustar * ustar * ustar))
        stab = jnp.minimum(stab, 1.0)
        psim_new, psih_new = _stability_psi(stab)
        newly_done = (jnp.abs(bl_new - bl) < CONV_LIM) & (j + 1 >= MIN_ITER)
        bl = jnp.where(done, bl, bl_new)
        psim = jnp.where(done, psim, psim_new)
        psih = jnp.where(done, psih, psih_new)
        done = done | newly_done
        return bl, psim, psih, done, j + 1

    def cond(carry):
        _, _, _, done, j = carry
        return (j < max_iter) & jnp.logical_not(jnp.all(done))

    init = (blcond0, zeros, zeros, jnp.zeros_like(blcond0, dtype=bool),
            jnp.asarray(0, dtype=jnp.int32))
    bl, psim, psih, _, _ = jax.lax.while_loop(cond, body, init)
    return bl, psim, psih


def aerodynamic_resistance(psim, psih, vz, p: PhysicsParams):
    """RAero capped at 30 s/m (BoundaryLayer.f90:112-131)."""
    raero = ((p.log_mom + psim) * (p.log_heat + psih)
             / (p.vk_const * p.vk_const * vz))
    return jnp.minimum(raero, 30.0)


def latent_heat(tsurf, tair, rhz, raero, srf_wat, dt, p: PhysicsParams):
    """Latent heat flux and evaporation per step (BoundaryLayer.f90:134-190)."""
    air_dens, air_hcap, _, psych_c = air_properties(tair, p)
    wat_den = water_density(tsurf)
    esurf = esat(tsurf)
    eair = jnp.minimum(0.01 * rhz, 1.0) * esat(tair)
    le = air_dens * air_hcap * (esurf - eair) / (psych_c * raero)
    lheat = jnp.where(tsurf >= 0.0, p.lvap, p.lfus)
    evap = (le / (lheat * wat_den)) * 1000.0 * dt
    # no water to evaporate
    dry = (le > 0.0) & (srf_wat <= 0.0)
    return jnp.where(dry, 0.0, le), jnp.where(dry, 0.0, evap)


def bl_cond_and_le(blcond0, tsurf, evap0, dt, srf_wat, tair, vz, rhz,
                   p: PhysicsParams, max_iter: int = MAX_ITER) -> BLResult:
    """Full CalcBLCondAndLE (BoundaryLayer.f90:3-109)."""
    _, _, air_vcap, _ = air_properties(tair, p)
    bl, psim, psih = bl_conductance(blcond0, tsurf, tair, vz, air_vcap, p,
                                    max_iter=max_iter)
    raero = aerodynamic_resistance(psim, psih, vz, p)
    le, evap = latent_heat(tsurf, tair, rhz, raero, srf_wat, dt, p)
    del evap0  # reference overwrites EvapmmTS unconditionally
    return BLResult(bl, psim, psih, le, evap)
