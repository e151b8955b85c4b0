"""Moisture utilities: Magnus saturation pressure, Tdew <-> RH.

Re-derivation of src/InputOutput.f90:202-268 and
examples/example1/src/MeteorologyTools.cpp (Magnus formula over water / ice).
Written as dtype-generic jnp functions that broadcast over any batch shape.
"""
from __future__ import annotations

import jax.numpy as jnp

AFACT = 0.61078   # kPa
ALPHA_ICE = 21.875
BETA_ICE = 265.5
ALPHA_WAT = 17.269
BETA_WAT = 237.3


def esat(t):
    """Saturation vapor pressure (kPa), over ice below 0 C, water above
    (src/BoundaryLayer.f90:159-171)."""
    t = jnp.asarray(t)
    e_ice = AFACT * jnp.exp(ALPHA_ICE * t / (t + BETA_ICE))
    e_wat = AFACT * jnp.exp(ALPHA_WAT * t / (t + BETA_WAT))
    return jnp.where(t < 0.0, e_ice, e_wat)


def esat_air_convention(t):
    """Same as :func:`esat` but with the >= 0 branch on water, matching
    CalcRh/CalcTDew (src/InputOutput.f90:223-229: T >= 0 -> water)."""
    t = jnp.asarray(t)
    e_ice = AFACT * jnp.exp(ALPHA_ICE * t / (t + BETA_ICE))
    e_wat = AFACT * jnp.exp(ALPHA_WAT * t / (t + BETA_WAT))
    return jnp.where(t >= 0.0, e_wat, e_ice)


def rh_from_tdew(t2m, tdew):
    """RH (%) from air and dew point temperature (src/InputOutput.f90:202-236)."""
    rh = (esat_air_convention(tdew) / esat_air_convention(t2m)) * 100.0
    return jnp.minimum(rh, 100.0)


def tdew_from_rh(t2m, rhz):
    """Dew point (C) from air temperature and RH (src/InputOutput.f90:239-268).

    Note the reference chooses the alpha/beta pair from T2m (not from the
    resulting dew point) -- replicated here.
    """
    t2m = jnp.asarray(t2m)
    alpha = jnp.where(t2m >= 0.0, ALPHA_WAT, ALPHA_ICE)
    beta = jnp.where(t2m >= 0.0, BETA_WAT, BETA_ICE)
    epr_sat = AFACT * jnp.exp(alpha * t2m / (t2m + beta))
    epr = 0.01 * rhz * epr_sat
    xx = jnp.log(epr / AFACT)
    return beta * xx / (alpha - xx)
