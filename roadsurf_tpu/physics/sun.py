"""Solar position (Meeus astronomical algorithms), fully vectorized.

Re-derivation of src/SunPosition.f90 (JulianEphemerisDay :196-260,
calcElevationAzimuth :20-194).  The reference computes this per (point, step)
inside the time loop; here it is a pure function of (time, lat, lon) evaluated
as one batched [P?, T] pass during forcing preparation -- the astronomy never
needs to live inside the sequential scan.

Elevation <= 0 yields the reference's -9999.9 sentinels.  The reference
``stop``s on |cos| > 1.001; we clamp instead (a failure mask is the framework's
error-signalling mechanism, not process aborts).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

MISSING = -9999.9


def julian_ephemeris_day(year, month, day, hour, minute, second):
    """Julian Ephemeris Day (Meeus ch. 7; src/SunPosition.f90:196-260).

    Accepts numpy integer arrays; returns float64 numpy (host-side prep).
    """
    year = np.asarray(year, dtype=np.int64)
    month = np.asarray(month, dtype=np.int64)
    early = month <= 2
    yr = np.where(early, year - 1, year).astype(np.float64)
    mo = np.where(early, month + 12, month).astype(np.float64)
    day_f = (np.asarray(day, np.float64) + np.asarray(hour, np.float64) / 24.0
             + np.asarray(minute, np.float64) / 1440.0
             + np.asarray(second, np.float64) / 86400.0)
    a = np.trunc(yr / 100.0)
    b = 2.0 - a + np.trunc(a / 4.0)
    return (np.trunc(365.25 * (yr + 4716.0)) + np.trunc(30.6001 * (mo + 1.0))
            + day_f + b - 1524.5)


def _wrap_to(x, period):
    """Reference-style wrapping: if x<0: x -= period*(AINT(x/period)-1);
    if x>period: x -= period*AINT(x/period)  (SunPosition.f90:78-79 etc)."""
    x = jnp.where(x < 0.0, x - period * (jnp.trunc(x / period) - 1.0), x)
    x = jnp.where(x > period, x - period * jnp.trunc(x / period), x)
    return x


def elevation_azimuth(jde, lat, lon):
    """Solar elevation and azimuth (degrees) for Julian Ephemeris Day values.

    Vectorized re-derivation of src/SunPosition.f90:20-194; broadcasts jde
    against lat/lon.  Returns (elevation_deg, azimuth_deg) with -9999.9 where
    the sun is below the horizon.
    """
    jde = jnp.asarray(jde)
    lat = jnp.asarray(lat)
    lon = jnp.asarray(lon)
    pi = jnp.pi

    t = (jde - 2451545.0) / 36525.0
    # geometric mean longitude
    ml = 280.46645 + 36000.76983 * t + 0.0003032 * t * t
    ml = _wrap_to(ml, 360.0)
    # mean anomaly
    ma = 357.52910 + 35999.05030 * t - 0.0001559 * t * t - 0.00000048 * t ** 3
    ma = _wrap_to(ma, 360.0)
    # equation of center
    mar = ma * pi / 180.0
    sunc = ((1.913600 - 0.004817 * t - 0.000014 * t * t) * jnp.sin(mar)
            + (0.019993 - 0.000101 * t) * jnp.sin(2.0 * mar)
            + 0.000290 * jnp.sin(3.0 * mar))
    # apparent longitude
    al = ml + sunc - 0.00569 - 0.00478 * jnp.sin((125.04 - 1934.136 * t) * pi / 180.0)
    al = al * pi / 180.0
    # obliquity
    tilt = 23.43929111 - 0.013004166 * t - 0.001638888 * t * t + 0.005036111 * t ** 3
    eps = (tilt + 0.00256 * jnp.cos((125.04 - 1934.136 * t) * pi / 180.0)) * pi / 180.0
    # right ascension
    ra = jnp.arctan2(jnp.cos(eps) * jnp.sin(al), jnp.cos(al))
    ra = _wrap_to(ra, 2.0 * pi)
    # declination
    decl = jnp.arcsin(jnp.sin(eps) * jnp.sin(al))
    # Greenwich mean sidereal time
    stg = (280.46061837 + 360.98564736629 * (jde - 2451545.0)
           + 0.000387933 * t * t - t ** 3 / 38710000.0)
    stg = _wrap_to(stg, 360.0) * pi / 180.0

    cos_decl = jnp.cos(decl)
    sin_decl = jnp.sin(decl)
    latr = pi * lat / 180.0
    sin_lat = jnp.sin(latr)
    cos_lat = jnp.cos(latr)

    ha = stg + lon * pi / 180.0 - ra
    # NOTE: the reference wraps the hour angle conditioned on ra (a quirk of
    # SunPosition.f90:134-135); ra is in [0, 2pi] after its own wrap, so only
    # the ra<0 branch is dead and the ra>2pi branch nearly so -- replicate by
    # leaving ha unwrapped here and wrapping below exactly as :157-161.
    cosah = jnp.cos(ha)
    cos_elev = sin_decl * sin_lat + cos_decl * cos_lat * cosah
    cos_elev = jnp.clip(cos_elev, -1.0, 1.0)
    chi = jnp.arccos(cos_elev)
    elevation = 90.0 - chi * 180.0 / pi

    ha = jnp.where(ha < 0.0, 2.0 * pi + ha, ha)
    ha = jnp.where(ha > 2.0 * pi, ha - 2.0 * pi, ha)

    cosele = jnp.cos(pi / 2.0 - chi)
    safe_cosele = jnp.where(jnp.abs(cosele) < 1e-4, 1.0, cosele)
    precos = (sin_decl * cos_lat - cos_decl * sin_lat * cosah) / safe_cosele
    precos = jnp.clip(precos, -1.0, 1.0)
    azim = jnp.arccos(precos)
    azim = jnp.where(ha < pi, 2.0 * pi - azim, azim)
    azim_deg = azim * 180.0 / pi
    azim_deg = jnp.where(jnp.abs(cosele) < 1e-4, MISSING, azim_deg)

    up = elevation > 0.0
    return (jnp.where(up, elevation, MISSING),
            jnp.where(up, azim_deg, MISSING))
