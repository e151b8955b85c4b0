"""Native C++ data-plane library: build, bind, and match the numpy reference
implementation exactly."""
import numpy as np
import pytest

from roadsurf_tpu.io import native
from roadsurf_tpu.io.interp import MISSING, interpolate_series

lib = native.load(build_if_missing=True)
pytestmark = pytest.mark.skipif(lib is None,
                                reason="native library build unavailable")


def test_interpolate_matches_numpy():
    rng = np.random.default_rng(0)
    nst = 37
    sim_times = np.arange(0, 86400, 300, dtype=np.int64)
    offsets = [0]
    raw_times_all = []
    vals_all = {"a": [], "b": [], "phase": []}
    for s in range(nst):
        n = rng.integers(5, 50)
        t = np.sort(rng.choice(np.arange(0, 90000, 600), size=n,
                               replace=False)).astype(np.int64)
        raw_times_all.append(t)
        a = rng.normal(0, 10, n)
        a[rng.random(n) < 0.15] = MISSING         # scattered missing
        b = rng.normal(0, 10, n)
        ph = rng.integers(0, 7, n).astype(np.float64)
        vals_all["a"].append(a)
        vals_all["b"].append(b)
        vals_all["phase"].append(ph)
        offsets.append(offsets[-1] + n)
    offsets = np.asarray(offsets, np.int64)
    raw_cat = np.concatenate(raw_times_all)
    values = np.stack([np.concatenate(vals_all["a"]),
                       np.concatenate(vals_all["b"]),
                       np.concatenate(vals_all["phase"])])
    out = native.interpolate_columns(
        offsets, raw_cat, sim_times, values,
        miss_thresh=np.array([-100.0, -100.0, -100.0]),
        nearest_next=np.array([0, 0, 1], np.int32), nthreads=4)

    for s in range(nst):
        t = raw_times_all[s]
        ref = interpolate_series(
            t, sim_times,
            {"a": vals_all["a"][s], "b": vals_all["b"][s],
             "prec_phase": vals_all["phase"][s]})
        np.testing.assert_allclose(out[s, 0], ref["a"], rtol=1e-12,
                                   err_msg=f"station {s} var a")
        np.testing.assert_allclose(out[s, 1], ref["b"], rtol=1e-12)
        np.testing.assert_allclose(out[s, 2], ref["prec_phase"], rtol=1e-12)


def test_parse_ascii_obs():
    text = b"""# comment line
19 12 02 00  -3.5  85.0  4.0  0.0  3  0.0  290.0  -4.2
19 12 02 01  -3.0  86.0  4.2  0.5  3  0.0  291.0  -3.9
2019 12 02 02  -2.5  87.0  4.4  1.0  2  10.0  292.0  -3.6
"""
    epochs, vals = native.parse_ascii_obs(text)
    assert len(epochs) == 3
    import calendar
    assert epochs[0] == calendar.timegm((2019, 12, 2, 0, 0, 0))
    assert epochs[2] == calendar.timegm((2019, 12, 2, 2, 0, 0))
    np.testing.assert_allclose(vals[0], [-3.5, -3.0, -2.5])   # tair
    np.testing.assert_allclose(vals[7], [-4.2, -3.9, -3.6])   # tsurf


def test_parse_ascii_skips_garbage():
    text = b"not a data line\n19 12 02 00 -1 80 3 0 3 0 290 -2\n"
    epochs, vals = native.parse_ascii_obs(text)
    assert len(epochs) == 1


def test_batch_interpolate_stations_matches_fallback():
    """The JsonSource/SmartMetSource wiring: native batched call ==
    per-station numpy fallback, incl. empty stations and absent variables."""
    from roadsurf_tpu.io import sources as S

    rng = np.random.default_rng(3)
    sim_times = np.arange(0, 7200, 300, dtype=np.int64)
    series = []
    for s in range(9):
        if s == 4:
            series.append((np.zeros(0, np.int64), {}))     # empty station
            continue
        n = int(rng.integers(3, 12))
        t = np.sort(rng.choice(np.arange(0, 9000, 60), size=n,
                               replace=False)).astype(np.int64)
        vals = {"tair": rng.normal(0, 5, n),
                "rhz": rng.uniform(40, 100, n),
                "prec_phase": rng.integers(0, 7, n).astype(np.float64)}
        if s % 2:
            vals["lw_net"] = rng.normal(-500, 100, n)      # only some have it
        vals["tair"][rng.random(n) < 0.3] = MISSING
        series.append((t, vals))

    got = S.batch_interpolate_stations(series, sim_times)

    import roadsurf_tpu.io.native as nat
    saved = nat._lib
    nat._lib = None
    import os
    lp = nat._LIB_PATH
    nat._LIB_PATH = "/nonexistent.so"
    try:
        ref = S.batch_interpolate_stations(series, sim_times)
    finally:
        nat._lib, nat._LIB_PATH = saved, lp
    assert len(got) == len(ref) == 9
    for g, r in zip(got, ref):
        assert set(g) == set(S.VAR_NAMES)
        for k in S.VAR_NAMES:
            np.testing.assert_allclose(g[k], r[k], rtol=1e-12, err_msg=k)


def test_native_grid_extract_matches_numpy(monkeypatch):
    """rs_grid_at_points (bilinear + nearest-corner, flip + missing) must be
    bitwise-identical to the numpy reference implementations."""
    import numpy as np

    from roadsurf_tpu.io import gridsource, native

    assert native.load(build_if_missing=True) is not None
    rng = np.random.default_rng(11)
    R, ny, nx, P = 7, 13, 17, 501
    for descending in (False, True):
        lats = np.linspace(60.0, 62.0, ny)
        if descending:
            lats = lats[::-1].copy()
        lons = np.linspace(24.0, 27.0, nx)
        field = rng.normal(-3.0, 4.0, (R, ny, nx))
        field[rng.random((R, ny, nx)) < 0.2] = -9999.9
        field[1, 3, 4] = np.nan
        plat = rng.uniform(59.5, 62.5, P)       # some outside
        plon = rng.uniform(23.5, 27.5, P)
        for fn, mode in ((gridsource.bilinear_at_points, 0),
                         (gridsource.nearest_corner_at_points, 1)):
            got = gridsource._native_extract(field, lats, lons, plat, plon,
                                             mode)
            assert got is not None
            with monkeypatch.context() as m:
                m.setattr(native, "_lib", None)
                m.setattr(native, "load",
                          lambda build_if_missing=False: None)
                want = fn(field, lats, lons, plat, plon)
            # g++ -march=native contracts a*b+c into FMA: values agree
            # to ~1 ulp, missingness must match exactly
            np.testing.assert_array_equal(got <= -9000.0, want <= -9000.0,
                                          err_msg=f"mode={mode} "
                                                  f"desc={descending}")
            np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-11,
                                       err_msg=f"mode={mode} "
                                               f"desc={descending}")


def test_native_grid_extract_degenerate_dims(monkeypatch):
    """1-row / 1-column grids must not read out of bounds (the +1 bilinear
    neighbor does not exist) and must match the numpy fallback, whose
    negative-index wrap lands on the same single row/column."""
    import numpy as np

    from roadsurf_tpu.io import gridsource, native

    assert native.load(build_if_missing=True) is not None
    rng = np.random.default_rng(3)
    for ny, nx in ((1, 9), (9, 1), (1, 1)):
        lats = np.linspace(60.0, 61.0, ny)
        lons = np.linspace(24.0, 25.0, nx)
        field = rng.normal(0.0, 2.0, (3, ny, nx))
        plat = rng.uniform(60.0, 61.0, 40)
        plon = rng.uniform(24.0, 25.0, 40)
        if ny == 1:
            plat[:] = 60.0                  # inside test needs la[0]==la[-1]
        if nx == 1:
            plon[:] = 24.0
        got = gridsource._native_extract(field, lats, lons, plat, plon, 0)
        assert got is not None
        with monkeypatch.context() as m:
            m.setattr(native, "_lib", None)
            m.setattr(native, "load", lambda build_if_missing=False: None)
            want = gridsource.bilinear_at_points(field, lats, lons,
                                                 plat, plon)
        np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-11,
                                   err_msg=f"ny={ny} nx={nx}")
