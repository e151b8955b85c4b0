"""Gridded forecast source (querydata equivalent), expression masks, and the
gridded output writer.

Covers QueryDataSource semantics (examples/example2/src/QueryDataSource.cpp):
bilinear point extraction, gap-capped time interpolation with missing-sample
search, nearest-time precipitation phase, RH clamp, precipitation sanity;
read_querydata_mask expression masks (roadrunner.cpp:272-323); and the
QueryDataTools 9-parameter grid writer.
"""
import calendar
import json
import time as timelib

import numpy as np
import pytest

from roadsurf_tpu.io.gridsource import (GridSource, bilinear_at_points,
                                        interpolate_gapped, nearest_gapped)
from roadsurf_tpu.io.masks import eval_mask_expression, expression_mask
from roadsurf_tpu.io.points import parse_points_full
from roadsurf_tpu import runner

MISSING = -9999.9


def utc(s):
    return calendar.timegm(timelib.strptime(s, "%Y-%m-%d %H:%M"))


# ---------------------------------------------------------------------------
# bilinear spatial extraction
# ---------------------------------------------------------------------------

def test_bilinear_corners_and_center():
    lats = np.array([60.0, 61.0])
    lons = np.array([24.0, 25.0])
    f = np.array([[1.0, 2.0], [3.0, 4.0]])   # [ny, nx]
    v = bilinear_at_points(f, lats, lons,
                           np.array([60.0, 61.0, 60.5]),
                           np.array([24.0, 25.0, 24.5]))
    np.testing.assert_allclose(v, [1.0, 4.0, 2.5])


def test_bilinear_descending_lats():
    lats = np.array([61.0, 60.0])           # descending (common in NWP)
    lons = np.array([24.0, 25.0])
    f = np.array([[3.0, 4.0], [1.0, 2.0]])  # row 0 = 61N
    v = bilinear_at_points(f, lats, lons, np.array([60.0, 61.0]),
                           np.array([24.0, 24.0]))
    np.testing.assert_allclose(v, [1.0, 3.0])


def test_bilinear_missing_corner_renormalizes():
    lats = np.array([60.0, 61.0])
    lons = np.array([24.0, 25.0])
    f = np.array([[1.0, MISSING], [3.0, 5.0]])
    # center point: corners (1, missing, 3, 5) at weight 1/4 each
    v = bilinear_at_points(f, lats, lons, np.array([60.5]), np.array([24.5]))
    np.testing.assert_allclose(v, [(1 + 3 + 5) / 3.0])


def test_bilinear_outside_grid_missing():
    lats = np.array([60.0, 61.0])
    lons = np.array([24.0, 25.0])
    f = np.ones((2, 2))
    v = bilinear_at_points(f, lats, lons, np.array([59.0, 62.0, 60.5]),
                           np.array([24.5, 24.5, 26.0]))
    assert np.all(v == MISSING)


def test_bilinear_time_major_field():
    lats = np.array([60.0, 61.0])
    lons = np.array([24.0, 25.0])
    f = np.stack([np.full((2, 2), 1.0), np.full((2, 2), 2.0)])  # [T, ny, nx]
    v = bilinear_at_points(f, lats, lons, np.array([60.5]), np.array([24.5]))
    np.testing.assert_allclose(v, [[1.0], [2.0]])


# ---------------------------------------------------------------------------
# gap-capped time interpolation (QueryDataSource.cpp:331-425)
# ---------------------------------------------------------------------------

def test_interpolate_gapped_basic_and_exact():
    rt = np.array([0, 3600, 7200], np.int64)
    st = np.array([0, 1800, 3600], np.int64)
    v = interpolate_gapped(rt, st, np.array([1.0, 3.0, 5.0]))
    np.testing.assert_allclose(v, [1.0, 2.0, 3.0])


def test_interpolate_gapped_skips_missing_sample():
    # missing middle sample: interpolation bridges 0->7200 (gap 120 min OK)
    rt = np.array([0, 3600, 7200], np.int64)
    st = np.array([3600], np.int64)
    v = interpolate_gapped(rt, st, np.array([1.0, MISSING, 5.0]))
    np.testing.assert_allclose(v, [3.0])


def test_interpolate_gapped_gap_cap():
    # valid samples 4 h apart > 180 min cap -> missing
    rt = np.array([0, 4 * 3600], np.int64)
    st = np.array([3600], np.int64)
    v = interpolate_gapped(rt, st, np.array([1.0, 5.0]))
    assert v[0] == MISSING
    # within cap at exactly 180 min -> interpolated
    rt2 = np.array([0, 3 * 3600], np.int64)
    v2 = interpolate_gapped(rt2, st, np.array([1.0, 4.0]))
    np.testing.assert_allclose(v2, [2.0])


def test_interpolate_gapped_before_start_missing():
    rt = np.array([3600, 7200], np.int64)
    st = np.array([0, 3600], np.int64)
    v = interpolate_gapped(rt, st, np.array([2.0, 4.0]))
    assert v[0] == MISSING and v[1] == 2.0


def test_interpolate_gapped_after_end_missing():
    rt = np.array([0, 3600], np.int64)
    st = np.array([3600, 7200], np.int64)
    v = interpolate_gapped(rt, st, np.array([2.0, 4.0]))
    assert v[0] == 4.0 and v[1] == MISSING


def test_nearest_gapped_tie_goes_later():
    rt = np.array([0, 3600], np.int64)
    st = np.array([1800, 1700, 1900], np.int64)
    v = nearest_gapped(rt, st, np.array([1.0, 2.0]))
    np.testing.assert_allclose(v, [2.0, 1.0, 2.0])


def test_nearest_gapped_no_missing_search():
    # the picked neighbor may be missing -- replicated reference behavior
    rt = np.array([0, 3600, 7200], np.int64)
    st = np.array([3000], np.int64)
    v = nearest_gapped(rt, st, np.array([1.0, MISSING, 5.0]))
    assert v[0] == MISSING


# ---------------------------------------------------------------------------
# GridSource end to end
# ---------------------------------------------------------------------------

def _write_grid_npz(path, t0, nhours=7, ny=3, nx=4, tair_base=-3.0):
    lats = np.linspace(60.0, 61.0, ny)
    lons = np.linspace(24.0, 25.5, nx)
    times = t0 + 3600 * np.arange(nhours)
    shp = (nhours, ny, nx)
    lat_g = np.broadcast_to(lats[None, :, None], shp)
    hr = np.arange(nhours)[:, None, None]
    np.savez(
        path, times=times, lats=lats, lons=lons,
        tair=tair_base + 0.5 * hr + (lat_g - 60.0),
        rhz=np.full(shp, 85.0), vz=np.full(shp, 3.0),
        prec=np.zeros(shp), sw=np.full(shp, 20.0),
        lw=np.full(shp, 290.0), sw_dir=np.zeros(shp),
        lw_net=np.full(shp, -10.0),
        prec_phase=np.full(shp, 3.0))
    return lats, lons, times


def test_gridsource_at_points(tmp_path):
    t0 = utc("2019-12-02 00:00")
    p = tmp_path / "fc.npz"
    _write_grid_npz(p, t0)
    sim_t = t0 + 1800 * np.arange(5)
    src = GridSource({"path": str(p)}, sim_t)
    vals = src.at_points(np.array([60.5, 60.0]), np.array([24.75, 24.0]))
    # tair(t, lat) = -3 + 0.5h + (lat-60): half-hour steps
    np.testing.assert_allclose(vals["tair"][0],
                               -2.5 + 0.25 * np.arange(5), atol=1e-9)
    np.testing.assert_allclose(vals["tair"][1],
                               -3.0 + 0.25 * np.arange(5), atol=1e-9)
    assert np.all(vals["prec_phase"] == 3.0)


def test_gridsource_rh_clamp_and_prec_sanity(tmp_path):
    t0 = utc("2019-12-02 00:00")
    p = tmp_path / "fc.npz"
    lats = np.array([60.0, 61.0])
    lons = np.array([24.0, 25.0])
    times = t0 + 3600 * np.arange(2)
    np.savez(p, times=times, lats=lats, lons=lons,
             rhz=np.full((2, 2, 2), 104.0),
             prec=np.full((2, 2, 2), 400.0))
    src = GridSource({"path": str(p)}, times)
    vals = src.at_points(np.array([60.5]), np.array([24.5]))
    assert np.all(vals["rhz"] == 100.0)            # clamp :868
    assert np.all(vals["prec"] == MISSING)         # >100 sanity :870-871


def test_gridsource_directory_merge_later_wins(tmp_path):
    t0 = utc("2019-12-02 00:00")
    d = tmp_path / "grids"
    d.mkdir()
    _write_grid_npz(d / "a_run0.npz", t0, nhours=4, tair_base=-3.0)
    # newer run overlaps hours 2-3 and extends to 6, different values
    _write_grid_npz(d / "b_run1.npz", t0 + 2 * 3600, nhours=4,
                    tair_base=+5.0)
    sim_t = t0 + 3600 * np.arange(6)
    src = GridSource({"path": str(d)}, sim_t)
    vals = src.at_points(np.array([60.0]), np.array([24.0]))
    # hours 0-1 from run0 (-3 + 0.5h); hours 2-5 from run1 (5 + 0.5(h-2))
    np.testing.assert_allclose(
        vals["tair"][0], [-3.0, -2.5, 5.0, 5.5, 6.0, 6.5], atol=1e-9)


def test_gridsource_latest_valid_time(tmp_path):
    t0 = utc("2019-12-02 00:00")
    p = tmp_path / "fc.npz"
    lats, lons, times = _write_grid_npz(p, t0, nhours=4)
    z = dict(np.load(p))
    z["tair"][-1] = MISSING           # last hour all-missing
    np.savez(p, **z)
    src = GridSource({"path": str(p)}, times)
    assert src.latest_valid_time("tair") == int(times[-2])
    assert src.latest_valid_time("rhz") == int(times[-1])
    assert src.latest_valid_time("nope") is None


# ---------------------------------------------------------------------------
# expression masks
# ---------------------------------------------------------------------------

def test_eval_mask_expression_ops():
    v = {"elev": np.array([10.0, 200.0, MISSING]),
         "lc": np.array([1.0, 2.0, 1.0])}
    # literal evaluation as in the reference stx evaluator: missing values
    # participate as their sentinel; guard with missing() when needed
    m = eval_mask_expression("elev < 100 and lc == 1", v)
    np.testing.assert_array_equal(m, [True, False, True])
    m_guarded = eval_mask_expression(
        "elev < 100 and lc == 1 and not missing(elev)", v)
    np.testing.assert_array_equal(m_guarded, [True, False, False])
    m2 = eval_mask_expression("missing(elev) or elev > 150", v)
    np.testing.assert_array_equal(m2, [False, True, True])
    m3 = eval_mask_expression("elev / 2 + 5 >= 10 && !missing(elev)", v)
    np.testing.assert_array_equal(m3, [True, True, False])


def test_eval_mask_expression_errors():
    v = {"x": np.array([1.0])}
    with pytest.raises(ValueError, match="Unrecognized variable"):
        eval_mask_expression("y > 0", v)
    with pytest.raises(ValueError, match="must be boolean"):
        eval_mask_expression("x + 1", v)
    with pytest.raises(ValueError, match="Unrecognized function"):
        eval_mask_expression("exp(x) > 0", v)
    with pytest.raises(ValueError, match="Unsupported"):
        eval_mask_expression("x ** 2 > 0", v)


def test_expression_mask_grid_points(tmp_path):
    p = tmp_path / "static.npz"
    lats = np.array([60.0, 61.0])
    lons = np.array([24.0, 25.0])
    elev = np.array([[0.0, 100.0], [200.0, 300.0]])
    np.savez(p, lats=lats, lons=lons, elevation=elev)
    keep = expression_mask("elevation <= 100", str(p),
                           np.array([60.0, 60.0, 61.0]),
                           np.array([24.0, 25.0, 25.0]))
    np.testing.assert_array_equal(keep, [True, True, False])


def test_parse_points_grid_expression_mask(tmp_path):
    p = tmp_path / "static.npz"
    np.savez(p, lats=np.array([60.0, 61.0]), lons=np.array([24.0, 25.0]),
             elevation=np.array([[0.0, 100.0], [200.0, 300.0]]))
    cfg = {"points": {"grid": {"bbox": [60.0, 24.0, 61.0, 25.0],
                               "ny": 2, "nx": 2},
                      "mask": {"path": str(p),
                               "enable": "elevation < 150"}}}
    ps = parse_points_full(cfg)
    assert ps.mode == "grid"
    assert len(ps.lats) == 2
    assert ps.keep.sum() == 2
    assert ps.grid_lats is not None and len(ps.grid_lons) == 2


# ---------------------------------------------------------------------------
# runner end to end: grid source -> grid points -> gridded npz output
# ---------------------------------------------------------------------------

def test_runner_grid_source_to_grid_output(tmp_path):
    t0 = utc("2019-12-02 00:00")
    fc = tmp_path / "fc.npz"
    _write_grid_npz(fc, t0, nhours=7)
    out = tmp_path / "out.npz"
    cfg = {
        "time": {"analysis": 2, "forecast": 4, "now": "20191202T0200"},
        "model": {"use_coupling": 0, "use_relaxation": 0, "DTSecs": 60.0},
        "output": {"step": 60, "filename": str(out)},
        "points": {"grid": {"bbox": [60.0, 24.0, 61.0, 25.5],
                            "ny": 3, "nx": 4}},
        "input": [{"name": "FC", "path": str(fc), "type": "grid",
                   "source": "forecast"}],
    }
    cfgp = tmp_path / "config.json"
    cfgp.write_text(json.dumps(cfg))
    final_state, fields = runner.run(str(cfgp), verbose=False)
    assert not np.asarray(final_state.failed).any()
    z = np.load(out)
    assert z["tsurf"].shape == (7, 3, 4)
    for name in ("tsurf", "tair", "tdew", "tdew_deficit", "snow", "water",
                 "ice", "deposit", "ice2"):
        assert name in z.files
    ts = z["tsurf"]
    assert np.all(ts > -30) and np.all(ts < 20)
    np.testing.assert_allclose(z["tdew_deficit"],
                               z["tsurf"] - z["tdew"], atol=1e-5)
    assert z["mask"].all()


def test_runner_grid_source_requires_points(tmp_path):
    t0 = utc("2019-12-02 00:00")
    fc = tmp_path / "fc.npz"
    _write_grid_npz(fc, t0)
    cfg = {"time": {"analysis": 1, "forecast": 1, "now": "20191202T0100"},
           "model": {"DTSecs": 60.0},
           "input": [{"path": str(fc), "type": "grid"}]}
    cfgp = tmp_path / "config.json"
    cfgp.write_text(json.dumps(cfg))
    with pytest.raises(SystemExit, match="points"):
        runner.run(str(cfgp), verbose=False)


def test_runner_grid_source_overlay_with_station_obs(tmp_path):
    """Grid forecast + station observations overlay-merged at latlon keys
    (DataManager.cpp:67-77), relaxation anchored on the obs."""
    t0 = utc("2019-12-02 00:00")
    fc = tmp_path / "fc.npz"
    _write_grid_npz(fc, t0, nhours=7)
    ob = tmp_path / "obs.json"
    hours = [t0 + 3600 * k for k in range(3)]
    ob.write_text(json.dumps([{
        "statId": 1, "lat": 60.5, "lon": 24.75,
        "time": [timelib.strftime("%Y-%m-%d %H:%M", timelib.gmtime(h))
                 for h in hours],
        "Temperature 2m": [-6.0, -5.5, -5.0],
        "RoadTemperature": [-7.0, -6.5, -6.0]}]))
    out = tmp_path / "out.json"
    cfg = {
        "time": {"analysis": 2, "forecast": 4, "now": "20191202T0200"},
        "model": {"use_coupling": 0, "use_relaxation": 1, "DTSecs": 60.0},
        "output": {"step": 60, "filename": str(out)},
        "points": {"coordinates": [[60.5, 24.75], [60.9, 25.2]],
                   "max_radius_km": 30.0},
        "input": [
            {"name": "FC", "path": str(fc), "type": "grid",
             "source": "forecast"},
            {"name": "OBS", "path": str(ob), "type": "json",
             "source": "observations"},
        ],
    }
    cfgp = tmp_path / "config.json"
    cfgp.write_text(json.dumps(cfg))
    final_state, fields = runner.run(str(cfgp), verbose=False)
    doc = json.loads(out.read_text())
    assert len(doc) == 2
    assert np.all(np.isfinite(doc[0]["RoadTemperature"]))
    # point 1 is within obs radius; point 2 only sees the grid forecast
    assert not np.allclose(doc[0]["RoadTemperature"],
                           doc[1]["RoadTemperature"])
