"""Point modes (coordinates/grid/masks), nearest-station mapping, and the
runner's grid-mode JSON output path.

(Restored from the retired test_points_streaming.py: only the two
run_streamed tests died with streaming.py -- these cover io/points.py and
runner paths that are still live in production.)
"""
import json

import numpy as np

from roadsurf_tpu import runner
from roadsurf_tpu.io.points import (haversine_km, nearest_station_forcing,
                                    parse_points, read_ascii_mask)
from roadsurf_tpu.io.synthetic import synthetic_raw

from test_io import _write_config, _write_full_inputs


def test_haversine():
    # Helsinki -> Tampere ~ 160 km
    d = haversine_km(60.17, 24.94, 61.50, 23.79)
    assert 150 < float(d) < 175


def test_parse_points_modes(tmp_path):
    assert parse_points({})[0] == "stations"
    m, la, lo = parse_points({"points": {"latlon": [60.0, 25.0]}})
    assert m == "coordinate" and la[0] == 60.0
    m, la, lo = parse_points(
        {"points": {"coordinates": [[60, 25], [61, 26]]}})
    assert m == "coordinates" and len(la) == 2
    m, la, lo = parse_points(
        {"points": {"grid": {"bbox": [60, 20, 62, 24], "ny": 3, "nx": 5}}})
    assert m == "grid" and len(la) == 15
    assert la.min() == 60 and la.max() == 62


def test_ascii_mask(tmp_path):
    p = tmp_path / "mask.txt"
    p.write_text("10101\n01010\n11111\n")
    m = read_ascii_mask(str(p), 3, 5, "1")
    assert m.sum() == 3 + 2 + 5
    cfg = {"points": {"grid": {"bbox": [60, 20, 62, 24], "ny": 3, "nx": 5,
                               "mask": {"path": str(p), "include": "1"}}}}
    mode, la, lo = parse_points(cfg)
    assert len(la) == 10


def test_nearest_station_mapping():
    raw, cal = synthetic_raw(3, 10, seed=1)
    st_lats = np.array([60.0, 61.0, 62.0])
    st_lons = np.array([25.0, 25.0, 25.0])
    # two points near station 1, one out of range
    lats = np.array([61.01, 60.99, 70.0])
    lons = np.array([25.0, 25.0, 25.0])
    mapped, idx = nearest_station_forcing(raw, st_lats, st_lons, lats, lons,
                                          max_radius_km=30.0)
    assert list(idx) == [1, 1, -1]
    np.testing.assert_array_equal(mapped.tair[0], np.asarray(raw.tair)[1])
    assert np.all(mapped.tair[2] < -9000)


def test_runner_grid_mode(tmp_path):
    fc, ob, t0 = _write_full_inputs(tmp_path)
    out = tmp_path / "out.json"
    cfgp = _write_config(tmp_path, fc, ob, out)
    cfg = json.loads(cfgp.read_text())
    cfg["points"] = {"grid": {"bbox": [60.05, 24.4, 60.09, 24.6],
                              "ny": 2, "nx": 2}, "max_radius_km": 30.0}
    cfgp.write_text(json.dumps(cfg))
    final_state, fields = runner.run(str(cfgp), verbose=False)
    doc = json.loads(out.read_text())
    assert len(doc) == 4                      # 2x2 grid
    assert all(np.isfinite(r["RoadTemperature"]).all() for r in doc)
