"""Data-plane tests: interpolation semantics, source overlay, sky-view files,
the CLI runner end-to-end on example1-format JSON, and warm-start cycling."""
import json
import time as timelib

import numpy as np
import pytest

from roadsurf_tpu.io.interp import MISSING, interpolate_series
from roadsurf_tpu.io.skyview import sky_variables
from roadsurf_tpu.io.sources import DataHandler, JsonSource
from roadsurf_tpu.io.writer import load_checkpoint
from roadsurf_tpu import runner


def utc(s):
    import calendar
    return calendar.timegm(timelib.strptime(s, "%Y-%m-%d %H:%M"))


# ---------------------------------------------------------------------------
def test_interpolation_linear_and_exact():
    raw_t = np.array([utc("2019-12-02 00:00"), utc("2019-12-02 01:00"),
                      utc("2019-12-02 02:00")])
    sim_t = np.array([utc("2019-12-02 00:00"), utc("2019-12-02 00:30"),
                      utc("2019-12-02 01:00"), utc("2019-12-02 01:45"),
                      utc("2019-12-02 02:00"), utc("2019-12-02 02:30")])
    out = interpolate_series(raw_t, sim_t, {"tair": np.array([0.0, 2.0, 4.0])})
    np.testing.assert_allclose(out["tair"][:5], [0.0, 1.0, 2.0, 3.5, 4.0])
    assert out["tair"][5] == MISSING     # beyond raw data


def test_interpolation_missing_endpoint_blocks():
    raw_t = np.array([0, 3600, 7200], np.int64)
    vals = {"tair": np.array([0.0, MISSING, 4.0])}
    out = interpolate_series(raw_t, np.array([1800, 5400], np.int64), vals)
    assert out["tair"][0] == MISSING     # right endpoint missing
    assert out["tair"][1] == MISSING    # left endpoint missing


def test_interpolation_prec_phase_nearest_next():
    raw_t = np.array([0, 3600], np.int64)
    out = interpolate_series(raw_t, np.array([0, 600, 3599], np.int64),
                             {"prec_phase": np.array([1.0, 3.0])})
    np.testing.assert_array_equal(out["prec_phase"], [1.0, 3.0, 3.0])


def test_gap_capped_interpolation():
    """RoadSurfSource interpolation semantics
    (examples/example2/src/RoadSurfSource.cpp:449-507): skip-missing
    brackets, 180-min gap cap, exact-match copy, pPos==0 guard."""
    from roadsurf_tpu.io.interp import interpolate_gap_capped
    h = 3600
    raw_t = np.array([0, 1 * h, 2 * h, 6 * h, 7 * h])
    vals = np.array([0.0, MISSING, 4.0, 12.0, 14.0])
    sim_t = np.array([-h // 2, 0, h, h + 1800, 4 * h, 6 * h + 1800])
    out = interpolate_gap_capped(raw_t, sim_t, vals, max_gap_minutes=180.0)
    assert out[0] == MISSING                     # before first raw sample
    assert out[1] == 0.0                         # exact valid match
    # raw at 1h is missing -> brackets skip to (0h, 2h), gap 2h <= 180min
    np.testing.assert_allclose(out[2], 2.0)
    np.testing.assert_allclose(out[3], 3.0)      # 1.5h between 0h..2h
    assert out[4] == MISSING                     # 2h..6h gap = 240min > cap
    np.testing.assert_allclose(out[5], 13.0)     # 6h..7h gap ok


def test_roadsurf_source_gap_cap(tmp_path):
    """The RoadSurf warm-start source applies the 180-min cap."""
    from roadsurf_tpu.io.sources import RoadSurfSource
    times = ["2019-12-02T00:00", "2019-12-02T01:00", "2019-12-02T06:00"]
    doc = [{"statId": 7, "lat": 60.0, "lon": 25.0, "time": times,
            "RoadTemperature": [1.0, 2.0, 12.0]}]
    path = tmp_path / "prev.json"
    path.write_text(json.dumps(doc))
    t0 = utc("2019-12-02 00:00")
    sim = np.array([t0, t0 + 1800, t0 + 3 * 3600, t0 + 6 * 3600])
    src = RoadSurfSource(str(path), sim)
    v = src.stations()[0].values["tsurf_obs"]
    np.testing.assert_allclose(v[0], 1.0)
    np.testing.assert_allclose(v[1], 1.5)
    assert v[2] == MISSING       # inside the 1h..6h gap (300 min > 180)
    np.testing.assert_allclose(v[3], 12.0)


def test_sim_times_before_raw_start_missing():
    raw_t = np.array([3600, 7200], np.int64)
    out = interpolate_series(raw_t, np.array([0, 1800, 3600], np.int64),
                             {"sw": np.array([5.0, 7.0])})
    assert out["sw"][0] == MISSING and out["sw"][1] == MISSING
    assert out["sw"][2] == 5.0


# ---------------------------------------------------------------------------
def _make_station_json(path, stat_id, lat, lon, hours, values, fmt_keys):
    times = [timelib.strftime("%Y-%m-%d %H:%M", timelib.gmtime(h))
             for h in hours]
    doc = [{"statId": stat_id, "lat": lat, "lon": lon, "time": times,
            **{k: list(map(float, v)) for k, v in zip(fmt_keys, values)}}]
    with open(path, "w") as f:
        json.dump(doc, f)


def test_json_source_overlay(tmp_path):
    t0 = utc("2019-12-02 00:00")
    hours = [t0 + 3600 * k for k in range(4)]
    fc = tmp_path / "fc.json"
    ob = tmp_path / "obs.json"
    _make_station_json(fc, 7, 60.0, 25.0, hours,
                       [[1.0, 2.0, 3.0, 4.0], [80, 80, 80, 80]],
                       ["Temperature 2m", "Humidity"])
    # obs overrides the first two hours
    _make_station_json(ob, 7, 60.0, 25.0, hours[:2],
                       [[-5.0, -4.0]], ["Temperature 2m"])
    sim_t = np.arange(t0, t0 + 3 * 3600 + 1, 1800, dtype=np.int64)
    h = DataHandler([JsonSource(str(fc), sim_t),
                     JsonSource(str(ob), sim_t, is_observation=True)])
    raw, obs_tair = h.merged(len(sim_t))
    # overlay: obs wins where it has data
    assert raw.tair[0, 0] == -5.0
    assert raw.tair[0, 2] == -4.0
    assert raw.tair[0, 4] == 3.0         # forecast-only region
    assert obs_tair[0, 0] == -5.0 and obs_tair[0, 4] < -9000


def test_skyview_files(tmp_path):
    sv = tmp_path / "sv.txt"
    hz = tmp_path / "hz.txt"
    sv.write_text("100 p100 60.0 25.0 0.850\n")
    hz.write_text("100 p100 60.0 25.0 " + " ".join(["5.0"] * 360) + "\n")
    svf, hor = sky_variables([100, 200], str(sv), str(hz))
    assert svf[0] == 0.85 and svf[1] == 1.0
    assert hor[0, 17] == 5.0 and hor[1, 17] == 0.0


# ---------------------------------------------------------------------------
def _write_full_inputs(tmp_path, nhours=7, stat_ids=(7, 8)):
    """example1-style forecast+obs JSON pair covering the sim window."""
    t0 = utc("2019-12-02 00:00")
    hours = [t0 + 3600 * k for k in range(nhours)]
    rng = np.random.default_rng(0)
    fc = tmp_path / "forecast.json"
    doc = []
    for sid in stat_ids:
        tair = (np.linspace(-3, 1, nhours)
                + rng.normal(0, 0.2, nhours)).round(2)
        doc.append({
            "statId": sid, "lat": 60.0 + sid * 0.01, "lon": 24.5,
            "time": [timelib.strftime("%Y-%m-%d %H:%M", timelib.gmtime(h))
                     for h in hours],
            "Temperature 2m": list(tair),
            "Humidity": [85.0] * nhours,
            "WindSpeed": [3.0] * nhours,
            "Precipitation": [0.0, 0.5, 1.0, 0.0, 0.0, 0.2, 0.0][:nhours],
            "PrecipitationForm": [3] * nhours,
            "RadiationGlobal": [0.0, 0.0, 10.0, 50.0, 80.0, 30.0,
                                0.0][:nhours],
            "RadiationDirectSW": [0.0] * nhours,
            "RadiationLW": [290.0] * nhours,
            "RadiationNetSurfaceLW": [-10.0] * nhours,
        })
    fc.write_text(json.dumps(doc))
    ob = tmp_path / "obs.json"
    obs_doc = []
    for sid in stat_ids:
        obs_doc.append({
            "statId": sid, "lat": 60.0 + sid * 0.01, "lon": 24.5,
            "time": [timelib.strftime("%Y-%m-%d %H:%M", timelib.gmtime(h))
                     for h in hours[:3]],
            "Temperature 2m": [-3.0, -2.5, -2.0],
            "RoadTemperature": [-4.0, -3.5, -3.0],
        })
    ob.write_text(json.dumps(obs_doc))
    return fc, ob, t0


def _write_config(tmp_path, fc, ob, out, analysis=2, forecast=4,
                  use_coupling=0, use_relaxation=1, coupling_minutes=60):
    cfg = {
        "missing_limit": 50,
        "time": {"analysis": analysis, "forecast": forecast,
                 "now": "20191202T0200",
                 "coupling_minutes": coupling_minutes},
        "model": {"use_coupling": use_coupling,
                  "use_relaxation": use_relaxation, "DTSecs": 60.0},
        "output": {"step": 60, "filename": str(out)},
        "input": [
            {"name": "FC", "path": str(fc), "type": "json",
             "source": "forecast"},
            {"name": "OBS", "path": str(ob), "type": "json",
             "source": "observations"},
        ],
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(cfg))
    return p


def test_runner_end_to_end(tmp_path):
    fc, ob, t0 = _write_full_inputs(tmp_path)
    out = tmp_path / "out.json"
    cfgp = _write_config(tmp_path, fc, ob, out)
    final_state, fields = runner.run(str(cfgp), verbose=False)
    doc = json.loads(out.read_text())
    assert len(doc) == 2
    rec = doc[0]
    assert rec["statId"] == 7
    assert len(rec["time"]) == len(rec["RoadTemperature"])
    # 2h analysis + 4h forecast at 60 min output = 7 rows
    assert len(rec["time"]) == 7
    ts = np.array(rec["RoadTemperature"])
    assert np.all(ts > -30) and np.all(ts < 20)
    assert "Ice2" not in rec            # reference JSON writer omits Ice2


def test_runner_coupled_end_to_end(tmp_path):
    fc, ob, t0 = _write_full_inputs(tmp_path)
    out = tmp_path / "outc.json"
    cfgp = _write_config(tmp_path, fc, ob, out, use_coupling=1,
                         coupling_minutes=30)
    final_state, fields = runner.run(str(cfgp), verbose=False)
    doc = json.loads(out.read_text())
    assert len(doc) == 2
    assert np.all(np.isfinite(doc[0]["RoadTemperature"]))


def test_runner_warm_start_cycle(tmp_path):
    fc, ob, t0 = _write_full_inputs(tmp_path)
    out = tmp_path / "out1.json"
    ck = tmp_path / "state.npz"
    cfgp = _write_config(tmp_path, fc, ob, out)
    runner.run(str(cfgp), checkpoint_out=str(ck), verbose=False)
    fields, ids, epoch = load_checkpoint(str(ck))
    assert list(ids) == [7, 8]
    assert fields["tmp"].shape[1] == 17

    # second cycle warm-started from the first
    out2 = tmp_path / "out2.json"
    st2, f2 = runner.run(str(cfgp), output_path=str(out2),
                         checkpoint_in=str(ck), verbose=False)
    # warm start changes the early trajectory vs cold start
    st1, f1 = runner.run(str(cfgp), verbose=False)
    assert not np.allclose(f1["tsurf"][0], f2["tsurf"][0])


def test_runner_missing_budget(tmp_path):
    fc, ob, t0 = _write_full_inputs(tmp_path)
    # corrupt one station's humidity to trigger a 50% failure > 40% budget
    doc = json.loads(fc.read_text())
    doc[0]["Humidity"] = [200.0] * len(doc[0]["Humidity"])  # out of range
    fc.write_text(json.dumps(doc))
    out = tmp_path / "out.json"
    cfgp = _write_config(tmp_path, fc, ob, out)
    cfg = json.loads(cfgp.read_text())
    cfg["missing_limit"] = 40
    cfgp.write_text(json.dumps(cfg))
    with pytest.raises(SystemExit, match="exceeds missing_limit"):
        runner.run(str(cfgp), verbose=False)


def test_ascii_source(tmp_path):
    from roadsurf_tpu.io.sources import AsciiSource
    p = tmp_path / "obs.txt"
    p.write_text(
        "19 12 02 00  -3.5  85.0  4.0  0.0  3  0.0  290.0  -4.2\n"
        "19 12 02 01  -3.0  86.0  4.2  0.5  3  0.0  291.0  -3.9\n")
    t0 = utc("2019-12-02 00:00")
    sim_t = np.arange(t0, t0 + 3601, 1800, dtype=np.int64)
    src = AsciiSource(str(p), sim_t, point_id=5, lat=60.0, lon=25.0)
    st = src.stations()[0]
    np.testing.assert_allclose(st.values["tair"], [-3.5, -3.25, -3.0])
    np.testing.assert_allclose(st.values["tsurf_obs"], [-4.2, -4.05, -3.9])
    assert src.is_observation
