"""End-to-end tests of the shipped examples (shrunken windows).

The reference treats its examples as the integration test (SURVEY.md section
4: example1 with pinned inputs and -t 20191202T0000 is the golden-output
test); these tests formalize that: each example's data generator + config +
runner must produce a complete, finite output set.
"""
import importlib.util
import json
import os

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def load_script(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_example1_end_to_end(tmp_path):
    gen = load_script(os.path.join(EXAMPLES, "example1", "make_data.py"),
                      "ex1_make_data")
    # data window is wider than the run window so the warm-started second
    # cycle (+1 h) stays covered
    gen.main(["--stations", "3", "--analysis", "4", "--forecast", "4",
              "--outdir", str(tmp_path)])

    from roadsurf_tpu.io.sources import read_json_tolerant
    cfg = read_json_tolerant(
        os.path.join(EXAMPLES, "example1", "example_config.json"))
    cfg["time"]["analysis"] = 4
    cfg["time"]["forecast"] = 2
    for src in cfg["input"]:
        src["path"] = str(tmp_path / os.path.basename(src["path"]))
    cfg["parameters"]["sky_view_file"] = str(tmp_path / "skyview.txt")
    cfg["parameters"]["local_horizon_file"] = str(tmp_path / "horizons.txt")
    out_path = tmp_path / "out.json"
    cfg["output"]["filename"] = str(out_path)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    from roadsurf_tpu import runner
    ck = tmp_path / "state.npz"
    runner.run(str(cfg_path), "20191202T0000", checkpoint_out=str(ck),
               verbose=False)
    doc = json.loads(out_path.read_text())
    assert len(doc) == 3
    for st in doc:
        n = len(st["time"])
        assert n >= 4     # hourly over 4 h
        for key in ("RoadTemperature", "Water", "Snow", "Ice", "Deposit"):
            vals = np.asarray(st[key], float)
            assert vals.shape == (n,)
            assert np.isfinite(vals).all()
        assert -40 < st["RoadTemperature"][-1] < 30

    # warm-started second cycle runs from the checkpoint
    runner.run(str(cfg_path), "20191202T0100", checkpoint_in=str(ck),
               verbose=False)


def test_example1_pallas_engine_parity(tmp_path):
    """example1's full feature set -- station JSON sources, sky-view +
    local horizons, coupling, relaxation -- through the streamed pallas
    engine (the round-5 fused-generic sky-view path) == the scan engine."""
    gen = load_script(os.path.join(EXAMPLES, "example1", "make_data.py"),
                      "ex1_make_data")
    gen.main(["--stations", "3", "--analysis", "4", "--forecast", "4",
              "--outdir", str(tmp_path)])

    from roadsurf_tpu.io.sources import read_json_tolerant
    cfg = read_json_tolerant(
        os.path.join(EXAMPLES, "example1", "example_config.json"))
    cfg["time"]["analysis"] = 2
    cfg["time"]["forecast"] = 1
    cfg["model"]["DTSecs"] = 120       # keep the interpret-mode run short
    for src in cfg["input"]:
        src["path"] = str(tmp_path / os.path.basename(src["path"]))
    cfg["parameters"]["sky_view_file"] = str(tmp_path / "skyview.txt")
    cfg["parameters"]["local_horizon_file"] = str(tmp_path / "horizons.txt")
    cfg["output"]["filename"] = str(tmp_path / "out.json")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    from roadsurf_tpu import runner
    _, f_scan = runner.run(str(cfg_path), "20191202T0000", verbose=False,
                           engine="scan")
    _, f_pal = runner.run(str(cfg_path), "20191202T0000", verbose=False,
                          engine="pallas")
    steps = np.asarray(f_pal["steps"])
    for n in ("tsurf", "wat", "snow", "ice", "dep"):
        want = np.asarray(f_scan[n])[steps]
        np.testing.assert_allclose(np.asarray(f_pal[n]), want,
                                   rtol=2e-4, atol=2e-3, err_msg=n)


def test_example2_grid_end_to_end(tmp_path):
    gen = load_script(os.path.join(EXAMPLES, "example2", "make_data.py"),
                      "ex2_make_data")
    gen.main(["--analysis", "2", "--forecast", "2", "--ny", "6", "--nx", "8",
              "--outdir", str(tmp_path)])

    from roadsurf_tpu.io.sources import read_json_tolerant
    cfg = read_json_tolerant(
        os.path.join(EXAMPLES, "example2", "grid_config.json"))
    cfg["time"]["analysis"] = 2
    cfg["time"]["forecast"] = 2
    cfg["points"]["grid"]["ny"] = 6
    cfg["points"]["grid"]["nx"] = 8
    cfg["points"]["mask"] = {"path": str(tmp_path / "road_mask.txt"),
                             "include": "1"}
    cfg["input"][0]["path"] = str(tmp_path / "forecast_grid.npz")
    cfg["input"][1]["path"] = str(tmp_path / "road_station.txt")
    out_path = tmp_path / "out.npz"
    cfg["output"]["filename"] = str(out_path)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    from roadsurf_tpu import runner
    runner.run(str(cfg_path), "20191202T0000", verbose=False)
    z = np.load(out_path)
    # the reference querydata writer's 9 output params
    # (examples/example2/src/QueryDataTools.cpp:125-153)
    for key in ("tsurf", "tair", "tdew", "tdew_deficit", "snow", "water",
                "ice", "deposit", "ice2"):
        assert key in z.files
        assert z[key].shape == (z["times"].shape[0], 6, 8)
    keep = z["mask"].astype(bool)
    assert keep.any() and not keep.all()
    assert np.isfinite(z["tsurf"][:, keep]).all()

    # expression-mask variant over the static grid
    cfg["points"]["mask"] = {"path": str(tmp_path / "static_grid.npz"),
                             "enable": "elevation < 120 && !missing(landcover)"}
    cfg_path.write_text(json.dumps(cfg))
    runner.run(str(cfg_path), "20191202T0000", verbose=False)
    z2 = np.load(out_path)
    assert z2["mask"].astype(bool).sum() > 0
