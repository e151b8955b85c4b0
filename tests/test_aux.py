"""Aux subsystems: NaN fault containment, extended writer, reference-config
compatibility (parses the actual example1 config + sky-view files when the
reference mirror is present)."""
import json
import os

import numpy as np
import pytest

from roadsurf_tpu.config import ModelSettings, PhysicsParams
from roadsurf_tpu.io.synthetic import synthetic_raw
from roadsurf_tpu.model import Model
from roadsurf_tpu.observability import detect_nan_points, RunMetrics
from roadsurf_tpu.state import default_point_params

REF = "/root/reference/examples/example1"


def test_nan_poisoning_detection():
    settings = ModelSettings(sim_len=10, dt=30.0)
    model = Model(settings)
    raw, cal = synthetic_raw(4, 10, seed=1)
    state = model.init(raw, cal)
    # corrupt one point's profile (simulated fault injection)
    import jax.numpy as jnp
    tmp = np.asarray(state.tmp).copy()
    tmp[2, 5] = np.nan
    state = state._replace(tmp=jnp.asarray(tmp))
    state2, bad = detect_nan_points(state)
    assert list(np.asarray(bad)) == [False, False, True, False]
    assert bool(np.asarray(state2.failed)[2])


def test_run_metrics():
    m = RunMetrics()
    with m.phase("scan"):
        pass
    m.count("points", 8)
    assert "scan" in m.phases
    assert m.point_steps_per_s(100, 10, "scan") > 0


def test_extended_writer(tmp_path):
    from roadsurf_tpu.io.writer import write_forecast_json_extended
    T, P = 6, 2
    rng = np.random.default_rng(0)
    fields = {k: rng.normal(0, 1, (T, P)) for k in
              ("tsurf", "wat", "snow", "ice", "ice2", "dep")}
    tair = rng.normal(0, 1, (T, P))
    tdew = tair - 2.0
    out = tmp_path / "ext.json"
    write_forecast_json_extended(
        str(out), [1, 2], [60.0, 61.0], [24.0, 25.0],
        1575244800 + np.arange(T) * 60, fields, tair, tdew, output_stride=2)
    doc = json.loads(out.read_text())
    assert set(doc[0]) >= {"RoadTemperature", "Temperature2m", "DewPoint",
                           "DewPointDeficit", "Snow", "Water", "Ice",
                           "Deposit", "Ice2"}
    assert len(doc[0]["time"]) == 3
    np.testing.assert_allclose(
        doc[0]["DewPointDeficit"][0],
        fields["tsurf"][0, 0] - tdew[0, 0], atol=1e-4)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_reference_example1_config_parses():
    """The actual example1 config + sky-view files from the reference repo
    load through our config / sky-view parsers."""
    from roadsurf_tpu.io.sources import read_json_tolerant
    from roadsurf_tpu.io.skyview import sky_variables
    cfg = read_json_tolerant(os.path.join(REF, "example_config.json"))
    s = ModelSettings.from_json(cfg)
    assert s.use_coupling and s.use_relaxation and s.dt == 30.0
    p = PhysicsParams.from_json(s, cfg.get("parameters", {}))
    assert p.emiss == 0.95
    svf, hor = sky_variables(
        [100118, 100120],
        os.path.join(REF, "example_skyview.txt"),
        os.path.join(REF, "example_local_horizons.txt"))
    assert svf[0] == 1.0 and hor.shape == (2, 360)
    assert len(cfg["input"]) == 2
    assert cfg["input"][1]["source"] == "observations"
