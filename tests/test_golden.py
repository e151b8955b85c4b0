"""Frozen golden trajectories (round-1 review item 6).

tests/data/golden.npz holds fixed forcing inputs plus the oracle's outputs
for 3 scenarios x {free, coupled} x 2 points, frozen by tools/gen_golden.py.
Both the oracle AND the batched engine must reproduce them: a change to
either that silently shifts trajectories (oracle+engine co-drift) fails here
until consciously re-frozen.
"""
import os

import numpy as np
import pytest

from roadsurf_tpu.config import ModelSettings, PhysicsParams
from roadsurf_tpu.forcing import Calendar, RawForcing
from roadsurf_tpu.oracle import Oracle, OraclePoint
from roadsurf_tpu.state import default_point_params

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "golden.npz")
SCENARIOS = ("winter_mix", "cold_snow", "warm_rain")
F_KEYS = ("tair", "tdew", "vz", "rhz", "prec", "sw", "lw", "sw_dir",
          "lw_net", "tsurf_obs", "prec_phase")
T, NP_, DT = 241, 2, 30.0


@pytest.fixture(scope="module")
def golden():
    assert os.path.exists(GOLDEN), \
        "tests/data/golden.npz missing; run tools/gen_golden.py"
    return np.load(GOLDEN)


def _raw(golden, sc):
    return RawForcing(*(np.asarray(golden[f"{sc}/{k}"]) for k in F_KEYS))


def _cal(golden):
    return Calendar.from_epochs(golden["epochs"])


@pytest.mark.parametrize("sc", SCENARIOS)
@pytest.mark.parametrize("coupled", [False, True])
def test_oracle_matches_golden(golden, sc, coupled):
    settings = ModelSettings(sim_len=T, dt=DT, use_coupling=coupled)
    oracle = Oracle(settings, PhysicsParams())
    cal = _cal(golden)
    for pnt in range(NP_):
        f = {k: np.array(golden[f"{sc}/{k}"][pnt], np.float64)
             for k in F_KEYS}
        kw = {}
        if coupled:
            kw = dict(coupling_index=120,
                      coupling_tsurf=float(f["tair"][119]) - 1.2)
        opt = OraclePoint(lat=61.0 + pnt, lon=24.0 + pnt, init_len=12, **kw)
        got = np.asarray(oracle.run(f, cal, opt))
        want = golden[f"{sc}/{'coupled' if coupled else 'free'}/p{pnt}"]
        np.testing.assert_array_equal(
            got, want,
            err_msg=f"oracle drifted from golden ({sc}, coupled={coupled}, "
                    f"p{pnt}); if intentional, re-freeze with "
                    f"tools/gen_golden.py")


@pytest.mark.parametrize("sc", SCENARIOS)
def test_engine_matches_golden_free(golden, sc):
    from roadsurf_tpu.model import Model
    settings = ModelSettings(sim_len=T, dt=DT)
    model = Model(settings)
    raw = _raw(golden, sc)
    pts = default_point_params(NP_, init_len=12)
    pts = pts._replace(lat=np.array([61.0, 62.0]),
                       lon=np.array([24.0, 25.0]))
    _, out = model.run(raw, pts, _cal(golden))
    fields = np.stack([np.asarray(out.tsurf), np.asarray(out.wat),
                       np.asarray(out.snow), np.asarray(out.ice),
                       np.asarray(out.ice2), np.asarray(out.dep)], axis=-1)
    for pnt in range(NP_):
        want = golden[f"{sc}/free/p{pnt}"]
        np.testing.assert_allclose(
            fields[:, pnt, :], want, rtol=1e-9, atol=1e-9,
            err_msg=f"engine drifted from golden ({sc}, p{pnt})")


def test_engine_matches_golden_coupled(golden):
    from roadsurf_tpu.model import Model
    sc = "winter_mix"
    settings = ModelSettings(sim_len=T, dt=DT, use_coupling=True)
    model = Model(settings)
    raw = _raw(golden, sc)
    tair = np.asarray(golden[f"{sc}/tair"])
    pts = default_point_params(NP_, init_len=12)
    clen = settings.coupling_len_steps
    start = 1 if 120 <= clen else 120 - clen   # initCouplingTimes
    pts = pts._replace(
        lat=np.array([61.0, 62.0]), lon=np.array([24.0, 25.0]),
        coupling_start=np.full(NP_, start, np.int32),
        coupling_end=np.full(NP_, 120, np.int32),
        coupling_tsurf=tair[:, 119] - 1.2)
    _, out = model.run_coupled(raw, pts, _cal(golden))
    out = np.asarray(out)
    for pnt in range(NP_):
        want = golden[f"{sc}/coupled/p{pnt}"]
        np.testing.assert_allclose(
            out[:, pnt, :], want, rtol=1e-9, atol=1e-9,
            err_msg=f"coupled engine drifted from golden (p{pnt})")
