"""Freeze oracle golden trajectories into tests/data/golden.npz.

The oracle (roadsurf_tpu/oracle.py) and the batched engines were written by
the same author, so a shared misreading of the Fortran would be invisible to
the parity suite.  Freezing the oracle's outputs on fixed inputs makes silent
oracle+engine co-drift detectable: any later change to either that alters
trajectories fails tests/test_golden.py until the change is consciously
re-frozen with this script (round-1 review item 6).

Usage: python tools/gen_golden.py        # rewrites tests/data/golden.npz
"""
import os
import sys

# same numeric environment as tests/conftest.py (CPU backend, float64)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENARIOS = ("winter_mix", "cold_snow", "warm_rain")
T = 241
NP_ = 2
DT = 30.0
F_KEYS = ("tair", "tdew", "vz", "rhz", "prec", "sw", "lw", "sw_dir",
          "lw_net", "tsurf_obs", "prec_phase")


def build_inputs():
    from roadsurf_tpu.io.synthetic import synthetic_raw
    data = {}
    for sc in SCENARIOS:
        raw, cal = synthetic_raw(NP_, T, dt=DT, seed=42, scenario=sc)
        for k in F_KEYS:
            data[f"{sc}/{k}"] = np.asarray(getattr(raw, k), np.float64)
        data[f"{sc}/epochs"] = np.asarray(
            (np.asarray(cal.year) * 0), np.int64)  # placeholder, see below
    # one shared calendar (epoch series) is enough
    start = 1575158400          # 2019-12-01T00:00Z
    data["epochs"] = start + (np.arange(T) * DT).astype(np.int64)
    return data


def run_oracle(data):
    from roadsurf_tpu.config import ModelSettings, PhysicsParams
    from roadsurf_tpu.forcing import Calendar
    from roadsurf_tpu.oracle import Oracle, OraclePoint

    cal = Calendar.from_epochs(data["epochs"])
    out = {}
    for sc in SCENARIOS:
        for coupled in (False, True):
            settings = ModelSettings(sim_len=T, dt=DT, use_coupling=coupled)
            oracle = Oracle(settings, PhysicsParams())
            for pnt in range(NP_):
                f = {k: np.array(data[f"{sc}/{k}"][pnt], np.float64)
                     for k in F_KEYS}
                kw = {}
                if coupled:
                    # obs 1.2 K off the free trajectory at step 120
                    kw = dict(coupling_index=120,
                              coupling_tsurf=float(f["tair"][119]) - 1.2)
                opt = OraclePoint(lat=61.0 + pnt, lon=24.0 + pnt,
                                  init_len=12, **kw)
                tag = f"{sc}/{'coupled' if coupled else 'free'}/p{pnt}"
                out[tag] = np.asarray(oracle.run(f, cal, opt), np.float64)
    return out


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "tests", "data", "golden.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data = build_inputs()
    data.pop("winter_mix/epochs", None)
    data = {k: v for k, v in data.items() if not k.endswith("/epochs")}
    data.update(run_oracle(data))
    np.savez_compressed(path, **data)
    print(f"wrote {path}: {len(data)} arrays")


if __name__ == "__main__":
    main()
