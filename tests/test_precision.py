"""float32 (TPU perf mode) vs float64 (parity mode) drift over long horizons.

The reference is float64 end-to-end on CPU; the TPU perf path runs float32.
SURVEY.md flags the Kelvin^4 radiation term and long-horizon drift as the
risks.  These tests quantify the drift over a 12 h window and bound it --
the acceptance criterion is drift well below the model's physical accuracy
(the coupling tolerance is 0.1 K; obs errors are several 0.1 K)."""
import jax
import jax.numpy as jnp
import numpy as np

from roadsurf_tpu.config import ModelSettings
from roadsurf_tpu.io.synthetic import synthetic_raw
from roadsurf_tpu.model import Model, scan_steps
from roadsurf_tpu.state import default_point_params


def _run(dtype, sim_len=1441, npoints=16, seed=33, scenario="winter_mix"):
    settings = ModelSettings(sim_len=sim_len, dt=30.0)
    model = Model(settings)
    raw, cal = synthetic_raw(npoints, sim_len, seed=seed, scenario=scenario)
    pts = default_point_params(npoints)
    prep = model.prepare(raw, pts, cal)
    prep = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype.kind == "f" else x, prep)
    state = model.init(raw, cal, dtype=dtype)
    ones = jnp.ones(prep.tair.shape, dtype)
    obs = jnp.asarray(pts.coupling_tsurf, dtype)
    _, out = scan_steps(state, prep, ones, ones, obs, model.cfg, model.grid,
                        model.params)
    return out


def test_f32_drift_bounded():
    out64 = _run(jnp.float64)
    out32 = _run(jnp.float32)
    dt_surf = np.abs(np.asarray(out64.tsurf) - np.asarray(out32.tsurf))
    # surface temperature drift over 12 h stays well under the 0.1 K
    # coupling tolerance
    assert dt_surf.max() < 0.1, f"f32 tsurf drift {dt_surf.max():.4f} K"
    for name in ("wat", "snow", "ice", "dep"):
        d = np.abs(np.asarray(getattr(out64, name))
                   - np.asarray(getattr(out32, name)))
        assert d.max() < 0.15, f"f32 {name} drift {d.max():.4f} mm"


def test_f32_drift_cold():
    out64 = _run(jnp.float64, scenario="cold_snow", seed=34)
    out32 = _run(jnp.float32, scenario="cold_snow", seed=34)
    dt_surf = np.abs(np.asarray(out64.tsurf) - np.asarray(out32.tsurf))
    assert dt_surf.max() < 0.1, f"f32 tsurf drift {dt_surf.max():.4f} K"
