"""prepare_window must compose chunk-by-chunk to exactly prepare()'s output.

The production engine streams forcing in time chunks through
forcing.prepare_window (every step rule written analytically in the global
step index); these tests pin chunked == full for every feature that carries
window context: relaxation anchors/decay, first-step wind floor, last-step
(lastValues) quirks, coupling windows and sky-view radiation modification.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from roadsurf_tpu.config import ModelSettings
from roadsurf_tpu.forcing import (Calendar, prepare, prepare_window,
                                  relax_anchors)
from roadsurf_tpu.io.driver import derive_point_params
from roadsurf_tpu.io.synthetic import synthetic_raw
from roadsurf_tpu.model import Model
from roadsurf_tpu.state import PointParams


def _build(use_coupling, use_relaxation, skyview, T=97, P=6, seed=3):
    settings = ModelSettings(sim_len=T, dt=30.0, use_coupling=use_coupling,
                             use_relaxation=use_relaxation)
    raw, cal = synthetic_raw(P, T, dt=30.0, seed=seed)
    pts, blanked = derive_point_params(raw, settings)
    raw = raw._replace(tsurf_obs=blanked)
    if skyview:
        rng = np.random.default_rng(seed)
        sky = np.full(P, 1.0)
        sky[::2] = 0.55
        hor = np.zeros((P, 360))
        hor[::2] = rng.uniform(0.0, 25.0, size=(360,))
        pts = pts._replace(sky_view=sky, horizons=hor)
    if use_relaxation:
        # give every point a plausible anchor set
        pts = pts._replace(
            init_len=np.full(P, T // 3, np.int32),
            tair_relax=np.asarray(raw.tair)[:, T // 3] + 0.5,
            vz_relax=np.asarray(raw.vz)[:, T // 3] + 0.2,
            rh_relax=np.asarray(raw.rhz)[:, T // 3] - 1.0)
    model = Model(settings)
    return settings, model, raw, cal, pts


@pytest.mark.parametrize("use_coupling,use_relaxation,skyview", [
    (False, False, False),
    (True, True, False),
    (True, True, True),
    (False, True, True),
])
def test_chunked_equals_full(use_coupling, use_relaxation, skyview):
    settings, model, raw, cal, pts = _build(use_coupling, use_relaxation,
                                            skyview)
    T = settings.sim_len
    full = prepare(raw, pts, cal, settings, model.params)

    ptsj = PointParams(*(jnp.asarray(x) for x in pts))
    anchors = relax_anchors(raw, ptsj) if use_relaxation else None
    jde = jnp.asarray(cal.jde) if skyview else None
    rawT = [jnp.swapaxes(jnp.asarray(x), -1, 0) for x in raw]
    hour = jnp.asarray(cal.hour)

    # uneven chunks, including a final 1-step chunk holding the lastValues row
    bounds = [0, 17, 40, 64, T - 1, T]
    pieces = []
    for t0, t1 in zip(bounds[:-1], bounds[1:]):
        rw = type(raw)(*(x[t0:t1] for x in rawT))
        pieces.append(prepare_window(
            rw, ptsj, hour[t0:t1], settings, model.params,
            t_offset=t0, t_total=T, anchors=anchors,
            jde=None if jde is None else jde[t0:t1],
            enable_skyview=skyview))
    for name in full._fields:
        got = np.concatenate([np.asarray(getattr(pc, name))
                              for pc in pieces], axis=0)
        want = np.asarray(getattr(full, name))
        assert np.array_equal(got, want), name


def test_window_under_jit_with_traced_offset():
    """t_offset is traced in the production chunk jit -- one compile serves
    every chunk."""
    import jax
    settings, model, raw, cal, pts = _build(False, True, False, T=64)
    T = settings.sim_len
    full = prepare(raw, pts, cal, settings, model.params)
    ptsj = PointParams(*(jnp.asarray(x) for x in pts))
    anchors = relax_anchors(raw, ptsj)
    rawT = type(raw)(*(jnp.swapaxes(jnp.asarray(x), -1, 0) for x in raw))
    hour = jnp.asarray(cal.hour)

    @jax.jit
    def chunk(rw, hr, t0):
        return prepare_window(rw, ptsj, hr, settings, model.params,
                              t_offset=t0, t_total=T, anchors=anchors)

    Tc = 16
    for k in range(T // Tc):
        sl = slice(k * Tc, (k + 1) * Tc)
        got = chunk(type(raw)(*(x[sl] for x in rawT)), hour[sl], k * Tc)
        for name in full._fields:
            a = np.asarray(getattr(got, name))
            b = np.asarray(getattr(full, name))[sl]
            if a.dtype == bool:
                assert np.array_equal(a, b), name
            else:
                # jit fusion (FMA) may differ from the eager build at
                # round-off level; semantics are pinned bitwise by
                # test_chunked_equals_full above.
                assert np.allclose(a, b, rtol=0, atol=1e-9), name
