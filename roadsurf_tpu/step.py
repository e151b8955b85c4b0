"""The fused per-timestep update: state x forcing-row -> state.

Composes the physics kernels in exactly the reference's per-step order
(examples/example1/src/Simulation.f90:58-95 and :120-172):

  CheckValues -> [coupling flags] -> SetCurrentValues (obs forcing)
  -> [relaxation: precomputed in forcing prep]
  -> PrecipitationToStorage -> [ModRadiation: precomputed]
  -> BalanceModelOneStep (BLCond fixed point, RNet, stencil, HStor, melting)
  -> WearFactors -> RoadCond -> CalcAlbedo

Branch-free, batched over points; per-point failure containment freezes the
state and poisons outputs with -9999 (the reference aborts the point's loop;
src/InputOutput.f90:66-82, Simulation.f90:58).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .config import ModelSettings, PhysicsParams
from .grid import LayerGrid
from .physics import storage
from .physics.boundary_layer import bl_cond_and_le
from .physics.radiation import net_radiation
from .physics.soil import soil_step, surface_average
from .state import State

OUT_MISSING = -9999.0


class StepForcing(NamedTuple):
    """One timestep's prepared forcing row (see forcing.Prepared)."""
    tair: jnp.ndarray
    vz: jnp.ndarray
    rhz: jnp.ndarray
    rain: jnp.ndarray
    snow: jnp.ndarray
    sw: jnp.ndarray
    lw: jnp.ndarray
    tsurf_obs: jnp.ndarray
    valid: jnp.ndarray
    in_coupling: jnp.ndarray
    trf_fric: jnp.ndarray
    sw_cof: jnp.ndarray
    lw_cof: jnp.ndarray


class StepConfig(NamedTuple):
    """Static (compile-time) step configuration."""
    dt: float
    tph: float
    depth_idx: int
    depth_w: float
    use_depth: bool
    force_snow_melting: bool
    force_ice_melting: bool
    melting_can_change_temperature: bool
    bl_max_iter: int = 40

    @classmethod
    def from_settings(cls, settings: ModelSettings, depth_idx=1, depth_w=0.0,
                      use_depth=False, bl_max_iter: int = 40) -> "StepConfig":
        return cls(dt=settings.dt, tph=settings.tph, depth_idx=depth_idx,
                   depth_w=depth_w, use_depth=use_depth,
                   force_snow_melting=settings.force_snow_melting,
                   force_ice_melting=settings.force_ice_melting,
                   melting_can_change_temperature=settings.melting_can_change_temperature,
                   bl_max_iter=bl_max_iter)


def step(state: State, f: StepForcing, coupling_tsurf, cfg: StepConfig,
         grid_dyc, grid_cond_dz, grid_wcont, p: PhysicsParams,
         depth=None) -> State:
    """Advance one timestep.  grid_* are the static [L] layer arrays.

    ``depth``: optional per-point (idx, w, use) arrays overriding the static
    StepConfig output-depth (ex2's per-point modelInput%%depth)."""
    didx, dw, duse = depth if depth is not None else (
        cfg.depth_idx, cfg.depth_w, cfg.use_depth)
    # --- failure containment (CheckValues; Simulation.f90:58) -----------
    # The reference has no early exit inside the loop body: the step that
    # FAILS CheckValues still runs and writes output; only subsequent steps
    # are skipped.  So `active` gates on failures from PRIOR steps, while the
    # new flag carries this step's failure forward.
    abnormal = (state.tsurf_ave < -100.0) | (state.tsurf_ave > 100.0)
    failed = state.failed | (~f.valid) | abnormal
    active = ~state.failed

    # --- SetCurrentValues: air node + obs forcing (InputOutput.f90:107-148)
    tmp = state.tmp.at[..., 0].set(f.tair)
    force_obs = f.tsurf_obs > -100.0
    t1 = jnp.where(force_obs, f.tsurf_obs, tmp[..., 1])
    t2 = jnp.where(force_obs, f.tsurf_obs, tmp[..., 2])
    tmp = tmp.at[..., 1].set(t1).at[..., 2].set(t2)
    tsurf_ave = jnp.where(
        force_obs, surface_average(tmp, didx, dw, duse), state.tsurf_ave)

    # --- PrecipitationToStorage (Storage.f90:9-29) ----------------------
    wat = state.wat + f.rain
    snow = state.snow + f.snow

    # --- BalanceModelOneStep (BalanceModel.f90:7-86) --------------------
    bl = bl_cond_and_le(state.blcond, tsurf_ave, state.evap, cfg.dt, wat,
                        f.tair, f.vz, f.rhz, p, max_iter=cfg.bl_max_iter)
    rnet = net_radiation(tsurf_ave, state.albedo, f.sw, f.lw,
                         f.sw_cof, f.lw_cof, p)
    soil = soil_step(tmp, grid_wcont, grid_dyc, grid_cond_dz, bl.blcond,
                     rnet, bl.le_flux, f.trf_fric, cfg.dt, p)

    storages = storage.Storages(wat, snow, state.ice, state.ice2, state.dep)
    tmp_new, _, q2melt = storage.melting_limiter(
        storages, soil.tmp_new, tsurf_ave, state.q2melt, state.t4melt,
        soil.hstor, soil.hs1, f.in_coupling, coupling_tsurf,
        didx, dw, duse, cfg.melting_can_change_temperature, p)

    # commit + output temperature (BalanceModel.f90:75-84)
    tsurf_after = surface_average(tmp_new, didx, dw, duse)

    # --- WearFactors + RoadCond + CalcAlbedo (Simulation.f90:159-171) ---
    storages, very_cold, q2melt, t4melt = storage.road_cond(
        storages, tsurf_after, bl.evap, q2melt, state.t4melt,
        state.very_cold, cfg.tph, cfg.dt,
        cfg.force_snow_melting, cfg.force_ice_melting, p)
    albedo = storage.albedo_update(state.albedo, storages, p)

    new = State(
        tmp=tmp_new, tsurf_ave=tsurf_after,
        wat=storages.wat, snow=storages.snow, ice=storages.ice,
        ice2=storages.ice2, dep=storages.dep,
        q2melt=q2melt, t4melt=t4melt, very_cold=very_cold,
        evap=bl.evap, blcond=bl.blcond, albedo=albedo, failed=failed)

    # freeze failed points
    frozen = State(
        tmp=jnp.where(active[..., None], new.tmp, state.tmp),
        tsurf_ave=jnp.where(active, new.tsurf_ave, state.tsurf_ave),
        wat=jnp.where(active, new.wat, state.wat),
        snow=jnp.where(active, new.snow, state.snow),
        ice=jnp.where(active, new.ice, state.ice),
        ice2=jnp.where(active, new.ice2, state.ice2),
        dep=jnp.where(active, new.dep, state.dep),
        q2melt=jnp.where(active, new.q2melt, state.q2melt),
        t4melt=jnp.where(active, new.t4melt, state.t4melt),
        very_cold=jnp.where(active, new.very_cold, state.very_cold),
        evap=jnp.where(active, new.evap, state.evap),
        blcond=jnp.where(active, new.blcond, state.blcond),
        albedo=jnp.where(active, new.albedo, state.albedo),
        failed=failed)
    return frozen


def step_output(state: State, failed_before):
    """The six output fields (SaveOutput, src/InputOutput.f90:151-165).

    ``failed_before`` is the failure mask at step ENTRY: the step on which a
    point first fails still writes its output (Simulation.f90 has no early
    exit in the loop body); only later steps stay -9999."""
    mask = lambda x: jnp.where(failed_before, OUT_MISSING, x)
    return (mask(state.tsurf_ave), mask(state.wat), mask(state.snow),
            mask(state.ice), mask(state.ice2), mask(state.dep))
