"""roadsurf_tpu: a TPU-native road weather model framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of fmidev/RoadSurf
(the FMI road weather model library): per-point 1-D ground heat balance with
surface storage physics, observation coupling, relaxation, sky-view radiation
correction -- batched over millions of road points, scanned over time on
device, sharded over TPU meshes.
"""

from .config import ModelSettings, PhysicsParams
from .forcing import Calendar, Prepared, RawForcing
from .model import Model, SimOutput, scan_steps
from .state import PointParams, State, default_point_params, init_state

__version__ = "0.1.0"

__all__ = [
    "ModelSettings", "PhysicsParams", "Calendar", "Prepared", "RawForcing",
    "Model", "SimOutput", "scan_steps", "PointParams", "State",
    "default_point_params", "init_state",
]
