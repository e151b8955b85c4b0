"""Multi-host glue exercised single-process on the 8-virtual-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from roadsurf_tpu.parallel.distributed import (gather_to_host, global_points_mesh,
                                               host_point_range, make_global)
from roadsurf_tpu.parallel.sharding import POINTS


def test_host_point_range_single_process():
    s, e = host_point_range(1000)
    assert (s, e) == (0, 1000)


def test_make_global_sharded():
    mesh = global_points_mesh()
    x = np.arange(64, dtype=np.float32)
    tree = {"a": x, "b": x.reshape(64, 1), "scalar": np.float32(3.0)}
    g = make_global(tree, mesh)
    assert not g["a"].sharding.is_fully_replicated
    assert g["scalar"].sharding.is_fully_replicated
    np.testing.assert_array_equal(gather_to_host(g["a"]), x)
    # computation over the sharded tree works transparently
    y = jax.jit(lambda t: t["a"] * 2 + t["b"][:, 0])(g)
    np.testing.assert_array_equal(np.asarray(y), x * 3)


def test_salt_melt_switches_config():
    from roadsurf_tpu.config import ModelSettings
    s = ModelSettings.from_json({"model": {"force_snow_melting": 1,
                                           "use_relaxation": 1}})
    assert s.force_snow_melting and not s.force_ice_melting
    assert s.use_relaxation
