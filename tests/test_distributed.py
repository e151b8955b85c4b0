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


def test_multiprocess_scan_parity():
    """SURVEY section 4(c): N local processes, per-host point-range loading,
    make_array_from_process_local_data assembly, SPMD scan == per-host
    single-process result (tests/_mp_worker.py)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    env = dict(os.environ)
    env["PYTHONPATH"] = (env.get("PYTHONPATH", "") + os.pathsep + repo
                         ).lstrip(os.pathsep)
    nproc = 2
    import tempfile
    shard_dir = tempfile.mkdtemp(prefix="rs_shards_")
    env["MP_SHARD_DIR"] = shard_dir
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(nproc), str(i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(nproc)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"MP_OK {i}" in out, f"worker {i} output:\n{out}"


def test_salt_melt_switches_config():
    from roadsurf_tpu.config import ModelSettings
    s = ModelSettings.from_json({"model": {"force_snow_melting": 1,
                                           "use_relaxation": 1}})
    assert s.force_snow_melting and not s.force_ice_melting
    assert s.use_relaxation
