"""Run every TPU bench in ONE process, sequentially.

The dev rig reaches its single chip through a remote tunnel whose device
claim is paid per process (and which wedges for many minutes if a TPU
process dies -- see CLAUDE.md).  This driver imports the individual bench
mains and runs them in one process: one claim cycle, one risk window.

Each stage is wrapped so a failure (e.g. HBM ResourceExhausted) does not
abort the remaining stages.  Output: each stage's own JSON lines, prefixed
with a stage banner on stderr.

Stage order puts the scarcest numbers first: one HBM OOM poisons the
device for every later stage in the process (measured: after a
ResourceExhausted, every subsequent allocation fails instantly).

Usage: python tools/bench_all_tpu.py [stage ...]
  stages (default order): coupled chunk_fast chunk_gather chunk chunk_skyview
  chunk_grid inner full
"""
import gc
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

STAGES = ("coupled", "chunk_fast", "chunk_gather", "chunk", "chunk_skyview",
          "chunk_grid", "chunk_composite", "chunk_grid_generic",
          "coupled_grid", "density", "inner", "full")


def _stage(name, fn):
    print(f"===== stage {name} =====", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    try:
        fn()
        print(f"===== stage {name} done in {time.perf_counter()-t0:.1f}s "
              f"=====", file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001 -- keep later stages alive
        print(f"===== stage {name} FAILED after "
              f"{time.perf_counter()-t0:.1f}s: {type(e).__name__}: {e} "
              f"=====", file=sys.stderr, flush=True)
    gc.collect()            # drop device buffers before the next stage


def main(argv=None):
    want = list(argv or []) or list(STAGES)
    for name in want:
        if name == "chunk":
            from tools.bench_chunk import main as m
            _stage(name, lambda: m([]))
        elif name == "chunk_fast":
            # --fast defaults to the fused tile-major MXU expansion
            from tools.bench_chunk import main as m
            _stage(name, lambda: m(["--fast"]))
        elif name == "chunk_gather":
            from tools.bench_chunk import main as m
            _stage(name, lambda: m(["--fast", "--no-fused"]))
        elif name == "chunk_skyview":
            # chunk 32: the raw+slim double materialization of the fused
            # sky-view path OOMs 16 GB HBM at 1M points x chunk 64
            from tools.bench_chunk import main as m
            _stage(name, lambda: m(["--skyview", "--chunk-t", "32"]))
        elif name == "chunk_grid":
            from tools.bench_chunk import main as m
            _stage(name, lambda: m(["--grid"]))
        elif name == "chunk_composite":
            from tools.bench_chunk import main as m
            _stage(name, lambda: m(["--composite"]))
        elif name == "chunk_grid_generic":
            # the pre-round-5 generic per-point grid path, for comparison
            from tools.bench_chunk import main as m
            _stage(name, lambda: m(["--grid", "--no-tm"]))
        elif name == "coupled_grid":
            from tools.bench_coupled import main as m
            _stage(name, lambda: m(["--points", "262144", "--grid",
                                    "--scenario", "typical"]))
        elif name == "density":
            # dense station map (VERDICT r4 item 5): ~10k stations at 262k
            # points -- the fused plan must auto-tune or degrade gracefully
            from tools.bench_chunk import main as m
            _stage(name, lambda: m(["--fast", "--stations", "10240",
                                    "--points", "262144"]))
        elif name == "coupled":
            from tools.bench_coupled import main as m
            _stage(name, lambda: m(["--points", "262144"]))
        elif name == "inner":
            import bench
            _stage(name, bench.main)
        elif name == "full":
            import bench_full
            _stage(name, bench_full.main)
        else:
            print(f"unknown stage {name!r}", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1:])
