"""Country-scale sustained-run behavior (BASELINE config 5 at test
scale).

The reference babysits multi-day country runs with a bash loop + an
SSH/tmux fleet script (reference: plantations_job.sh:1-33,
src/check_on_instances.py:1-159). These tests exercise the replacement
at a compressed scale:

1. 64 fixture tiles stream through the pipelined tile-batched predict
   path end to end — every raster written, sustained throughput and
   peak host RSS measured (reported, asserted only loosely: CI boxes
   vary).
2. 64 tiles stream through the virtual 8-device mesh batched predictor
   (ttc.parallel.batch.run_tile_stream) with host-side prefetch.
3. fleet.supervise drives REAL predict-job workers over a shared tile
   DB; one worker is SIGKILLed mid-run and the supervisor must restart
   it and converge to every tile completed (idempotent skip of
   finished tiles makes the restart cheap).
"""
import os
import resource
import threading
import time

import numpy as np
import pytest

from ttc.io.store import TileStore

pytestmark = pytest.mark.slow

HW = 64
CFG_KW = dict(tile_px=HW, out_size=26, n_rows=2)


def _predictor(tile_batch=1):
    import jax

    from ttc.core.config import InferenceConfig
    from ttc.infer.pipeline import TilePredictor
    from ttc.models.unet import TreeCoverNet

    model = TreeCoverNet()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 5, 28, 28, 17), np.float32))
    cfg = InferenceConfig(**CFG_KW)
    return TilePredictor(params, cfg, model, tile_batch=tile_batch), \
        params, cfg, model


def _vm_rss_mb() -> float:
    try:
        with open("/proc/self/status") as fh:
            for line in fh:
                if line.startswith("VmRSS"):
                    return float(line.split()[1]) / 1024
    except OSError:
        return resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss / 1024
    return 0.0


def test_sustained_64_tiles_pipelined(tmp_path):
    from ttc.cli.predict_job import run_tiles_pipelined
    from ttc.io.acquisition import FixtureBackend

    predictor, _, _, _ = _predictor(tile_batch=4)
    store = TileStore(str(tmp_path))
    backend = FixtureBackend(seed=1, n_dates=6, hw=HW)
    tiles = [(x, y) for x in range(8) for y in range(8)]     # 64

    # sample RSS through the stream: the pipeline's bounded prefetch
    # must hold the working set flat — a leak shows as second-half
    # samples ramping past the first half
    samples: list = []
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            samples.append(_vm_rss_mb())
            stop.wait(0.5)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    t0 = time.perf_counter()
    results = run_tiles_pipelined(tiles, 2023, backend, store,
                                  predictor)
    wall = time.perf_counter() - t0
    stop.set()
    th.join(timeout=5)
    assert sorted(results) == tiles
    for x, y in tiles:
        assert os.path.exists(store.final_tif_path(x, y)), (x, y)
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(f"sustained 64 tiles: {64 / wall:.2f} tiles/sec "
          f"({wall:.0f}s wall), peak RSS {rss_mb:.0f} MB")
    assert 64 / wall > 0.05          # sanity floor only; CI varies
    if len(samples) >= 8:
        half = len(samples) // 2
        first, second = max(samples[:half]), max(samples[half:])
        # plateau: second-half peak within 25% + 200 MB of first-half
        # (allocator jitter allowed; a per-tile leak of even ~10 MB
        # over 32 second-half tiles would blow through this)
        assert second <= first * 1.25 + 200, (first, second)


def test_sustained_64_tiles_mesh_stream():
    """64 tiles through the sharded batched predictor on the virtual
    8-device mesh with prefetch (ttc.parallel.batch)."""
    import jax

    from ttc.parallel.batch import run_tile_stream
    from ttc.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    _, params, cfg, _ = _predictor()
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)

    def tile_iter():
        for i in range(64):
            yield i, {
                "s2_monthly": (rng.random((12, HW, HW, 14))
                               * 0.4).astype(np.float32),
                "s1_monthly": (rng.random((12, HW, HW, 2))
                               * 0.6).astype(np.float32),
                "slope": (rng.random((HW, HW)) * 0.3).astype(
                    np.float32),
                "s2_median": (rng.random((HW, HW, 14))
                              * 0.4).astype(np.float32),
                "s1_median": (rng.random((HW, HW, 2))
                              * 0.6).astype(np.float32),
                "clear_count": np.full((HW, HW), 8.0, np.float32),
            }

    done = []
    for ids, rasters in run_tile_stream(params, mesh, tile_iter(),
                                        cfg=cfg):
        assert rasters.shape[1:] == (HW, HW)
        done.extend(i for i in ids if i is not None)
    assert sorted(done) == list(range(64))


def test_fleet_kill_restart_completes(tmp_path, monkeypatch):
    """A SIGKILLed worker is restarted by fleet.supervise and the run
    converges: every tile raster exists afterwards."""
    import pandas as pd

    import ttc.cli.fleet as fleet

    db = tmp_path / "tiles.csv"
    pd.DataFrame({
        "X_tile": [x for x in range(4) for _ in range(2)],
        "Y_tile": [y for _ in range(4) for y in range(2)],
        "X": [np.nan] * 8, "Y": [np.nan] * 8,
    }).to_csv(db, index=False)
    out = tmp_path / "tiles_out"

    procs = []
    real_launch = fleet.launch_worker

    def tracking_launch(start, end, passthrough):
        p = real_launch(start, end, passthrough)
        procs.append(p)
        return p

    monkeypatch.setattr(fleet, "launch_worker", tracking_launch)
    monkeypatch.setenv("TTC_PLATFORM", "cpu")   # workers off the TPU
    passthrough = ["--backend", "fixture", "--local_path", str(out),
                   "--allow_random_init", "--no_superres",
                   "--tile_px", str(HW), "--out_size", "26",
                   "--n_rows", "2"]

    t = threading.Thread(target=fleet.supervise,
                         args=(str(db), 2, passthrough),
                         kwargs=dict(max_restarts=3, poll_s=1.0),
                         daemon=True)
    t.start()
    # let worker 0 get going, then kill it by exact PID (never by
    # pattern) before it can finish its range
    deadline = time.time() + 60
    while not procs and time.time() < deadline:
        time.sleep(0.5)
    assert procs, "no worker launched"
    time.sleep(3.0)
    victim = procs[0]
    if victim.poll() is None:
        victim.kill()
    t.join(timeout=600)
    assert not t.is_alive(), "supervise did not converge"

    store = TileStore(str(out))
    missing = [(x, y) for x in range(4) for y in range(2)
               if not os.path.exists(store.final_tif_path(x, y))]
    assert not missing, missing
    assert len(procs) >= 3      # 2 initial workers + >=1 restart
