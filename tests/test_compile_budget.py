"""Compile-budget regression gates for the fused ARD program.

The ARD chain is one big jitted program whose compile cost must stay
T-independent (lax.scan over fixed-capacity date slots, never Python
unrolling — ttc/preprocess/ard.py bucket design). Two gates:

1. date-bucket sharing: tiles whose raw date counts land in the same
   capacity bucket MUST reuse one compiled executable (production
   tiles then share a handful of programs; reference context: the
   rebuild's round-1 4-9 min cold compiles came from per-T recompiles).
2. a VERY loose wall-time ceiling on the cold compile at small
   geometry, catching catastrophic regressions (e.g. an op that
   silently unrolls the T axis) without being flaky on shared CI
   hardware. Measured references (axon v5e server-side compile,
   618 px / 12 dates): _ard_fused 562 s cold, ~0 s warm; CPU at
   52 px compiles in well under a minute.
"""
import time

import numpy as np
import pytest

from ttc.io.acquisition import FixtureBackend


@pytest.mark.slow
def test_ard_bucket_sharing_and_compile_ceiling():
    from ttc.preprocess import ard

    hw = 52  # unique geometry so other tests' cache entries don't hit
    raw6 = FixtureBackend(seed=11, n_dates=6, hw=hw).fetch(0, 0, None,
                                                           2023)
    raw7 = FixtureBackend(seed=12, n_dates=7, hw=hw).fetch(0, 0, None,
                                                           2023)
    assert ard._bucket_capacity(6) == ard._bucket_capacity(7) == 8

    n0 = ard._ard_smooth_fused._cache_size()
    t0 = time.perf_counter()
    tile6, sm6 = ard.process_and_smooth_tile(raw6)
    cold = time.perf_counter() - t0
    n1 = ard._ard_smooth_fused._cache_size()
    assert n1 == n0 + 1, "first tile at a new geometry compiles once"

    t0 = time.perf_counter()
    tile7, sm7 = ard.process_and_smooth_tile(raw7)
    warm = time.perf_counter() - t0
    assert ard._ard_smooth_fused._cache_size() == n1, (
        "a tile in the same date bucket must NOT trigger a recompile")
    assert np.isfinite(np.asarray(sm6.s2)).all()
    assert np.isfinite(np.asarray(sm7.s2)).all()

    # catastrophic-regression ceilings only (shared hardware is noisy):
    # CPU cold compile at 52 px is tens of seconds; a T-unrolling bug
    # multiplies it past these bounds immediately.
    assert cold < 300, f"cold ARD compile blew the budget: {cold:.0f}s"
    assert warm < max(60.0, cold / 2), (
        f"bucket-shared dispatch should skip compilation: {warm:.0f}s "
        f"vs cold {cold:.0f}s")
