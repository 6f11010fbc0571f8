"""Decompose warm per-stage device time of the ARD chain on a cached
bench tile. Sync via scalar reduction so tunnel readback (4 bytes)
doesn't pollute timings. Usage: python tools/profile_ard.py"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from ttc.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp

    from bench import _raw_tile
    from ttc.ops.whittaker import WhittakerSmoother
    from ttc.ops.regrid import apply_regrid, regrid_weights
    from ttc.ops import indices as idx_ops
    from ttc.preprocess import ard
    from ttc.preprocess.clouds import identify_clouds_shadows
    from ttc.preprocess.gapfill import (interp_weights,
                                        make_aligned_mosaic,
                                        remove_cloud_and_shadows)

    raw = _raw_tile(0)

    def scalar_sync(out):
        leaves = [x for x in (out if isinstance(out, tuple) else (out,))
                  if hasattr(x, "dtype")]
        return [float(jnp.sum(x.astype(jnp.float32))) for x in leaves]

    def t(name, fn, n=3, sync=scalar_sync):
        sync(fn())  # warm
        t0 = time.perf_counter()
        for _ in range(n):
            sync(fn())
        print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:9.1f} ms",
              flush=True)

    def full_sync(out):
        for f in ("s2", "interp", "s1", "s2_median"):
            v = getattr(out, f, None)
            if v is not None and hasattr(v, "dtype"):
                float(jnp.sum(v.astype(jnp.float32)))
        return out

    tile = ard.process_tile(raw)
    full_sync(tile)
    t("process_tile (warm, e2e)", lambda: ard.process_tile(raw), 2,
      sync=full_sync)
    t("smooth_tile (warm, e2e)", lambda: ard.smooth_tile(tile), 2,
      sync=full_sync)

    s2 = jnp.asarray(tile.s2)
    dem = jnp.asarray(tile.dem) * 90.0
    cs, fcps = identify_clouds_shadows(s2, dem)
    scalar_sync((cs, fcps))
    t("  identify_clouds_shadows",
      lambda: identify_clouds_shadows(s2, dem))
    t("  interp_weights", lambda: interp_weights(cs, 12.0, closing=15))
    iw = interp_weights(cs, 12.0, closing=15)
    scalar_sync(iw)
    t("  make_aligned_mosaic", lambda: make_aligned_mosaic(s2, iw))
    t("  remove_cloud_and_shadows",
      lambda: remove_cloud_and_shadows(s2, cs, fcps))

    dates = tile.dates
    weights, _ = regrid_weights(dates)
    t("  all_indices", lambda: idx_ops.all_indices(s2))
    t("  apply_regrid(bands)", lambda: apply_regrid(s2, weights))
    rg = apply_regrid(s2, weights)
    scalar_sync(rg)
    sm = WhittakerSmoother(lmbd=100.0, size=24, outsize=12)
    t("  whittaker.interpolate", lambda: sm.interpolate_array(rg))
    t("  medians", lambda: jnp.median(s2, axis=0))


if __name__ == "__main__":
    main()
