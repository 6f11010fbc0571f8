"""Full-tile bf16-vs-fp32 drift + speed on the trained release
weights (production 618 px geometry, realistic ARD inputs through the
real preprocessing chain). Run on the TPU chip:

    python tools/bench_bf16_drift.py

Last recorded (2026-08-19, trained weights, forest fixture tile):
    drift: mean 0.011 pp, p99 0.00 pp, max 15 pp, nodata agree 100%
    fp32 195.1 ms/tile, bf16 173.4 ms/tile
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from bench import _raw_tile
from ttc.core.config import InferenceConfig
from ttc.infer.pipeline import TilePredictor
from ttc.models.unet import inference_model
from ttc.preprocess.ard import process_tile, smooth_tile
from ttc.train.checkpoint import load_params_npz

params = load_params_npz("/root/repo/weights/treecover.npz")
sm = smooth_tile(process_tile(_raw_tile(0)))
args = (sm.s2, sm.s1, sm.dem, sm.s2_median, sm.s1_median,
        sm.clear_count)

p32 = TilePredictor(params, InferenceConfig(), inference_model(True))
p16 = TilePredictor(params, InferenceConfig(), inference_model())
out32 = np.asarray(p32(*args)).astype(np.float32)
out16 = np.asarray(p16(*args)).astype(np.float32)
valid = (out32 != 255) & (out16 != 255)
diff = np.abs(out32[valid] - out16[valid])
print(f"drift: mean {diff.mean():.3f} pp, "
      f"p99 {np.percentile(diff, 99):.2f} pp, max {diff.max():.0f} pp,"
      f" nodata agree {np.mean((out32 == 255) == (out16 == 255)) * 100:.3f}%")

dargs = jax.device_put(args)
for p, name in ((p32, "fp32"), (p16, "bf16")):
    np.asarray(p(*dargs))  # warm (axon: readback = sync)
    t0 = time.perf_counter()
    for _ in range(6):
        out = p(*dargs)
    np.asarray(out)
    print(name, f"{(time.perf_counter() - t0) / 6 * 1000:.1f} ms/tile")
