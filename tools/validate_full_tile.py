import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from ttc.core.config import InferenceConfig
from ttc.infer.pipeline import TilePredictor
from ttc.io.acquisition import FixtureBackend
from ttc.io.store import TileStore
from ttc.models.unet import TreeCoverNet
from ttc.cli.predict_job import run_tile
from ttc.utils.profiling import StageTimer
import tempfile

model = TreeCoverNet()
params = jax.jit(model.init)(jax.random.PRNGKey(0), np.zeros((1,5,28,28,17),np.float32))
predictor = TilePredictor(params, InferenceConfig(), model)
backend = FixtureBackend(seed=9, n_dates=10, hw=618, cloud_fraction=0.3)
store = TileStore(tempfile.mkdtemp())
timer = StageTimer("full618")
t0 = time.time()
raster = run_tile(7, 7, 2023, backend, store, predictor, timer=timer)
print("total wall:", round(time.time()-t0, 1), "s")
print(timer.report())
print("raster:", raster.shape, "mean", float(raster[raster!=255].mean()),
      "nodata%", float((raster==255).mean()*100))
