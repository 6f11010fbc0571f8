import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from ttc.core.config import InferenceConfig
from ttc.infer.pipeline import TilePredictor
from ttc.models.unet import TreeCoverNet
from bench import _build_inputs

params = jax.jit(TreeCoverNet().init)(jax.random.PRNGKey(0), np.zeros((1,5,28,28,17),np.float32))
inp = _build_inputs(np.random.default_rng(0))
args = (inp["s2_monthly"], inp["s1_monthly"], inp["slope"], inp["s2_median"], inp["s1_median"], inp["clear_count"])

out32 = np.asarray(TilePredictor(params, InferenceConfig(), TreeCoverNet())(*args)).astype(np.float32)
out16 = np.asarray(TilePredictor(params, InferenceConfig(), TreeCoverNet(dtype=jnp.bfloat16))(*args)).astype(np.float32)
valid = (out32 != 255) & (out16 != 255)
diff = np.abs(out32[valid] - out16[valid])
print(f"bf16 vs fp32 tree-cover raster: mean abs diff {diff.mean():.3f} pp, "
      f"p99 {np.percentile(diff,99):.1f} pp, max {diff.max():.0f} pp, "
      f"nodata agreement {np.mean((out32==255)==(out16==255))*100:.2f}%")
