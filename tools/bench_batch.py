import sys
sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from ttc.models.unet import TreeCoverNet

def timeit(f,*a,n=10):
    s=f(*a); float(jnp.sum(s)); t=time.perf_counter()
    for _ in range(n): s=f(*a)
    float(jnp.sum(s)); return (time.perf_counter()-t)/n

rng = np.random.default_rng(0)
params = jax.jit(TreeCoverNet().init)(jax.random.PRNGKey(0), np.zeros((1,5,28,28,17),np.float32))
for name, dtype in (("fp32", None), ("bf16", jnp.bfloat16)):
    model = TreeCoverNet(dtype=dtype)
    for b in (144, 288):
        x = jnp.asarray(rng.random((b,5,172,172,17)).astype(np.float32))
        f = jax.jit(lambda p,v: model.apply(p,v))
        dt = timeit(f, params, x)
        print(f"{name} b={b}: {dt*1000:.1f} ms = {b/dt:.0f} windows/s", flush=True)
