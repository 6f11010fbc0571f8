import sys
sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from ttc.models.convgru import ConvGRUCell
from ttc.ops.pallas_gru import fused_convgru_step, fused_convgru_step_im2col, params_from_cell

f, cx, hw, b = 32, 17, 172, 36
cell = ConvGRUCell(filters=f)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, .5, (b, hw, hw, cx)), jnp.float32)
h = jnp.asarray(rng.normal(0, .5, (b, hw, hw, f)), jnp.float32)
params = jax.jit(cell.init)(jax.random.PRNGKey(0), x, h)

def timeit(fn, *a, n=20):
    s = fn(*a); float(jnp.sum(s))
    t = time.perf_counter()
    for _ in range(n): s = fn(*a)
    float(jnp.sum(s))
    return (time.perf_counter()-t)/n

f_ref = jax.jit(lambda p, x, h: cell.apply(p, x, h))
print("XLA cell:", timeit(f_ref, params, x, h)*1000, "ms", flush=True)

fp = params_from_cell(params["params"])
xh = jnp.concatenate([x, h], axis=-1).astype(jnp.bfloat16)
xh_pad = jnp.pad(xh, ((0,0),(1,1),(1,1),(0,0)), mode="reflect")
t0=time.time()
out = fused_convgru_step(xh_pad, fp)
float(jnp.sum(out.astype(jnp.float32))); print("pallas compile:", time.time()-t0, flush=True)
print("pallas cell:", timeit(lambda a: fused_convgru_step(a, fp), xh_pad)*1000, "ms")
ref = np.asarray(f_ref(params, x, h))
got = np.asarray(out, dtype=np.float32)
print("maxdiff:", np.abs(ref-got).max(), "meandiff:", np.abs(ref-got).mean())

t0=time.time()
out2 = fused_convgru_step_im2col(xh_pad, fp)
float(jnp.sum(out2.astype(jnp.float32))); print("im2col compile:", time.time()-t0, flush=True)
print("pallas im2col cell:", timeit(lambda a: fused_convgru_step_im2col(a, fp), xh_pad)*1000, "ms")
got2 = np.asarray(out2, dtype=np.float32)
print("im2col maxdiff:", np.abs(ref-got2).max())
