import numpy as np, jax, jax.numpy as jnp, time
import bench as B
from relaxtpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
rng = np.random.default_rng(0)
fx = B.build_extractor(jnp.bfloat16)
# tiny video: compute ~0 -> measures per-call dispatch/marshalling overhead
vids = [B.synthetic_video(rng, 16, 64, 128) for _ in range(6)]
np.asarray(fx.video_feature_async_yuv(vids[0][3], vids[0][4]))
t0 = time.perf_counter()
for v in vids[1:]:
    np.asarray(fx.video_feature_async_yuv(v[3], v[4]))
print('tiny video s/call (dispatch floor): %.3f' % ((time.perf_counter()-t0)/5))
# and the pure MLP head-ish small program for comparison
f = jax.jit(lambda x: (x * 2).sum())
x = jnp.ones((8, 128))
float(f(x))
t0 = time.perf_counter()
for i in range(10): float(f(x + i))
print('trivial jit s/call: %.3f' % ((time.perf_counter()-t0)/10))
