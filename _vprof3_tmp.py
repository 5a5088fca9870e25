import numpy as np, jax, jax.numpy as jnp, time
import bench as B
from relaxtpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
rng = np.random.default_rng(0)
fx = B.build_extractor(jnp.bfloat16)
v = B.synthetic_video(rng, 16)
fy, fu, fv = (jnp.asarray(a) for a in v[3])
ny, nu, nv = (jnp.asarray(a) for a in v[4])
if not hasattr(fx, "_video_fn_yuv_v"):
    fx._video_fn_yuv_v = jax.jit(fx._video_vec_yuv)
nf = jnp.asarray(16, jnp.int32); npr = jnp.asarray(16, jnp.int32)
call = lambda e: fx._video_fn_yuv_v(fx.resnet_vars, fx.vit_vars, fy, fu, fv, ny, nu, nv, nf, npr)
np.asarray(call(0))
for trial in range(3):
    t0 = time.perf_counter()
    outs = [call(i) for i in range(4)]
    for o in outs: np.asarray(o)
    print('video program s/call (device-resident): %.2f' % ((time.perf_counter()-t0)/4))
