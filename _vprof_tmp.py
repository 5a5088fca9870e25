import numpy as np, jax, jax.numpy as jnp, time
from bench import synthetic_video, build_extractor
from relaxtpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
rng = np.random.default_rng(0)
fx = build_extractor(jnp.bfloat16)
v = synthetic_video(rng, 16)
frames, prev, nxt, fyuv, nyuv = v

# same-content repeats: uploads hit the tunnel content cache -> ~compute+dispatch
np.asarray(fx.video_feature_async_yuv(fyuv, nyuv))
t0 = time.perf_counter()
for _ in range(5):
    np.asarray(fx.video_feature_async_yuv(fyuv, nyuv))
print('yuv same-content s/video (compute+dispatch): %.2f' % ((time.perf_counter()-t0)/5))

# unique-content serial (no pipelining): upload + compute
vids = [synthetic_video(rng, 16) for _ in range(4)]
t0 = time.perf_counter()
for vv in vids:
    np.asarray(fx.video_feature_async_yuv(vv[3], vv[4]))
print('yuv unique serial s/video: %.2f' % ((time.perf_counter()-t0)/4))

# upload-only cost of one yuv set
t0 = time.perf_counter()
arrs = [jnp.asarray(a) for a in (*vids[0][3], *vids[0][4])]
jax.block_until_ready(arrs)
print('note: block_until_ready unreliable; skip')
