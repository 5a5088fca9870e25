import numpy as np, jax, jax.numpy as jnp, time
probe = jax.jit(lambda a: a.ravel()[0].astype(jnp.int32))
rng = np.random.default_rng(0)
a0 = rng.integers(0, 256, (16, 540, 960, 3), dtype=np.uint8)
int(probe(jnp.asarray(a0)))  # warm compile
# sustained unique-content upload, forced complete via tiny probe fetch
datas = [rng.integers(0, 256, (16, 540, 960, 3), dtype=np.uint8) for _ in range(5)]
t0 = time.perf_counter()
for d in datas:
    int(probe(jnp.asarray(d)))
dt = (time.perf_counter() - t0) / 5
mb = d.nbytes / 1e6
print('upload %.0f MB: %.2f s -> %.0f MB/s' % (mb, dt, mb / dt))
# yuv-sized (12.4 MB)
datas = [rng.integers(0, 256, (16, 540, 960), dtype=np.uint8) for _ in range(5)]
ys = [rng.integers(0, 256, (16, 270, 480), dtype=np.uint8) for _ in range(5)]
t0 = time.perf_counter()
for d, y in zip(datas, ys):
    int(probe(jnp.asarray(d))); int(probe(jnp.asarray(y))); int(probe(jnp.asarray(y)))
dt = (time.perf_counter() - t0) / 5
print('yuv-shaped upload ~12.4MB+halves: %.2f s' % dt)
