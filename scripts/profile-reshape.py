"""Test the relayout hypothesis: on TPU, reshaping an NHWC conv-derived
int32 tensor (1,h,w,C) to a flat / (T,128) row layout may cost
milliseconds (tile-crossing relayout), which×(9 blocks)×(2 directions)
would explain the fused codec's unattributed ~35-40 ms per direction.

Usage: python scripts/profile-reshape.py
"""
import time

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import os
    import jax
    import jax.numpy as jnp
    cache = os.path.expanduser('~/.cache/lvae_tpu_jax')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    def bench(fn, *a, k=8):
        r = fn(*a)
        np.asarray(jax.tree.leaves(r)[0].reshape(-1)[:1])

        def run(kk):
            t0 = time.perf_counter()
            out = None
            for _ in range(kk):
                out = fn(*a)
            np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
            return time.perf_counter() - t0
        run(1)
        return min((run(k) - run(1)) / (k - 1) for _ in range(3)) * 1e3

    # qarv_base block shapes at 512x768
    shapes = [(1, 8, 12, 32), (1, 16, 24, 32), (1, 32, 48, 96),
              (1, 64, 96, 8)]
    rng = np.random.default_rng(0)
    for shp in shapes:
        x_bf = jnp.asarray(rng.normal(size=shp).astype(np.float32)
                           ).astype(jnp.bfloat16)
        np.asarray(x_bf.astype(jnp.float32)[0, :1, :1, 0])
        n = int(np.prod(shp))
        T = (n + 127) // 128

        f_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
        f_rsum = jax.jit(
            lambda x: jnp.sum(jnp.round(x.astype(jnp.float32))
                              .astype(jnp.int32).reshape(-1)))
        f_rows = jax.jit(
            lambda x: jnp.pad(jnp.round(x.astype(jnp.float32))
                              .astype(jnp.int32).reshape(-1),
                              (0, T * 128 - n)).reshape(T, 128))
        a = bench(f_sum, x_bf)
        b = bench(f_rsum, x_bf)
        c = bench(f_rows, x_bf)
        print(f'{str(shp):<18s} sum {a:6.2f} | int-reshape-sum {b:6.2f} | '
              f'rows out {c:6.2f} ms', flush=True)

    # 9-block emulation: reshape+concat of all qarv_base latent tensors
    blocks = ([(1, 8, 12, 32)] + [(1, 16, 24, 32)] * 2 +
              [(1, 32, 48, 96)] * 3 + [(1, 64, 96, 8)] * 3)
    xs = [jnp.asarray(rng.normal(size=s).astype(np.float32)
                      ).astype(jnp.bfloat16) for s in blocks]
    jax.block_until_ready(xs[-1])

    def all_rows(*xs):
        flats = [jnp.round(x.astype(jnp.float32)).astype(jnp.int32)
                 .reshape(-1) for x in xs]
        rows = []
        for f in flats:
            n = f.shape[0]
            T = (n + 127) // 128
            rows.append(jnp.pad(f, (0, T * 128 - n)).reshape(T, 128))
        return jnp.concatenate(rows)
    print(f'9-block reshape+concat: {bench(jax.jit(all_rows), *xs):6.2f} ms',
          flush=True)

    # reverse direction: (T,128) kernel-output rows -> (1,h,w,C)
    for shp in shapes:
        n = int(np.prod(shp))
        T = (n + 127) // 128
        y = jnp.asarray(rng.integers(-8, 8, (T, 128)).astype(np.int32))
        jax.block_until_ready(y)
        f_img = jax.jit(lambda y, shp=shp, n=n:
                        jnp.sum(y.reshape(-1)[:n].reshape(shp) * 2))
        print(f'rows->{str(shp):<18s}: {bench(f_img, y):6.2f} ms',
              flush=True)


if __name__ == '__main__':
    main()
