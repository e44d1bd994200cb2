"""Op-level device-time attribution of the fused codec via jax.profiler.

Captures an xplane trace of the fused encode and decode programs on the
real chip and prints the top HLO ops by self time. This replaces the
black-box truncation probes (profile-fused-stages.py etc.), which gave
contradictory numbers because summed outputs let XLA fuse whole stages
away.

Usage: python scripts/profile-trace.py [--dtype bf16|f32] [--what enc|dec|both]
"""
import argparse
import glob
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_xplane(logdir):
    """Return list of (op_name, total_self_us, occurrences) from the trace."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rttd
    paths = glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                      recursive=True)
    assert paths, f'no xplane under {logdir}'
    for tool in ('hlo_stats', 'hlo_op_stats', 'framework_op_stats',
                 'tensorflow_stats'):
        try:
            data, _ = rttd.xspace_to_tool_data(paths, tool, {})
            return tool, data
        except Exception as e:
            print(f'  (tool {tool} failed: {type(e).__name__}: {e})',
                  flush=True)
    return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dtype', default='bf16', choices=['bf16', 'f32'])
    ap.add_argument('--what', default='both', choices=['enc', 'dec', 'both'])
    ap.add_argument('--logdir', default='/tmp/jaxtrace')
    args = ap.parse_args()
    cd = 'bfloat16' if args.dtype == 'bf16' else None

    import jax
    import jax.numpy as jnp
    cache = os.path.expanduser('~/.cache/lvae_tpu_jax')
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import lvae_tpu
    from scipy.ndimage import gaussian_filter

    model = lvae_tpu.get_model('qarv_base')
    w = 'runs/qarv_base_synth6k_ema.msgpack'
    if os.path.isfile(w):
        model.load_weights(w)
    model.params = jax.device_put(model.params)
    jax.block_until_ready(jax.tree.leaves(model.params)[0])

    rng = np.random.default_rng(0)
    H, W = 512, 768
    im = gaussian_filter(rng.uniform(0, 1, (H, W, 3)), sigma=(4, 4, 0))
    im = (im - im.min()) / (im.max() - im.min() + 1e-9)
    im = (np.round(im * 255) / 255).astype(np.float32)[None]
    imj = jnp.asarray(im)
    np.asarray(imj[0, :1, :1, 0])

    model.compress_mode(coder='fused', esc_cap=8192, compute_dtype=cd)

    print("warmup compress...", flush=True)  # compile outside the trace
    import time as _t
    t = _t.perf_counter()
    bits = model.compress(imj, lmb=512.0)
    print(f'compress done {_t.perf_counter()-t:.1f}s', flush=True)
    t = _t.perf_counter()
    out = model.decompress(bits)
    np.asarray(out[0, :1, :1, 0])
    print(f'decompress done {_t.perf_counter()-t:.1f}s', flush=True)

    import shutil
    shutil.rmtree(args.logdir, ignore_errors=True)

    t0 = time.perf_counter()
    with jax.profiler.trace(args.logdir):
        for _ in range(3):
            if args.what in ('enc', 'both'):
                bits = model.compress(imj, lmb=512.0)
            if args.what in ('dec', 'both'):
                out = model.decompress(bits)
                np.asarray(out[0, :1, :1, 0])
    print(f'traced wall: {(time.perf_counter() - t0) * 1e3:.1f} ms '
          f'for 3 iter ({args.what})', flush=True)

    tool, data = parse_xplane(args.logdir)
    print(f'tool = {tool}', flush=True)
    if data is None:
        sys.exit(1)
    # data is json or csv text depending on tool; just dump to a file and
    # print the head so we can inspect the schema.
    outp = '/tmp/trace_tool_data.txt'
    mode = 'wb' if isinstance(data, bytes) else 'w'
    with open(outp, mode) as f:
        f.write(data)
    print(f'wrote {outp} ({len(data)} bytes)')
    s = data.decode() if isinstance(data, bytes) else str(data)
    print(s[:3000])


if __name__ == '__main__':
    main()
