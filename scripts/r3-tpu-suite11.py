"""Round-3 TPU evidence runs, part 11 — batched serving codec.

The batch-B unified codec (qarv/fused._build_codec_batch) amortizes the
runtime's fixed per-dispatch/per-transfer costs over B images and runs
the conv trunk batched on the MXU. This suite validates it on hardware
with trained weights (selfcheck bit-exactness: decode must reproduce the
encode-side reconstructions bitwise for every image in the batch) and
measures per-image enc+dec wall vs the B=1 headline.

Usage: nohup python scripts/r3-tpu-suite11.py > /tmp/r3suite11.log 2>&1 &
"""
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

W = 'runs/qarv_base_synth6k_ema.msgpack'


def med_ms(v):
    return float(sorted(v)[len(v) // 2] * 1e3)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    cache = os.path.expanduser('~/.cache/lvae_tpu_jax')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import lvae_tpu
    from scipy.ndimage import gaussian_filter

    model = lvae_tpu.get_model('qarv_base')
    assert (ROOT / W).is_file(), f'{W} missing'
    model.load_weights(str(ROOT / W))
    model.params = jax.device_put(model.params)
    jax.block_until_ready(jax.tree.leaves(model.params)[0])

    rng = np.random.default_rng(3)
    H, Wd = 512, 768
    ims = []
    for i in range(8):
        im = gaussian_filter(rng.uniform(0, 1, (H, Wd, 3)),
                             sigma=(3 + (i % 4), 3 + (i % 4), 0))
        im = (im - im.min()) / (im.max() - im.min() + 1e-9)
        ims.append((np.round(im * 255) / 255).astype(np.float32))
    ims = np.stack(ims)
    lmb = 512.0

    model.compress_mode(coder='fused', esc_cap=8192)
    results = {'weights': 'trained-synth6k', 'lmb': lmb,
               'shape': [H, Wd]}

    batches = tuple(int(v) for v in sys.argv[1:]) or (4, 8)
    for B in batches:
        sub = jnp.asarray(ims[:B])
        np.asarray(sub[0, :1, :1, 0])        # device-resident input
        lmbs = [lmb] * B
        import struct
        lmb_f32 = struct.unpack('f', struct.pack('f', lmb))[0]
        t0 = time.time()
        bodies = model.compress_batch(sub, lmb=lmbs)
        print(f'B={B}: first encode (compile) {time.time() - t0:.0f}s',
              flush=True)
        _, recon = model._fused.encode_check_batch(
            model.params, sub, jnp.asarray([lmb_f32] * B, jnp.float32))
        dec = np.asarray(model.decompress_batch(bodies))
        bit_exact = bool(np.array_equal(dec, np.asarray(recon, np.float32)))
        det = model.compress_batch(sub, lmb=lmbs) == bodies
        print(f'B={B}: bit_exact={bit_exact} deterministic={det}',
              flush=True)

        enc_t, dec_t = [], []
        for _ in range(7):
            t0 = time.perf_counter()
            bodies = model.compress_batch(sub, lmb=lmbs)
            t1 = time.perf_counter()
            img_dev = model.decompress_batch_to_device(bodies)
            np.asarray(img_dev[0, :1, :1, 0])   # sync
            dec_t.append(time.perf_counter() - t1)
            enc_t.append(t1 - t0)
        bpp = sum(len(b) for b in bodies) * 8 / (B * H * Wd)
        results[f'B{B}'] = {
            'bit_exact': bit_exact, 'deterministic': bool(det),
            'encode_ms_total': round(med_ms(enc_t), 2),
            'decode_ms_total': round(med_ms(dec_t), 2),
            'encdec_ms_per_image': round(
                (med_ms(enc_t) + med_ms(dec_t)) / B, 2),
            'bpp': round(bpp, 4)}
        print(json.dumps(results[f'B{B}']), flush=True)

    out = ROOT / 'runs' / 'batch-throughput-r3.json'
    if out.is_file():                      # merge across invocations
        prev = json.loads(out.read_text())
        prev.update(results)
        results = prev
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


if __name__ == '__main__':
    main()
