"""Headline benchmark: qarv_base encode+decode latency on one TPU chip.

Measures the production fused codec (ONE XLA program per direction with
on-device interleaved-rANS in both, models/qarv/fused.py) on a synthetic
512x768 image — the Kodak-size latency benchmark from the reference
(README.md:49-56; scripts/speedtest-lvae.py). Baseline to beat:
RTX 3080 Ti encode 0.096 s + decode 0.063 s = 159 ms (BASELINE.md).

Methodology (matches the reference speedtest): encode starts from a
DEVICE-RESIDENT image — the reference moves `im` to the GPU before t_start
(scripts/speedtest-lvae.py:27-31) — and is timed until the stream BYTES are
on the host (they are the file payload); decode is timed until the image is
materialized ON DEVICE plus a synchronizing fetch — the reference also
times GPU-resident decode output with cuda.synchronize
(scripts/speedtest-lvae.py:29-44), it never pays a device->host image copy.
The full image pull is reported separately (this environment's TPU tunnel
moves ~50 MB/s with a 27 ms floor; PCIe hosts pay ~0.3 ms for the same).

Prints ONE JSON line:
  {"metric": "qarv_base_encdec_latency", "value": <ms>, "unit": "ms",
   "vs_baseline": <baseline_ms / ours_ms>}  (vs_baseline > 1 means faster)
"""
import json
import struct
import time

import numpy as np


BASELINE_MS = 159.0  # RTX 3080 Ti enc+dec, reference README.md:49-56


def _enable_compile_cache():
    import os
    import jax
    if os.environ.get('LVAE_TPU_NO_CACHE'):
        return
    cache = os.path.expanduser('~/.cache/lvae_tpu_jax')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)


def _median_ms(v):
    return float(sorted(v)[len(v) // 2] * 1e3)


def main():
    import jax
    _enable_compile_cache()
    import lvae_tpu

    model = lvae_tpu.get_model('qarv_base')

    rng = np.random.default_rng(0)
    H, W = 512, 768
    # natural-image-like statistics (smooth, limited bandwidth) — white
    # noise would make the latent residuals pathological
    from scipy.ndimage import gaussian_filter
    im = gaussian_filter(rng.uniform(0, 1, (H, W, 3)), sigma=(4, 4, 0))
    im = (im - im.min()) / (im.max() - im.min() + 1e-9)
    im = (np.round(im * 255) / 255).astype(np.float32)[None]
    lmb = 512.0
    n_iter = 9

    # ---------------- fused codec (production path) -----------------------
    # esc_cap sized for untrained weights (trained models need ~0 escapes)
    import jax.numpy as _jnp
    model.compress_mode(coder='fused', esc_cap=1 << 18)
    im_dev = _jnp.asarray(im)                # device-resident input, like the
    np.asarray(im_dev[0, :1, :1, 0])         # reference's im.to(device)
    bits = model.compress(im_dev, lmb=lmb)   # compile + prepay first fetch
    rec_warm = model.decompress(bits)        # compile decode + image pull
    bpp_fused = len(bits) * 8 / (H * W)

    enc_t, dec_t, pull_t = [], [], []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        bits = model.compress(im_dev, lmb=lmb)
        t1 = time.perf_counter()
        lmb_v, = struct.unpack('f', bits[:4])
        nB, nH, nW = struct.unpack('3H', bits[4:10])
        img_dev = model.decompress_to_device(lmb_v, nB, nH, nW, bits[10:])
        np.asarray(img_dev[0, :1, :1, 0])    # sync: image resident on device
        t2 = time.perf_counter()
        np.asarray(img_dev)                  # optional host copy (reported)
        t3 = time.perf_counter()
        enc_t.append(t1 - t0)
        dec_t.append(t2 - t1)
        pull_t.append(t3 - t2)
    enc_ms, dec_ms = _median_ms(enc_t), _median_ms(dec_t)
    total_ms = enc_ms + dec_ms

    # --------------- host coder (reference-layout streams) ----------------
    model.compress_mode(coder='host')
    bits_h = model.compress(im, lmb=lmb)
    _ = model.decompress(bits_h)
    host_e, host_d = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        bits_h = model.compress(im, lmb=lmb)
        t1 = time.perf_counter()
        _ = model.decompress(bits_h)
        host_e.append(t1 - t0)
        host_d.append(time.perf_counter() - t1)
    bpp_host = len(bits_h) * 8 / (H * W)

    # --------------- pure device forward (pipelined estimate) -------------
    import jax.numpy as jnp
    imj = jnp.asarray(im)
    lmb_arr = jnp.full((1,), lmb, jnp.float32)
    loss, _ = model._jit_eval(model.params, imj, lmb_arr)
    np.asarray(loss)

    def run_k(k):
        t0 = time.perf_counter()
        for _ in range(k):
            loss, _ = model._jit_eval(model.params, imj, lmb_arr)
        np.asarray(loss)
        return time.perf_counter() - t0
    run_k(1)
    # (t(6 chained) - t(1)) / 5 removes the fixed sync cost: on this tunnel
    # block_until_ready does NOT wait, only fetches synchronize
    fwd_ms = float(min((run_k(6) - run_k(1)) / 5 for _ in range(3)) * 1e3)

    print(json.dumps({
        'metric': 'qarv_base_encdec_latency',
        'value': round(total_ms, 3),
        'unit': 'ms',
        'vs_baseline': round(BASELINE_MS / total_ms, 3),
        'detail': {
            # headline = fused codec: encode until stream bytes on host,
            # decode until image materialized on device + sync (the
            # reference times GPU-resident decode the same way)
            'fused_encode_ms': round(enc_ms, 3),
            'fused_decode_ms': round(dec_ms, 3),
            'image_host_pull_ms': round(_median_ms(pull_t), 3),
            # rate-parity mode (per-block host rANS, reference-equivalent
            # stream layout)
            'host_coder_encode_ms': round(_median_ms(host_e), 3),
            'host_coder_decode_ms': round(_median_ms(host_d), 3),
            # with untrained weights the synthetic image produces escape
            # symbols; trained models have ~none (escape = 2-4 B varint,
            # lane states = 512 bytes/image)
            'fused_bpp': round(bpp_fused, 4),
            'host_bpp': round(bpp_host, 4),
            'fused_bpp_overhead': round(bpp_fused - bpp_host, 4),
            'device_forward_ms': round(fwd_ms, 3),
            'n_iter': n_iter,
            'device': str(jax.devices()[0])},
    }))


if __name__ == '__main__':
    main()
