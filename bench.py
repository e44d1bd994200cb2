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


def _measure_fused(model, im_dev, lmb, n_iter):
    """Time the fused codec: encode until stream bytes on host, decode
    until the image is materialized on device + sync (reference
    methodology, see module docstring)."""
    import numpy as np
    bits = model.compress(im_dev, lmb=lmb)   # compile + prepay first fetch
    _ = model.decompress(bits)               # compile decode + image pull
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
    H, W = im_dev.shape[1], im_dev.shape[2]
    return {'enc_ms': _median_ms(enc_t), 'dec_ms': _median_ms(dec_t),
            'enc_min_ms': float(min(enc_t) * 1e3),
            'dec_min_ms': float(min(dec_t) * 1e3),
            'pull_ms': _median_ms(pull_t),
            'bpp': len(bits) * 8 / (H * W)}


# Trained weights (round-2 synthetic 6k-step qarv_base run) give the
# realistic operating point: ~0.5 bpp streams and ZERO escape symbols.
# Falls back to random init (pathological rates/escapes) when absent.
TRAINED_WEIGHTS = 'runs/qarv_base_synth6k_ema.msgpack'


def main():
    import os
    import jax
    _enable_compile_cache()
    import lvae_tpu

    model = lvae_tpu.get_model('qarv_base')
    trained = os.path.isfile(TRAINED_WEIGHTS)
    if trained:
        model.load_weights(TRAINED_WEIGHTS)
        # params must be DEVICE-RESIDENT: host numpy params would be
        # re-uploaded (373 MB) on every dispatch through the tunnel
        model.params = jax.device_put(model.params)
        jax.block_until_ready(jax.tree.leaves(model.params)[0])

    rng = np.random.default_rng(0)
    H, W = 512, 768
    # natural-image-like statistics (smooth, limited bandwidth) — white
    # noise would make the latent residuals pathological
    from scipy.ndimage import gaussian_filter
    im = gaussian_filter(rng.uniform(0, 1, (H, W, 3)), sigma=(4, 4, 0))
    im = (im - im.min()) / (im.max() - im.min() + 1e-9)
    im = (np.round(im * 255) / 255).astype(np.float32)[None]
    lmb = 512.0
    n_iter = 11

    # ---------------- fused codec (production path) -----------------------
    import jax.numpy as _jnp
    esc_cap = 8192 if trained else 1 << 18
    im_dev = _jnp.asarray(im)                # device-resident input, like the
    np.asarray(im_dev[0, :1, :1, 0])         # reference's im.to(device)

    model.compress_mode(coder='fused', esc_cap=esc_cap)
    f32 = _measure_fused(model, im_dev, lmb, n_iter)
    model.compress_mode(coder='fused', esc_cap=esc_cap,
                        compute_dtype='bfloat16')
    bf16 = _measure_fused(model, im_dev, lmb, n_iter)

    # headline: the faster production mode. 'bf16' means backbone-only
    # bf16 (qarv/fused.py precision policy — the decode-reproduced trunk
    # always runs f32, so both modes round-trip bit-exact on hardware);
    # its small rate delta vs the all-f32 stream is surfaced in detail
    # ('bf16_vs_f32_bpp_delta').
    best = bf16 if (bf16['enc_ms'] + bf16['dec_ms'] <
                    f32['enc_ms'] + f32['dec_ms']) else f32
    mode = 'bf16' if best is bf16 else 'f32'
    enc_ms, dec_ms = best['enc_ms'], best['dec_ms']
    bpp_fused = best['bpp']
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

    # --------------- qres34m (reference latency table row 2) --------------
    # reference README.md:49-56: RTX 3080 Ti qres34m enc+dec = 199 ms.
    # Random init (no trained qres checkpoint in this environment), so a
    # large escape capacity; latency is weight-independent.
    qres = lvae_tpu.get_model('qres34m')
    qres.params = jax.device_put(qres.params)
    jax.block_until_ready(jax.tree.leaves(qres.params)[0])
    qres.compress_mode(coder='fused', esc_cap=1 << 18)
    im_dev_q = _jnp.asarray(im)
    np.asarray(im_dev_q[0, :1, :1, 0])
    obj = qres.compress(im_dev_q)            # warm: compile + first pulls
    _ = qres.decompress(obj)
    qres_e, qres_d = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        obj = qres.compress(im_dev_q)
        t1 = time.perf_counter()
        _, fH, fW, _ = obj[-1]
        img_dev = qres.decompress_to_device(obj[0], fH, fW)
        np.asarray(img_dev[0, :1, :1, 0])
        t2 = time.perf_counter()
        qres_e.append(t1 - t0)
        qres_d.append(t2 - t1)

    # --------------- batched serving mode (qarv_base, batch 6) ------------
    # one batch-B unified executable: fixed dispatch/transfer costs
    # amortize over the batch (see STATUS.md batch table; B=6 is the
    # per-chip sweet spot — B=8 hits an HBM cliff). Measured per mode
    # (f32 and backbone-only bf16, both bit-exact on hardware —
    # runs/suite12-r3.json): (a) one-batch latency, (b) pipelined
    # steady-state throughput — a serving loop dispatches batch k+1
    # before finishing batch k (compress_batch_async/finish), hiding the
    # host payload pull + stream glue behind device compute.
    Bsrv = 6
    ims_b = _jnp.asarray(np.concatenate([im] * Bsrv))
    np.asarray(ims_b[0, :1, :1, 0])
    lmbs = [lmb] * Bsrv

    def run_batch_mode():
        bodies = model.compress_batch(ims_b, lmb=lmbs)   # compile + warm
        _ = model.decompress_batch_to_device(bodies)
        be_t, bd_t = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            bodies = model.compress_batch(ims_b, lmb=lmbs)
            t1 = time.perf_counter()
            img_dev = model.decompress_batch_to_device(bodies)
            np.asarray(img_dev[0, :1, :1, 0])
            be_t.append(t1 - t0)
            bd_t.append(time.perf_counter() - t1)
        lat_ms = (_median_ms(be_t) + _median_ms(bd_t)) / Bsrv
        # pipelined encode: one dispatch + one finish per loop iteration
        K = 5
        h = model.compress_batch_async(ims_b, lmb=lmbs)
        t0 = time.perf_counter()
        for _ in range(K):
            h_next = model.compress_batch_async(ims_b, lmb=lmbs)
            bodies = model.compress_batch_finish(h)
            h = h_next
        enc_pipe = (time.perf_counter() - t0) / K
        bodies = model.compress_batch_finish(h)
        # pipelined decode: dispatch batch k+1, then sync batch k (tiny
        # fetch; images stay device-resident for the consumer)
        img_prev = model.decompress_batch_to_device(bodies)
        t0 = time.perf_counter()
        for _ in range(K):
            img_next = model.decompress_batch_to_device(bodies)
            np.asarray(img_prev[0, :1, :1, 0])
            img_prev = img_next
        dec_pipe = (time.perf_counter() - t0) / K
        np.asarray(img_prev[0, :1, :1, 0])
        pipe_ms = (enc_pipe + dec_pipe) * 1e3 / Bsrv
        return lat_ms, pipe_ms

    model.compress_mode(coder='fused', esc_cap=esc_cap)
    b_f32 = run_batch_mode()
    model.compress_mode(coder='fused', esc_cap=esc_cap,
                        compute_dtype='bfloat16')
    b_bf16 = run_batch_mode()
    batch_mode = 'bf16' if b_bf16[1] < b_f32[1] else 'f32'
    b_best = b_bf16 if batch_mode == 'bf16' else b_f32
    batch_per_image_ms, batch_pipe_ms = b_best

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
            # headline = fused codec (faster of f32/bf16): encode until
            # stream bytes on host, decode until image materialized on
            # device + sync (the reference times GPU-resident decode the
            # same way)
            'mode': mode,
            'weights': 'trained-synth6k' if trained else 'random-init',
            'fused_encode_ms': round(enc_ms, 3),
            'fused_decode_ms': round(dec_ms, 3),
            'fused_encode_min_ms': round(best['enc_min_ms'], 3),
            'fused_decode_min_ms': round(best['dec_min_ms'], 3),
            'f32_encdec_ms': round(f32['enc_ms'] + f32['dec_ms'], 3),
            'bf16_encdec_ms': round(bf16['enc_ms'] + bf16['dec_ms'], 3),
            'image_host_pull_ms': round(best['pull_ms'], 3),
            # rate-parity mode (per-block host rANS, reference-equivalent
            # stream layout)
            'host_coder_encode_ms': round(_median_ms(host_e), 3),
            'host_coder_decode_ms': round(_median_ms(host_d), 3),
            # fused overhead = 512 B lane states + 10 B header (+ varint
            # escapes: zero with trained weights)
            'fused_bpp': round(bpp_fused, 4),
            'f32_fused_bpp': round(f32['bpp'], 4),
            'bf16_vs_f32_bpp_delta': round(bf16['bpp'] - f32['bpp'], 4),
            'bf16_fused_bpp': round(bf16['bpp'], 4),
            'host_bpp': round(bpp_host, 4),
            'fused_bpp_overhead': round(bpp_fused - bpp_host, 4),
            'device_forward_ms': round(fwd_ms, 3),
            # batched serving mode: B=6 images per unified executable,
            # per-image enc+dec wall (bit-exact, see STATUS batch table);
            # 'pipelined' = sustained serving loop (batch k+1 dispatched
            # before batch k is finished — host glue hidden)
            'batch6_mode': batch_mode,
            'batch6_encdec_ms_per_image': round(batch_per_image_ms, 3),
            'batch6_pipelined_ms_per_image': round(batch_pipe_ms, 3),
            'batch6_f32_ms_per_image': round(b_f32[0], 3),
            'batch6_f32_pipelined_ms_per_image': round(b_f32[1], 3),
            'batch6_bf16_ms_per_image': round(b_bf16[0], 3),
            'batch6_bf16_pipelined_ms_per_image': round(b_bf16[1], 3),
            # second reference latency row (README.md:49-56, 199 ms GPU)
            'qres34m_encode_ms': round(_median_ms(qres_e), 3),
            'qres34m_decode_ms': round(_median_ms(qres_d), 3),
            'n_iter': n_iter,
            'device': str(jax.devices()[0])},
    }))


if __name__ == '__main__':
    main()
