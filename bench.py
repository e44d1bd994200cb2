"""Headline benchmark: qarv_base encode+decode latency on one TPU chip.

Measures the production fused codec (ONE XLA program for both directions
with on-device interleaved-rANS, models/qarv/fused.py) on a synthetic
512x768 image — the Kodak-size latency benchmark from the reference
(README.md:49-56; scripts/speedtest-lvae.py). Baseline to beat:
RTX 3080 Ti encode 0.096 s + decode 0.063 s = 159 ms (BASELINE.md).
The headline is the PORTABLE codec (ops/pallas/trunk.py): streams that
decode bit-exact in any process / any executable — the decode-anywhere
production mode (files default to it). The binary-pinned codec is
reported alongside in the detail dict.

Methodology (matches the reference speedtest): encode starts from a
DEVICE-RESIDENT image — the reference moves `im` to the GPU before t_start
(scripts/speedtest-lvae.py:27-31) — and is timed until the stream BYTES are
on the host (they are the file payload); decode is timed until the image is
materialized ON DEVICE plus a synchronizing fetch — the reference also
times GPU-resident decode output with cuda.synchronize
(scripts/speedtest-lvae.py:29-44), it never pays a device->host image copy.
The full image pull is reported separately (this environment's TPU tunnel
moves ~50 MB/s with a 27 ms floor; PCIe hosts pay ~0.3 ms for the same).

Stall-proofing (round-5 rework after BENCH_r04 printed value=null): this
environment's FIRST device->host fetch per process can stall 10-25 min —
longer than the whole bench budget. Compiles and async dispatches need no
fetch, so the bench now runs in two phases:
  PHASE A (concurrent with the prepay fetch): load weights, compile the
  headline codec, dispatch warm executions, and measure a PROVISIONAL
  device-time headline via jax.profiler (the one measurement channel that
  does not ride the stalled data path) — then keep compiling the other
  sections' programs while the stall continues.
  PHASE B (after the first fetch lands): the real end-to-end sections in
  priority order, each updating a shared snapshot; an e2e headline
  replaces the provisional one.
A daemon watchdog force-prints the current snapshot at the budget
deadline (env BENCH_BUDGET_S, default 1200 s), so even a stall longer
than the budget yields a labeled device-time number instead of null.
The stall duration is recorded as detail.first_fetch_stall_s.
Weights load from the COMMITTED float16 checkpoint
(checkpoints/qarv_base_synth6k_ema_f16.msgpack) so a clean checkout never
falls back to random-init (whose pathological 283k-word streams compiled
for 150-380 s per program — the r3 timeout).

Test hooks (tests/test_bench_stall.py simulates a 25-min stall on CPU):
LVAE_BENCH_PLATFORM, LVAE_BENCH_MODEL, LVAE_BENCH_HW, LVAE_BENCH_ITERS,
LVAE_BENCH_SIMULATE_STALL_S, LVAE_TPU_CACHE_DIR.

Prints ONE JSON line on stdout:
  {"metric": "qarv_base_encdec_latency", "value": <ms>, "unit": "ms",
   "vs_baseline": <baseline_ms / ours_ms>}  (vs_baseline > 1 means faster)
Progress notes go to stderr prefixed '# bench:' (never JSON-shaped).
"""
import json
import os
import shutil
import struct
import sys
import threading
import time

import numpy as np


BASELINE_MS = 159.0  # RTX 3080 Ti enc+dec, reference README.md:49-56
T_START = time.monotonic()
BUDGET_S = float(os.environ.get('BENCH_BUDGET_S', '1200'))
SIM_STALL_S = float(os.environ.get('LVAE_BENCH_SIMULATE_STALL_S', '0'))
MODEL_NAME = os.environ.get('LVAE_BENCH_MODEL', 'qarv_base')
IM_H, IM_W = (int(v) for v in
              os.environ.get('LVAE_BENCH_HW', '512x768').split('x'))
N_ITER = int(os.environ.get('LVAE_BENCH_ITERS', '11'))

# Committed trained operating point, float16-quantized (rate/PSNR-
# identical to the f32 export, see scripts/quantize-weights.py). The r5
# preferred point is the 20k-step mixed real+synthetic run (VERDICT r4
# weak item 2: make the operating point representative); the r2/3 6k-step
# synthetic run is the fallback. A trained point gives ~0.5 bpp streams
# and ZERO escape symbols; random init is only a last-resort fallback.
TRAINED_WEIGHTS = (
    'checkpoints/qarv_base_mixed20k_ema_f16.msgpack',  # committed (r5)
    'checkpoints/qarv_base_synth6k_ema_f16.msgpack',   # committed (r4)
    'runs/qarv_base_synth6k_ema.msgpack',              # local f32 export
)

_snapshot_lock = threading.Lock()
_snapshot = {'metric': 'qarv_base_encdec_latency', 'value': None,
             'unit': 'ms', 'vs_baseline': None, 'detail': {}}
_printed = False
# headline sources, weakest to strongest: a labeled device-time estimate
# from the profiler (no host sync needed) loses to a real e2e measurement
_KIND_RANK = {'device-time-provisional': 1, 'e2e': 2}
_prepay_t0 = None       # set when the prepay fetch is dispatched
_warm_done = threading.Event()


def _note(msg):
    print(f'# bench: [{time.monotonic() - T_START:7.1f}s] {msg}',
          file=sys.stderr, flush=True)


def _remaining():
    return BUDGET_S - (time.monotonic() - T_START)


def _update(headline_ms=None, kind=None, **detail):
    with _snapshot_lock:
        if headline_ms is not None:
            cur = _snapshot['detail'].get('headline_kind')
            if cur is None or _KIND_RANK[kind] >= _KIND_RANK[cur]:
                _snapshot['value'] = round(headline_ms, 3)
                _snapshot['vs_baseline'] = round(BASELINE_MS / headline_ms, 3)
                _snapshot['detail']['headline_kind'] = kind
        _snapshot['detail'].update({
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in detail.items()})


def _print_final(tag):
    global _printed
    with _snapshot_lock:
        if _printed:
            return
        _printed = True
        _snapshot['detail']['completed'] = tag
        if _prepay_t0 is not None and not _warm_done.is_set():
            _snapshot['detail']['first_fetch_stall_s'] = None
            _snapshot['detail']['stall_ongoing_s'] = round(
                time.monotonic() - _prepay_t0, 1)
        print(json.dumps(_snapshot), flush=True)


def _watchdog():
    # Force a parseable result even if the main thread is wedged in a
    # tunnel fetch at the deadline. os._exit skips atexit/flush races.
    time.sleep(max(BUDGET_S - (time.monotonic() - T_START), 1.0) + 20.0)
    _note('WATCHDOG fired — printing snapshot')
    _print_final('watchdog-partial')
    sys.stdout.flush()
    os._exit(0)


def _median_ms(v):
    return float(sorted(v)[len(v) // 2] * 1e3)


def _measure_fused(model, im_dev, lmb, n_iter):
    """Time the fused codec: encode until stream bytes on host, decode
    until the image is materialized on device + sync (reference
    methodology, see module docstring)."""
    bits = model.compress(im_dev, lmb=lmb)   # compile + warm fetches
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


def _provisional_device_time(enc_call, dec_call):
    """PHASE A measurement: device-time envelopes of the already-compiled
    codec via jax.profiler — no device->host fetch, so it works while the
    data path is stalled. Updates the snapshot with a labeled provisional
    headline (VERDICT r4 item 1b)."""
    try:
        import jax
        from lvae_tpu.utils.profiling import program_envelope_ms
        K = 4
        res = {}
        for what, call in (('enc', enc_call), ('dec', dec_call)):
            logdir = f'/tmp/lvae-bench-prov-{what}-{os.getpid()}'
            shutil.rmtree(logdir, ignore_errors=True)
            with jax.profiler.trace(logdir):
                for _ in range(K):
                    call()
                # dispatches are async: give the device queue a moment so
                # most runs COMPLETE inside the trace window (duration is
                # normalized per completed run, so stragglers don't skew)
                time.sleep(1.0)
            r = program_envelope_ms(logdir, 'prog')
            if not r:
                _note(f'provisional {what}: no program events in trace')
                return
            res[what] = r[0]
            _note(f'provisional {what}: {r[0]:.1f} ms over {r[1]} runs')
        _update(headline_ms=res['enc'] + res['dec'],
                kind='device-time-provisional',
                provisional_dev_enc_ms=res['enc'],
                provisional_dev_dec_ms=res['dec'])
    except Exception as e:  # noqa: BLE001 — provisional is best-effort
        _note(f'provisional measurement failed: {type(e).__name__}: {e}')


def main():
    plat = os.environ.get('LVAE_BENCH_PLATFORM')
    import jax
    if plat:
        jax.config.update('jax_platforms', plat)
    from lvae_tpu.utils.general import enable_compile_cache
    enable_compile_cache()
    threading.Thread(target=_watchdog, daemon=True).start()
    import lvae_tpu
    import jax.numpy as jnp

    # Prepay the per-process first-device-fetch tunnel stall CONCURRENTLY
    # with weight loading, compilation and the provisional measurement
    # (observed at 10-25 minutes — longer than the whole budget).
    global _prepay_t0
    _prepay_t0 = time.monotonic()

    def _prepay():
        t0 = time.monotonic()
        np.asarray(jnp.zeros((8,)))
        fetch_s = time.monotonic() - t0
        _note(f'first device fetch done in {fetch_s:.1f}s')
        if SIM_STALL_S:
            _note(f'simulating a {SIM_STALL_S:.0f}s first-fetch stall')
            time.sleep(SIM_STALL_S)
        _update(first_fetch_stall_s=time.monotonic() - t0)
        _warm_done.set()
    threading.Thread(target=_prepay, daemon=True).start()

    t0 = time.monotonic()
    model = lvae_tpu.get_model(MODEL_NAME)
    _note(f'get_model({MODEL_NAME}) done in {time.monotonic() - t0:.1f}s')
    weights = None
    if MODEL_NAME == 'qarv_base':
        weights = next((p for p in TRAINED_WEIGHTS if os.path.isfile(p)),
                       None)
    if weights:
        t0 = time.monotonic()
        model.load_weights(weights)  # pushes stored f16, casts on device
        _note(f'loaded trained weights: {weights} '
              f'in {time.monotonic() - t0:.1f}s')
    trained = weights is not None
    _update(weights=(os.path.basename(weights) if trained
                     else 'random-init'),
            budget_s=BUDGET_S, model=MODEL_NAME)

    rng = np.random.default_rng(0)
    H, W = IM_H, IM_W
    # natural-image-like statistics (smooth, limited bandwidth) — white
    # noise would make the latent residuals pathological
    from scipy.ndimage import gaussian_filter
    im = gaussian_filter(rng.uniform(0, 1, (H, W, 3)), sigma=(4, 4, 0))
    im = (im - im.min()) / (im.max() - im.min() + 1e-9)
    im = (np.round(im * 255) / 255).astype(np.float32)[None]
    lmb = 512.0
    lmb_f32 = struct.unpack('f', struct.pack('f', lmb))[0]
    esc_cap = 8192 if trained else 1 << 18
    # trained streams are 20-120k words across the lambda range; capping the
    # word buffers at 128k cuts the encode payload-assembly conditional from
    # 7-12 ms to ~1 ms/image (runs/fused-attrib-r4.txt). Random init emits
    # ~283k-word pathological streams — keep the worst-case buffers there.
    word_cap = (1 << 17) if trained else None
    is_qarv = MODEL_NAME.startswith('qarv')

    im_dev = jnp.asarray(im)        # host->device push: fine during a stall

    def _mode_kw(kw):
        return dict(coder='fused', esc_cap=esc_cap, word_cap=word_cap, **kw)

    # ============= PHASE A: fetch-free compile + provisional ==============
    # (VERDICT r4 item 1a: never serialize compilation behind the prepay
    # fetch — everything here needs no device->host transfer)
    headline_mode = 'portable_f32'
    try:
        model.compress_mode(**_mode_kw({'portable': True}))
    except (NotImplementedError, TypeError):
        headline_mode = 'f32'
        model.compress_mode(**_mode_kw({}))
    fc = model._fused
    extra = (jnp.full((1,), lmb_f32, jnp.float32),) if is_qarv else ()
    try:
        t0 = time.monotonic()
        codec = fc._codec(H, W)
        d = fc._dummies(H, W)
        payload, _ = codec(model.params, im_dev, d['enc'], d['off'],
                           d['states'], d['packed'], d['esc_pos'],
                           d['esc_val'], *extra)
        _update(headline_codec_compile_s=time.monotonic() - t0)
        _note(f'phase A: {headline_mode} codec compiled + dispatched in '
              f'{time.monotonic() - t0:.1f}s')
        # decode operands derived ON DEVICE from the encode payload (a
        # valid stream, no fetch): payload = [n_words, n_esc, N][states(N)]
        # [packed words...][escape pairs at a dynamic offset]
        N = fc.N
        nH, nW = H // model.net.max_stride, W // model.net.max_stride
        PK, _EB = fc._canon_sizes(nH, nW)
        dec_prep = jax.jit(lambda p: (
            p[3:3 + N].reshape(1, N),
            jax.lax.dynamic_slice_in_dim(p, 3 + N, PK)))
        st, pk = dec_prep(payload)

        def enc_call():
            codec(model.params, im_dev, d['enc'], d['off'], d['states'],
                  d['packed'], d['esc_pos'], d['esc_val'], *extra)

        def dec_call():
            codec(model.params, d['im'], d['dec'], d['on'], st, pk,
                  d['esc_pos'], d['esc_val'], *extra)

        dec_call()   # same executable (runtime mode operand) — no compile
        prov = threading.Thread(target=_provisional_device_time,
                                args=(enc_call, dec_call), daemon=True)
        prov.start()
        prov.join(timeout=min(300.0, max(_remaining() * 0.5, 30.0)))
        if prov.is_alive():
            _note('provisional thread still running — moving on')
    except Exception as e:  # noqa: BLE001 — phase A is best-effort
        _note(f'PHASE A failed ({type(e).__name__}: {e}) — falling back '
              f'to the post-fetch path')

    # keep compiling the other sections' programs while the stall continues
    for name, kw in (('f32', {}),
                     ('portable_bf16', {'compute_dtype': 'bfloat16',
                                        'portable': True})):
        if _warm_done.is_set() or _remaining() < 180:
            break
        try:
            t0 = time.monotonic()
            model.compress_mode(**_mode_kw(kw))
            fc2 = model._fused
            c2 = fc2._codec(H, W)
            d2 = fc2._dummies(H, W)
            c2(model.params, im_dev, d2['enc'], d2['off'], d2['states'],
               d2['packed'], d2['esc_pos'], d2['esc_val'], *extra)
            _note(f'phase A: {name} codec compiled in '
                  f'{time.monotonic() - t0:.1f}s')
        except (NotImplementedError, TypeError):
            _note(f'phase A: {name} unsupported — skipped')
        except Exception as e:  # noqa: BLE001
            _note(f'phase A: {name} compile failed: {type(e).__name__}: {e}')

    # ============= PHASE B: end-to-end sections (need the data path) ======
    _warm_done.wait()
    jax.block_until_ready(jax.tree.leaves(model.params)[0])
    _update(device=str(jax.devices()[0]))
    np.asarray(im_dev[0, :1, :1, 0])         # device-resident input, like
    #                                          the reference's im.to(device)

    results = {}
    # headline preference: portable (decode-anywhere production mode)
    # first; the binary-pinned codec is reported alongside in detail
    HEADLINE_ORDER = ('portable_f32', 'f32', 'portable_bf16', 'bf16')

    def _refresh_headline():
        for m in HEADLINE_ORDER:
            if m in results:
                r = results[m]
                _update(headline_ms=r['enc_ms'] + r['dec_ms'], kind='e2e',
                        mode=m,
                        fused_encode_ms=r['enc_ms'],
                        fused_decode_ms=r['dec_ms'],
                        fused_encode_min_ms=r['enc_min_ms'],
                        fused_decode_min_ms=r['dec_min_ms'],
                        image_host_pull_ms=r['pull_ms'],
                        fused_bpp=r['bpp'], n_iter=N_ITER)
                return

    def _section(fn, *a, **kw):
        """Run one bench section; a failure degrades to a partial snapshot
        instead of killing the run (the headline JSON must always print)."""
        try:
            fn(*a, **kw)
        except Exception as e:  # noqa: BLE001 — record and move on
            _note(f'SECTION FAILED ({fn.__name__} {a}): {type(e).__name__}: '
                  f'{e}')
            _update(**{f'failed_{fn.__name__}_{a[0] if a else ""}':
                       f'{type(e).__name__}'})

    def run_single(mode_name, kw):
        _note(f'fused {mode_name} single-image: compiling + measuring')
        model.compress_mode(**_mode_kw(kw))
        r = _measure_fused(model, im_dev, lmb, N_ITER)
        results[mode_name] = r
        _note(f'fused {mode_name}: enc {r["enc_ms"]:.1f} '
              f'dec {r["dec_ms"]:.1f} bpp {r["bpp"]:.4f}')
        _refresh_headline()
        _update(**{f'{mode_name}_encdec_ms': r['enc_ms'] + r['dec_ms'],
                   f'{mode_name}_enc_ms': r['enc_ms'],
                   f'{mode_name}_dec_ms': r['dec_ms'],
                   f'{mode_name}_bpp': r['bpp']})

    # ---- section 1: the headline (portable f32, compiled in phase A) -----
    _section(run_single, headline_mode,
             {'portable': True} if headline_mode == 'portable_f32' else {})
    if _remaining() < 60:
        _note('budget nearly exhausted — emitting headline')
        _print_final(f'fused-{headline_mode}')
        return

    # ---- section 2: the binary-pinned codec (latency comparison) ---------
    if headline_mode == 'portable_f32' and _remaining() > 150:
        _section(run_single, 'f32', {})

    # --------------- section 3: batched serving (B=6) ---------------------
    # one batch-B unified executable: fixed dispatch/transfer costs
    # amortize over the batch (see STATUS.md batch table; B=6 is the
    # per-chip sweet spot). Measured: (a) one-batch latency, (b) pipelined
    # steady-state throughput — a serving loop dispatches batch k+1 before
    # finishing batch k (compress_batch_async/finish).
    def run_batch_mode():
        Bsrv = 6
        ims_b = jnp.asarray(np.concatenate([im] * Bsrv))
        np.asarray(ims_b[0, :1, :1, 0])
        lmbs = [lmb] * Bsrv
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

    batch = {}

    def run_batch(mode_name, kw, min_budget):
        if _remaining() < min_budget:
            _note(f'skipping batch6 {mode_name} (budget)')
            return
        _note(f'batch6 {mode_name}: compiling + measuring')
        model.compress_mode(**_mode_kw(kw))
        lat, pipe = run_batch_mode()
        batch[mode_name] = (lat, pipe)
        _note(f'batch6 {mode_name}: {lat:.1f} ms/img, pipelined {pipe:.1f}')
        bb = min(batch.values(), key=lambda x: x[1])
        _update(batch6_mode=next(k for k, v in batch.items() if v is bb),
                batch6_encdec_ms_per_image=bb[0],
                batch6_pipelined_ms_per_image=bb[1],
                **{f'batch6_{mode_name}_ms_per_image': lat,
                   f'batch6_{mode_name}_pipelined_ms_per_image': pipe})

    if is_qarv:
        _section(run_batch, headline_mode,
                 {'portable': True} if headline_mode == 'portable_f32'
                 else {}, min_budget=240)

    # --------------- section: host coder (reference-layout streams) -------
    def run_host():
        _note('host coder: measuring')
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
        _update(host_coder_encode_ms=_median_ms(host_e),
                host_coder_decode_ms=_median_ms(host_d),
                host_bpp=bpp_host,
                fused_bpp_overhead=_snapshot['detail'].get(
                    'fused_bpp', bpp_host) - bpp_host)

    if is_qarv and _remaining() > 180:
        _section(run_host)
    else:
        _note('skipping host coder (budget/model)')

    # --------------- section: qres34m (reference latency table row 2) -----
    # reference README.md:49-56: RTX 3080 Ti qres34m enc+dec = 199 ms.
    # Random init (no trained qres checkpoint), so a large escape
    # capacity; latency is weight-independent. Portable when supported.
    def run_qres():
        _note('qres34m: compiling + measuring')
        qres = lvae_tpu.get_model('qres34m')
        qres.params = jax.device_put(qres.params)
        jax.block_until_ready(jax.tree.leaves(qres.params)[0])
        try:
            qres.compress_mode(coder='fused', esc_cap=1 << 18, portable=True)
            qres_mode = 'portable'
        except (NotImplementedError, TypeError):
            qres.compress_mode(coder='fused', esc_cap=1 << 18)
            qres_mode = 'pinned'
        im_dev_q = jnp.asarray(im)
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
        _update(qres34m_encode_ms=_median_ms(qres_e),
                qres34m_decode_ms=_median_ms(qres_d),
                qres34m_mode=qres_mode)

    # qres34m outranks the bf16/host sections: it is a row of the
    # reference's published latency table (README.md:49-56)
    if MODEL_NAME == 'qarv_base' and _remaining() > 360:
        _section(run_qres)
    else:
        _note('skipping qres34m (budget/model)')

    if _remaining() > 180:
        _section(run_single, 'portable_bf16',
                 {'compute_dtype': 'bfloat16', 'portable': True})

    # --------------- section: pure device forward (pipelined estimate) ----
    def run_forward():
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
        # (t(6 chained) - t(1)) / 5 removes the fixed sync cost: on this
        # tunnel block_until_ready does NOT wait, only fetches synchronize
        fwd_ms = float(min((run_k(6) - run_k(1)) / 5 for _ in range(3)) * 1e3)
        _update(device_forward_ms=fwd_ms)

    if is_qarv and _remaining() > 90:
        _section(run_forward)

    # --------------- lowest priority: batch6 bf16 --------------------------
    if is_qarv:
        _section(run_batch, 'portable_bf16',
                 {'compute_dtype': 'bfloat16', 'portable': True},
                 min_budget=300)

    _print_final('all')


if __name__ == '__main__':
    main()
