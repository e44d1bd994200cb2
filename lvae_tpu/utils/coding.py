"""Bitstream container utilities, image padding, and BD-rate computation.

Byte formats are byte-identical to the reference so that tooling that parses
reference bitstream containers keeps working
(reference: lvae/utils/coding.py:26-110 for pack/pad, :113-267 for BD-rate).

These are host-side, pure-Python/numpy: they never touch the accelerator.
"""
import sys
import json
import math
import pickle
import struct
import numpy as np
from PIL import Image


def get_object_size(obj, unit='bits'):
    """Size of a pickled Python object (reference: lvae/utils/coding.py:10-23)."""
    num_bytes = sys.getsizeof(pickle.dumps(obj))
    if unit == 'bits':
        return num_bytes * 8
    elif unit == 'bytes':
        return num_bytes
    raise ValueError(f'Unknown unit {unit}')


def pack_byte_strings(list_of_strings):
    """Pack a list of byte strings into one byte string.

    Layout: [B num][num * I lengths][concatenated payload]
    (reference: lvae/utils/coding.py:26-47)
    """
    lengths = [len(s) for s in list_of_strings]
    packed = b''.join(list_of_strings)
    packed = struct.pack(f'{len(lengths)}I', *lengths) + packed
    packed = struct.pack('B', len(lengths)) + packed
    return packed


def unpack_byte_string(string):
    """Inverse of pack_byte_strings (reference: lvae/utils/coding.py:50-70)."""
    _len = 1
    num, string = struct.unpack('B', string[:_len])[0], string[_len:]
    _len = num * 4
    lengths, string = struct.unpack(f'{num}I', string[:_len]), string[_len:]
    assert sum(lengths) == len(string), f'{sum(lengths)=} != {len(string)=}'
    edges = np.cumsum((0,) + lengths, dtype=np.uint32)
    return [string[edges[i]:edges[i + 1]] for i in range(num)]


# ---------------------------------------------------------------------------
# Escape-record serialization (device-coder streams)
#
# The interleaved device coder stores out-of-range symbols out-of-band as
# (global position, true value) records. A fixed-width encoding (round-1 used
# int64 pairs = 16 B/escape) charges the stream for the astronomically-common
# case where values are tiny and positions ascend; here positions are
# delta-coded and both fields are LEB128 varints (values zigzag-mapped), so a
# typical escape costs 2-4 bytes. All loops below are vectorized over the
# BYTE-POSITION axis (<=10 iterations), not over records.
# ---------------------------------------------------------------------------

def leb128_encode(vals: np.ndarray) -> bytes:
    """LEB128-encode a 1-D array of unsigned integers (vectorized)."""
    v = np.asarray(vals).astype(np.uint64)
    if v.size == 0:
        return b''
    nbytes = np.ones(v.size, np.int64)
    t = v >> np.uint64(7)
    while (t > 0).any():
        nbytes[t > 0] += 1
        t >>= np.uint64(7)
    maxlen = int(nbytes.max())
    j = np.arange(maxlen)
    emit = j[None, :] < nbytes[:, None]
    shifts = (np.uint64(7) * j.astype(np.uint64))[None, :]
    mat = ((v[:, None] >> shifts) & np.uint64(0x7F)).astype(np.uint8)
    mat[(j[None, :] + 1) < nbytes[:, None]] |= 0x80
    return mat[emit].tobytes()


def leb128_decode(buf: bytes, count: int):
    """Decode `count` LEB128 varints. Returns (uint64 array, bytes consumed)."""
    if count == 0:
        return np.zeros(0, np.uint64), 0
    b = np.frombuffer(buf, np.uint8)
    term = np.nonzero((b & 0x80) == 0)[0]
    assert len(term) >= count, 'truncated varint stream'
    consumed = int(term[count - 1]) + 1
    b = b[:consumed]
    starts = np.concatenate([[0], term[:count - 1] + 1])
    vid = np.zeros(consumed, np.int64)
    vid[starts[1:]] = 1
    vid = np.cumsum(vid)
    pos_in_val = np.arange(consumed) - starts[vid]
    vals = np.zeros(count, np.uint64)
    np.add.at(vals, vid,
              (b & np.uint8(0x7F)).astype(np.uint64)
              << (np.uint64(7) * pos_in_val.astype(np.uint64)))
    return vals, consumed


def pack_escapes(pos: np.ndarray, val: np.ndarray) -> bytes:
    """Serialize escape records: delta-coded positions then zigzag values,
    both LEB128. `pos` must be non-decreasing (scan order)."""
    pos = np.asarray(pos, np.int64)
    val = np.asarray(val, np.int64)
    deltas = np.diff(pos, prepend=np.int64(0))
    assert (deltas >= 0).all(), 'escape positions must be non-decreasing'
    zig = (val << 1) ^ (val >> 63)          # zigzag: sign -> LSB
    return leb128_encode(deltas) + leb128_encode(zig.astype(np.uint64))


def unpack_escapes(buf: bytes, count: int):
    """Inverse of pack_escapes. Returns (pos int64, val int64, consumed)."""
    deltas, c1 = leb128_decode(buf, count)
    zig, c2 = leb128_decode(buf[c1:], count)
    pos = np.cumsum(deltas.astype(np.int64))
    zig = zig.astype(np.int64)
    val = (zig >> 1) ^ -(zig & 1)
    return pos, val, c1 + c2


# ---------------------------------------------------------------------------
# Compact rANS lane-state serialization
# ---------------------------------------------------------------------------
# Lane states live in [2^16, 2^32): raw storage costs 4 B/lane, which at 128
# lanes is the dominant fixed overhead of the fused stream (512 B/image).
# Final states are ~log-uniform, so (state - 2^16) fits in <=3 bytes about
# half the time: store a packed 2-bit length code per lane (4 lanes/byte)
# followed by the truncated little-endian bytes. Pure host-side glue — the
# device kernels still see raw u32 states, so coder byte-identity of the
# words is untouched.

RANS_STATE_MIN = 1 << 16


def pack_states(states) -> bytes:
    """Serialize uint32 rANS lane states (each >= 2^16) compactly."""
    s = np.asarray(states).astype(np.uint64).ravel()
    assert (s >= RANS_STATE_MIN).all() and (s < (1 << 32)).all()
    x = s - RANS_STATE_MIN
    nb = (1 + (x >= (1 << 8)).astype(np.int64) +
          (x >= (1 << 16)).astype(np.int64) +
          (x >= (1 << 24)).astype(np.int64))
    codes = (nb - 1).astype(np.uint8)
    pad = (-len(codes)) % 4
    cp = np.concatenate([codes, np.zeros(pad, np.uint8)]).reshape(-1, 4)
    prefix = (cp[:, 0] | (cp[:, 1] << 2) | (cp[:, 2] << 4) |
              (cp[:, 3] << 6)).astype(np.uint8)
    j = np.arange(4)
    mat = ((x[:, None] >> (np.uint64(8) * j.astype(np.uint64)))
           & np.uint64(0xFF)).astype(np.uint8)
    emit = j[None, :] < nb[:, None]
    return prefix.tobytes() + mat[emit].tobytes()


def unpack_states(buf: bytes, n: int):
    """Inverse of pack_states. Returns (uint32 states, bytes consumed)."""
    npre = (n + 3) // 4
    pre = np.frombuffer(buf[:npre], np.uint8)
    codes = np.stack([pre & 3, (pre >> 2) & 3, (pre >> 4) & 3,
                      (pre >> 6) & 3], axis=1).reshape(-1)[:n]
    nb = codes.astype(np.int64) + 1
    total = int(nb.sum())
    body = np.frombuffer(buf[npre:npre + total], np.uint8).astype(np.uint64)
    starts = np.concatenate([[0], np.cumsum(nb)[:-1]])
    x = np.zeros(n, np.uint64)
    for j in range(4):
        sel = nb > j
        x[sel] |= body[starts[sel] + j] << np.uint64(8 * j)
    return (x + RANS_STATE_MIN).astype(np.uint32), npre + total


# ---------------------------------------------------------------------------
# Image padding / cropping to stride multiples
# ---------------------------------------------------------------------------

def pad_divisible_by(img: Image.Image, div=64) -> Image.Image:
    """Edge-pad a PIL image at right/bottom so both sides divide by `div`
    (reference: lvae/utils/coding.py:73-91)."""
    h_old, w_old = img.height, img.width
    if (h_old % div == 0) and (w_old % div == 0):
        return img
    h_tgt = div * math.ceil(h_old / div)
    w_tgt = div * math.ceil(w_old / div)
    arr = np.asarray(img)
    pad_h, pad_w = h_tgt - h_old, w_tgt - w_old
    pad_spec = [(0, pad_h), (0, pad_w)] + [(0, 0)] * (arr.ndim - 2)
    padded = np.pad(arr, pad_spec, mode='edge')
    return Image.fromarray(padded)


def crop_divisible_by(img: Image.Image, div=64) -> Image.Image:
    """Center-crop a PIL image so both sides divide by `div`
    (reference: lvae/utils/coding.py:94-110)."""
    h_old, w_old = img.height, img.width
    if (h_old % div == 0) and (w_old % div == 0):
        return img
    h_new = div * (h_old // div)
    w_new = div * (w_old // div)
    top = (h_old - h_new) // 2
    left = (w_old - w_new) // 2
    arr = np.asarray(img)
    cropped = arr[top:top + h_new, left:left + w_new]
    return Image.fromarray(cropped)


def pad_array_divisible_by(arr: np.ndarray, div=64) -> np.ndarray:
    """Edge-pad an HWC numpy image so H and W divide by `div`."""
    h_old, w_old = arr.shape[0], arr.shape[1]
    if (h_old % div == 0) and (w_old % div == 0):
        return arr
    h_tgt = div * math.ceil(h_old / div)
    w_tgt = div * math.ceil(w_old / div)
    pad_spec = [(0, h_tgt - h_old), (0, w_tgt - w_old)] + [(0, 0)] * (arr.ndim - 2)
    return np.pad(arr, pad_spec, mode='edge')


# ---------------------------------------------------------------------------
# BD-rate and RD-curve bookkeeping
# ---------------------------------------------------------------------------

def bd_rate(r1, psnr1, r2, psnr2):
    """Bjontegaard delta-rate of curve 2 vs baseline curve 1, in percent.

    Deg-3 polynomial fit of log-rate as a function of PSNR, integrated over
    the overlapping PSNR interval (reference: lvae/utils/coding.py:113-144).
    """
    lr1 = np.log(np.asarray(r1, dtype=np.float64))
    lr2 = np.log(np.asarray(r2, dtype=np.float64))
    psnr1 = np.asarray(psnr1, dtype=np.float64)
    psnr2 = np.asarray(psnr2, dtype=np.float64)

    degree = 3
    p1 = np.polyfit(psnr1, lr1, deg=degree)
    p2 = np.polyfit(psnr2, lr2, deg=degree)
    p_int1 = np.polyint(p1)
    p_int2 = np.polyint(p2)

    min_psnr = max(psnr1.min(), psnr2.min())
    max_psnr = min(psnr1.max(), psnr2.max())
    auc1 = np.polyval(p_int1, max_psnr) - np.polyval(p_int1, min_psnr)
    auc2 = np.polyval(p_int2, max_psnr) - np.polyval(p_int2, min_psnr)

    avg_exp_diff = (auc2 - auc1) / (max_psnr - min_psnr)
    return (np.exp(avg_exp_diff) - 1) * 100


class RDList:
    """Store/plot RD curves and compute BD-rates
    (reference: lvae/utils/coding.py:167-267)."""

    def __init__(self):
        self.stats_all = []
        self.bdrate_anchor = None

    def add_json(self, fpath, label='no label', **kwargs):
        with open(fpath, mode='r') as f:
            stat = json.load(f)
        if 'results' in stat:
            stat = stat['results']
        stat['label'] = label
        stat['kwargs'] = kwargs
        self.stats_all.append(stat)

    def add_data(self, bpp=(), psnr=(), label='no label', **kwargs):
        stat = {'bpp': list(bpp), 'psnr': list(psnr), 'label': label, 'kwargs': kwargs}
        self.stats_all.append(stat)

    def set_bdrate_anchor(self, label=None):
        if label is None:
            anchor = self.stats_all[-1]
        else:
            matches = [st for st in self.stats_all if st['label'] == label]
            assert len(matches) == 1
            anchor = matches[0]
        self.bdrate_anchor = anchor

    def compute_bdrate(self):
        if self.bdrate_anchor is None:
            return None
        bd_anchor = self.bdrate_anchor
        out = {}
        print(f'BD-rate anchor = {bd_anchor["label"]}')
        for method in self.stats_all:
            if len(method['bpp']) == 0:
                continue
            bd = bd_rate(bd_anchor['bpp'], bd_anchor['psnr'],
                         method['bpp'], method['psnr'])
            out[method['label']] = bd
            print(method['label'], f'BD-rate = {bd}')
        print()
        return out

    def plot_all_stats(self, ax):
        for stat in self.stats_all:
            self._plot_stat(stat, ax=ax, **stat['kwargs'])

    @staticmethod
    def _plot_stat(stat, ax, ls='-', **kwargs):
        assert 'bpp' in stat, f'{stat}'
        kwargs['marker'] = kwargs.get('marker', '.')
        kwargs['linewidth'] = kwargs.get('linewidth', 1.2)
        return ax.plot(stat['bpp'], stat['psnr'], label=stat['label'],
                       markersize=8, linestyle=ls, **kwargs)


# suffixes eval loops accept — a stray .json/.txt in a dataset dir must
# not crash Image.open (the reference globs '*.*' and does crash)
IMAGE_SUFFIXES = {'.png', '.jpg', '.jpeg', '.bmp', '.webp', '.ppm', '.tif',
                  '.tiff'}


def pad_to_shape(img: Image.Image, h_tgt: int, w_tgt: int) -> Image.Image:
    """Edge-pad a PIL image at right/bottom to an exact target shape (shape
    bucketing for eval: bounds XLA compile count over mixed-shape datasets).
    Target must be >= the image and divisible by the model stride."""
    h_old, w_old = img.height, img.width
    assert h_tgt >= h_old and w_tgt >= w_old, (h_tgt, w_tgt, h_old, w_old)
    if (h_tgt, w_tgt) == (h_old, w_old):
        return img
    arr = np.asarray(img)
    pad_spec = [(0, h_tgt - h_old), (0, w_tgt - w_old)] + \
        [(0, 0)] * (arr.ndim - 2)
    return Image.fromarray(np.pad(arr, pad_spec, mode='edge'))


def choose_shape_buckets(sizes, div=64, max_buckets=3):
    """Pick <= max_buckets padded (H, W) buckets covering all (h, w) sizes.

    Exact /div padding when the dataset has few distinct shapes; otherwise
    contiguous area-sorted groups with element-wise-max buckets, the last
    bucket being the global max (so every image fits somewhere)."""
    padded = sorted({(div * math.ceil(h / div), div * math.ceil(w / div))
                     for h, w in sizes})
    if len(padded) <= max_buckets:
        return padded
    by_area = sorted(padded, key=lambda s: s[0] * s[1])
    n = len(by_area)
    buckets = []
    for g in range(max_buckets):
        grp = by_area[g * n // max_buckets:(g + 1) * n // max_buckets]
        if grp:
            buckets.append((max(h for h, _ in grp), max(w for _, w in grp)))
    gmax = (max(h for h, _ in padded), max(w for _, w in padded))
    if gmax not in buckets:
        buckets[-1] = gmax
    return sorted(set(buckets))


def bucket_for(h, w, buckets):
    """Smallest bucket that fits (h, w); the global-max bucket always does."""
    for bh, bw in buckets:
        if bh >= h and bw >= w:
            return bh, bw
    return buckets[-1]
