"""Tests for host-side utilities: byte containers, padding, general utils."""
import numpy as np
import pytest
from PIL import Image

from lvae_tpu.utils import coding
from lvae_tpu.utils.general import MaxLengthList, SimpleTable, increment_dir


def test_pack_unpack_roundtrip(rng_np):
    strings = [bytes(rng_np.integers(0, 256, int(n), dtype=np.uint8))
               for n in rng_np.integers(0, 500, 9)]
    packed = coding.pack_byte_strings(strings)
    out = coding.unpack_byte_string(packed)
    assert out == strings


def test_pack_layout_matches_reference_format():
    """Byte-identical to reference lvae/utils/coding.py:26-47:
    [B num][num*I lengths][payload]."""
    import struct
    strings = [b'abc', b'', b'xy']
    packed = coding.pack_byte_strings(strings)
    assert packed[0] == 3
    lengths = struct.unpack('3I', packed[1:13])
    assert lengths == (3, 0, 2)
    assert packed[13:] == b'abcxy'


def test_pad_crop_divisible(rng_np):
    arr = rng_np.integers(0, 255, (100, 130, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    padded = coding.pad_divisible_by(img, div=64)
    assert padded.height == 128 and padded.width == 192
    # edge padding: last real row replicated
    parr = np.asarray(padded)
    assert np.array_equal(parr[:100, :130], arr)
    assert np.array_equal(parr[100], parr[99])
    cropped = coding.crop_divisible_by(img, div=64)
    assert cropped.height == 64 and cropped.width == 128


def test_max_length_list():
    m = MaxLengthList(max_len=3)
    for v in [1, 2, 3, 4]:
        m.add(v)
    assert len(m) == 3
    assert m.current() == 4
    assert m.median() == 3
    assert m.max() == 4


def test_simple_table():
    t = SimpleTable(['a', 'b'])
    t['a'] = 1.23456
    t['c'] = 'xyz'
    header, body = t.update(border=True)
    assert 'a' in header and 'c' in header
    assert '1.235' in body and 'xyz' in body


def test_increment_dir(tmp_path):
    assert increment_dir(tmp_path, 'run') == 'run_0'
    (tmp_path / 'run_0').mkdir()
    (tmp_path / 'run_3').mkdir()
    assert increment_dir(tmp_path, 'run') == 'run_4'


def test_get_object_size():
    n = coding.get_object_size([b'123'], unit='bytes')
    assert n > 0
    assert coding.get_object_size([b'123'], unit='bits') == n * 8


def test_leb128_roundtrip():
    rng = np.random.default_rng(0)
    vals = np.concatenate([
        np.array([0, 1, 127, 128, 16383, 16384, 2**32 - 1, 2**40], np.uint64),
        rng.integers(0, 2**34, 200).astype(np.uint64)])
    buf = coding.leb128_encode(vals)
    out, consumed = coding.leb128_decode(buf + b'\x05\x05', len(vals))
    assert consumed == len(buf)
    assert np.array_equal(out, vals)
    assert coding.leb128_encode(np.zeros(0, np.uint64)) == b''


def test_pack_escapes_roundtrip_and_size():
    rng = np.random.default_rng(1)
    n = 500
    pos = np.sort(rng.integers(0, 400_000, n)).astype(np.int64)
    val = rng.integers(-70_000, 70_000, n).astype(np.int64)
    buf = coding.pack_escapes(pos, val)
    p2, v2, consumed = coding.unpack_escapes(buf + b'trailing', n)
    assert consumed == len(buf)
    assert np.array_equal(p2, pos) and np.array_equal(v2, val)
    # compactness: typical escape record ~2-4 bytes (round-1 format was 16)
    assert len(buf) < 8 * n
    # empty
    assert coding.pack_escapes(np.zeros(0), np.zeros(0)) == b''
    p0, v0, c0 = coding.unpack_escapes(b'', 0)
    assert c0 == 0 and p0.size == 0 and v0.size == 0


def test_pack_escapes_duplicate_and_boundary_positions():
    pos = np.array([0, 0, 5, 5, 5, 1 << 31], np.int64)
    val = np.array([-1, 2**31 - 1, -(2**31), 0, 7, -3], np.int64)
    p2, v2, _ = coding.unpack_escapes(coding.pack_escapes(pos, val), len(pos))
    assert np.array_equal(p2, pos) and np.array_equal(v2, val)
