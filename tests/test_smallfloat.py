"""Property tests for the byte4 norm quantization (SmallFloat semantics)."""

import numpy as np
import pytest

from lucene_spark.util import smallfloat as sf


def _ref_long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError
    nbits = i.bit_length()
    if nbits < 4:
        return i
    shift = nbits - 4
    return ((i >> shift) & 0x07) | ((shift + 1) << 3)


def _ref_int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


def _ref_int_to_byte4(i: int) -> int:
    if i < sf.NUM_FREE_VALUES:
        return i
    return sf.NUM_FREE_VALUES + _ref_long_to_int4(i - sf.NUM_FREE_VALUES)


def _ref_byte4_to_int(b: int) -> int:
    if b < sf.NUM_FREE_VALUES:
        return b
    return sf.NUM_FREE_VALUES + _ref_int4_to_long(b - sf.NUM_FREE_VALUES)


def test_constants():
    assert _ref_long_to_int4(2**31 - 1) == sf.MAX_INT4 == 231
    assert sf.NUM_FREE_VALUES == 24


def test_small_values_exact():
    for i in range(24):
        assert int(sf.int_to_byte4(i)) == i
        assert int(sf.byte4_to_int(i)) == i


def test_matches_scalar_reference_exhaustive():
    xs = np.array(
        list(range(0, 5000)) + [2**k for k in range(30)] + [2**31 - 1], dtype=np.int64
    )
    enc = sf.int_to_byte4(xs)
    expected = np.array([_ref_int_to_byte4(int(x)) for x in xs])
    np.testing.assert_array_equal(enc, expected)
    dec = sf.byte4_to_int(enc)
    expected_dec = np.array([_ref_byte4_to_int(int(e)) for e in enc])
    np.testing.assert_array_equal(dec, expected_dec)


def test_monotonic_and_idempotent():
    xs = np.arange(0, 200000, dtype=np.int64)
    enc = sf.int_to_byte4(xs)
    assert np.all(np.diff(enc) >= 0)
    assert enc.max() <= 255
    dec = sf.byte4_to_int(enc)
    # quantization is idempotent and <= input
    np.testing.assert_array_equal(sf.byte4_to_int(sf.int_to_byte4(dec)), dec)
    assert np.all(dec <= xs)


def test_length_table():
    assert sf.LENGTH_TABLE.shape == (256,)
    assert sf.LENGTH_TABLE.dtype == np.float32
    assert float(sf.LENGTH_TABLE[0]) == 0.0
    assert float(sf.LENGTH_TABLE[10]) == 10.0


def test_negative_rejected():
    with pytest.raises(ValueError):
        sf.int_to_byte4(-1)
