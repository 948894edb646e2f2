"""Numeric utils parity tests (reference src/utils.rs:1-53 semantics)."""

import pytest

from kzg_tpu.utils import (
    is_power_of_two,
    log2,
    log2_ceil,
    next_power_of_two,
    pad_to_power_of_two,
)


def test_log2_matches_bit_math():
    for x in [1, 2, 3, 4, 7, 8, 9, 1023, 1024, 1025, 1 << 31]:
        assert log2(x) == x.bit_length() - 1
    with pytest.raises(ValueError):
        log2(0)


def test_log2_ceil():
    assert log2_ceil(1) == 0
    assert log2_ceil(2) == 1
    assert log2_ceil(3) == 2
    assert log2_ceil(4) == 2
    assert log2_ceil(5) == 3
    assert log2_ceil(1024) == 10
    assert log2_ceil(1025) == 11


def test_is_power_of_two():
    assert is_power_of_two(1)
    assert is_power_of_two(64)
    assert not is_power_of_two(0)
    assert not is_power_of_two(3)
    assert not is_power_of_two(-4)


def test_pad_to_power_of_two():
    assert pad_to_power_of_two([1, 2, 3]) == [1, 2, 3, 0]
    assert pad_to_power_of_two([1, 2]) == [1, 2]
    assert pad_to_power_of_two([1], pad_value=9) == [1]
    assert pad_to_power_of_two([1, 2, 3, 4, 5], pad_value=7) == [1, 2, 3, 4, 5, 7, 7, 7]
    assert next_power_of_two(5) == 8
