"""Bit-feature filter conformance (skiplist_reverse_index.go:158-171,
SURVEY M3) — incl. the or_flags zero-entry skip rule."""

import numpy as np

from quickray.scoring import compute_bits, flags_mask


def test_on_off_flags():
    bits = np.array([0b0000, 0b0101, 0b0011, 0b1111], dtype=np.int64)
    assert flags_mask(bits, on_flag=0b0001).tolist() == [False, True, True, True]
    assert flags_mask(bits, on_flag=0b0101).tolist() == [False, True, False, True]
    assert flags_mask(bits, off_flag=0b0010).tolist() == [True, True, False, False]
    assert flags_mask(bits, on_flag=0b0001, off_flag=0b1000).tolist() == [
        False, True, True, False,
    ]


def test_or_flags_zero_skipped():
    bits = np.array([0b0001, 0b0010, 0b0100], dtype=np.int64)
    # a zero entry must be skipped entirely (reference rule), not treated
    # as "no bit can match"
    assert flags_mask(bits, or_flags=(0,)).tolist() == [True, True, True]
    assert flags_mask(bits, or_flags=(0, 0b0011)).tolist() == [True, True, False]
    assert flags_mask(bits, or_flags=(0b0001, 0b0110)).tolist() == [False, False, False]
    assert flags_mask(bits, or_flags=(0b0011, 0b0110)).tolist() == [False, True, False]


def test_no_flags_all_pass():
    bits = np.array([0, 1, 2], dtype=np.int64)
    assert flags_mask(bits).all()


def test_compute_bits_rules():
    bits = compute_bits(
        ["go", "py", "zz"],
        ["src/a.go", "test/b.py", "pkg/test_c.go"],
        np.array([5, 20, 10]),
        avgdl=10.0,
        langs=["go", "py"],
    )
    assert bits[0] == 1 << 0
    assert bits[1] == (1 << 1) | (1 << 8) | (1 << 9)  # test path + long doc
    assert bits[2] == 1 << 8  # unknown lang -> no lang bit; test_ basename
