"""average_error_rate tests (reference tests/test__fastq.py semantics)."""

import math

import numpy as np
import pytest

from fastqdedup_tpu import average_error_rate
from fastqdedup_tpu.quality import batch_average_error_rate


def test_average_error_rate_exact():
    # (0.1 + 0.001) / 2 == 0.0505
    assert average_error_rate(chr(10) + chr(30), phred_offset=0) == 0.0505


def test_average_error_rate_default_offset():
    assert average_error_rate(chr(43) + chr(63)) == 0.0505


@pytest.mark.parametrize("i", list(range(33)) + [127])
def test_average_error_rate_out_of_range(i):
    with pytest.raises(ValueError, match="outside of valid phred range"):
        average_error_rate(chr(i))


def test_average_error_rate_non_ascii():
    with pytest.raises(ValueError, match="phred_scores must be ASCII"):
        average_error_rate(chr(128))


def test_average_error_rate_empty_is_nan():
    assert math.isnan(average_error_rate(""))


def test_batch_matches_scalar():
    strings = ["IIII", "!!!!".replace("!", chr(43)), "ABCDEFG", "I"]
    lmax = max(len(s) for s in strings)
    scores = np.full((len(strings), lmax), 33, dtype=np.uint8)
    lengths = np.array([len(s) for s in strings])
    for i, s in enumerate(strings):
        scores[i, :len(s)] = np.frombuffer(s.encode(), dtype=np.uint8)
    batch = batch_average_error_rate(scores, lengths)
    for i, s in enumerate(strings):
        assert batch[i] == average_error_rate(s)  # bit-exact


def test_batch_validates_range():
    scores = np.array([[32, 70]], dtype=np.uint8)  # 32 < offset 33
    with pytest.raises(ValueError, match="outside of valid phred range"):
        batch_average_error_rate(scores, np.array([2]))


def test_batch_ignores_padding():
    scores = np.array([[70, 0, 0]], dtype=np.uint8)  # padding out of range
    result = batch_average_error_rate(scores, np.array([1]))
    assert result[0] == average_error_rate("F")
