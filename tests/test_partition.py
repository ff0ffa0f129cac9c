"""Unit tests for utils/partition.py (reference src/common/partition.py:22-58).

The examples mirror the reference docstrings exactly so behavior parity is
checkable line-by-line.
"""

import pytest

from seedvr2_tpu.utils.partition import (partition_by_groups,
                                         partition_by_size, shift_list)


def test_partition_by_size_reference_example():
    assert partition_by_size([1, 2, 3, 4, 5], 2) == [[1, 2], [3, 4], [5]]


def test_partition_by_size_exact_and_oversize():
    assert partition_by_size([1, 2, 3, 4], 2) == [[1, 2], [3, 4]]
    assert partition_by_size([1, 2], 5) == [[1, 2]]
    assert partition_by_size([], 3) == []


def test_partition_by_size_accepts_range():
    # core/pipeline.py passes range(len(batches))
    assert partition_by_size(range(5), 3) == [[0, 1, 2], [3, 4]]


def test_partition_by_size_rejects_nonpositive():
    with pytest.raises(ValueError):
        partition_by_size([1], 0)


def test_partition_by_groups_reference_example():
    assert partition_by_groups([1, 2, 3, 4, 5], 2) == [[1, 3, 5], [2, 4]]


def test_partition_by_groups_more_groups_than_items():
    assert partition_by_groups([1, 2], 4) == [[1], [2], [], []]
    with pytest.raises(ValueError):
        partition_by_groups([1], -1)


def test_shift_list_reference_example():
    assert shift_list([1, 2, 3, 4, 5], 3) == [4, 5, 1, 2, 3]


def test_shift_list_wraps_and_handles_empty():
    assert shift_list([1, 2, 3], 5) == [3, 1, 2]
    assert shift_list([1, 2, 3], 0) == [1, 2, 3]
    assert shift_list([], 2) == []
