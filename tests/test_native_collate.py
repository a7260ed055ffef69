"""Golden equivalence: C++ collate fast path == numpy builders, bit for bit."""

import numpy as np
import pytest

from sessionrec_tpu.data import native_collate as nc
from sessionrec_tpu.graph import builders

pytestmark = pytest.mark.skipif(not nc.available(),
                                reason="native collate not built")


def _random_seqs(rng, n, max_len, num_items=200):
    lens = rng.integers(1, max_len + 1, size=n)
    seqs = [list(map(int, rng.integers(0, num_items, size=l))) for l in lens]
    labels = list(map(int, rng.integers(0, num_items, size=n)))
    return seqs, labels


def _assert_tree_equal(a, b, path=""):
    assert type(a) is type(b), (path, type(a), type(b))
    if isinstance(a, dict):
        assert a.keys() == b.keys(), path
        for k in a:
            _assert_tree_equal(a[k], b[k], f"{path}/{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_tree_equal(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_array_equal(a, b, err_msg=path)


@pytest.mark.parametrize("trial", range(3))
def test_session_builder_matches(trial):
    rng = np.random.default_rng(trial)
    seqs, labels = _random_seqs(rng, 64, 20)
    a = builders.build_session_batch(seqs, labels, 20, 80)
    b = nc.build_session_batch(seqs, labels, 20, 80)
    _assert_tree_equal(a, b)


@pytest.mark.parametrize("trial", range(3))
def test_lessr_builder_matches(trial):
    rng = np.random.default_rng(100 + trial)
    seqs, labels = _random_seqs(rng, 64, 20)
    a = builders.build_lessr_batch(seqs, labels, 20, 80)
    b = nc.build_lessr_batch(seqs, labels, 20, 80)
    _assert_tree_equal(a, b)


@pytest.mark.parametrize("order", [1, 2, 3, 4])
def test_ccs_builder_matches(order):
    rng = np.random.default_rng(200 + order)
    # small alphabet to force duplicate k-grams, plus short sessions to
    # force pad levels
    lens = rng.integers(1, 21, size=64)
    seqs = [list(map(int, rng.integers(0, 8, size=l))) for l in lens]
    labels = list(map(int, rng.integers(0, 8, size=64)))
    a = builders.build_ccs_batch(seqs, labels, order, 20, 80)
    b = nc.build_ccs_batch(seqs, labels, order, 20, 80)
    _assert_tree_equal(a, b)


def test_edge_cases():
    seqs = [[5], [3, 3], [1, 2, 1, 2], [7, 7, 7, 7, 7]]
    labels = [0, 1, 2, 3]
    for order in (1, 3):
        a = builders.build_ccs_batch(seqs, labels, order, 20, 4)
        b = nc.build_ccs_batch(seqs, labels, order, 20, 4)
        _assert_tree_equal(a, b)
    _assert_tree_equal(builders.build_session_batch(seqs, labels, 20, 4),
                       nc.build_session_batch(seqs, labels, 20, 4))
    _assert_tree_equal(builders.build_lessr_batch(seqs, labels, 20, 4),
                       nc.build_lessr_batch(seqs, labels, 20, 4))
