"""Search-space + graph-hash tests.

Golden values come from the reference README (README.md:61) and the counts
recomputed with reference code during the survey (SURVEY.md §0).
"""

import pytest

from nbasr_tpu import search_space as ss
from nbasr_tpu import graph_utils as gu
from nbasr_tpu.utils import flatten, copy_structure, count, get_first_n, make_nice_number

GOLDEN_ARCH = [[1, 0], [1, 0, 0], [1, 0, 0, 0]]
GOLDEN_HASH = '36855332a5778e0df5114305bc3ce238'


def test_search_space_shape():
    assert ss.get_search_space() == [[6, 2], [6, 2, 2], [6, 2, 2, 2]]


def test_golden_hash():
    assert ss.get_model_hash(GOLDEN_ARCH) == GOLDEN_HASH


def test_total_arch_count():
    assert count(ss.get_all_architectures()) == 13824


def test_enumeration_is_unique_and_in_space():
    seen = set()
    radixes = flatten(ss.get_search_space())
    for arch in ss.get_all_architectures():
        flat = tuple(flatten(arch))
        assert flat not in seen
        seen.add(flat)
        assert all(0 <= v < r for v, r in zip(flat, radixes))
    assert len(seen) == 13824


@pytest.mark.slow
def test_unique_hash_counts():
    """8,242 unique graphs; 8,000 excluding the zero op (paper-published)."""
    hashes, no_zero = set(), set()
    for arch in ss.get_all_architectures():
        h = ss.get_model_hash(arch)
        hashes.add(h)
        if 5 not in flatten(arch):
            no_zero.add(h)
    assert len(hashes) == 8242
    assert len(no_zero) == 8000


def test_isomorphic_archs_collide():
    # A 'zero' op cuts its chain path; skip connections around it keep the
    # graph equal to one that routes around explicitly.
    a = [[5, 1], [1, 0, 1], [2, 0, 1, 1]]
    g_min, g_full = gu.get_model_graph(a)
    assert gu.graph_hash(g_min) != gu.graph_hash(g_full)
    # Hash is invariant to how the pruned graph was reached.
    h1 = ss.get_model_hash(a, minimize=True)
    assert h1 == gu.graph_hash(g_min)


def test_zero_everywhere_prunes_to_io_only():
    arch = [[5, 0], [5, 0, 0], [5, 0, 0, 0]]
    (mat, labels), _ = gu.get_model_graph(arch)
    assert labels == ['input', 'output'] or labels == []


def test_random_architectures_deterministic():
    a = ss.get_random_architectures(10, seed=42)
    b = ss.get_random_architectures(10, seed=42)
    assert a == b
    assert len(a) == 10
    radixes = flatten(ss.get_search_space())
    for arch in a:
        assert all(0 <= v < r for v, r in zip(flatten(arch), radixes))


def test_arch_vec_to_names():
    names = ss.arch_vec_to_names(GOLDEN_ARCH)
    assert names == [['conv5', 0], ['conv5', 0, 0], ['conv5', 0, 0, 0]]


def test_flatten_copy_structure_roundtrip():
    seq = [[1, 2], [3, 4, 5], [6, [7, 8]]]
    assert copy_structure(flatten(seq), seq) == seq
    assert flatten(seq) == [1, 2, 3, 4, 5, 6, 7, 8]


def test_get_first_n():
    assert list(get_first_n(iter(range(100)), 3)) == [0, 1, 2]


def test_make_nice_number():
    assert make_nice_number(26338848) == '26,338,848'
    assert make_nice_number(5) == '5'
    assert make_nice_number(1000) == '1,000'


def test_nx_hash_partition_agrees_on_sample():
    """The numpy hash and the WL hash must induce the same partition
    (reference self-check graph_utils.py:319-362), spot-checked on a sample."""
    archs = list(get_first_n(ss.get_all_architectures(), 400))
    np_hashes = {}
    nx_hashes = {}
    for arch in archs:
        key = tuple(flatten(arch))
        np_hashes[key] = ss.get_model_hash(arch)
        g, _ = gu.get_model_graph_nx(arch)
        nx_hashes[key] = gu.graph_hash_nx(g)
    # same-partition check: np equal <=> nx equal
    keys = list(np_hashes)
    from collections import defaultdict
    np_groups, nx_groups = defaultdict(set), defaultdict(set)
    for k in keys:
        np_groups[np_hashes[k]].add(k)
        nx_groups[nx_hashes[k]].add(k)
    assert sorted(map(sorted, np_groups.values())) == sorted(map(sorted, nx_groups.values()))


def test_to_dot_renders():
    g, _ = gu.get_model_graph(GOLDEN_ARCH)
    dot = gu.to_dot(g)
    assert 'digraph' in dot and 'Conv(5)' in dot
