"""Tree layer tests: generator invariants, symfact semantics, serialization round-trip.

The reference has no tests (SURVEY.md section 4); these check the structural invariants
its factorization silently relies on (nesteddissection.jl:29-88)."""

import numpy as np
import pytest

from hsolve import (NDTree, nested_dissection, parse_elimtree, permuted, postorder,
                    serialize_elimtree, symfact)


@pytest.mark.parametrize("shape,leafmax", [((15, 15), 20), ((31, 31), 40),
                                           ((20, 13), 16), ((7, 7, 7), 30)])
def test_nested_dissection_invariants(shape, leafmax):
    tree = nested_dissection(shape, leafmax=leafmax)
    tree.validate()
    N = int(np.prod(shape))
    perm_parts = np.concatenate([tree.int_idx[i] for i in tree.topo_order()]
                                + [tree.bnd_idx[tree.root]])
    assert sorted(perm_parts.tolist()) == list(range(N))


def test_symfact_reorders_parent_sets():
    tree = nested_dissection((15, 15), leafmax=20)
    # keep copies of pre-symfact sets
    before_int = [s.copy() for s in tree.int_idx]
    before_bnd = [s.copy() for s in tree.bnd_idx]
    loc = symfact(tree)
    for i in tree.topo_order():
        if tree.is_leaf(i):
            continue
        l, r = int(tree.left[i]), int(tree.right[i])
        # parity with nesteddissection.jl:42-46,64-65
        np.testing.assert_array_equal(
            tree.int_idx[i],
            np.concatenate([tree.bnd_idx[l][loc.int_loc[l]],
                            tree.bnd_idx[r][loc.int_loc[r]]]))
        np.testing.assert_array_equal(
            tree.bnd_idx[i],
            np.concatenate([tree.bnd_idx[l][loc.bnd_loc[l]],
                            tree.bnd_idx[r][loc.bnd_loc[r]]]))
        assert set(tree.int_idx[i]) == set(before_int[i])
        assert set(tree.bnd_idx[i]) == set(before_bnd[i])


def test_postorder_contiguity_after_permutation():
    tree = nested_dissection((31, 31), leafmax=30)
    symfact(tree)
    perm = postorder(tree)
    N = len(perm)
    relabel = np.empty(N, dtype=np.int64)
    relabel[perm] = np.arange(N)
    permuted(tree, relabel)
    # every node's int must be a contiguous ascending range (factorization.jl:79-80)
    for i in tree.topo_order():
        s = tree.int_idx[i]
        np.testing.assert_array_equal(s, np.arange(s[0], s[0] + len(s)))


def test_serialize_parse_roundtrip():
    tree = nested_dissection((15, 15), leafmax=20)
    fields = serialize_elimtree(tree)
    tree2 = parse_elimtree(*fields)
    assert tree2.nnodes == tree.nnodes
    assert tree2.root == tree.root
    for i in range(tree.nnodes):
        np.testing.assert_array_equal(tree.int_idx[i], tree2.int_idx[i])
        np.testing.assert_array_equal(tree.bnd_idx[i], tree2.bnd_idx[i])
        assert tree.left[i] == tree2.left[i]
        assert tree.right[i] == tree2.right[i]


def test_depth_and_levels():
    tree = nested_dissection((31, 31), leafmax=30)
    d = tree.depth()
    lev = tree.levels()
    assert lev[tree.root] == 1
    assert lev.max() == d
