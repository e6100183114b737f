"""Host-side symbolic planner.

This is the TPU-native replacement for the reference's runtime tree recursion: instead
of pointer-chasing with dynamic shapes (``factorization.jl:14-27``), the planner turns
the elimination tree into a *static, level-synchronous schedule* of batched fixed-shape
device kernels:

- symbolic phase: :func:`hsolve.utils.trees.symfact` + post-order permutation
  (parity with nesteddissection.jl:29-88),
- nodes are grouped by *height* (leaves first, then branches whose children are all
  scheduled earlier); every batch is padded to shared ``(ni_pad, nb_pad)`` so the whole
  batch runs as one batched kernel,
- every sparse submatrix gather ``A[I, J]`` the numeric factorization will need is
  precomputed here into dense padded front buffers (the TPU answer to the reference's
  ``mygetindex.jl`` sparse-getindex monkey-patch),
- extend-add becomes a per-node scatter map from child Schur positions into parent front
  positions (the child S is stored in ``[int_loc; bnd_loc]`` order, factorization.jl:39-41,
  so the map is two contiguous runs).

Front layout per batch: interior DOFs at rows/cols ``[0, ni)`` padded to ``ni_pad`` with
an identity diagonal (so the batched LU is well-defined on padding), boundary DOFs at
``[ni_pad, ni_pad + nb)`` padded to ``nb_pad`` with zeros.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np
import scipy.sparse as sp

from hsolve.options import SolverOptions
from hsolve.utils.trees import LocTree, NDTree, NONE, permuted, postorder, symfact


def _round_up(x: int, m: int) -> int:
    return int(-(-x // m) * m) if x > 0 else 0


@dataclasses.dataclass
class ChildGroup:
    """One (source batch -> this batch) gather: children living in source batch
    ``src_batch`` at rows ``src_rows`` feed the parents at rows ``dst_rows``."""

    src_batch: int
    src_rows: np.ndarray   # [g] row in the source batch's S stack
    dst_rows: np.ndarray   # [g] row in this batch


@dataclasses.dataclass
class BatchPlan:
    node_ids: np.ndarray       # [B]
    is_leaf: bool
    ni_pad: int
    nb_pad: int
    ni: np.ndarray             # [B] actual interior sizes
    nb: np.ndarray             # [B] actual boundary sizes
    A_front: np.ndarray        # [B, m_pad, m_pad] sparse part of the fronts (padded)
    sperm: np.ndarray          # [B, nb_pad] output permutation to [int_loc; bnd_loc]
    int_ids: np.ndarray        # [B, ni_pad] global (permuted) DOF ids, sentinel N
    bnd_ids: np.ndarray        # [B, nb_pad] global (permuted) DOF ids, sentinel N
    levels: np.ndarray         # [B] reference recursion level (root = 1)
    compress: bool = False     # this batch's fronts get compressed L/R (+HSS S)
    rank_cap: int = 0          # static low-rank cap for compressed batches
    # branch-only extend-add data (None for the leaf batch):
    sl_pad: int = 0
    sr_pad: int = 0
    map_l: Optional[np.ndarray] = None   # [B, sl_pad] front positions, sentinel m_pad
    map_r: Optional[np.ndarray] = None   # [B, sr_pad]
    groups_l: Tuple[ChildGroup, ...] = ()
    groups_r: Tuple[ChildGroup, ...] = ()

    @property
    def B(self) -> int:
        return self.A_front.shape[0]  # includes sharding-padding dummy rows

    @property
    def m_pad(self) -> int:
        return self.ni_pad + self.nb_pad


@dataclasses.dataclass
class Plan:
    """Static schedule: ``batches[0]`` is the leaf batch, later batches only consume
    Schur complements produced by earlier batches; the last batch contains the root."""

    N: int
    perm: np.ndarray           # postorder permutation: position p holds original dof perm[p]
    batches: List[BatchPlan]
    tree_depth: int
    nb_root: int
    A_perm: sp.csr_matrix      # the permuted matrix (device ELL built from this)
    tree: NDTree               # relabeled tree (indices are positions in A_perm)
    loc: LocTree
    opts: "SolverOptions" = None

    @property
    def nnz(self) -> int:
        return int(self.A_perm.nnz)


def _extract_dense(A: sp.csr_matrix, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    """Dense gather A[rows][:, cols] in the given (not necessarily sorted) order."""
    if len(rows) == 0 or len(cols) == 0:
        return np.zeros((len(rows), len(cols)), dtype=A.dtype)
    return np.asarray(A[rows][:, cols].todense())


def plan_factorization(A: sp.spmatrix, tree: NDTree, opts: SolverOptions,
                       batch_multiple: int = 1) -> Plan:
    """Run the symbolic phase and build the batched numeric schedule.

    batch_multiple: round every level's batch size up to a multiple of this (with
    decoupled identity dummy fronts), so the node axis divides a device-mesh axis.
    """
    opts.validate()
    A = sp.csr_matrix(A)
    N = A.shape[0]

    tree = tree.copy()  # symfact/permuted mutate; keep the caller's tree reusable
    loc = symfact(tree)
    perm = postorder(tree)
    if len(perm) != N or len(np.unique(perm)) != N:
        raise ValueError(
            "postorder is not a permutation: the tree does not cover every DOF exactly "
            "once (check separator/boundary construction)")
    relabel = np.empty(N, dtype=np.int64)
    relabel[perm] = np.arange(N)
    A_perm = A[perm][:, perm].tocsr()
    tree = permuted(tree, relabel)
    depth = tree.depth()
    levels = tree.levels()

    # --- schedule: group nodes by height, split by compression flag ---
    order = tree.topo_order()
    height = np.zeros(tree.nnodes, dtype=np.int64)
    for i in order:
        l, r = tree.left[i], tree.right[i]
        if l != NONE:
            height[i] = 1 + max(height[l], height[r])
    max_h = int(height[tree.root])

    # per-node compression flag (parity with factorization.jl:15:
    # level <= swlevel and |bnd| >= swsize)
    swlevel = opts.resolve_swlevel(depth)
    cflag = np.array([(levels[i] <= swlevel) and (len(tree.bnd_idx[i]) >= opts.swsize)
                      for i in range(tree.nnodes)], dtype=bool)

    groups: List[Tuple[np.ndarray, bool, bool]] = []  # (nodes, is_leaf, compress)
    for h in range(max_h + 1):
        at_h = np.asarray([i for i in order if height[i] == h], dtype=np.int64)
        for want in (False, True):
            sel = at_h[cflag[at_h] == want]
            if len(sel):
                groups.append((sel, h == 0, want))

    # node -> (batch, row) location of its Schur complement
    s_loc: Dict[int, Tuple[int, int]] = {}
    batches: List[BatchPlan] = []

    for bidx, (nodes, is_leaf_batch, compress) in enumerate(groups):
        B0 = len(nodes)
        B = _round_up(B0, batch_multiple)  # dummy rows beyond B0 (sharding padding)
        ni = np.zeros(B, dtype=np.int64)
        nb = np.zeros(B, dtype=np.int64)
        ni[:B0] = [len(tree.int_idx[i]) for i in nodes]
        nb[:B0] = [len(tree.bnd_idx[i]) for i in nodes]
        ni_pad = _round_up(int(ni.max()), opts.pad)
        nb_pad = _round_up(int(nb.max()), opts.pad) if nb.max() > 0 else 0
        m_pad = ni_pad + nb_pad

        A_front = np.zeros((B, m_pad, m_pad), dtype=A.dtype)
        diag = np.arange(ni_pad)
        A_front[B0:, diag, diag] = 1.0  # dummy fronts: identity pivot block
        sperm = np.tile(np.arange(nb_pad, dtype=np.int64), (B, 1)) if nb_pad else \
            np.zeros((B, 0), dtype=np.int64)
        int_ids = np.full((B, ni_pad), N, dtype=np.int64)
        bnd_ids = np.full((B, nb_pad), N, dtype=np.int64)

        if not is_leaf_batch:
            ni1 = np.array([len(loc.int_loc[tree.left[i]]) for i in nodes], np.int64)
            ni2 = np.array([len(loc.int_loc[tree.right[i]]) for i in nodes], np.int64)
            nb1 = np.array([len(loc.bnd_loc[tree.left[i]]) for i in nodes], np.int64)
            nb2 = np.array([len(loc.bnd_loc[tree.right[i]]) for i in nodes], np.int64)
            sl = ni1 + nb1
            sr = ni2 + nb2
            sl_pad = max(_round_up(int(sl.max()), opts.pad), 1)
            sr_pad = max(_round_up(int(sr.max()), opts.pad), 1)
            map_l = np.full((B, sl_pad), m_pad, dtype=np.int64)
            map_r = np.full((B, sr_pad), m_pad, dtype=np.int64)
        else:
            sl_pad = sr_pad = 0
            map_l = map_r = None

        groups_l: Dict[int, List[Tuple[int, int]]] = {}
        groups_r: Dict[int, List[Tuple[int, int]]] = {}

        for b, node in enumerate(nodes):
            node = int(node)
            ints = tree.int_idx[node]
            bnds = tree.bnd_idx[node]
            k_i, k_b = len(ints), len(bnds)
            int_ids[b, :k_i] = ints
            bnd_ids[b, :k_b] = bnds
            if k_b:
                sperm[b, :k_b] = np.concatenate([loc.int_loc[node], loc.bnd_loc[node]])

            ord_pos = np.concatenate([
                np.arange(k_i), ni_pad + np.arange(k_b)])
            ord_glob = np.concatenate([ints, bnds])
            Asub = _extract_dense(A_perm, ord_glob, ord_glob)
            if not is_leaf_batch:
                # same-child entries come from the child Schur complements; only the
                # cross-child couplings are taken from A (factorization.jl:115-123)
                l, r = int(tree.left[node]), int(tree.right[node])
                child = np.concatenate([
                    np.zeros(ni1[b]), np.ones(ni2[b]),
                    np.zeros(nb1[b]), np.ones(nb2[b])]).astype(np.int64)
                Asub[child[:, None] == child[None, :]] = 0.0

                # extend-add scatter maps: child S is stored [int_loc; bnd_loc]-permuted
                kl = int(sl[b])
                ml = np.empty(kl, dtype=np.int64)
                ml[: ni1[b]] = np.arange(ni1[b])
                ml[ni1[b]:] = ni_pad + np.arange(nb1[b])
                map_l[b, :kl] = ml
                kr = int(sr[b])
                mr = np.empty(kr, dtype=np.int64)
                mr[: ni2[b]] = ni1[b] + np.arange(ni2[b])
                mr[ni2[b]:] = ni_pad + nb1[b] + np.arange(nb2[b])
                map_r[b, :kr] = mr

                sb_l, sr_l = s_loc[l]
                groups_l.setdefault(sb_l, []).append((sr_l, b))
                sb_r, sr_r = s_loc[r]
                groups_r.setdefault(sb_r, []).append((sr_r, b))

            A_front[b][np.ix_(ord_pos, ord_pos)] = Asub
            # identity on the padded part of the pivot block keeps the batched LU
            # well-defined (the padded rows/cols stay decoupled)
            pad_diag = np.arange(k_i, ni_pad)
            A_front[b, pad_diag, pad_diag] = 1.0
            s_loc[node] = (bidx, b)

        def _mk_groups(gd: Dict[int, List[Tuple[int, int]]]) -> Tuple[ChildGroup, ...]:
            out = []
            for src_batch, pairs in sorted(gd.items()):
                src_rows = np.array([p[0] for p in pairs], dtype=np.int64)
                dst_rows = np.array([p[1] for p in pairs], dtype=np.int64)
                out.append(ChildGroup(src_batch, src_rows, dst_rows))
            return tuple(out)

        lev_arr = np.zeros(B, dtype=np.int64)
        lev_arr[:B0] = levels[nodes]
        rank_cap = 0
        if compress and nb_pad > 0:
            cap = opts.rank_cap if opts.rank_cap > 0 else max(nb_pad // 4, 32)
            rank_cap = min(ni_pad, nb_pad, _round_up(cap, opts.rank_pad))
        batches.append(BatchPlan(
            node_ids=nodes, is_leaf=is_leaf_batch, ni_pad=ni_pad, nb_pad=nb_pad,
            ni=ni, nb=nb, A_front=A_front, sperm=sperm, int_ids=int_ids,
            bnd_ids=bnd_ids, levels=lev_arr, sl_pad=sl_pad, sr_pad=sr_pad,
            map_l=map_l, map_r=map_r, compress=compress and rank_cap > 0,
            rank_cap=rank_cap,
            groups_l=_mk_groups(groups_l), groups_r=_mk_groups(groups_r)))

    nb_root = len(tree.bnd_idx[tree.root])
    return Plan(N=N, perm=perm, batches=batches, tree_depth=depth, nb_root=nb_root,
                A_perm=A_perm, tree=tree, loc=loc, opts=opts)
