"""Graph-cleaning analyses for one de Bruijn round: weak-link
disconnection, local low-depth removal, and bubble popping.

Capability parity with megahit_core `assemble`'s cleaning schedule as the
reference drives it (reference assemble/assemble_wrapper.py:269-286:
`bubble_level: 2, merge_len: 20, merge_similar: 0.95, disconnect_ratio:
0.1, low_local_ratio: 0.2, careful_bubble: kmer < kmax`), re-designed for
the edge-array graph of ops/dbg.py:

- the graph pass (device) hands back dense node ids, degrees and unitig
  labels; every analysis here is vectorized host numpy over those arrays
  (they are O(unitigs), tiny next to the k-mer tables);
- **weak links** (megahit Disconnect): at a branch node, out-edges whose
  multiplicity is < disconnect_ratio x the strongest sibling are cut
  (likewise in-edges). Edge counts are reverse-complement symmetric
  (both strands are counted), so the mirrored edge is cut in the same
  round and the bidirected graph stays consistent;
- **local low depth** (megahit RemoveLocalLowDepth): a short unitig whose
  depth is < low_local_ratio x the mean depth of its branch-neighbors is
  removed — the *local* complement of the global prune_depth gate;
- **bubbles** (megahit PopBubble / complex-bubble merge): unitigs that
  share a single predecessor node a and a single successor node d are
  parallel branches of a bubble. The deepest branch (ties broken by
  canonical sequence, which is orientation-symmetric) survives; others
  are popped when their length is within the level's bound and their
  sequence similarity to the winner is >= merge_similar. Multi-unitig
  ("complex") bubbles are popped by iteration: each fixpoint round pops
  the innermost simple bubbles, the freed chains merge in the next device
  pass, and the enclosing bubble becomes simple — same effect as
  megahit's path search, bounded by the cleaning round count.
- **careful_bubble**: popped branch sequences are returned so the caller
  can re-inject them at the next k (the reference carries bubble_seq.fa
  into `iterate -b`, assemble_wrapper.py:307-315).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

_RC = str.maketrans("ACGT", "TGCA")


def _revcomp(s: str) -> str:
    return s.translate(_RC)[::-1]


def _canonical(s: str) -> str:
    r = _revcomp(s)
    return s if s <= r else r


def edit_distance(a: str, b: str) -> int:
    """Unit-cost Levenshtein distance, vectorized over DP rows.

    The in-row dependency cur[j] = min(m[j], cur[j-1]+1) is solved in
    closed form: cur[j] = j + min_{l<=j}(t[l]) with t[l] = m[l] - l, a
    prefix-min — standard trick for unit edit costs."""
    if a == b:
        return 0
    x = np.frombuffer(a.encode(), np.uint8)
    y = np.frombuffer(b.encode(), np.uint8)
    n = len(y)
    js = np.arange(n + 1, dtype=np.int32)
    prev = js.copy()
    t = np.empty(n + 1, np.int32)
    for i in range(1, len(x) + 1):
        m = np.minimum(prev[:-1] + (y != x[i - 1]), prev[1:] + 1)
        t[0] = i
        t[1:] = m - js[1:]
        prev = np.minimum.accumulate(t) + js
    return int(prev[-1])


def seq_similarity(a: str, b: str) -> float:
    """1 - editdist/maxlen (megahit's bubble similarity measure)."""
    if a == b:
        return 1.0
    if len(a) == len(b):
        x = np.frombuffer(a.encode(), np.uint8)
        y = np.frombuffer(b.encode(), np.uint8)
        return float((x == y).mean())
    return 1.0 - edit_distance(a, b) / max(len(a), len(b))


@dataclass
class CleanParams:
    """Knob set the reference fixes when invoking megahit_core assemble
    (assemble_wrapper.py:269-286)."""

    prune_depth: float = 2.0
    prune_level: int = 2
    bubble_level: int = 2
    merge_len: int = 20          # complex-bubble branch bound, x k bases
    merge_similar: float = 0.95
    disconnect_ratio: float = 0.1
    low_local_ratio: float = 0.2
    careful_bubble: bool = False


@dataclass
class PoppedBubble:
    seq: str
    depth: float


@dataclass
class CleanResult:
    bad_nodes: np.ndarray            # [n] bool — nodes to delete
    bad_edges: np.ndarray            # [E] bool — edges to cut (weak links)
    bubbles: List[PoppedBubble] = field(default_factory=list)

    @property
    def any(self) -> bool:
        return bool(self.bad_nodes.any() or self.bad_edges.any())


def weak_link_edges(
    pre: np.ndarray, suf: np.ndarray, ecnt: np.ndarray,
    out_deg: np.ndarray, in_deg: np.ndarray, ratio: float,
) -> np.ndarray:
    """Cut branch edges whose multiplicity is dwarfed by a sibling
    (megahit Disconnect, ratio = disconnect_ratio).

    Never flags a node's strongest edge, so no node is fully
    disconnected by this pass alone."""
    n = len(out_deg)
    E = len(pre)
    bad = np.zeros(E, dtype=bool)
    if ratio <= 0 or E == 0:
        return bad
    c = ecnt.astype(np.float64)
    out_max = np.zeros(n, np.float64)
    np.maximum.at(out_max, pre, c)
    in_max = np.zeros(n, np.float64)
    np.maximum.at(in_max, suf, c)
    bad |= (out_deg[pre] >= 2) & (c < ratio * out_max[pre]) & (c < out_max[pre])
    bad |= (in_deg[suf] >= 2) & (c < ratio * in_max[suf]) & (c < in_max[suf])
    return bad


def _single_neighbors(
    pre: np.ndarray, suf: np.ndarray, in_deg: np.ndarray, out_deg: np.ndarray,
    entry: np.ndarray, exit_: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """For each unitig: its unique predecessor node (or -1) and unique
    successor node (or -1), resolved by sorted-edge lookups."""
    o_in = np.argsort(suf, kind="stable")
    o_out = np.argsort(pre, kind="stable")
    suf_s, pre_of_in = suf[o_in], pre[o_in]
    pre_s, suf_of_out = pre[o_out], suf[o_out]

    p_in = np.searchsorted(suf_s, entry)
    has_in = (in_deg[entry] == 1) & (p_in < len(suf_s))
    p_in = np.clip(p_in, 0, max(len(suf_s) - 1, 0))
    pred = np.where(has_in & (suf_s[p_in] == entry), pre_of_in[p_in], -1)

    p_out = np.searchsorted(pre_s, exit_)
    has_out = (out_deg[exit_] == 1) & (p_out < len(pre_s))
    p_out = np.clip(p_out, 0, max(len(pre_s) - 1, 0))
    succ = np.where(has_out & (pre_s[p_out] == exit_), suf_of_out[p_out], -1)
    return pred, succ


def pop_bubbles(
    unitigs, pred: np.ndarray, succ: np.ndarray, k: int, params: CleanParams,
    bad_nodes: np.ndarray,
) -> List[PoppedBubble]:
    """Group non-circular unitigs by their (single-pred, single-succ) node
    pair; in each group of parallel branches keep the deepest and pop the
    rest, subject to the level's length bound and merge_similar.

    Orientation symmetry: the reverse-complement twin of every bubble is
    an independent group keyed by the mirrored node pair; because edge
    counts and the canonical-sequence tie-break are strand-symmetric, the
    same branch loses in both, keeping the bidirected graph consistent."""
    popped: List[PoppedBubble] = []
    if params.bubble_level <= 0 or not len(unitigs):
        return popped
    max_branch = (params.merge_len * k if params.bubble_level >= 2
                  else 2 * k + 2)
    cand = [
        j for j, u in enumerate(unitigs)
        if (not u.circular) and pred[j] >= 0 and succ[j] >= 0
        and pred[j] != succ[j] and len(u.seq) <= max_branch
    ]
    if len(cand) < 2:
        return popped
    keys = np.stack(
        [np.asarray([pred[j] for j in cand]), np.asarray([succ[j] for j in cand])],
        axis=1,
    )
    order = np.lexsort((keys[:, 1], keys[:, 0]))
    ks = keys[order]
    starts = np.flatnonzero(
        np.concatenate([[True], (ks[1:] != ks[:-1]).any(axis=1)])
    )
    bounds = np.append(starts, len(order))
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e - s < 2:
            continue
        group = [unitigs[cand[order[i]]] for i in range(s, e)]
        idxs = [cand[order[i]] for i in range(s, e)]
        ranked = sorted(
            range(len(group)),
            key=lambda g: (-group[g].depth, _canonical(group[g].seq)),
        )
        winner = group[ranked[0]]
        for g in ranked[1:]:
            u = group[g]
            if seq_similarity(winner.seq, u.seq) < params.merge_similar:
                continue
            bad_nodes[u.node_ids] = True
            if params.careful_bubble:
                popped.append(PoppedBubble(u.seq, u.depth))
    return popped


def analyze_round(
    unitigs, in_deg: np.ndarray, out_deg: np.ndarray,
    pre: np.ndarray, suf: np.ndarray, ecnt: np.ndarray,
    k: int, params: CleanParams,
) -> CleanResult:
    """One cleaning round over a finished graph pass: tips, global and
    local low depth, weak links, bubbles. Returns node/edge kill masks
    and (careful mode) the popped bubble sequences."""
    n = len(in_deg)
    bad_nodes = np.zeros(n, dtype=bool)
    tip_len = 2 * k
    drop_ratio = {0: 0.0, 1: 0.3, 2: 0.5, 3: 0.7}[params.prune_level]

    depths = np.asarray([u.depth for u in unitigs], np.float64)
    med_depth = float(np.median(depths[depths > 0])) if (depths > 0).any() else 0.0

    # --- weak links (edge-level) -----------------------------------------
    bad_edges = weak_link_edges(pre, suf, ecnt, out_deg, in_deg,
                                params.disconnect_ratio)

    # --- unitig endpoints + single neighbors ------------------------------
    entry = np.asarray([u.node_ids[0] for u in unitigs], np.int64)
    exit_ = np.asarray([u.node_ids[-1] for u in unitigs], np.int64)
    pred, succ = _single_neighbors(pre, suf, in_deg, out_deg, entry, exit_)

    # --- local low depth (megahit RemoveLocalLowDepth analog) -------------
    if params.low_local_ratio > 0 and len(unitigs):
        uidx = np.full(n, -1, np.int64)
        for j, u in enumerate(unitigs):
            uidx[u.node_ids] = j
        # branch edges connect exit(u_a) -> entry(u_b)
        branch = (out_deg[pre] != 1) | (in_deg[suf] != 1)
        ua, ub = uidx[pre[branch]], uidx[suf[branch]]
        ok = (ua >= 0) & (ub >= 0) & (ua != ub)
        nb_sum = np.zeros(len(unitigs), np.float64)
        nb_cnt = np.zeros(len(unitigs), np.float64)
        np.add.at(nb_sum, ua[ok], depths[ub[ok]])
        np.add.at(nb_cnt, ua[ok], 1.0)
        np.add.at(nb_sum, ub[ok], depths[ua[ok]])
        np.add.at(nb_cnt, ub[ok], 1.0)
        with np.errstate(invalid="ignore"):
            local_mean = np.where(nb_cnt > 0, nb_sum / np.maximum(nb_cnt, 1), 0.0)
    else:
        local_mean = np.zeros(len(unitigs), np.float64)

    for j, u in enumerate(unitigs):
        if u.circular:
            continue
        dead_start = in_deg[entry[j]] == 0
        dead_end = out_deg[exit_[j]] == 0
        is_tip = (dead_start or dead_end) and not (dead_start and dead_end) \
            and len(u.seq) < tip_len
        low = (0 < u.depth < params.prune_depth) or (
            drop_ratio > 0 and 0 < u.depth < drop_ratio * med_depth
            and len(u.seq) < tip_len
        )
        local_low = (
            params.low_local_ratio > 0 and local_mean[j] > 0
            and 0 < u.depth < params.low_local_ratio * local_mean[j]
            and len(u.seq) < tip_len
        )
        if is_tip or low or local_low:
            bad_nodes[u.node_ids] = True

    # --- bubbles -----------------------------------------------------------
    bubbles = pop_bubbles(unitigs, pred, succ, k, params, bad_nodes)
    return CleanResult(bad_nodes=bad_nodes, bad_edges=bad_edges, bubbles=bubbles)
