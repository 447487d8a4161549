"""Greedy limb assignment + person grouping (host step).

This is the one intentionally-host stage of the body pipeline: the greedy
mutual-exclusion pick over sorted limb candidates and the person-subset merge
are inherently sequential with data-dependent table growth
(reference semantics: src/body.py:166-231). The inputs are tiny (<=24 limbs x
K<=32^2 candidate pairs), so this costs microseconds; all the heavy work
(NMS, PAF integrals) already happened on device.

Implements exactly the reference's rules, including its tie-breaking:
candidates are enumerated in (i, j) row-major order and stably sorted by
score descending (src/body.py:166), a person row is pruned when it has <4
parts or mean part-score < 0.4 (src/body.py:227-231).

Outputs match the reference contract: ``candidate[N,4] = (x, y, score, id)``
and ``subset[P, njoint+2]`` where the last two columns are (total score,
part count) (src/body.py:233-235).
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np


def build_candidates(xy: np.ndarray, score: np.ndarray, count: np.ndarray
                     ) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Fixed-K device peaks -> ragged candidate table with global ids.

    xy: [C,K,2], score: [C,K], count: [C] (from islx.ops.peaks.find_peaks).
    Returns (candidate[N,4], per-channel global-id arrays).
    """
    blocks = []
    ids: List[np.ndarray] = []
    next_id = 0
    for c in range(xy.shape[0]):
        n = int(count[c])
        gid = np.arange(next_id, next_id + n)
        ids.append(gid)
        if n:
            blocks.append(np.column_stack([
                xy[c, :n, 0].astype(np.float64),
                xy[c, :n, 1].astype(np.float64),
                score[c, :n].astype(np.float64),
                gid.astype(np.float64)]))
        next_id += n
    candidate = np.concatenate(blocks, 0) if blocks else np.zeros((0, 4))
    return candidate, ids


def select_connections(limb_score: np.ndarray, limb_ok: np.ndarray,
                       counts: np.ndarray, ids: List[np.ndarray],
                       limb_seq: np.ndarray,
                       pair_score: np.ndarray | None = None
                       ) -> Tuple[List[np.ndarray], List[int]]:
    """Greedy per-limb assignment (reference semantics: src/body.py:140-178).

    limb_score/limb_ok: [L,K,K] from islx.ops.paf.score_limbs.
    Returns (connection_all, special_k): per limb either an [M,5] array of
    (globalA, globalB, score, i, j) or [] when a side has no candidates.
    """
    connection_all: List[np.ndarray] = []
    special_k: List[int] = []
    for k in range(limb_seq.shape[0]):
        a_part, b_part = int(limb_seq[k, 0]), int(limb_seq[k, 1])
        n_a, n_b = int(counts[a_part]), int(counts[b_part])
        if n_a == 0 or n_b == 0:
            special_k.append(k)
            connection_all.append([])
            continue
        ok = limb_ok[k, :n_a, :n_b]
        ii, jj = np.nonzero(ok)
        ss = limb_score[k, ii, jj].astype(np.float64)
        # stable sort, score desc, ties keep (i, j) enumeration order —
        # matches the reference's sorted(..., reverse=True) of an (i, j)-
        # ordered list (src/body.py:142-166)
        order = np.lexsort((jj, ii, -ss))
        used_i = np.zeros(n_a, bool)
        used_j = np.zeros(n_b, bool)
        rows = []
        cap = min(n_a, n_b)
        for t in order:
            i, j = int(ii[t]), int(jj[t])
            if not used_i[i] and not used_j[j]:
                used_i[i] = used_j[j] = True
                rows.append([ids[a_part][i], ids[b_part][j], ss[t],
                             float(i), float(j)])
                if len(rows) >= cap:
                    break
        connection_all.append(np.array(rows, dtype=np.float64)
                              if rows else np.zeros((0, 5)))
    return connection_all, special_k


def select_connections_sorted(pair: np.ndarray, score: np.ndarray,
                              ok: np.ndarray, k: int, counts: np.ndarray,
                              ids: List[np.ndarray], limb_seq: np.ndarray
                              ) -> Tuple[List[np.ndarray], List[int]]:
    """Greedy assignment from device-pre-sorted compact connection lists
    (islx.ops.paf.compact_connections). Same semantics as
    :func:`select_connections`, ~(K*K/M)x less host work and transfer."""
    connection_all: List[np.ndarray] = []
    special_k: List[int] = []
    for li in range(limb_seq.shape[0]):
        a_part, b_part = int(limb_seq[li, 0]), int(limb_seq[li, 1])
        n_a, n_b = int(counts[a_part]), int(counts[b_part])
        if n_a == 0 or n_b == 0:
            special_k.append(li)
            connection_all.append([])
            continue
        used_i = np.zeros(n_a, bool)
        used_j = np.zeros(n_b, bool)
        rows = []
        cap = min(n_a, n_b)
        for t in range(pair.shape[1]):
            if not ok[li, t]:
                break  # sorted: invalid entries are all at the tail
            i, j = divmod(int(pair[li, t]), k)
            if i >= n_a or j >= n_b:
                continue
            if not used_i[i] and not used_j[j]:
                used_i[i] = used_j[j] = True
                rows.append([ids[a_part][i], ids[b_part][j],
                             float(score[li, t]), float(i), float(j)])
                if len(rows) >= cap:
                    break
        connection_all.append(np.array(rows, dtype=np.float64)
                              if rows else np.zeros((0, 5)))
    return connection_all, special_k


def group_people(candidate: np.ndarray, connection_all: List[np.ndarray],
                 special_k: List[int], limb_seq: np.ndarray, njoint: int
                 ) -> np.ndarray:
    """Merge limb connections into person rows (semantics: src/body.py:182-231)."""
    subset = -1 * np.ones((0, njoint + 1))
    for k in range(limb_seq.shape[0]):
        if k in special_k:
            continue
        part_as = connection_all[k][:, 0]
        part_bs = connection_all[k][:, 1]
        index_a, index_b = int(limb_seq[k, 0]), int(limb_seq[k, 1])

        for i in range(len(connection_all[k])):
            found = 0
            subset_idx = [-1, -1]
            for j in range(len(subset)):
                if subset[j][index_a] == part_as[i] or subset[j][index_b] == part_bs[i]:
                    subset_idx[found] = j
                    found += 1

            if found == 1:
                j = subset_idx[0]
                if subset[j][index_b] != part_bs[i]:
                    subset[j][index_b] = part_bs[i]
                    subset[j][-1] += 1
                    subset[j][-2] += (candidate[part_bs[i].astype(int), 2]
                                      + connection_all[k][i][2])
            elif found == 2:
                j1, j2 = subset_idx
                membership = ((subset[j1] >= 0).astype(int)
                              + (subset[j2] >= 0).astype(int))[:-2]
                if len(np.nonzero(membership == 2)[0]) == 0:  # disjoint: merge
                    subset[j1][:-2] += subset[j2][:-2] + 1
                    subset[j1][-2:] += subset[j2][-2:]
                    subset[j1][-2] += connection_all[k][i][2]
                    subset = np.delete(subset, j2, 0)
                else:
                    subset[j1][index_b] = part_bs[i]
                    subset[j1][-1] += 1
                    subset[j1][-2] += (candidate[part_bs[i].astype(int), 2]
                                       + connection_all[k][i][2])
            elif not found and k < njoint - 2:
                row = -1 * np.ones(njoint + 1)
                row[index_a] = part_as[i]
                row[index_b] = part_bs[i]
                row[-1] = 2
                row[-2] = (sum(candidate[connection_all[k][i, :2].astype(int), 2])
                           + connection_all[k][i][2])
                subset = np.vstack([subset, row])

    # prune weak rows (src/body.py:227-231)
    delete_idx = [i for i in range(len(subset))
                  if subset[i][-1] < 4 or subset[i][-2] / subset[i][-1] < 0.4]
    return np.delete(subset, delete_idx, axis=0)


def assemble_sorted(peaks_xy: np.ndarray, peaks_score: np.ndarray,
                    peaks_count: np.ndarray, pair: np.ndarray,
                    score: np.ndarray, ok: np.ndarray, k: int,
                    limb_seq: np.ndarray, njoint: int
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Compact-connection variant of :func:`assemble`."""
    candidate, ids = build_candidates(peaks_xy, peaks_score, peaks_count)
    connection_all, special_k = select_connections_sorted(
        pair, score, ok, k, peaks_count, ids, limb_seq)
    subset = group_people(candidate, connection_all, special_k, limb_seq, njoint)
    return candidate, subset


def assemble(peaks_xy: np.ndarray, peaks_score: np.ndarray,
             peaks_count: np.ndarray, limb_score: np.ndarray,
             limb_ok: np.ndarray, limb_seq: np.ndarray, njoint: int
             ) -> Tuple[np.ndarray, np.ndarray]:
    """Device peak/limb tensors -> reference-contract (candidate, subset)."""
    candidate, ids = build_candidates(peaks_xy, peaks_score, peaks_count)
    connection_all, special_k = select_connections(
        limb_score, limb_ok, peaks_count, ids, limb_seq)
    subset = group_people(candidate, connection_all, special_k, limb_seq, njoint)
    return candidate, subset
