"""Spring topology construction (host-side, reset-time).

Reproduces the reference's KD-tree spring connection
(reference: sim/physics/phystwin.py:263-286 and
experiments/utils/create_rigid_phystwin.py:33-80): for every point, connect
to its nearest neighbours within ``radius`` capped at ``max_neighbours``,
deduplicated, skipping degenerate rest lengths.

Additionally builds the **incidence table** that makes force accumulation
TPU-friendly: instead of the reference's atomic scatter-add
(spring_mass_warp.py:103-104), each particle stores the (padded, fixed-size)
list of springs it participates in with a sign, so per-substep force
gathering is a dense gather + weighted sum — no scatters in the hot loop.
"""

from __future__ import annotations

import numpy as np


def connect_springs(
    points: np.ndarray,
    radius: float,
    max_neighbours: int,
    rest_points: np.ndarray | None = None,
    min_rest_length: float = 1e-4,
) -> tuple[np.ndarray, np.ndarray]:
    """KD-tree hybrid search spring connection.

    Args:
      points: (N, 3) positions used for neighbour search.
      radius: connection radius.
      max_neighbours: cap on neighbours per point (including self).
      rest_points: positions used for rest lengths (defaults to ``points``).
    Returns:
      springs (S, 2) int32, rest_lengths (S,) float32.
    """
    from scipy.spatial import cKDTree

    points = np.asarray(points, np.float64)
    rest_points = points if rest_points is None else np.asarray(rest_points, np.float64)
    tree = cKDTree(points)

    # hybrid search semantics (open3d search_hybrid_vector_3d): the k nearest
    # neighbours that also lie within radius
    dists, idxs = tree.query(points, k=max_neighbours, distance_upper_bound=radius)

    n = len(points)
    seen = set()
    springs = []
    rests = []
    for i in range(n):
        for k in range(1, max_neighbours):  # skip self (k=0)
            j = idxs[i, k]
            if j >= n:  # cKDTree pads missing neighbours with n
                break
            rest = float(np.linalg.norm(rest_points[i] - rest_points[j]))
            key = (i, j) if i < j else (j, i)
            if key in seen or rest <= min_rest_length:
                continue
            seen.add(key)
            springs.append([i, j])
            rests.append(rest)

    if not springs:
        return np.zeros((0, 2), np.int32), np.zeros((0,), np.float32)
    return np.asarray(springs, np.int32), np.asarray(rests, np.float32)


def connect_springs_grouped(
    points: np.ndarray,
    group_mask: np.ndarray,
    radius: float,
    max_neighbours: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Connect springs independently inside each mask group (reference:
    create_rigid_phystwin.py:86-137 masked branch)."""
    springs_all, rests_all = [], []
    for value in np.unique(group_mask):
        sel = np.where(group_mask == value)[0]
        s, r = connect_springs(points[sel], radius, max_neighbours)
        if len(s):
            springs_all.append(sel[s])
            rests_all.append(r)
    if not springs_all:
        return np.zeros((0, 2), np.int32), np.zeros((0,), np.float32)
    return (np.concatenate(springs_all).astype(np.int32),
            np.concatenate(rests_all).astype(np.float32))


def build_neighbor_tables(
    springs: np.ndarray, rest_lengths: np.ndarray, spring_Y_log: np.ndarray,
    n_points: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-particle neighbor formulation of the spring system.

    Instead of per-spring forces + endpoint accumulation (two big gathers),
    each particle stores its neighbor particle indices with the spring's
    rest length and log-stiffness baked in, so the whole force evaluation
    is ONE packed gather of x/v at the neighbors (each spring is simply
    evaluated from both ends — symmetric, so identical forces).

    Returns (nbr_idx (N, D) i32 — padded with the particle's own index,
    nbr_rest (N, D) f32 — padding 1.0, nbr_Y_log (N, D) f32 — padding -inf
    so exp() -> 0 disables the slot).
    """
    lists: list[list[tuple[int, float, float]]] = [[] for _ in range(n_points)]
    for s, (i, j) in enumerate(np.asarray(springs)):
        r = float(rest_lengths[s])
        y = float(spring_Y_log[s])
        lists[int(i)].append((int(j), r, y))
        lists[int(j)].append((int(i), r, y))
    deg = max(1, max((len(l) for l in lists), default=0))
    nbr_idx = np.tile(np.arange(n_points, dtype=np.int32)[:, None], (1, deg))
    nbr_rest = np.ones((n_points, deg), np.float32)
    nbr_Y = np.full((n_points, deg), -np.inf, np.float32)
    for p, l in enumerate(lists):
        for d, (j, r, y) in enumerate(l):
            nbr_idx[p, d] = j
            nbr_rest[p, d] = r
            nbr_Y[p, d] = y
    return nbr_idx, nbr_rest, nbr_Y


def build_rolled_tables(
    springs: np.ndarray, rest_lengths: np.ndarray, spring_Y_log: np.ndarray,
    n_points: int, max_offsets: int = 128,
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Offset-structured spring tables for chain-like topologies.

    When particles are ordered such that every spring connects indices
    within a bounded window (ropes and other 1D-ish objects naturally are),
    the neighbor gather becomes a set of jnp.roll's — pure vector ops, zero
    gathers: for each distinct index offset o, slot tables hold the spring
    params of the (i, i+o) spring at row i (or -inf stiffness when absent).

    Returns (offsets (O,) int, rest (O, N) f32, Y_log (O, N) f32), or None
    when the topology has too many distinct offsets to be worth it.
    """
    springs = np.asarray(springs)
    if len(springs) == 0:
        return None
    deltas_all = np.concatenate([springs[:, 1] - springs[:, 0],
                                 springs[:, 0] - springs[:, 1]])
    offsets = np.unique(deltas_all)
    if len(offsets) > max_offsets:
        return None
    off_index = {int(o): k for k, o in enumerate(offsets)}
    O = len(offsets)
    rest = np.ones((O, n_points), np.float32)
    Y = np.full((O, n_points), -np.inf, np.float32)
    for s, (i, j) in enumerate(springs):
        for a, b in ((int(i), int(j)), (int(j), int(i))):
            k = off_index[b - a]
            rest[k, a] = rest_lengths[s]
            Y[k, a] = spring_Y_log[s]
    return offsets.astype(np.int32), rest, Y


def build_rolled_tables_maybe_reordered(
    springs, rest_lengths, spring_Y_log, n_points, max_offsets: int = 128,
):
    """Rolled tables in checkpoint order, else after RCM reordering.

    Returns (rolled_or_None, perm_or_None): when perm is not None the
    tables index INTERNAL order perm[k] and consumers must permute state
    at their boundary (physics/pallas_step.py does)."""
    rolled = build_rolled_tables(springs, rest_lengths, spring_Y_log,
                                 n_points, max_offsets)
    if rolled is not None or len(np.asarray(springs)) == 0:
        return rolled, None
    perm = rcm_order(springs, n_points)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n_points, dtype=np.int32)
    rolled_p = build_rolled_tables(inv[np.asarray(springs)], rest_lengths,
                                   spring_Y_log, n_points, max_offsets)
    if rolled_p is None:
        return None, None
    return rolled_p, perm


def rcm_order(springs: np.ndarray, n_points: int) -> np.ndarray:
    """Reverse Cuthill-McKee ordering of the spring graph.

    Minimizing the index bandwidth max|i-j| over springs is what makes the
    rolled (offset-structured) tables — and with them the fused Pallas
    substep kernel — applicable to volumetric objects whose checkpoint
    point order is arbitrary (e.g. the sloth): after RCM, neighbours sit
    within a small index window. Returns perm with perm[k] = original index
    of the particle at new position k.
    """
    adj: list[list[int]] = [[] for _ in range(n_points)]
    for i, j in np.asarray(springs):
        adj[int(i)].append(int(j))
        adj[int(j)].append(int(i))
    deg = np.array([len(a) for a in adj])
    visited = np.zeros(n_points, bool)
    order: list[int] = []
    # BFS from the minimum-degree node of each component, neighbours by
    # ascending degree (classic CM), then reverse
    for start in np.argsort(deg):
        if visited[start]:
            continue
        queue = [int(start)]
        visited[start] = True
        while queue:
            v = queue.pop(0)
            order.append(v)
            nbrs = sorted((u for u in adj[v] if not visited[u]),
                          key=lambda u: deg[u])
            for u in nbrs:
                visited[u] = True
                queue.append(u)
    return np.asarray(order[::-1], np.int32)


def bandwidth(springs: np.ndarray, perm: np.ndarray | None = None) -> int:
    """max|i-j| over springs (optionally after applying a permutation)."""
    springs = np.asarray(springs)
    if len(springs) == 0:
        return 0
    if perm is not None:
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm), dtype=perm.dtype)
        springs = inv[springs]
    return int(np.abs(springs[:, 0] - springs[:, 1]).max())


def build_incidence(
    springs: np.ndarray, n_points: int, pad_to: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Per-particle incident-spring table.

    Returns:
      inc_idx: (N, D) int32 — spring indices; padding entries point at
        index S (one past the end; callers append a zero force row).
      inc_sign: (N, D) float32 — +1 if the particle is the spring's first
        endpoint (force added), -1 if second (force subtracted), 0 padding.
        Sign convention matches eval_springs' atomic_add/atomic_sub
        (spring_mass_warp.py:103-104).
    """
    n_springs = len(springs)
    lists: list[list[tuple[int, float]]] = [[] for _ in range(n_points)]
    for s, (i, j) in enumerate(np.asarray(springs)):
        lists[int(i)].append((s, 1.0))
        lists[int(j)].append((s, -1.0))
    deg = max((len(l) for l in lists), default=0)
    if pad_to is not None:
        deg = max(deg, pad_to)
    deg = max(deg, 1)
    inc_idx = np.full((n_points, deg), n_springs, np.int32)
    inc_sign = np.zeros((n_points, deg), np.float32)
    for p, l in enumerate(lists):
        for d, (s, sign) in enumerate(l):
            inc_idx[p, d] = s
            inc_sign[p, d] = sign
    return inc_idx, inc_sign
