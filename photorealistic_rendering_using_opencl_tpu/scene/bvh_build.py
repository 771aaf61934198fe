"""Host SAH BVH build -> DFS-threaded SoA arrays for stackless traversal.

Replaces the reference's external madmann91/bvh SweepSahBuilder
(``src/BVH/bvh.cpp:43-108``) with a full-sweep SAH builder in numpy, and
replaces the child-pointer node layout (``include/BVH/bvh.h:24-30``) with a
*threaded* DFS layout: every node carries a ``miss`` skip link so device
traversal needs no per-lane stack (ops/intersect.py:bvh_traverse).
Triangles are permuted so every leaf owns a contiguous range (the analogue
of the reference's primitive_indices indirection, triangle.cl:7 -- removed
entirely here).  A C++ builder with the same output lives in runtime/.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

LEAF_SIZE = 4  # must match ops/intersect.py LEAF_SIZE
TRAVERSAL_COST = 1.0
INTERSECT_COST = 1.0


class FlatBVH(NamedTuple):
    bounds_min: np.ndarray  # [M,3]
    bounds_max: np.ndarray  # [M,3]
    miss: np.ndarray  # [M] int32; == M when traversal ends
    first_prim: np.ndarray  # [M] int32
    prim_count: np.ndarray  # [M] int32 (0 for inner nodes)
    order: np.ndarray  # [T] permutation: new position -> original triangle


def build_bvh(tri_verts: np.ndarray) -> FlatBVH:
    """tri_verts [T,3,3] -> flat threaded BVH (sweep SAH, leaf<=LEAF_SIZE).

    Dispatches to the native C++ builder (runtime/csrc/prt_native.cpp) when
    available; set PRT_NO_NATIVE=1 to force this Python implementation.
    """
    from photorealistic_rendering_using_opencl_tpu.runtime import native
    res = native.build_bvh_native(tri_verts)
    if res is not None:
        bmin, bmax, miss, first, count, order = res
        return FlatBVH(bmin, bmax, miss, first, count, order)
    return build_bvh_py(tri_verts)


def build_bvh_py(tri_verts: np.ndarray) -> FlatBVH:
    """Pure-numpy reference implementation of the sweep-SAH build."""
    t = tri_verts.shape[0]
    lo = tri_verts.min(axis=1)  # [T,3]
    hi = tri_verts.max(axis=1)
    centers = (lo + hi) * 0.5

    order = np.arange(t, dtype=np.int64)

    # nodes as parallel python lists built iteratively (explicit stack)
    n_min, n_max, n_first, n_count = [], [], [], []
    n_left: list[int] = []  # child index (-1 leaf), right = left_subtree_end

    def node_bounds(idx):
        return lo[order[idx]].min(axis=0), hi[order[idx]].max(axis=0)

    # recursion via explicit stack; children are emitted in DFS preorder
    # so the "hit" successor of an inner node is node+1.
    stack = [(0, t, -1, False)]  # (begin, end, parent_slot, is_right)
    spans = []  # (begin, end) per node for the second pass
    parents = []

    while stack:
        begin, end, parent, is_right = stack.pop()
        idx = len(n_min)
        if parent >= 0 and is_right:
            n_left[parent] = n_left[parent]  # right child implicitly follows
        seg = order[begin:end]
        bmin = lo[seg].min(axis=0)
        bmax = hi[seg].max(axis=0)
        n_min.append(bmin)
        n_max.append(bmax)
        spans.append((begin, end))
        parents.append(parent)
        count = end - begin

        split = _find_split(lo, hi, centers, order, begin, end)
        if split is None:
            n_first.append(begin)
            n_count.append(count)
            n_left.append(-1)
            continue

        axis, mid = split
        seg_sorted = seg[np.argsort(centers[seg, axis], kind="stable")]
        order[begin:end] = seg_sorted
        n_first.append(0)
        n_count.append(0)
        n_left.append(idx + 1)
        # push right first so left pops first (preorder)
        stack.append((begin + mid, end, idx, True))
        stack.append((begin, begin + mid, idx, False))

    m = len(n_min)
    bounds_min = np.asarray(n_min, np.float32)
    bounds_max = np.asarray(n_max, np.float32)
    first_prim = np.asarray(n_first, np.int32)
    prim_count = np.asarray(n_count, np.int32)

    # second pass: compute subtree extents to derive right-child and miss links
    subtree_end = np.empty(m, np.int64)  # index one past the node's subtree

    def compute_extents():
        # DFS preorder property: subtree of node i is [i, subtree_end[i])
        # walk backwards: leaves end at i+1; inner nodes end at right child's end
        is_leaf = prim_count > 0
        for i in range(m - 1, -1, -1):
            if is_leaf[i]:
                subtree_end[i] = i + 1
            else:
                left = i + 1
                right = subtree_end[left]
                subtree_end[i] = subtree_end[right]

    compute_extents()
    miss = np.empty(m, np.int32)
    miss_stack = [(0, m)]
    while miss_stack:
        i, mlink = miss_stack.pop()
        miss[i] = mlink
        if prim_count[i] == 0:
            left = i + 1
            right = int(subtree_end[left])
            miss_stack.append((left, right))
            miss_stack.append((right, mlink))

    return FlatBVH(bounds_min, bounds_max, miss, first_prim, prim_count,
                   order.astype(np.int64))


def _find_split(lo, hi, centers, order, begin, end):
    """Full-sweep SAH over all 3 axes; None -> make a leaf."""
    count = end - begin
    if count <= 2:
        return None
    seg = order[begin:end]
    best = (np.inf, -1, -1)
    for axis in range(3):
        perm = np.argsort(centers[seg, axis], kind="stable")
        slo = lo[seg][perm]
        shi = hi[seg][perm]
        # prefix/suffix bounding-box surface areas
        pmin = np.minimum.accumulate(slo, axis=0)
        pmax = np.maximum.accumulate(shi, axis=0)
        smin = np.minimum.accumulate(slo[::-1], axis=0)[::-1]
        smax = np.maximum.accumulate(shi[::-1], axis=0)[::-1]

        def area(mn, mx):
            d = np.maximum(mx - mn, 0.0)
            return 2.0 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
                          + d[:, 2] * d[:, 0])

        left_area = area(pmin, pmax)[:-1]
        right_area = area(smin, smax)[1:]
        nl = np.arange(1, count)
        nr = count - nl
        cost = left_area * nl + right_area * nr
        j = int(np.argmin(cost))
        if cost[j] < best[0]:
            best = (cost[j], axis, j + 1)

    whole = np.maximum(hi[seg].max(axis=0) - lo[seg].min(axis=0), 0.0)
    whole_area = 2.0 * (whole[0] * whole[1] + whole[1] * whole[2]
                        + whole[2] * whole[0])
    leaf_cost = INTERSECT_COST * count
    split_cost = TRAVERSAL_COST + best[0] / max(whole_area, 1e-20)
    if count <= LEAF_SIZE and split_cost >= leaf_cost:
        return None
    return best[1], best[2]


def permute_triangles(tri_verts: np.ndarray, tri_normals: np.ndarray,
                      bvh: FlatBVH, pad: int = LEAF_SIZE):
    """Reorder triangles into leaf order and pad for fixed-width leaf tests."""
    v = tri_verts[bvh.order]
    n = tri_normals[bvh.order]
    padv = np.zeros((pad, 3, 3), np.float32)  # degenerate: never hit
    padn = np.zeros((pad, 3, 3), np.float32)
    return (np.concatenate([v, padv], axis=0),
            np.concatenate([n, padn], axis=0))


def pack_for_device(bvh: FlatBVH, tri_verts: np.ndarray,
                    tri_normals: np.ndarray):
    """Device layout: one gather per traversal step instead of nine.

    Returns (nodes[M,8] f32, leaf_verts[L, LEAF_SIZE*9] f32,
    tri_verts_lm[L*LEAF_SIZE,3,3], tri_normals_lm[L*LEAF_SIZE,3,3]).

    * ``nodes`` row: bmin(0:3) | bmax(3:6) | bitcast(miss) |
      bitcast(meta) with meta = (leaf_idx << 3) | count for leaves, 0 for
      inner nodes -- the whole per-step node fetch is a single 32-byte row.
    * triangles are stored leaf-major with every leaf padded to LEAF_SIZE
      slots (degenerate zero triangles never hit), so a leaf's 4 candidate
      triangles come back in ONE gather of its ``leaf_verts`` row.  The hit
      triangle index is leaf_idx * LEAF_SIZE + k into the _lm arrays.
    """
    m = bvh.miss.shape[0]
    is_leaf = bvh.prim_count > 0
    leaf_ids = np.cumsum(is_leaf) - 1  # preorder leaf numbering
    n_leaves = int(is_leaf.sum())

    meta = np.where(is_leaf,
                    (leaf_ids.astype(np.int64) << 3)
                    | bvh.prim_count.astype(np.int64),
                    0).astype(np.int32)
    nodes = np.zeros((m, 8), np.float32)
    nodes[:, 0:3] = bvh.bounds_min
    nodes[:, 3:6] = bvh.bounds_max
    nodes[:, 6] = bvh.miss.view(np.float32)
    nodes[:, 7] = meta.view(np.float32)

    v_sorted = tri_verts[bvh.order].astype(np.float32)
    n_sorted = tri_normals[bvh.order].astype(np.float32)
    lm_v = np.zeros((n_leaves, LEAF_SIZE, 3, 3), np.float32)
    lm_n = np.zeros((n_leaves, LEAF_SIZE, 3, 3), np.float32)
    leaf_nodes = np.nonzero(is_leaf)[0]
    for li, node in enumerate(leaf_nodes):
        first = int(bvh.first_prim[node])
        count = int(bvh.prim_count[node])
        lm_v[li, :count] = v_sorted[first:first + count]
        lm_n[li, :count] = n_sorted[first:first + count]
    leaf_verts = lm_v.reshape(n_leaves, LEAF_SIZE * 9)
    links = thread_octants(bvh)
    return (nodes, leaf_verts,
            lm_v.reshape(n_leaves * LEAF_SIZE, 3, 3),
            lm_n.reshape(n_leaves * LEAF_SIZE, 3, 3),
            links)


def thread_octants(bvh: FlatBVH) -> np.ndarray:
    """Per-ray-octant hit/miss threading -> links [8*M, 2] int32.

    The reference's stack traversal swaps siblings to visit the near child
    first (bvh.cl:181-195).  A skip-link walk cannot reorder on the fly
    (the miss link of a child depends on visit order), so the near-first
    DFS is precomputed for each of the 8 direction octants: ray r uses the
    table slice [oct(r)*M, (oct(r)+1)*M).  hit = next node when the box is
    hit (first child, near-first), miss = skip target; leaves have
    hit == miss.  Ordering key: the children's separation axis (argmax of
    center distance) -- equivalent to the builder's split axis.
    """
    m = bvh.miss.shape[0]
    is_leaf = bvh.prim_count > 0
    centers = (bvh.bounds_min + bvh.bounds_max) * 0.5

    # subtree extents: right child of inner i is subtree_end[i + 1]
    subtree_end = np.empty(m, np.int64)
    for i in range(m - 1, -1, -1):
        subtree_end[i] = i + 1 if is_leaf[i] else subtree_end[subtree_end[i + 1]]

    links = np.empty((8, m, 2), np.int32)
    for oct_ in range(8):
        sign = np.array([oct_ & 1, (oct_ >> 1) & 1, (oct_ >> 2) & 1], bool)
        hit = np.empty(m, np.int32)
        miss = np.empty(m, np.int32)
        stack = [(0, m)]
        while stack:
            i, miss_link = stack.pop()
            miss[i] = miss_link
            if is_leaf[i]:
                hit[i] = miss_link
                continue
            left = i + 1
            right = int(subtree_end[left])
            sep = np.abs(centers[left] - centers[right])
            axis = int(np.argmax(sep))
            left_is_near = centers[left, axis] <= centers[right, axis]
            if sign[axis]:  # negative direction: far-coordinate child first
                left_is_near = not left_is_near
            near, far = (left, right) if left_is_near else (right, left)
            hit[i] = near
            # iterative DFS: push far (resumes at miss_link), then near
            stack.append((far, miss_link))
            stack.append((near, far))
        links[oct_, :, 0] = hit
        links[oct_, :, 1] = miss
    return links.reshape(8 * m, 2)
