"""Native (C++) runtime parity: BVH builder and OBJ loader vs pure Python.

The native library (runtime/csrc/prt_native.cpp) is the fast host path for
one-time scene setup; these tests pin it to the Python reference semantics
(scene/bvh_build.py, scene/obj.py).
"""
import os
import textwrap

import numpy as np
import pytest

from photorealistic_rendering_using_opencl_tpu.runtime import native
from photorealistic_rendering_using_opencl_tpu.scene import bvh_build
from photorealistic_rendering_using_opencl_tpu.scene.obj import (
    load_obj_py, make_icosphere,
)

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable")


def _brute_force_closest(tri_verts, origin, direction):
    """Reference closest-hit t per ray against all triangles (numpy)."""
    p0, p1, p2 = tri_verts[:, 0], tri_verts[:, 1], tri_verts[:, 2]
    e1 = p0 - p1
    e2 = p2 - p0
    n = np.cross(e1, e2)  # [T,3]
    best = np.full(origin.shape[0], np.inf)
    for r in range(origin.shape[0]):
        c = p0 - origin[r]
        rr = np.cross(direction[r], c)
        den = n @ direction[r]
        den = np.where(np.abs(den) < 1e-20, 1e-20, den)
        u = np.sum(rr * e2, axis=-1) / den
        v = np.sum(rr * e1, axis=-1) / den
        w = 1.0 - u - v
        t = np.sum(n * c, axis=-1) / den
        ok = (u >= 0) & (v >= 0) & (w >= 0) & (t > 1e-5)
        if ok.any():
            best[r] = t[ok].min()
    return best


def _traverse_closest(bvh, tri_sorted, origin, direction):
    """Walk the threaded BVH on the host; returns closest t per ray."""
    m = bvh.miss.shape[0]
    out = np.full(origin.shape[0], np.inf)
    for r in range(origin.shape[0]):
        o, d = origin[r], direction[r]
        inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
        node = 0
        while node < m:
            t_lo = (bvh.bounds_min[node] - o) * inv
            t_hi = (bvh.bounds_max[node] - o) * inv
            entry = np.maximum(np.minimum(t_lo, t_hi).max(), 1e-5)
            exit_ = np.minimum(np.maximum(t_lo, t_hi).min(), out[r])
            if entry <= exit_:
                cnt = bvh.prim_count[node]
                if cnt > 0:
                    first = bvh.first_prim[node]
                    seg = tri_sorted[first:first + cnt]
                    t = _brute_force_closest(seg, o[None], d[None])[0]
                    out[r] = min(out[r], t)
                    node = bvh.miss[node]
                else:
                    node = node + 1
            else:
                node = bvh.miss[node]
        # leaves visited; out[r] holds closest
    return out


def _check_invariants(bvh, tri_verts):
    m = bvh.miss.shape[0]
    t = tri_verts.shape[0]
    assert bvh.order.shape == (t,)
    assert sorted(bvh.order.tolist()) == list(range(t))
    # leaves partition [0, t) contiguously in preorder
    leaves = np.nonzero(bvh.prim_count > 0)[0]
    spans = sorted((int(bvh.first_prim[i]),
                    int(bvh.first_prim[i] + bvh.prim_count[i]))
                   for i in leaves)
    pos = 0
    for lo, hi in spans:
        assert lo == pos
        pos = hi
    assert pos == t
    assert (bvh.prim_count <= bvh_build.LEAF_SIZE).all()
    # miss links point strictly forward and stay in range
    assert (bvh.miss > np.arange(m)).all()
    assert (bvh.miss <= m).all()
    # node bounds contain their primitives
    sorted_tris = tri_verts[bvh.order]
    for i in leaves[:64]:
        seg = sorted_tris[bvh.first_prim[i]:bvh.first_prim[i]
                          + bvh.prim_count[i]]
        assert (seg.reshape(-1, 3) >= bvh.bounds_min[i] - 1e-4).all()
        assert (seg.reshape(-1, 3) <= bvh.bounds_max[i] + 1e-4).all()


def test_native_bvh_matches_python():
    tri_v, _ = make_icosphere(subdiv=2, radius=0.8)
    nat = bvh_build.build_bvh(tri_v)  # dispatches native
    py = bvh_build.build_bvh_py(tri_v)
    _check_invariants(nat, tri_v)
    _check_invariants(py, tri_v)

    rng = np.random.default_rng(0)
    origin = rng.normal(size=(32, 3)).astype(np.float32) * 2.0
    direction = rng.normal(size=(32, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)

    ref = _brute_force_closest(tri_v, origin, direction)
    t_nat = _traverse_closest(nat, tri_v[nat.order], origin, direction)
    t_py = _traverse_closest(py, tri_v[py.order], origin, direction)
    np.testing.assert_allclose(t_nat, ref, rtol=1e-4)
    np.testing.assert_allclose(t_py, ref, rtol=1e-4)


def test_native_bvh_single_triangle():
    tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    bvh = bvh_build.build_bvh(tri)
    assert bvh.miss.shape[0] == 1
    assert bvh.prim_count[0] == 1
    _check_invariants(bvh, tri)


OBJ_WITH_NORMALS = textwrap.dedent("""\
    v 0 0 0
    v 1 0 0
    v 1 1 0
    v 0 1 0
    vn 0 0 1
    f 1//1 2//1 3//1 4//1
""")

OBJ_NO_NORMALS = textwrap.dedent("""\
    v 0 0 0
    v 1 0 0
    v 0 1 0
    v 0 0 1
    f 1 2 3
    f 1 3 4
    f -4 -2 -3
""")


@pytest.mark.parametrize("body,name", [(OBJ_WITH_NORMALS, "quad_vn"),
                                       (OBJ_NO_NORMALS, "tris_smooth")])
def test_native_obj_matches_python(tmp_path, body, name):
    p = tmp_path / f"{name}.obj"
    p.write_text(body)
    v_nat, n_nat = native.load_obj_native(str(p))
    v_py, n_py = load_obj_py(str(p))
    np.testing.assert_allclose(v_nat, v_py, atol=1e-6)
    np.testing.assert_allclose(n_nat, n_py, atol=1e-5)
    # smooth normals of opposing faces may cancel to zero; nonzero ones unit
    ln = np.linalg.norm(n_nat, axis=-1)
    assert np.all((ln < 1e-6) | (np.abs(ln - 1.0) < 1e-4))


def test_native_obj_missing_file():
    with pytest.raises(FileNotFoundError):
        native.load_obj_native("/nonexistent/never.obj")
