"""Independent numpy oracle: a direct port of the REFERENCE integrator.

This file is a from-scratch numpy implementation of the reference's light
transport semantics -- ``kernels/integrators/pathtracing.cl:4-120`` and
``base.cl:31-192`` -- for Lambert-only analytic scenes (BASELINE config 1).
It shares NO code with the JAX renderer (no imports from the package): its
purpose is to pin the *reference's* estimator so tests/test_oracle.py fails
if the JAX renderer ever drifts from reference semantics rather than merely
from its own past (VERDICT round 1, "independent forward-radiance oracle").

Structure mirrors the reference launch loop literally (SURVEY §1):

  per launch:  intersect -> miss: env, reset
                         -> light: emission iff wasSpecular||!lightSampling
                                   (pathtracing.cl:76-84), reset
                         -> surface: handleSurface = bsdfSample (BSDF dir,
                                   OWN intersect, MIS-weighted light hit,
                                   base.cl:31-77) + lightSample (area/cap
                                   sample, shadow ray, MIS, base.cl:79-134)
               russian roulette (bounce>2, maxThroughput<0.1,
                                 pathtracing.cl:97-106)
               per-lobe budget termination (pathtracing.cl:108-115)

Deliberate deviations, matching the JAX renderer's documented fixes:
  * sub-pixel jitter (the reference aims at pixel corners, camera.cl:32-33);
  * sphere cap sampling returns the actual cap direction (the reference
    splats the scalar cosTheta, sphere.cl:84);
  * Lambert pdf has a return value (Lambert.cl:30 UB).

Everything is vectorized over paths with numpy ONLY as a speed measure --
the control flow per path is the reference's.
"""
from __future__ import annotations

import json

import numpy as np

EPS = 1e-5
RAY_INF = 20.0  # header.cl:5 INF=2e1f: max ray t is 20 world units
INV_PI = 1.0 / np.pi


# ---------------------------------------------------------------------------
# Scene: parsed straight from the JSON (no package imports)
# ---------------------------------------------------------------------------

class OracleScene:
    def __init__(self, path: str, mesh_verts=None, mesh_normals=None,
                 mesh_mat=None):
        """``mesh_verts``/``mesh_normals`` ([T,3,3] numpy, degenerate
        padding rows allowed) add a triangle mesh with material
        ``mesh_mat`` (a JSON-style material dict) -- the geometry DATA may
        come from anywhere (it is input, not estimator code); the
        intersection/shading math here stays an independent port."""
        with open(path) as f:
            doc = json.load(f)
        s = doc.get("settings", {})
        self.max_bounces = int(s.get("MAX_BOUNCES", 4))
        self.max_diff = int(s.get("MAX_DIFF_BOUNCES", 4))

        self.max_spec = int(s.get("MAX_SPEC_BOUNCES", 4))
        self.max_trans = int(s.get("MAX_TRANS_BOUNCES", 12))
        self.max_scatter = int(s.get("MAX_SCATTERING_EVENTS", 12))

        # global medium (scene.h:150-158: scalar sigmas premultiplied by
        # density; sigmaT = sigmaA + sigmaS)
        gm = doc.get("global_medium")
        self.has_medium = gm is not None
        density = float(gm.get("density", 0.1)) if gm else 0.0
        self.sigma_a = np.full(3, density * float(gm.get("sigmaA", 0.2))
                               if gm else 0.0)
        self.sigma_s = np.full(3, density * float(gm.get("sigmaS", 1.0))
                               if gm else 0.0)
        self.sigma_t = self.sigma_a + self.sigma_s
        self.absorption_only = self.has_medium and self.sigma_s.max() == 0.0

        sc = doc["scene"]
        sph = sc.get("spheres", [])
        self.sph_c = np.array([q["pos"] for q in sph], np.float64).reshape(-1, 3)
        self.sph_r = np.array([q["radius"] for q in sph], np.float64)
        self.sph_col = np.array([q["material"]["color"] for q in sph],
                                np.float64).reshape(-1, 3)
        self.sph_light = np.array(
            [int(q["material"].get("type", 1)) == 0 for q in sph], bool)

        quads = sc.get("quads", [])
        v = np.array([q["vertices"] for q in quads], np.float64).reshape(-1, 3, 3)
        self.q_base = v[:, 0] if len(quads) else np.zeros((0, 3))
        self.q_e0 = v[:, 1] if len(quads) else np.zeros((0, 3))
        self.q_e1 = v[:, 2] if len(quads) else np.zeros((0, 3))
        cr = np.cross(self.q_e0, self.q_e1)
        self.q_area = np.linalg.norm(cr, axis=-1)
        self.q_n = cr / np.maximum(self.q_area[:, None], 1e-20)
        self.q_col = np.array([q["material"]["color"] for q in quads],
                              np.float64).reshape(-1, 3)
        self.q_light = np.array(
            [int(q["material"].get("type", 1)) == 0 for q in quads], bool)

        # material table across [spheres | quads] in scene order
        # (include/Types/material.h: JSON "type": n -> bit 1<<n;
        # 0 LIGHT, 1 DIFF, 3 DIEL, 10 ROUGH_COND; "dist": 2 -> GGX)
        def mat_row(m):
            t = int(m.get("type", 1))
            return dict(
                t=t,
                rough=float(m.get("roughness", 0.0)),
                dist=int(m.get("dist", 0)),  # 0 Beckmann, 2 GGX
                eta_t=float(m.get("eta", [1.5121])[0]
                            if isinstance(m.get("eta"), list)
                            else m.get("eta", 1.5121)),
                cond_eta=np.array(m.get("eta", (0.17229, 0.36901, 1.5478)),
                                  np.float64)[:3],
                cond_k=np.array(m.get("k", (4.2223, 2.4628, 1.8063)),
                                np.float64)[:3],
            )
        # optional triangle mesh (one material slot, like the reference's
        # separate obj material buffer, src/main.cpp:404-405)
        self.has_mesh = mesh_verts is not None
        if self.has_mesh:
            self.tri_v = np.asarray(mesh_verts, np.float64)
            self.tri_n = np.asarray(mesh_normals, np.float64)
            e1 = self.tri_v[:, 1] - self.tri_v[:, 0]
            e2 = self.tri_v[:, 2] - self.tri_v[:, 0]
            self.tri_live = np.linalg.norm(np.cross(e1, e2), axis=-1) > 1e-20
            self.mesh_col = np.array(mesh_mat.get("color", [1.0, 1.0, 1.0]),
                                     np.float64)
        else:
            self.tri_v = np.zeros((0, 3, 3))
            self.tri_n = np.zeros((0, 3, 3))
            self.tri_live = np.zeros((0,), bool)
            self.mesh_col = np.zeros(3)

        self.mats = ([mat_row(q["material"]) for q in sph]
                     + [mat_row(q["material"]) for q in quads]
                     + ([mat_row(mesh_mat)] if self.has_mesh else []))
        self.m_t = np.array([m["t"] for m in self.mats], np.int32)
        self.m_rough = np.array([m["rough"] for m in self.mats])
        self.m_dist = np.array([m["dist"] for m in self.mats], np.int32)
        self.m_eta_t = np.array([m["eta_t"] for m in self.mats])
        self.m_ceta = np.array([m["cond_eta"] for m in self.mats])
        self.m_ck = np.array([m["cond_k"] for m in self.mats])

        # single NEE light, LIGHT_INDICES[0] (base.cl:9,92): first light in
        # scene order (spheres precede quads, scene.h:262-469)
        lights = ([("s", i) for i in range(len(sph)) if self.sph_light[i]]
                  + [("q", i) for i in range(len(quads)) if self.q_light[i]])
        assert lights, "oracle scene needs a light"
        self.light = lights[0]


# ---------------------------------------------------------------------------
# Geometry (sphere.cl:5-41, quad.cl:11-38; one-sided quads)
# ---------------------------------------------------------------------------

def _sphere_t(o, d, c, r):
    p = o - c
    b = np.sum(p * d, axis=-1)
    cc = np.sum(p * p, axis=-1) - r * r
    det2 = b * b - cc
    det = np.sqrt(np.maximum(det2, 0.0))
    t0 = -b - det
    t1 = -b + det
    t = np.where(t0 > EPS, t0, np.where(t1 > EPS, t1, np.inf))
    return np.where(det2 >= EPS * EPS, t, np.inf)


def _quad_t(o, d, base, e0, e1, n):
    ndotw = np.sum(n * d, axis=-1)
    anchor = base - (e0 + e1) * 0.5
    denom = np.where(np.abs(ndotw) < 1e-12, 1e-12, ndotw)
    rt = np.sum(n * (anchor - o), axis=-1) / denom
    q = o + rt[..., None] * d
    v = q - anchor
    l0 = np.sum(v * e0, axis=-1) / np.sum(e0 * e0, axis=-1)
    l1 = np.sum(v * e1, axis=-1) / np.sum(e1 * e1, axis=-1)
    ok = ((ndotw >= 1e-5) & (rt > EPS)
          & (l0 >= 0.0) & (l0 <= 1.0) & (l1 >= 0.0) & (l1 <= 1.0))
    return np.where(ok, rt, np.inf)


def _tri_all(o, d, tri_v, live):
    """Classic Moller-Trumbore, every ray vs every triangle -> (t[N,T],
    u[N,T], v[N,T]); u weights vertex 1, v weights vertex 2."""
    p0, p1, p2 = tri_v[:, 0], tri_v[:, 1], tri_v[:, 2]
    e1 = p1 - p0  # [T,3]
    e2 = p2 - p0
    pv = np.cross(d[:, None, :], e2[None])  # [N,T,3]
    det = np.sum(e1[None] * pv, axis=-1)
    inv = 1.0 / np.where(np.abs(det) < 1e-14,
                         np.copysign(1e-14, det), det)
    tv = o[:, None, :] - p0[None]
    u = np.sum(tv * pv, axis=-1) * inv
    qv = np.cross(tv, e1[None])
    v = np.sum(d[:, None, :] * qv, axis=-1) * inv
    t = np.sum(e2[None] * qv, axis=-1) * inv
    ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > EPS)
          & live[None])
    return np.where(ok, t, np.inf), u, v


def intersect(sc: OracleScene, o, d):
    """Closest hit -> (t, kind, idx, normal, color, is_light, mid).

    kind: 0 sphere, 1 quad, 2 mesh triangle, -1 miss; mid is the
    material-table row.  Normal resolved against the ray EXCEPT for
    purely-transmissive dielectrics (intersect.cl:222-233) whose outward
    normal encodes inside/outside through wi.z's sign.
    """
    n = o.shape[0]
    best_t = np.full(n, RAY_INF)
    kind = np.full(n, -1, np.int8)
    idx = np.zeros(n, np.int32)
    for i in range(len(sc.sph_r)):
        t = _sphere_t(o, d, sc.sph_c[i], sc.sph_r[i])
        m = t < best_t
        best_t = np.where(m, t, best_t)
        kind = np.where(m, 0, kind)
        idx = np.where(m, i, idx)
    for i in range(len(sc.q_area)):
        t = _quad_t(o, d, sc.q_base[i], sc.q_e0[i], sc.q_e1[i], sc.q_n[i])
        m = t < best_t
        best_t = np.where(m, t, best_t)
        kind = np.where(m, 1, kind)
        idx = np.where(m, i, idx)
    tri_u = tri_vv = None
    if sc.has_mesh:
        tt, uu, vv = _tri_all(o, d, sc.tri_v, sc.tri_live)
        tmin = tt.min(axis=1)
        targ = tt.argmin(axis=1).astype(np.int32)
        m = tmin < best_t
        best_t = np.where(m, tmin, best_t)
        kind = np.where(m, 2, kind)
        idx = np.where(m, targ, idx)
        rows = np.arange(n)
        tri_u = uu[rows, targ]
        tri_vv = vv[rows, targ]

    pos = o + best_t[:, None] * d
    normal = np.zeros((n, 3))
    color = np.zeros((n, 3))
    is_light = np.zeros(n, bool)
    mid = np.zeros(n, np.int32)
    nsph = len(sc.sph_r)
    for i in range(nsph):
        m = (kind == 0) & (idx == i)
        normal[m] = (pos[m] - sc.sph_c[i]) / sc.sph_r[i]
        color[m] = sc.sph_col[i]
        is_light[m] = sc.sph_light[i]
        mid[m] = i
    for i in range(len(sc.q_area)):
        m = (kind == 1) & (idx == i)
        normal[m] = sc.q_n[i]
        color[m] = sc.q_col[i]
        is_light[m] = sc.q_light[i]
        mid[m] = nsph + i
    if sc.has_mesh:
        m = kind == 2
        tn = sc.tri_n[idx[m]]  # [M,3,3]
        w0 = (1.0 - tri_u[m] - tri_vv[m])[:, None]
        sm = (w0 * tn[:, 0] + tri_u[m][:, None] * tn[:, 1]
              + tri_vv[m][:, None] * tn[:, 2])
        sm /= np.maximum(np.linalg.norm(sm, axis=-1, keepdims=True), 1e-20)
        normal[m] = sm
        color[m] = sc.mesh_col
        mid[m] = nsph + len(sc.q_area)
    is_diel = (sc.m_t[mid] == 3) & (kind >= 0)
    back = np.sum(normal * d, axis=-1) > 0.0
    normal = np.where((back & ~is_diel)[:, None], -normal, normal)
    return best_t, kind, idx, normal, color, is_light, mid


def occluded(sc: OracleScene, o, d, dist, skip_mesh=False):
    limit = dist * (1.0 - 1e-3)
    blocked = np.zeros(o.shape[0], bool)
    for i in range(len(sc.sph_r)):
        blocked |= _sphere_t(o, d, sc.sph_c[i], sc.sph_r[i]) < limit
    for i in range(len(sc.q_area)):
        blocked |= _quad_t(o, d, sc.q_base[i], sc.q_e0[i], sc.q_e1[i],
                           sc.q_n[i]) < limit
    if sc.has_mesh and not skip_mesh:
        tt, _, _ = _tri_all(o, d, sc.tri_v, sc.tri_live)
        blocked |= tt.min(axis=1) < limit
    return blocked


# ---------------------------------------------------------------------------
# Sampling helpers (utils.cl:92-169 semantics)
# ---------------------------------------------------------------------------

def _onb(n):
    """Any orthonormal frame with n as +z (frame azimuth is irrelevant for
    the rotationally-symmetric samples used here)."""
    s = np.where(n[..., 2:3] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2:3])
    b = n[..., 0:1] * n[..., 1:2] * a
    t = np.concatenate([1.0 + s * n[..., 0:1] ** 2 * a, s * b,
                        -s * n[..., 0:1]], axis=-1)
    bt = np.concatenate([b, s + n[..., 1:2] ** 2 * a, -n[..., 1:2]], axis=-1)
    return t, bt


def _to_global(n, v):
    t, bt = _onb(n)
    return t * v[..., 0:1] + bt * v[..., 1:2] + n * v[..., 2:3]


def cosine_hemisphere_world(rng, n):
    u1 = rng.random(n.shape[0])
    u2 = rng.random(n.shape[0])
    phi = 2.0 * np.pi * u1
    r = np.sqrt(u2)
    local = np.stack([np.cos(phi) * r, np.sin(phi) * r,
                      np.sqrt(np.maximum(1.0 - u2, 0.0))], axis=-1)
    return _to_global(n, local), local[..., 2] * INV_PI


def power_heuristic(p0, p1):
    return p0 * p0 / np.maximum(p0 * p0 + p1 * p1, 1e-30)


def _to_local(n, v):
    t, bt = _onb(n)
    return np.stack([np.sum(t * v, -1), np.sum(bt * v, -1),
                     np.sum(n * v, -1)], axis=-1)


# ---------------------------------------------------------------------------
# GGX microfacet + Fresnel (kernels/bxdf/microfacet.cl GGX branches,
# Fresnel.cl conductorReflectance/dielectricReflectance) -- independent
# numpy forms of the same canonical Tungsten math
# ---------------------------------------------------------------------------

def ggx_D(alpha, m):
    mz = m[..., 2]
    c2 = mz * mz
    t2 = np.maximum(1.0 - c2, 0.0) / np.maximum(c2, 1e-12)
    a2 = alpha * alpha
    d = a2 * INV_PI / np.maximum(c2 * c2 * (a2 + t2) ** 2, 1e-30)
    return np.where(mz <= 0.0, 0.0, d)


def ggx_G1(alpha, v, m):
    vz = v[..., 2]
    back = np.sum(v * m, axis=-1) * vz <= 0.0
    c2 = vz * vz
    t2 = np.maximum(1.0 - c2, 0.0) / np.maximum(c2, 1e-12)
    g = 2.0 / (1.0 + np.sqrt(1.0 + alpha * alpha * t2))
    return np.where(back, 0.0, g)


def ggx_G(alpha, wi, wo, m):
    return ggx_G1(alpha, wi, m) * ggx_G1(alpha, wo, m)


def ggx_pdf(alpha, m):
    return ggx_D(alpha, m) * np.maximum(m[..., 2], 0.0)


def ggx_sample(alpha, u1, u2):
    phi = u2 * 2.0 * np.pi
    xs = np.clip(u1, 0.0, 1.0 - 1e-7)
    t2 = alpha * alpha * xs / (1.0 - xs)
    cos_t = 1.0 / np.sqrt(1.0 + t2)
    r = np.sqrt(np.maximum(1.0 - cos_t * cos_t, 0.0))
    return np.stack([np.cos(phi) * r, np.sin(phi) * r, cos_t], axis=-1)


def conductor_fresnel_rgb(eta, k, cos_i):
    """conductorReflectance (Fresnel.cl), exact form, per channel."""
    c = np.maximum(cos_i, 0.0)[..., None]
    c2 = c * c
    s2 = 1.0 - c2
    e2 = eta * eta
    k2 = k * k
    t0 = e2 - k2 - s2
    a2b2 = np.sqrt(np.maximum(t0 * t0 + 4.0 * e2 * k2, 0.0))
    t1 = a2b2 + c2
    a = np.sqrt(np.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * c
    rs = (t1 - t2) / np.maximum(t1 + t2, 1e-30)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / np.maximum(t3 + t4, 1e-30)
    return 0.5 * (rs + rp)


def dielectric_fresnel(eta, cos_i):
    """dielectricReflectance (Fresnel.cl) -> (F, cos_t).  eta = n_i/n_t."""
    cos_i = np.abs(cos_i)
    s2t = eta * eta * np.maximum(1.0 - cos_i * cos_i, 0.0)
    tir = s2t >= 1.0
    cos_t = np.sqrt(np.maximum(1.0 - s2t, 0.0))
    rs = (eta * cos_i - cos_t) / np.maximum(eta * cos_i + cos_t, 1e-30)
    rp = (eta * cos_t - cos_i) / np.maximum(eta * cos_t + cos_i, 1e-30)
    f = 0.5 * (rs * rs + rp * rp)
    return np.where(tir, 1.0, f), np.where(tir, 0.0, cos_t)


# --- sphere light cap sampling (sphere.cl:65-88, splat bug fixed) ----------

def sphere_light_sample(rng, c, r, p):
    ell = c - p
    d2 = np.sum(ell * ell, axis=-1)
    dist_c = np.sqrt(d2)
    cvis = d2 - r * r
    valid = cvis > 0.0
    ldir = ell / dist_c[:, None]
    cos_max = np.sqrt(np.maximum(cvis, 0.0)) / dist_c
    u1 = rng.random(p.shape[0])
    u2 = rng.random(p.shape[0])
    z = u2 * (1.0 - cos_max) + cos_max
    phi = 2.0 * np.pi * u1
    sin_t = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    cap = np.stack([np.cos(phi) * sin_t, np.sin(phi) * sin_t, z], axis=-1)
    w = _to_global(ldir, cap)
    b = dist_c * z
    det = np.sqrt(np.maximum(b * b - cvis, 0.0))
    dist = b - det
    pdf = 1.0 / (2.0 * np.pi * np.maximum(1.0 - cos_max, 1e-12))
    return w, dist, pdf, valid


def sphere_light_pdf(c, r, p):
    d2 = np.sum((c - p) ** 2, axis=-1)
    cos_max = np.sqrt(np.maximum(d2 - r * r, 0.0)) / np.sqrt(d2)
    return 1.0 / (2.0 * np.pi * np.maximum(1.0 - cos_max, 1e-12))


# --- quad light area sampling (quad.cl:40-62) -------------------------------

def quad_light_sample(rng, base, e0, e1, nrm, area, p):
    anchor = base - (e0 + e1) * 0.5
    front = np.sum(nrm * (p - base), axis=-1) > 0.0
    u1 = rng.random(p.shape[0])[:, None]
    u2 = rng.random(p.shape[0])[:, None]
    q = anchor + u1 * e0 + u2 * e1
    dvec = q - p
    r2 = np.sum(dvec * dvec, axis=-1)
    dist = np.sqrt(r2)
    d = dvec / dist[:, None]
    cos_t = -np.sum(nrm * d, axis=-1)
    pdf = r2 / np.maximum(cos_t * area, 1e-12)
    return d, dist, pdf, front & (cos_t > 0.0)


def quad_light_pdf(base, nrm, area, p, d):
    ndw = np.sum(nrm * d, axis=-1)
    t = np.sum(nrm * (base - p), axis=-1) / np.where(np.abs(ndw) < 1e-12,
                                                     1e-12, ndw)
    return t * t / np.maximum(np.abs(ndw) * area, 1e-12)


def light_sample(sc: OracleScene, rng, p):
    kind, i = sc.light
    if kind == "s":
        return sphere_light_sample(rng, sc.sph_c[i], sc.sph_r[i], p)
    return quad_light_sample(rng, sc.q_base[i], sc.q_e0[i], sc.q_e1[i],
                             sc.q_n[i], sc.q_area[i], p)


def light_pdf(sc: OracleScene, p, d):
    kind, i = sc.light
    if kind == "s":
        return sphere_light_pdf(sc.sph_c[i], sc.sph_r[i], p)
    return quad_light_pdf(sc.q_base[i], sc.q_n[i], sc.q_area[i], p, d)


def light_color(sc: OracleScene):
    kind, i = sc.light
    return sc.sph_col[i] if kind == "s" else sc.q_col[i]


def is_the_nee_light(sc: OracleScene, kind, idx):
    lk, li = sc.light
    return (kind == (0 if lk == "s" else 1)) & (idx == li)


# ---------------------------------------------------------------------------
# Camera (camera.cl:17-66 + jitter fix; matches ops/camera_rays.py)
# ---------------------------------------------------------------------------

def camera_rays(rng, width, height, aperture=0.01, focal=4.0):
    yaw, pitch, radius = 0.0, 0.3, 4.0
    dirv = np.array([np.sin(yaw) * np.cos(pitch), np.sin(pitch),
                     np.cos(yaw) * np.cos(pitch)])
    position = dirv * radius
    view = -dirv
    up = np.array([0.0, 1.0, 0.0])
    fovx = 45.0
    fovy = np.degrees(np.arctan(np.tan(np.radians(fovx) * 0.5)
                                * (height / width)) * 2.0)

    haxis = np.cross(view, up)
    haxis /= np.linalg.norm(haxis)
    vaxis = np.cross(haxis, view)
    vaxis /= np.linalg.norm(vaxis)
    middle = position + view
    horizontal = haxis * np.tan(np.radians(fovx) * 0.5)
    vertical = vaxis * (-np.tan(np.radians(fovy) * 0.5))

    px, py = np.meshgrid(np.arange(width), np.arange(height))
    px = px.ravel().astype(np.float64)
    py = py.ravel().astype(np.float64)
    n = px.shape[0]
    sx = (px + rng.random(n)) / (width - 1.0)
    sy = ((height - 1 - py) + rng.random(n)) / (height - 1.0)
    plane = (middle + horizontal * (2.0 * sx - 1.0)[:, None]
             + vertical * (2.0 * sy - 1.0)[:, None])
    img_pt = position + (plane - position) * focal

    # concentric-free uniform disk (distribution matches any uniform disk)
    r = np.sqrt(rng.random(n)) * aperture
    th = 2.0 * np.pi * rng.random(n)
    origin = (position + haxis * (r * np.cos(th))[:, None]
              + vaxis * (r * np.sin(th))[:, None])
    if aperture <= 1e-5:
        origin = np.broadcast_to(position, (n, 3)).copy()
    d = img_pt - origin
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return origin, d


# ---------------------------------------------------------------------------
# The reference launch loop (pathtracing.cl:4-120)
# ---------------------------------------------------------------------------

def render(scene_path: str, width: int, height: int, spp: int,
           seed: int = 0, light_sampling: bool = True,
           final_vertex_mis: bool = True, volume_light_sampling: bool = True,
           sigma_a=None, sigma_s=None, planted_error: str | None = None,
           mesh_verts=None, mesh_normals=None, mesh_mat=None):
    """Mean image [H,W,3] under the reference estimator.

    ``final_vertex_mis=False`` drops the bsdfSample light contribution at
    budget-terminated vertices (the reference keeps it: handleSurface runs
    before the budget check, pathtracing.cl:86-115) -- used to quantify
    that term in tests.

    ``sigma_a``/``sigma_s`` override the global medium's coefficients
    per-channel (the JSON carries reference-parity scalars); the spectral-
    channel distance sampling (homogeneous.cl:26-44) only exercises its
    channel-average bookkeeping when they differ.

    ``planted_error`` deliberately corrupts one medium bookkeeping term to
    MEASURE the comparison's sensitivity (VERDICT r3 next #8):
      * "exit_pdf": exited paths skip the /avg(exp(-tau)) pdf division
        (homogeneous.cl:40 bookkeeping bug class);
      * "scatter_sigma_s": drops the sigma_s factor on scatter events
        (homogeneous.cl:45);
      * "nee_trans": drops the exp(-sigmaT*dist) shadow-segment
        transmittance on volumetric NEE (base.cl:216);
      * "mesh_occlusion": surface-NEE shadow rays ignore the mesh
        (intersect.cl:94-152 would skip the BVH);
      * "surf_nee_trans": drops the medium transmittance on surface-NEE
        shadow segments (base.cl:124-128).
    """
    sc = OracleScene(scene_path, mesh_verts=mesh_verts,
                     mesh_normals=mesh_normals, mesh_mat=mesh_mat)
    if sigma_a is not None:
        sc.sigma_a = np.asarray(sigma_a, np.float64)
    if sigma_s is not None:
        sc.sigma_s = np.asarray(sigma_s, np.float64)
    if sigma_a is not None or sigma_s is not None:
        sc.sigma_t = sc.sigma_a + sc.sigma_s
        sc.absorption_only = sc.has_medium and sc.sigma_s.max() == 0.0
    rng = np.random.default_rng(seed)
    npix = width * height
    acc_img = np.zeros((npix, 3))
    medium_live = sc.has_medium and not sc.absorption_only
    inv4pi = 1.0 / (4.0 * np.pi)  # isotropic phase eval == pdf

    for _ in range(spp):
        o, d = camera_rays(rng, width, height)
        mask = np.ones((npix, 3))
        acc = np.zeros((npix, 3))
        alive = np.ones(npix, bool)
        was_specular = np.ones(npix, bool)  # main.cl:133
        n_total = np.zeros(npix, np.int32)
        n_diff = np.zeros(npix, np.int32)
        n_spec = np.zeros(npix, np.int32)
        n_trans = np.zeros(npix, np.int32)
        n_scatter = np.zeros(npix, np.int32)

        # intersect cache: bsdfSample's own intersect (base.cl:57) is the
        # same deterministic query the next launch repeats; reuse it.
        t, kind, idx, nrm, col, isl, mid = intersect(sc, o, d)

        # scatter chains don't advance the bounce counter and the scatter
        # budget resets per surface segment (pathtracing.cl:92), so the
        # exact launch bound is multiplicative; the JAX scan instead runs
        # max_bounces + min(budget,16) TOTAL steps -- a documented
        # truncation whose contribution is sub-noise at test sigmas
        launches = (sc.max_bounces * (min(sc.max_scatter, 16) + 1) + 2
                    if medium_live else sc.max_bounces + 1)
        for _launch in range(launches):
            if not alive.any():
                break

            # ---- global medium (pathtracing.cl:35-62) -------------------
            scattered = np.zeros(npix, bool)
            if medium_live:
                # absorption-only handled by the absorption_only flag path
                # (not exercised: the oracle scene scatters)
                u_chan = rng.random(npix)
                chan = np.minimum((u_chan * 3.0).astype(np.int32), 2)
                sig_c = np.maximum(sc.sigma_t[chan], 1e-12)
                u_dist = rng.random(npix)
                t_free = -np.log(np.maximum(1.0 - u_dist, 1e-12)) / sig_c
                exited = t_free >= t
                ms_t = np.minimum(t_free, t)
                tau = ms_t[:, None] * sc.sigma_t[None]
                w_med = np.exp(-tau)
                pdf_exit = np.exp(-tau).mean(-1)
                if planted_error == "exit_pdf":
                    pdf_exit = np.ones_like(pdf_exit)
                pdf_scat = (sc.sigma_t[None] * np.exp(-tau)).mean(-1)
                pdf_med = np.where(exited, pdf_exit, pdf_scat)
                if planted_error != "scatter_sigma_s":
                    w_med = np.where(exited[:, None], w_med,
                                     w_med * sc.sigma_s[None])
                w_med = w_med / np.maximum(pdf_med, 1e-30)[:, None]
                mask = np.where(alive[:, None], mask * w_med, mask)
                scattered = alive & ~exited & (n_scatter < sc.max_scatter)
                ms_p = o + ms_t[:, None] * d
                n_scatter = np.where(scattered, n_scatter + 1, n_scatter)
                # wasSpecular = !(enableVolumeLightSampling &&
                #                 (lowOrderScattering || scatters > 1));
                # defaults make it False on every scatter (base.cl:210)
                vol_nee = light_sampling and volume_light_sampling
                was_specular = np.where(scattered, not vol_nee,
                                        was_specular)

                if vol_nee:
                    # volumeLightSample (base.cl:194-230)
                    lw, ldist, lpdf, lvalid = light_sample(sc, rng, ms_p)
                    cand = scattered & lvalid
                    vis = ~occluded(sc, ms_p, lw, ldist)
                    wmis = power_heuristic(lpdf, inv4pi)
                    trans = np.exp(-sc.sigma_t[None] * ldist[:, None])
                    if planted_error == "nee_trans":
                        trans = np.ones_like(trans)
                    contrib = (light_color(sc)[None] * trans * inv4pi
                               * (wmis / np.maximum(lpdf, 1e-30))[:, None])
                    addv = cand & vis
                    acc[addv] += mask[addv] * contrib[addv]

                # isotropic phase sample (Isotropic.cl; weight 1, pdf 1/4pi)
                z = 1.0 - 2.0 * rng.random(npix)
                rr_ = np.sqrt(np.maximum(1.0 - z * z, 0.0))
                ph = 2.0 * np.pi * rng.random(npix)
                w_phase = np.stack([rr_ * np.cos(ph), rr_ * np.sin(ph), z],
                                   axis=-1)

            surf = alive & ~scattered
            miss = surf & (kind == -1)
            # env map is black in the oracle scenes; only alpha would change
            alive = alive & ~miss

            hit_light = surf & isl
            gate = was_specular if light_sampling else np.ones(npix, bool)
            add = hit_light & gate
            acc[add] += mask[add] * col[add]
            alive = alive & ~hit_light

            shade = alive & ~scattered
            if not (shade.any() or scattered.any()):
                break

            # ---- handleSurface (base.cl:138-192) ----
            # per-lane material dispatch: DIFF(1) / DIEL(3) / ROUGH_COND(10)
            mt = sc.m_t[mid]
            is_rc = mt == 10
            is_diel = mt == 3
            is_diff = ~is_rc & ~is_diel
            # NEE only for non-specular lobes (base.cl:169)
            nee_ok = ~is_diel

            pos = o + t[:, None] * d
            wi_l = _to_local(nrm, -d)
            alpha = np.maximum(sc.m_rough[mid], 1e-3)  # GGX alpha=roughness
            ceta = sc.m_ceta[mid]
            ck = sc.m_ck[mid]

            def bsdf_eval_pdf(wo_world):
                """(f*cos, pdf) of the sampleable lobes at this vertex."""
                wo_l = _to_local(nrm, wo_world)
                cos_o = wo_l[..., 2]
                f_d = col * INV_PI * np.maximum(cos_o, 0.0)[:, None]
                p_d = np.maximum(cos_o, 0.0) * INV_PI
                hr = wi_l + wo_l
                hr = hr / np.maximum(np.linalg.norm(hr, axis=-1,
                                                    keepdims=True), 1e-12)
                cos_m = np.sum(wi_l * hr, axis=-1)
                fr_c = conductor_fresnel_rgb(ceta, ck, cos_m)
                gd = (ggx_G(alpha, wi_l, wo_l, hr) * ggx_D(alpha, hr) * 0.25
                      / np.maximum(wi_l[..., 2], 1e-12))
                ok_rc = (wi_l[..., 2] > 0.0) & (cos_o > 0.0)
                f_rc = np.where(ok_rc[:, None], col * fr_c * gd[:, None], 0.0)
                p_rc = np.where(ok_rc, ggx_pdf(alpha, hr) * 0.25
                                / np.maximum(cos_m, 1e-12), 0.0)
                f = np.where(is_rc[:, None], f_rc, f_d)
                p = np.where(is_rc, p_rc, p_d)
                return f, p

            # lightSample: area/cap sample + shadow + MIS (base.cl:79-134)
            if light_sampling:
                lw, ldist, lpdf, lvalid = light_sample(sc, rng, pos)
                f, b_pdf_l = bsdf_eval_pdf(lw)
                cand = (shade & nee_ok & lvalid
                        & (np.sum(f * f, axis=-1) > 0.0))
                vis = ~occluded(sc, pos, lw, ldist,
                                skip_mesh=planted_error == "mesh_occlusion")
                takem = cand & vis
                wmis = power_heuristic(lpdf, b_pdf_l)
                contrib = (light_color(sc)[None] * f
                           * (wmis / np.maximum(lpdf, 1e-30))[:, None])
                if medium_live and planted_error != "surf_nee_trans":
                    # shadow-segment transmittance (base.cl:124-128)
                    contrib = contrib * np.exp(-sc.sigma_t[None]
                                               * ldist[:, None])
                acc[takem] += mask[takem] * contrib[takem]

            # bsdfSample: lobe sample + own intersect + MIS light add
            u0 = rng.random(npix)
            u1 = rng.random(npix)
            u2 = rng.random(npix)
            # Lambert: cosine hemisphere (Lambert.cl:4-14)
            phi = 2.0 * np.pi * u1
            r_ = np.sqrt(u2)
            wo_diff_l = np.stack([np.cos(phi) * r_, np.sin(phi) * r_,
                                  np.sqrt(np.maximum(1.0 - u2, 0.0))], -1)
            pdf_diff = wo_diff_l[..., 2] * INV_PI
            w_diff = col
            valid_diff = wi_l[..., 2] > 0.0
            # RoughConductor GGX (RoughConductor.cl:4-33)
            m = ggx_sample(alpha, u1, u2)
            wi_dot_m = np.sum(wi_l * m, axis=-1)
            wo_rc_l = 2.0 * wi_dot_m[:, None] * m - wi_l
            valid_rc = ((wi_l[..., 2] > 0.0) & (wi_dot_m > 0.0)
                        & (wo_rc_l[..., 2] > 0.0))
            g_rc = ggx_G(alpha, wi_l, wo_rc_l, m)
            d_rc = ggx_D(alpha, m)
            mpdf = np.maximum(ggx_pdf(alpha, m), 1e-30)
            pdf_rc = mpdf * 0.25 / np.maximum(wi_dot_m, 1e-12)
            w_rc = (col * conductor_fresnel_rgb(ceta, ck, wi_dot_m)
                    * (wi_dot_m * g_rc * d_rc
                       / np.maximum(wi_l[..., 2] * mpdf, 1e-12))[:, None])
            # Smooth dielectric (Dielectric.cl:4-47 + BSDF2 eta^2 scaling)
            eta_rel = np.where(wi_l[..., 2] < 0.0, sc.m_eta_t[mid],
                               1.0 / sc.m_eta_t[mid])
            f_di, cos_t = dielectric_fresnel(eta_rel, wi_l[..., 2])
            refl = u0 < f_di
            wo_di_l = np.where(
                refl[:, None],
                np.stack([-wi_l[..., 0], -wi_l[..., 1], wi_l[..., 2]], -1),
                np.stack([-wi_l[..., 0] * eta_rel, -wi_l[..., 1] * eta_rel,
                          -np.copysign(cos_t, wi_l[..., 2])], -1))
            w_di = col * np.where(refl, 1.0, eta_rel * eta_rel)[:, None]
            valid_di = refl | (f_di < 1.0)

            wo_l = np.where(is_rc[:, None], wo_rc_l,
                            np.where(is_diel[:, None], wo_di_l, wo_diff_l))
            b_pdf = np.where(is_rc, pdf_rc, pdf_diff)
            weight = np.where(is_rc[:, None], w_rc,
                              np.where(is_diel[:, None], w_di, w_diff))
            valid = np.where(is_rc, valid_rc,
                             np.where(is_diel, valid_di, valid_diff))
            spec_lobe = is_diel
            wo = _to_global(nrm, wo_l)
            bsdf_dead = shade & ~valid
            alive = alive & ~bsdf_dead
            shade = shade & valid

            # merged next ray: scattered lanes continue on the phase-sample
            # direction from the scatter point (pathtracing.cl:57-58), the
            # rest on the bsdfSample direction from the surface vertex; one
            # intersect serves both volumePhaseSample's explicit light
            # check and the next launch's cache
            if medium_live:
                o2 = np.where(scattered[:, None], ms_p, pos)
                wo = np.where(scattered[:, None], w_phase, wo)
            else:
                o2 = pos
            t2, kind2, idx2, nrm2, col2, isl2, mid2 = intersect(sc, o2, wo)
            trans2 = (np.exp(-sc.sigma_t[None] * t2[:, None])
                      if medium_live else 1.0)

            # volumePhaseSample light hit (base.cl:232-260): phase weight is
            # 1 for the isotropic lobe; MIS vs the NEE light's direct pdf
            if medium_live and light_sampling and volume_light_sampling:
                hit_v = scattered & isl2
                nee_v = is_the_nee_light(sc, kind2, idx2)
                d_pdf_v = light_pdf(sc, ms_p, wo)
                w_v = np.where(nee_v, power_heuristic(inv4pi, d_pdf_v), 1.0)
                acc[hit_v] += (mask[hit_v] * col2[hit_v] * trans2[hit_v]
                               * w_v[hit_v][:, None])
                # next launch the wasSpecular gate (False) blocks a re-add
                # and the light hit terminates the lane with zero emission
            # shade lanes at launch L have n_total == L+1, so the budget-
            # final vertex is exactly launch max_bounces-1
            is_final = _launch >= sc.max_bounces - 1
            collect = light_sampling and (final_vertex_mis or not is_final)
            if collect:
                # the reference MIS-weights ANY light hit by that light's
                # directPdf (base.cl:60-66) even though only light[0] is
                # NEE-sampled; single-light scenes are unaffected.  The
                # oracle matches the JAX renderer: only the NEE light gets
                # the MIS weight, others full weight.  Specular lobes skip
                # the MIS add entirely (collected next launch at full
                # weight via the wasSpecular gate, base.cl:169-186).
                hit2 = shade & isl2 & ~spec_lobe & nee_ok
                nee2 = is_the_nee_light(sc, kind2, idx2)
                d_pdf = light_pdf(sc, pos, wo)
                w2 = np.where(nee2, power_heuristic(b_pdf, d_pdf), 1.0)
                # non-NEE-light full-weight hits are collected NEXT launch
                # via the wasSpecular gate; here add only the MIS term for
                # the NEE light (and mark it consumed via gate=False below)
                add2 = hit2 & nee2
                acc[add2] += (mask[add2] * weight[add2] * col2[add2]
                              * w2[add2][:, None]
                              * (trans2[add2] if medium_live else 1.0))

            mask = np.where(shade[:, None], mask * weight, mask)
            was_specular = np.where(shade, spec_lobe, was_specular)
            n_scatter = np.where(shade, 0, n_scatter)  # pathtracing.cl:92
            n_diff = n_diff + (shade & ~is_diel).astype(np.int32)
            n_spec = n_spec + (shade & is_diel & refl).astype(np.int32)
            n_trans = n_trans + (shade & is_diel & ~refl).astype(np.int32)
            n_total = n_total + shade.astype(np.int32)

            # advance the path onto the bsdfSample ray
            o, d = o2, wo
            t, kind, idx, nrm, col, isl, mid = (t2, kind2, idx2, nrm2, col2,
                                                isl2, mid2)
            # the NEE light hit was already MIS-added above; the next
            # launch's wasSpecular gate (False) skips it -- but a non-NEE
            # light hit must still be collected at full weight, which the
            # gate handles only when light_sampling is False.  With
            # light_sampling on, the reference adds nothing for non-NEE
            # lights next launch either (same gate) -- the full-weight
            # add2 path above is the JAX renderer's fix; mirror it:
            if collect:
                hit_other = (shade & isl2 & ~spec_lobe & nee_ok
                             & ~is_the_nee_light(sc, kind2, idx2))
                acc[hit_other] += (mask[hit_other] * col2[hit_other]
                                   * (trans2[hit_other] if medium_live
                                      else 1.0))
                # mark consumed so the next launch does not re-add
                isl = np.where(hit_other, False, isl)
                alive = alive & ~hit_other
                # NEE-light MIS hits terminate next launch via the gate
                # (reset happens there in the reference; emission adds 0)

            # russian roulette (pathtracing.cl:97-106; the reference rolls
            # scattered lanes too -- RR placement changes variance only)
            r_pdf = np.max(mask, axis=-1)
            do_rr = (shade | scattered) & (n_total > 2) & (r_pdf < 0.1)
            u = rng.random(npix)
            surv = u < r_pdf
            mask = np.where((do_rr & surv)[:, None],
                            mask / np.maximum(r_pdf, 1e-30)[:, None], mask)
            alive = alive & ~(do_rr & ~surv)

            # per-lobe budgets (pathtracing.cl:108-115); the ghost launch
            # still collects the pending bsdfSample light hit -- which the
            # loop above already added inline, so budget kill is exact here
            over = ((n_total >= sc.max_bounces) | (n_diff >= sc.max_diff)
                    | (n_spec >= sc.max_spec) | (n_trans >= sc.max_trans))
            alive = alive & ~(shade & over)

        acc_img += acc

    return (acc_img / spp).reshape(height, width, 3)
