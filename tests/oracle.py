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
    def __init__(self, path: str):
        with open(path) as f:
            doc = json.load(f)
        s = doc.get("settings", {})
        self.max_bounces = int(s.get("MAX_BOUNCES", 4))
        self.max_diff = int(s.get("MAX_DIFF_BOUNCES", 4))

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


def intersect(sc: OracleScene, o, d):
    """Closest hit -> (t, kind, idx, normal, color, is_light).

    kind: 0 sphere, 1 quad, -1 miss.  Normal resolved against the ray
    (backside flip for non-transmissive, intersect.cl:222-233).
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

    pos = o + best_t[:, None] * d
    normal = np.zeros((n, 3))
    color = np.zeros((n, 3))
    is_light = np.zeros(n, bool)
    for i in range(len(sc.sph_r)):
        m = (kind == 0) & (idx == i)
        normal[m] = (pos[m] - sc.sph_c[i]) / sc.sph_r[i]
        color[m] = sc.sph_col[i]
        is_light[m] = sc.sph_light[i]
    for i in range(len(sc.q_area)):
        m = (kind == 1) & (idx == i)
        normal[m] = sc.q_n[i]
        color[m] = sc.q_col[i]
        is_light[m] = sc.q_light[i]
    back = np.sum(normal * d, axis=-1) > 0.0
    normal = np.where(back[:, None], -normal, normal)
    return best_t, kind, idx, normal, color, is_light


def occluded(sc: OracleScene, o, d, dist):
    limit = dist * (1.0 - 1e-3)
    blocked = np.zeros(o.shape[0], bool)
    for i in range(len(sc.sph_r)):
        blocked |= _sphere_t(o, d, sc.sph_c[i], sc.sph_r[i]) < limit
    for i in range(len(sc.q_area)):
        blocked |= _quad_t(o, d, sc.q_base[i], sc.q_e0[i], sc.q_e1[i],
                           sc.q_n[i]) < limit
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
           final_vertex_mis: bool = True):
    """Mean image [H,W,3] under the reference estimator.

    ``final_vertex_mis=False`` drops the bsdfSample light contribution at
    budget-terminated vertices (the reference keeps it: handleSurface runs
    before the budget check, pathtracing.cl:86-115) -- used to quantify
    that term in tests.
    """
    sc = OracleScene(scene_path)
    rng = np.random.default_rng(seed)
    npix = width * height
    acc_img = np.zeros((npix, 3))

    for _ in range(spp):
        o, d = camera_rays(rng, width, height)
        mask = np.ones((npix, 3))
        acc = np.zeros((npix, 3))
        alive = np.ones(npix, bool)
        was_specular = np.ones(npix, bool)  # main.cl:133
        n_total = np.zeros(npix, np.int32)
        n_diff = np.zeros(npix, np.int32)

        # intersect cache: bsdfSample's own intersect (base.cl:57) is the
        # same deterministic query the next launch repeats; reuse it.
        t, kind, idx, nrm, col, isl = intersect(sc, o, d)

        for _launch in range(sc.max_bounces + 1):
            if not alive.any():
                break
            miss = alive & (kind == -1)
            # env map is black in the oracle scenes; only alpha would change
            alive = alive & ~miss

            hit_light = alive & isl
            gate = was_specular if light_sampling else np.ones(npix, bool)
            add = hit_light & gate
            acc[add] += mask[add] * col[add]
            alive = alive & ~hit_light

            shade = alive.copy()
            if not shade.any():
                break

            # ---- handleSurface (base.cl:138-192), Lambert only ----
            # lightSample: area/cap sample + shadow + MIS (base.cl:79-134)
            if light_sampling:
                lw, ldist, lpdf, lvalid = light_sample(sc, rng, o + t[:, None] * d)
                pos = o + t[:, None] * d
                cos_o = np.sum(nrm * lw, axis=-1)
                f = col * INV_PI * np.maximum(cos_o, 0.0)[:, None]
                b_pdf = np.maximum(cos_o, 0.0) * INV_PI
                cand = shade & lvalid & (cos_o > 0.0)
                vis = ~occluded(sc, pos, lw, ldist)
                takem = cand & vis
                wmis = power_heuristic(lpdf, b_pdf)
                contrib = (light_color(sc)[None] * f
                           * (wmis / np.maximum(lpdf, 1e-30))[:, None])
                acc[takem] += mask[takem] * contrib[takem]

            # bsdfSample: cosine sample + own intersect + MIS light add
            pos = o + t[:, None] * d
            wo, b_pdf = cosine_hemisphere_world(rng, nrm)
            weight = col  # Lambert sample weight = albedo (Lambert.cl:4-14)

            o2 = pos
            t2, kind2, idx2, nrm2, col2, isl2 = intersect(sc, o2, wo)
            # shade lanes at launch L have n_total == L+1, so the budget-
            # final vertex is exactly launch max_bounces-1
            is_final = _launch >= sc.max_bounces - 1
            collect = light_sampling and (final_vertex_mis or not is_final)
            if collect:
                # the reference MIS-weights ANY light hit by that light's
                # directPdf (base.cl:60-66) even though only light[0] is
                # NEE-sampled; single-light scenes are unaffected.  The
                # oracle matches the JAX renderer: only the NEE light gets
                # the MIS weight, others full weight.
                hit2 = shade & isl2
                nee2 = is_the_nee_light(sc, kind2, idx2)
                d_pdf = light_pdf(sc, pos, wo)
                w2 = np.where(nee2, power_heuristic(b_pdf, d_pdf), 1.0)
                # non-NEE-light full-weight hits are collected NEXT launch
                # via the wasSpecular gate; here add only the MIS term for
                # the NEE light (and mark it consumed via gate=False below)
                add2 = hit2 & nee2
                acc[add2] += (mask[add2] * weight[add2] * col2[add2]
                              * w2[add2][:, None])

            mask = np.where(shade[:, None], mask * weight, mask)
            was_specular = np.where(shade, False, was_specular)
            n_diff = n_diff + shade.astype(np.int32)
            n_total = n_total + shade.astype(np.int32)

            # advance the path onto the bsdfSample ray
            o, d = o2, wo
            t, kind, idx, nrm, col, isl = t2, kind2, idx2, nrm2, col2, isl2
            # the NEE light hit was already MIS-added above; the next
            # launch's wasSpecular gate (False) skips it -- but a non-NEE
            # light hit must still be collected at full weight, which the
            # gate handles only when light_sampling is False.  With
            # light_sampling on, the reference adds nothing for non-NEE
            # lights next launch either (same gate) -- the full-weight
            # add2 path above is the JAX renderer's fix; mirror it:
            if collect:
                hit_other = shade & isl2 & ~is_the_nee_light(sc, kind2, idx2)
                acc[hit_other] += mask[hit_other] * col2[hit_other]
                # mark consumed so the next launch does not re-add
                isl = np.where(hit_other, False, isl)
                alive = alive & ~hit_other
                # NEE-light MIS hits terminate next launch via the gate
                # (reset happens there in the reference; emission adds 0)

            # russian roulette (pathtracing.cl:97-106)
            r_pdf = np.max(mask, axis=-1)
            do_rr = shade & (n_total > 2) & (r_pdf < 0.1)
            u = rng.random(npix)
            surv = u < r_pdf
            mask = np.where((do_rr & surv)[:, None],
                            mask / np.maximum(r_pdf, 1e-30)[:, None], mask)
            alive = alive & ~(do_rr & ~surv)

            # per-lobe budgets (pathtracing.cl:108-115); the ghost launch
            # still collects the pending bsdfSample light hit -- which the
            # loop above already added inline, so budget kill is exact here
            over = (n_total >= sc.max_bounces) | (n_diff >= sc.max_diff)
            alive = alive & ~(shade & over)

        acc_img += acc

    return (acc_img / spp).reshape(height, width, 3)
