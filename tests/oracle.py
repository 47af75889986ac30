"""Pure-NumPy reference tracer used as test oracle (SURVEY §4 item 1).

Implements the reference's intersection and shading math with scalar loops in
float64 — slow, obviously-correct, and independent of the JAX code paths.
Semantics follow /root/reference/Assign10-Path_Tracing/code.cl.
"""
import numpy as np


def sphere_ts(o, d, mint, maxt, cen, rad):
    """(R, S) nearest valid hit t; inf = miss (ref interSphere code.cl:199-242)."""
    R, S = o.shape[0], cen.shape[0]
    ts = np.full((R, S), np.inf)
    for i in range(R):
        for j in range(S):
            omc = o[i] - cen[j]
            a = d[i] @ d[i]
            b = 2 * omc @ d[i]
            c = omc @ omc - rad[j] ** 2
            dis = b * b - 4 * a * c
            if dis < 0:
                continue
            sq = np.sqrt(dis)
            t0, t1 = (-b - sq) / (2 * a), (-b + sq) / (2 * a)
            tmn, tmx = min(t0, t1), max(t0, t1)
            if mint[i] <= tmn <= maxt[i]:
                ts[i, j] = tmn
            elif mint[i] <= tmx <= maxt[i]:
                ts[i, j] = tmx
    return ts


def triangle_ts(o, d, mint, maxt, v, two_sided=False):
    """(R, T) Möller–Trumbore hit t (ref interTriangle code.cl:250-288)."""
    R, T = o.shape[0], v.shape[0]
    ts = np.full((R, T), np.inf)
    for i in range(R):
        for j in range(T):
            for flip in ([False, True] if two_sided else [False]):
                p0, p1, p2 = v[j]
                if flip:
                    p0, p1 = p1, p0
                e1, e2 = p1 - p0, p2 - p0
                div = np.cross(e2, e1) @ d[i]
                if div <= 0:
                    continue
                idiv = 1 / div
                s = o[i] - p0
                beta = (np.cross(s, d[i]) @ e2) * idiv
                if beta < 0 or beta > 1:
                    continue
                gamma = (np.cross(s, e1) @ d[i]) * idiv
                if gamma < 0 or beta + gamma > 1:
                    continue
                t = (np.cross(s, e2) @ e1) * -idiv
                if mint[i] <= t <= maxt[i]:
                    ts[i, j] = min(ts[i, j], t)
    return ts


def aabb_window(o, d, pmin, pmax):
    """(tmin, tmax, valid) per ray (ref interAABB code.cl:335-389)."""
    R = o.shape[0]
    tmin = np.zeros(R)
    tmax = np.full(R, np.inf)
    ok = np.ones(R, bool)
    for i in range(R):
        lo, hi = 0.0, np.inf
        for ax in range(3):
            da = d[i, ax]
            if da == 0:
                da = 1e-30
            t0 = (pmin[ax] - o[i, ax]) / da
            t1 = (pmax[ax] - o[i, ax]) / da
            if t0 > t1:
                t0, t1 = t1, t0
            lo, hi = max(lo, t0), min(hi, t1)
        tmin[i], tmax[i], ok[i] = lo, hi, lo <= hi
    return tmin, tmax, ok


def pinhole_ray(eye, u, v, w, width, height, cols, rows, col, row):
    """(o, d) (ref getRay code.cl:108-119)."""
    cop = (-0.5 + (col + 0.5) / cols) * width * u + \
          (0.5 - (row + 0.5) / rows) * height * v - w
    d = cop / np.linalg.norm(cop)
    return eye.copy(), d


def fake_shade_image(o_eye, cam_w, cam, cen, rad, colors, cols, rows):
    """Assign02 monolithic raytrace kernel (Assign02 code.cl:158-232):
    champion sphere + fake shade dot(W, n), color*shade, black background.
    Returns float image (rows, cols, 3) in [0,1]-ish (pre-u8)."""
    img = np.zeros((rows, cols, 3))
    mint = np.zeros(1)
    maxt = np.full(1, np.inf)
    for r in range(rows):
        for c in range(cols):
            o, d = pinhole_ray(o_eye, cam[0], cam[1], cam[2], cam[3], cam[4],
                               cols, rows, c, r)
            ts = sphere_ts(o[None], d[None], mint, maxt, cen, rad)[0]
            j = np.argmin(ts)
            if np.isfinite(ts[j]):
                p = o + ts[j] * d
                n = (p - cen[j]) / np.linalg.norm(p - cen[j])
                shade = cam_w @ n
                img[r, c] = colors[j][:3] * shade
    return img
