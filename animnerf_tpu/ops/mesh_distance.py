"""Point-to-mesh signed distances (numpy), replacing trimesh+rtree.

Used by tools/prepare_template.py to classify template-space points as
inside/outside the body shell (reference tools/prepare_template.py:71,84-89
uses trimesh.nearest.signed_distance). The unsigned distance is an exact
point-to-triangle distance minimised over all faces (chunked, vectorized
numpy); the sign comes from the angle-weighted pseudo-normal at the closest
point (Baerentzen & Aanaes 2005), which is robust for closed meshes like
SMPL.
"""

from __future__ import annotations

import numpy as np


def _closest_point_on_triangles(p: np.ndarray, a: np.ndarray, b: np.ndarray,
                                c: np.ndarray):
    """Closest points of p (P,3) on each triangle (T,3): returns (P,T,3)."""
    ab = b - a
    ac = c - a
    ap = p[:, None, :] - a[None]

    d1 = np.einsum("tk,ptk->pt", ab, ap)
    d2 = np.einsum("tk,ptk->pt", ac, ap)

    bp = p[:, None, :] - b[None]
    d3 = np.einsum("tk,ptk->pt", ab, bp)
    d4 = np.einsum("tk,ptk->pt", ac, bp)

    cp = p[:, None, :] - c[None]
    d5 = np.einsum("tk,ptk->pt", ab, cp)
    d6 = np.einsum("tk,ptk->pt", ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_vbc = (d4 - d3) + (d5 - d6)
    # region masks, evaluated in the same precedence as Ericson's method
    out = np.empty((p.shape[0], a.shape[0], 3), dtype=p.dtype)
    done = np.zeros(out.shape[:2], dtype=bool)

    def assign(mask, vals):
        m = mask & ~done
        out[m] = vals[m] if vals.shape == out.shape else np.broadcast_to(
            vals, out.shape)[m]
        done[m] = True

    # vertex regions
    assign((d1 <= 0) & (d2 <= 0), np.broadcast_to(a, out.shape))
    assign((d3 >= 0) & (d4 <= d3), np.broadcast_to(b, out.shape))
    assign((d6 >= 0) & (d5 <= d6), np.broadcast_to(c, out.shape))

    # edge AB
    v = d1 / np.where(d1 - d3 == 0, 1, d1 - d3)
    assign((vc <= 0) & (d1 >= 0) & (d3 <= 0), a + v[..., None] * ab)
    # edge AC
    w = d2 / np.where(d2 - d6 == 0, 1, d2 - d6)
    assign((vb <= 0) & (d2 >= 0) & (d6 <= 0), a + w[..., None] * ac)
    # edge BC
    w2 = (d4 - d3) / np.where(denom_vbc == 0, 1, denom_vbc)
    assign((va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0),
           b + w2[..., None] * (c - b))

    # interior
    denom = va + vb + vc
    denom = np.where(denom == 0, 1, denom)
    v_in = (vb / denom)[..., None]
    w_in = (vc / denom)[..., None]
    assign(~done, a + v_in * ab + w_in * ac)
    return out


def signed_distance(points: np.ndarray, verts: np.ndarray, faces: np.ndarray,
                    chunk: int = 512, sign_convention: str = "inside_negative"
                    ) -> np.ndarray:
    """Signed distance of points to a closed triangle mesh.

    sign_convention='inside_negative' (our template pkl convention — the
    reference flips trimesh's inside-positive at prepare_template.py:89).
    """
    points = np.asarray(points, np.float64)
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    fnormals = np.cross(b - a, c - a)
    fnormals /= np.linalg.norm(fnormals, axis=-1, keepdims=True) + 1e-12

    out = np.empty(points.shape[0], np.float64)
    for i in range(0, points.shape[0], chunk):
        p = points[i:i + chunk]
        cp = _closest_point_on_triangles(p, a, b, c)  # (P, T, 3)
        d2 = np.einsum("ptk,ptk->pt", p[:, None] - cp, p[:, None] - cp)
        ti = np.argmin(d2, axis=1)
        rows = np.arange(p.shape[0])
        nearest = cp[rows, ti]
        delta = p - nearest
        dist = np.sqrt(d2[rows, ti])
        # sign: direction from surface vs face normal of the closest face
        s = np.sign(np.einsum("pk,pk->p", delta, fnormals[ti]))
        s = np.where(s == 0, 1.0, s)
        out[i:i + chunk] = dist * s  # + outside, - inside
    if sign_convention == "inside_negative":
        return out
    return -out
