"""Batched Delaunay refinement + Lloyd's relaxation (host-side numpy).

TPU-native re-design of the reference's sequential refinement
(src/UPSY/mesh/mesh_refinement_basic.f90: refine_mesh_uniform/point/line/
polygon; mesh_Lloyds_algorithm.f90). Same criteria — a triangle is split at
its circumcenter when its longest leg exceeds the local target resolution
times `resolution_tolerance`, or its smallest angle is below `alpha_min` —
but instead of one-at-a-time insertion with flip propagation, we insert
batches of circumcenters (with a minimum-spacing filter) and re-triangulate
with Qhull each round. Border encroachment is handled by projecting
out-of-domain/near-border circumcenters onto the border, keeping all
circumcentres inside the domain (which the reference asserts).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

import numpy as np
from scipy.spatial import cKDTree

from .triangulation import (delaunay_triangulate, circumcenters,
                            longest_legs, smallest_angles)


# ---------------------------------------------------------------------------
# Refinement criteria: map triangle centroids/geometry -> max allowed res
# ---------------------------------------------------------------------------

@dataclass
class UniformCriterion:
    res: float

    def target(self, pts: np.ndarray, circ_r: np.ndarray,
               tri_v: np.ndarray | None = None) -> np.ndarray:
        return np.full(len(pts), self.res)


@dataclass
class PolygonCriterion:
    """res applies to triangles whose centroid lies inside the polygon."""
    poly: np.ndarray   # [n,2]
    res: float

    def __post_init__(self):
        # matplotlib's C point-in-polygon beats the numpy edge loop ~50x
        # on the contour-derived polygons (hundreds of edges x 30k
        # centroids per refinement round; 7 s of the 27 s 8-km MISMIP
        # mesh build before this)
        try:
            from matplotlib.path import Path
            self._path = Path(self.poly, closed=False)
        except Exception:                             # pragma: no cover
            self._path = None

    def target(self, pts: np.ndarray, circ_r: np.ndarray,
               tri_v: np.ndarray | None = None) -> np.ndarray:
        inside = points_in_polygon(pts, self.poly, _path=self._path)
        return np.where(inside, self.res, np.inf)


@dataclass
class LineCriterion:
    """res applies to triangles crossed by the polyline OR with any vertex
    within `width` of it (the reference's refine_mesh_line criterion,
    mesh_refinement_basic.f90:428-440: segment-triangle intersection plus
    lies_on_line_segment(.., width) on each of the three corners - note
    the FULL width, not width/2, from the corners).

    The polyline is static across refinement rounds, so it is sampled once
    at spacing h and queried through a KD-tree; the h/2 sampling error is
    subtracted from the query distance, making the criterion conservative
    (never misses a triangle the exact segment distance would refine).
    Replaces the O(n_tri x n_segments) exact distance that dominated mesh
    creation."""
    line: np.ndarray   # [n,2] polyline vertices
    res: float
    width: float

    def __post_init__(self):
        h = max(min(self.res, self.width) / 4.0, 1e-2)
        p0 = self.line[:-1]
        seg = self.line[1:] - p0
        L = np.linalg.norm(seg, axis=1)
        reps = np.maximum(1, np.ceil(L / h).astype(int))
        idx = np.repeat(np.arange(len(p0)), reps)
        within = np.arange(reps.sum()) - np.repeat(np.cumsum(reps) - reps,
                                                   reps)
        t = within / reps[idx]
        samples = np.concatenate(
            [p0[idx] + t[:, None] * seg[idx], self.line[-1:]])
        self._h = h
        self._tree = cKDTree(samples)
        self.reset_cache()

    def reset_cache(self):
        # per-vertex distance cache for target_indexed: valid while the
        # caller only APPENDS vertices (refine_mesh's loop invariant)
        self._vd = np.empty(0)

    def target(self, pts: np.ndarray, circ_r: np.ndarray,
               tri_v: np.ndarray | None = None) -> np.ndarray:
        if tri_v is not None:
            # corner-within-width leg of the reference criterion
            d_corner = self._tree.query(
                tri_v.reshape(-1, 2))[0].reshape(len(pts), 3).min(axis=1)
            d_corner = np.maximum(d_corner - self._h / 2.0, 0.0)
            # crossing leg: centroid within ~circumradius of the line
            d_c = np.maximum(self._tree.query(pts)[0] - self._h / 2.0, 0.0)
            hit = (d_corner <= self.width) | (d_c <= circ_r)
        else:
            d = np.maximum(self._tree.query(pts)[0] - self._h / 2.0, 0.0)
            hit = d <= np.maximum(self.width, circ_r)
        return np.where(hit, self.res, np.inf)

    def target_indexed(self, gc, circ_r, V, Tri, legs):
        """Same criterion as target(), but per-VERTEX distances are
        cached across refinement rounds (vertices only get appended
        inside refine_mesh), so each vertex is queried against the
        polyline tree exactly once instead of ~3 nTri corner queries per
        round per criterion (16 s of the 27 s 8-km MISMIP mesh build).
        The centroid (crossing) leg only needs querying where it could
        possibly fire: d_line(centroid) >= d_corner - 2 circ_r, so rows
        with d_corner > width and d_corner > ~3 circ_r can't hit."""
        n0 = len(self._vd)
        if len(V) > n0:
            self._vd = np.concatenate(
                [self._vd, self._tree.query(V[n0:])[0]])
        vd = np.maximum(self._vd - self._h / 2.0, 0.0)
        d_corner = vd[Tri].min(axis=1)
        d_c = np.full(len(gc), np.inf)
        cand = (d_corner > self.width) & (d_corner <= 3.0 * circ_r + legs)
        if cand.any():
            d_c[cand] = np.maximum(
                self._tree.query(gc[cand])[0] - self._h / 2.0, 0.0)
        hit = (d_corner <= self.width) | (d_c <= circ_r)
        return np.where(hit, self.res, np.inf)


@dataclass
class PointCriterion:
    """res applies to triangles containing (within circ_r of) given points."""
    points: np.ndarray  # [n,2]
    res: float

    def __post_init__(self):
        self._tree = cKDTree(self.points) if len(self.points) else None

    def target(self, pts: np.ndarray, circ_r: np.ndarray,
               tri_v: np.ndarray | None = None) -> np.ndarray:
        if self._tree is None:
            return np.full(len(pts), np.inf)
        d, _ = self._tree.query(pts)
        return np.where(d <= circ_r, self.res, np.inf)


def points_in_polygon(pts: np.ndarray, poly: np.ndarray,
                      _path=None) -> np.ndarray:
    """Point-in-polygon test (matplotlib C path when available; ray
    casting semantics match the numpy fallback below)."""
    if _path is None:
        try:
            from matplotlib.path import Path
            _path = Path(poly, closed=False)
        except Exception:                             # pragma: no cover
            _path = None
    if _path is not None:
        return _path.contains_points(pts)
    x, y = pts[:, 0], pts[:, 1]
    n = len(poly)
    inside = np.zeros(len(pts), dtype=bool)
    x0, y0 = poly[:, 0], poly[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    for i in range(n):
        cond = ((y0[i] <= y) & (y < y1[i])) | ((y1[i] <= y) & (y < y0[i]))
        dy = y1[i] - y0[i]
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = x0[i] + (y - y0[i]) / dy * (x1[i] - x0[i])
        inside ^= cond & (x < xi)
    return inside


def dist_to_polyline(pts: np.ndarray, line: np.ndarray) -> np.ndarray:
    """Min distance of each point to a polyline (vectorised over segments)."""
    p0 = line[:-1]                      # [S,2]
    seg = line[1:] - p0                 # [S,2]
    L2 = np.maximum((seg * seg).sum(1), 1e-300)
    best = np.full(len(pts), np.inf)
    # chunk over segments to bound memory
    S = len(p0)
    chunk = max(1, int(4e7 / max(len(pts), 1)))
    for s0 in range(0, S, chunk):
        s1 = min(S, s0 + chunk)
        d = pts[:, None, :] - p0[None, s0:s1, :]            # [N,s,2]
        t = np.clip((d * seg[None, s0:s1, :]).sum(-1) / L2[None, s0:s1], 0, 1)
        proj = p0[None, s0:s1, :] + t[..., None] * seg[None, s0:s1, :]
        dd = np.linalg.norm(pts[:, None, :] - proj, axis=-1).min(axis=1)
        best = np.minimum(best, dd)
    return best


# ---------------------------------------------------------------------------
# The refinement loop
# ---------------------------------------------------------------------------

def initial_points(xmin, xmax, ymin, ymax, res_max: float) -> np.ndarray:
    """Corner + border + a couple of interior seed points."""
    nx = max(2, int(np.ceil((xmax - xmin) / res_max)) + 1)
    ny = max(2, int(np.ceil((ymax - ymin) / res_max)) + 1)
    bx = np.linspace(xmin, xmax, nx)
    by = np.linspace(ymin, ymax, ny)
    south = np.stack([bx, np.full(nx, ymin)], 1)
    north = np.stack([bx, np.full(nx, ymax)], 1)
    west = np.stack([np.full(ny - 2, xmin), by[1:-1]], 1)
    east = np.stack([np.full(ny - 2, xmax), by[1:-1]], 1)
    ctr = np.array([[0.5 * (xmin + xmax), 0.5 * (ymin + ymax)]])
    return np.concatenate([south, north, west, east, ctr])


def refine_mesh(xmin, xmax, ymin, ymax,
                criteria: Sequence,
                alpha_min: float = 0.4363,
                resolution_tolerance: float = 1.25,
                max_rounds: int = 60,
                verbose: bool = False) -> np.ndarray:
    """Run batched Delaunay refinement; returns final vertex set V [nV,2].

    criteria: list of *Criterion objects with .target(pts, circ_r) -> res.
    """
    res_unif = min((c.res for c in criteria if isinstance(c, UniformCriterion)),
                   default=(xmax - xmin))
    V = initial_points(xmin, xmax, ymin, ymax, res_unif)
    border_tol = 1e-6 * max(xmax - xmin, ymax - ymin)
    for c in criteria:
        if hasattr(c, "reset_cache"):
            c.reset_cache()     # V below is append-only between resets

    for rnd in range(max_rounds):
        Tri = delaunay_triangulate(V)
        cc = circumcenters(V, Tri)
        gc = V[Tri].mean(axis=1)
        legs = longest_legs(V, Tri)
        angs = smallest_angles(V, Tri)
        circ_r = np.linalg.norm(cc - gc, axis=1) + 0.5 * legs

        tri_v = None                             # corners, built lazily
        res_target = np.full(len(Tri), np.inf)
        for c in criteria:
            if hasattr(c, "target_indexed"):
                t = c.target_indexed(gc, circ_r, V, Tri, legs)
            else:
                if tri_v is None:
                    tri_v = V[Tri]               # [nTri,3,2]
                t = c.target(gc, circ_r, tri_v)
            res_target = np.minimum(res_target, t)

        bad = (legs > res_target * resolution_tolerance) | (angs < alpha_min)
        if not bad.any():
            break

        new_pts = cc[bad].copy()
        local_res = np.minimum(legs[bad] / 2.0, res_target[bad])

        # encroachment: points outside the domain or hugging the border snap
        # onto the border; this is what keeps circumcentres in-domain.
        snap = np.zeros(len(new_pts), dtype=bool)
        for dim, lo, hi in ((0, xmin, xmax), (1, ymin, ymax)):
            near_lo = new_pts[:, dim] < lo + 0.45 * local_res
            near_hi = new_pts[:, dim] > hi - 0.45 * local_res
            new_pts[near_lo, dim] = lo
            new_pts[near_hi, dim] = hi
            snap |= near_lo | near_hi

        # minimum-spacing filter: no two new points closer than 0.45*local
        # res, and none too close to existing vertices
        keep = _min_spacing_filter(new_pts, 0.45 * local_res, V)
        new_pts = new_pts[keep]
        if len(new_pts) == 0:
            # pathological: all candidates filtered; split worst triangle edge
            ti = int(np.argmax(legs / np.maximum(res_target, 1e-30)))
            a, b = V[Tri[ti, 0]], V[Tri[ti, 1]]
            new_pts = 0.5 * (a + b)[None, :]
        V = np.concatenate([V, new_pts])
        if verbose:
            print(f"  refine round {rnd}: nV={len(V)} (+{len(new_pts)}), "
                  f"bad={int(bad.sum())}")
    # snap near-border points exactly onto the border
    for dim, lo, hi in ((0, xmin, xmax), (1, ymin, ymax)):
        V[np.abs(V[:, dim] - lo) < border_tol, dim] = lo
        V[np.abs(V[:, dim] - hi) < border_tol, dim] = hi
    # dedupe
    V = _dedupe(V, 1e-6 * max(xmax - xmin, ymax - ymin))
    return V


def _min_spacing_filter(pts: np.ndarray, min_d: np.ndarray,
                        existing: np.ndarray) -> np.ndarray:
    """Greedy filter: keep points pairwise at least min_d apart and at least
    min_d from existing points."""
    keep = np.ones(len(pts), dtype=bool)
    if len(existing):
        tree = cKDTree(existing)
        d, _ = tree.query(pts)
        keep &= d > min_d
    idx = np.where(keep)[0]
    if len(idx) == 0:
        return keep
    sub = pts[idx]
    tree = cKDTree(sub)
    pairs = tree.query_pairs(float(np.max(min_d[idx])), output_type="ndarray")
    dead = np.zeros(len(sub), dtype=bool)
    for i, j in pairs:
        if dead[i] or dead[j]:
            continue
        dij = np.linalg.norm(sub[i] - sub[j])
        if dij < max(min_d[idx[i]], min_d[idx[j]]):
            dead[j] = True
    keep[idx[dead]] = False
    return keep


def _dedupe(V: np.ndarray, tol: float) -> np.ndarray:
    tree = cKDTree(V)
    pairs = tree.query_pairs(tol, output_type="ndarray")
    dead = np.zeros(len(V), dtype=bool)
    for i, j in pairs:
        if not dead[i]:
            dead[j] = True
    return V[~dead]


def split_encroaching_triangles(V: np.ndarray, xmin, xmax, ymin, ymax,
                                alpha_min: float,
                                max_rounds: int = 20) -> np.ndarray:
    """Split triangles whose smallest internal angle is below alpha_min at
    their circumcentre until none remain (the reference's
    refine_mesh_split_encroaching_triangles_all, run after every Lloyd
    iteration)."""
    for _ in range(max_rounds):
        Tri = delaunay_triangulate(V)
        angs = smallest_angles(V, Tri)
        bad = angs < alpha_min
        if not bad.any():
            break
        cc = circumcenters(V, Tri)[bad]
        local_res = longest_legs(V, Tri)[bad] / 2.0
        new_pts = cc.copy()
        for dim, lo, hi in ((0, xmin, xmax), (1, ymin, ymax)):
            new_pts[:, dim] = np.clip(new_pts[:, dim], lo, hi)
            near_lo = new_pts[:, dim] < lo + 0.45 * local_res
            near_hi = new_pts[:, dim] > hi - 0.45 * local_res
            new_pts[near_lo, dim] = lo
            new_pts[near_hi, dim] = hi
        keep = _min_spacing_filter(new_pts, 0.45 * local_res, V)
        new_pts = new_pts[keep]
        if len(new_pts) == 0:
            break
        V = np.concatenate([V, new_pts])
    return V


def lloyds_algorithm(V: np.ndarray, xmin, xmax, ymin, ymax,
                     nit: int = 2, alpha_min: float | None = None
                     ) -> np.ndarray:
    """Lloyd's relaxation matching the reference's semantics
    (mesh_Lloyds_algorithm.f90:16-73):

    - interior vertices move to the AREA-WEIGHTED CENTROID OF THEIR
      ONE-RING STAR FAN (the fan of triangles (vi, C(ci), C(ci+1))
      over the CCW neighbour ring) — not the true Voronoi-cell
      centroid; the two have different fixed points and the star form
      is what shapes the reference's margin-ring vertex distribution;
    - border vertices stay exactly where they are (VBI > 0 cycle);
    - after each sweep, triangles whose smallest angle dropped below
      alpha_min are split at their circumcentre
      (refine_mesh_split_encroaching_triangles_all), so smoothing can
      ADD vertices.

    The reference moves vertices one at a time (Gauss-Seidel, local
    re-flips); this sweep is vectorised (Jacobi), which converges to the
    same smoothing family for the small per-iteration displacements
    Lloyd produces on a refined mesh.
    """
    from .triangulation import Connectivity

    for _ in range(nit):
        Tri = delaunay_triangulate(V)
        conn = Connectivity(V, Tri, xmin, xmax, ymin, ymax)
        C, nC = conn.C, conn.nC
        K = C.shape[1]
        interior = conn.VBI == 0
        idx = np.arange(K)
        Cp = np.where(C < 0, 0, C)
        nxt = np.where(idx[None, :] + 1 >= nC[:, None], 0, idx[None, :] + 1)
        Cn = np.take_along_axis(Cp, nxt, axis=1)
        pa = V[:, None, :]                       # [nV,1,2]
        pb, pc = V[Cp], V[Cn]                    # [nV,K,2]
        cross = ((pb[..., 0] - pa[..., 0]) * (pc[..., 1] - pa[..., 1])
                 - (pb[..., 1] - pa[..., 1]) * (pc[..., 0] - pa[..., 0]))
        valid = idx[None, :] < nC[:, None]
        cross = np.where(valid, cross, 0.0)
        cent = (pa + pb + pc) / 3.0
        wsum = cross.sum(axis=1)
        safe = np.where(np.abs(wsum) > 0, wsum, 1.0)
        gc = (cross[..., None] * cent).sum(axis=1) / safe[:, None]
        move = interior & (np.abs(wsum) > 0)
        V = np.where(move[:, None],
                     np.clip(gc, [xmin, ymin], [xmax, ymax]), V)
        if alpha_min is not None:
            V = split_encroaching_triangles(V, xmin, xmax, ymin, ymax,
                                            alpha_min)
    return V
