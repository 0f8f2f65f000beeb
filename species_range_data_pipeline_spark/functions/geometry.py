"""Grid geometry kernels: connected components, boundary tracing, polygonize.

This is the engine's replacement for ``arcpy.RasterToPolygon_conversion``
(operator T4, ``species_range_etl.py:127``) and the geometric half of the
dissolve (A1, ``:205``).  The model is SURVEY.md §1.3 option (b): a raster is
long-format cell rows; polygonization is per-group numpy (driven from Spark
via applyInPandas in operators/polygonize.py).

Algorithm (pure numpy/dict, no GEOS):
1. 4-connected components over kept cells (vectorized union-find-ish BFS).
2. Boundary edges: each cell edge with no neighbor on the other side,
   directed so the interior is on the LEFT — outer rings come out CCW,
   holes CW, automatically.
3. Walk edges into closed loops; at saddle vertices (two diagonal cells
   touching) take the leftmost turn, which keeps diagonally-touching
   components separate (matching 4-connectivity).
4. Loops group by the component of their interior cell -> one exterior ring
   + holes per component; collinear vertices collapsed.

Cell (row, col) maps to the unit square x in [col, col+1], y in
[flip - row - 1 + ... ] — callers pass an affine (x0, y0, cellsize, nrows)
so output coordinates are georeferenced like the reference's rasters.
"""

from __future__ import annotations

import numpy as np

from .wkb import Ring, encode_multipolygon, encode_polygon, ring_signed_area


def label_components(rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    """4-connected component labels for cell set {(rows[i], cols[i])}.

    Union-find with path compression over vectorized neighbor matching:
    sort-free, O(n α(n)); no dense grid materialized (cells can be sparse
    in a huge raster).
    """
    n = len(rows)
    parent = np.arange(n)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(i: int, j: int) -> None:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)

    key = {(int(r), int(c)): i for i, (r, c) in enumerate(zip(rows, cols))}
    for i in range(n):
        r, c = int(rows[i]), int(cols[i])
        for dr, dc in ((0, 1), (1, 0)):
            j = key.get((r + dr, c + dc))
            if j is not None:
                union(i, j)
    roots = np.fromiter((find(i) for i in range(n)), dtype=np.int64, count=n)
    # densify labels to 0..k-1 in first-seen order for determinism
    _, labels = np.unique(roots, return_inverse=True)
    return labels


def _boundary_edges(cells: set[tuple[int, int]]):
    """Directed boundary edges (interior on the left), in grid vertex space
    where cell (r, c) spans x [c, c+1], y [-r-1, -r] (y up = north)."""
    edges = []  # (start, end, owner_cell)
    for r, c in cells:
        x0, x1 = c, c + 1
        y0, y1 = -r - 1, -r  # y1 is the top of the cell
        if (r + 1, c) not in cells:  # no neighbor below -> bottom edge, +x
            edges.append(((x0, y0), (x1, y0), (r, c)))
        if (r, c + 1) not in cells:  # right edge, +y
            edges.append(((x1, y0), (x1, y1), (r, c)))
        if (r - 1, c) not in cells:  # top edge, -x
            edges.append(((x1, y1), (x0, y1), (r, c)))
        if (r, c - 1) not in cells:  # left edge, -y
            edges.append(((x0, y1), (x0, y0), (r, c)))
    return edges


def _walk_loops(edges):
    """Assemble directed edges into closed loops; leftmost turn at forks."""
    out_map: dict[tuple[int, int], list[int]] = {}
    for idx, (s, _e, _o) in enumerate(edges):
        out_map.setdefault(s, []).append(idx)
    used = [False] * len(edges)
    loops = []
    for start_idx in range(len(edges)):
        if used[start_idx]:
            continue
        loop_idx = [start_idx]
        used[start_idx] = True
        _s, cur_end, _o = edges[start_idx]
        cur_dir = _direction(edges[start_idx])
        while cur_end != edges[start_idx][0]:
            candidates = [i for i in out_map.get(cur_end, []) if not used[i]]
            if not candidates:
                raise ValueError("open boundary loop — input cells inconsistent")
            nxt = _leftmost(candidates, cur_dir, edges)
            used[nxt] = True
            loop_idx.append(nxt)
            cur_end = edges[nxt][1]
            cur_dir = _direction(edges[nxt])
        loops.append(loop_idx)
    return loops


def _direction(edge):
    (sx, sy), (ex, ey), _ = edge
    return (ex - sx, ey - sy)


def _leftmost(candidates, cur_dir, edges):
    """Pick the outgoing edge turning most to the left of cur_dir.
    Turn preference: left turn > straight > right turn > U-turn."""
    def turn_rank(i):
        dx, dy = _direction(edges[i])
        cx, cy = cur_dir
        cross = cx * dy - cy * dx  # >0 left, 0 straight/U, <0 right
        dot = cx * dx + cy * dy
        if cross > 0:
            return 0
        if cross == 0 and dot > 0:
            return 1
        if cross < 0:
            return 2
        return 3
    return min(candidates, key=turn_rank)


def _simplify(ring: Ring) -> Ring:
    """Drop collinear intermediate vertices (axis-aligned grid rings)."""
    if len(ring) < 3:
        return ring
    out = []
    n = len(ring)
    for i in range(n):
        px, py = ring[i - 1]
        cx, cy = ring[i]
        nx, ny = ring[(i + 1) % n]
        if (cx - px) * (ny - cy) != (cy - py) * (nx - cx):
            out.append((cx, cy))
    return out


def polygonize_cells(
    rows: np.ndarray,
    cols: np.ndarray,
    x0: float = 0.0,
    y0: float = 0.0,
    cellsize: float = 1.0,
    nrows: int | None = None,
) -> list[tuple[int, bytes, int, float]]:
    """Polygonize kept cells -> [(component_id, polygon_wkb, n_cells, area)].

    Affine: x = x0 + col*cellsize; y = y0 + (nrows - row - 1)*cellsize when
    ``nrows`` given (ASCII-grid row order, ``species_range_etl.py:59-74``),
    else y = -row*cellsize.
    """
    if len(rows) == 0:
        return []
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    labels = label_components(rows, cols)
    cells = {(int(r), int(c)) for r, c in zip(rows, cols)}
    cell_label = {
        (int(r), int(c)): int(l) for r, c, l in zip(rows, cols, labels)
    }
    edges = _boundary_edges(cells)
    loops = _walk_loops(edges)

    def to_geo(pt):
        gx, gy = pt
        if nrows is not None:
            # grid y = -r-1..-r  ->  geo y = y0 + (nrows + gy) * cellsize
            return (x0 + gx * cellsize, y0 + (nrows + gy) * cellsize)
        return (x0 + gx * cellsize, y0 + gy * cellsize)

    by_component: dict[int, dict[str, list[Ring]]] = {}
    for loop_idx in loops:
        ring = [edges[i][0] for i in loop_idx]
        owner = edges[loop_idx[0]][2]
        comp = cell_label[owner]
        ring_geo = _simplify([to_geo(p) for p in ring])
        bucket = by_component.setdefault(comp, {"outer": [], "holes": []})
        if ring_signed_area(ring_geo) > 0:
            bucket["outer"].append(ring_geo)
        else:
            bucket["holes"].append(ring_geo)

    counts = np.bincount(labels)
    results = []
    for comp in sorted(by_component):
        bucket = by_component[comp]
        if len(bucket["outer"]) != 1:
            raise ValueError(
                f"component {comp}: expected 1 exterior ring, got {len(bucket['outer'])}"
            )
        rings = bucket["outer"] + bucket["holes"]
        wkb = encode_polygon(rings)
        area = sum(ring_signed_area(r) for r in rings)
        results.append((int(comp), wkb, int(counts[comp]), float(area)))
    return results


def union_cells_to_multipolygon(
    rows: np.ndarray,
    cols: np.ndarray,
    x0: float = 0.0,
    y0: float = 0.0,
    cellsize: float = 1.0,
    nrows: int | None = None,
) -> tuple[bytes, float, int, int]:
    """Geometric union in cell space (the dissolve kernel, A1): dedupe cells,
    polygonize, emit (MultiPolygon WKB, total area, polygon count,
    unique-cell count)."""
    if len(rows) == 0:
        return encode_multipolygon([]), 0.0, 0, 0
    uniq = np.unique(np.stack([np.asarray(rows), np.asarray(cols)], axis=1), axis=0)
    parts = polygonize_cells(uniq[:, 0], uniq[:, 1], x0, y0, cellsize, nrows)
    from .wkb import decode

    polys = []
    total_area = 0.0
    for _comp, wkb, _n, area in parts:
        _, rings = decode(wkb)
        polys.extend(rings)
        total_area += area
    return encode_multipolygon(polys), float(total_area), len(parts), len(uniq)
