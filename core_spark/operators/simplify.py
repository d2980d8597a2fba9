"""Douglas-Peucker ring simplification: fewer vertices, same shape.

Admin boundaries arrive at survey precision (thousands of vertices per
ring); every PIP ray-cast and every broadcast payload pays for all of
them. Douglas-Peucker (1973) is THE standard line-generalization
algorithm: keep the two anchors, recursively keep whichever point lies
farthest from the current chord while that distance exceeds ``eps``,
drop everything else. Its guarantee — every dropped vertex lies within
``eps`` of the simplified chain — is exactly the error bound a PIP
candidate filter tolerates (envelope padding by eps keeps candidate
generation sound; the tests pin the guarantee itself).

Closed rings have no natural anchors, so the standard ring adaptation
applies: anchor at vertex 0 and at the vertex FARTHEST from it (first
index on ties — deterministic), run DP on the two halves, reassemble,
re-close. Survival tests are EXACT: the perpendicular comparison is
cross-multiplied (``cross² > eps²·|AB|²`` — products only, no
division, no sqrt), so which vertices survive is bit-deterministic;
STRICT inequality means a vertex exactly eps away is dropped
(documented, pinned).

Plumbing: one Arrow-batched ``mapInArrow`` stage over the polygon
DIRECTORY (host-bounded like PIP's payload — never the point corpus),
simplifying every ring of every part; the recursion is an explicit
stack (no Python recursion limits on pathological rings). Output
schema mirrors the input with ``rings`` replaced and per-part
``n_vertices_in/out`` counters so the reduction is visible in the
gated data. mapInArrow (not mapInPandas) is load-bearing: pyspark's
arrow_to_pandas SEGFAULTS converting the triply-nested rings column
(pyarrow nested-list → pandas block conversion); staying in pyarrow
and pulling rows via ``to_pylist`` sidesteps the pandas layer and is
cheaper anyway for a column we immediately re-nest.

No reference counterpart (specvital/core has no spatial subsystem);
the algorithm is the published Douglas & Peucker 1973 / Hershberger-
Snoeyink formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _seg_dist2(px, py, ax, ay, bx, by) -> tuple[float, float]:
    """Squared distance from P to SEGMENT AB as an exact (num, den) pair.

    Segment distance, not infinite-line distance: a point that projects
    BEYOND the chord can be arbitrarily far from the segment while
    sitting on the line — the classic DP soundness hole (found by the
    property fuzz in tests); clamping to the endpoints restores the
    "every dropped vertex within eps of the simplified CHAIN"
    guarantee. All branches are products/compares — no division, no
    sqrt — so survival stays bit-deterministic.
    """
    dx, dy = bx - ax, by - ay
    seg2 = dx * dx + dy * dy
    if seg2 == 0.0:
        return (px - ax) ** 2 + (py - ay) ** 2, 1.0
    t_num = (px - ax) * dx + (py - ay) * dy
    if t_num <= 0.0:
        return (px - ax) ** 2 + (py - ay) ** 2, 1.0
    if t_num >= seg2:
        return (px - bx) ** 2 + (py - by) ** 2, 1.0
    cr = dx * (py - ay) - dy * (px - ax)
    return cr * cr, seg2


def _dp_open(pts: list, eps: float, keep: list, lo: int, hi: int) -> None:
    """Mark survivors of the open polyline pts[lo..hi] (anchors kept)."""
    e2 = eps * eps
    stack = [(lo, hi)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        ax, ay = pts[a]
        bx, by = pts[b]
        best_val = -1.0
        best = (-1, 0.0, 1.0)
        for i in range(a + 1, b):
            px, py = pts[i]
            num, den = _seg_dist2(px, py, ax, ay, bx, by)
            val = num / den  # float ranking; survival below is exact
            if val > best_val:
                best_val = val
                best = (i, num, den)
        best_i, num, den = best
        if num > e2 * den:  # exact, cross-multiplied
            keep[best_i] = True
            stack.append((a, best_i))
            stack.append((best_i, b))


def simplify_ring(ring: list, eps: float) -> list:
    """DP-simplify one CLOSED ring (first == last); returns a closed ring.

    Degenerate collapses (everything within eps of vertex 0) return the
    minimal closed triangle-or-less that remains — callers treating
    area seriously should drop rings below 4 positions afterwards.
    """
    if len(ring) <= 4:
        return list(ring)
    open_pts = [tuple(p[:2]) for p in ring[:-1]]
    x0, y0 = open_pts[0]
    far_i, far_d = 0, -1.0
    for i, (x, y) in enumerate(open_pts):
        d = (x - x0) ** 2 + (y - y0) ** 2
        if d > far_d:
            far_d, far_i = d, i
    if far_i == 0:  # all points identical
        return [list(open_pts[0]), list(open_pts[0])]
    cyc = open_pts + [open_pts[0]]  # indices 0..n (closing anchor)
    keep = [False] * len(cyc)
    keep[0] = keep[far_i] = keep[len(cyc) - 1] = True
    _dp_open(cyc, eps, keep, 0, far_i)
    _dp_open(cyc, eps, keep, far_i, len(cyc) - 1)
    out = [list(cyc[i]) for i in range(len(cyc)) if keep[i]]
    return out


def simplify_rings(
    df: DataFrame, eps: float, rings_col: str = "rings"
) -> DataFrame:
    """Replace ``rings_col`` with DP-simplified rings; append
    n_vertices_in / n_vertices_out (BIGINT) per row. NULL rings pass
    through with NULL counters."""
    if eps < 0:
        raise ValueError(f"simplify_rings: eps must be >= 0, got {eps}")
    fields = ", ".join(
        f.name + " " + f.dataType.simpleString() for f in df.schema.fields
    )
    schema = fields + ", n_vertices_in bigint, n_vertices_out bigint"

    def run(batches):
        import pyarrow as pa

        for batch in batches:
            out_schema = batch.schema.append(
                pa.field("n_vertices_in", pa.int64())
            ).append(pa.field("n_vertices_out", pa.int64()))
            rows = batch.to_pylist()
            for row in rows:
                rings = row[rings_col]
                if rings is None:
                    row["n_vertices_in"] = None
                    row["n_vertices_out"] = None
                    continue
                simp = [simplify_ring(r, eps) for r in rings]
                row[rings_col] = simp
                row["n_vertices_in"] = sum(len(r) for r in rings)
                row["n_vertices_out"] = sum(len(r) for r in simp)
            yield pa.RecordBatch.from_pylist(rows, schema=out_schema)

    return df.mapInArrow(run, schema)
