"""Per-partition CSR shards built and probed entirely with numpy.

The Spark analog of the reference's per-shard CSR construction
(tricore/src/tricount_gpu.cu:146-203 `split`/`node_index`): inside an
applyInPandas task, the Arrow batch of (vertex, nbrs) rows becomes
(offsets, flat neighbor array) once, and every per-edge gather afterwards is
a fancy-indexing expression — zero per-edge Python, matching the input_hint
invariant.
"""

from __future__ import annotations

import numpy as np


class CsrShard:
    """Sorted-vertex CSR with per-row (start, end) spans into a flat value
    array. Spans need not be contiguous — this lets Arrow list buffers be
    used zero-copy (values stay in arrival order; only the tiny vertex
    column is argsorted)."""

    __slots__ = ("vertices", "starts", "ends", "flat")

    def __init__(
        self, vertices: np.ndarray, starts: np.ndarray, ends: np.ndarray, flat: np.ndarray
    ):
        self.vertices = vertices
        self.starts = starts
        self.ends = ends
        self.flat = flat

    @classmethod
    def from_arrow_lists(cls, vertices, list_array) -> "CsrShard":
        """Zero-copy CSR from an Arrow list column: the child values buffer
        IS the flat array; per-row offsets come from the list buffer; only
        the vertex ids are argsorted (tiny vs re-sorting the values)."""
        import pyarrow as pa

        if isinstance(list_array, pa.ChunkedArray):
            list_array = list_array.combine_chunks()
        verts = np.asarray(vertices, dtype=np.int64)
        offs = np.asarray(list_array.offsets)
        flat = np.asarray(list_array.values, dtype=np.int64)
        order = np.argsort(verts, kind="stable")
        return cls(
            verts[order],
            offs[:-1][order].astype(np.int64),
            offs[1:][order].astype(np.int64),
            flat,
        )

    @classmethod
    def from_flat(cls, owners: np.ndarray, nbrs: np.ndarray) -> "CsrShard":
        """Build from flat (owner, nbr) pairs — one lexsort + one unique, no
        per-row Python. Neighbor lists come out sorted; duplicates are kept
        (upstream guarantees distinct edges)."""
        owners = np.asarray(owners, dtype=np.int64)
        nbrs = np.asarray(nbrs, dtype=np.int64)
        if owners.size == 0:
            return cls(
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
            )
        order = np.lexsort((nbrs, owners))
        o_sorted = owners[order]
        flat = nbrs[order]
        vertices, starts = np.unique(o_sorted, return_index=True)
        ends = np.empty(len(vertices), dtype=np.int64)
        ends[:-1] = starts[1:]
        ends[-1] = len(flat)
        return cls(vertices, starts.astype(np.int64), ends, flat)

    @classmethod
    def from_lists(cls, vertices, nbr_lists) -> "CsrShard":
        v = np.asarray(vertices, dtype=np.int64)
        order = np.argsort(v, kind="stable")
        v = v[order]
        lists = [np.asarray(nbr_lists[i], dtype=np.int64) for i in order]
        lens = np.fromiter((len(x) for x in lists), dtype=np.int64, count=len(lists))
        starts = np.zeros(len(lists), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        flat = np.concatenate(lists) if lists else np.empty(0, dtype=np.int64)
        return cls(v, starts, starts + lens, flat.astype(np.int64, copy=False))

    def rows_of(self, keys: np.ndarray) -> np.ndarray:
        """CSR row index per key; -1 for keys absent from the shard."""
        keys = np.asarray(keys, dtype=np.int64)
        idx = np.searchsorted(self.vertices, keys)
        idx_c = np.minimum(idx, len(self.vertices) - 1) if len(self.vertices) else idx * 0
        ok = len(self.vertices) > 0
        found = (self.vertices[idx_c] == keys) if ok else np.zeros(len(keys), bool)
        return np.where(found, idx_c, -1)

    def gather(self, rows: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Concatenate the neighbor lists of `rows` (missing rows = empty).

        Returns (flat values, output row ids 0..len(rows)-1 repeated, lens).
        Fully vectorized: one arange + two repeats + one fancy index.
        """
        rows = np.asarray(rows, dtype=np.int64)
        if len(self.vertices) == 0:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
                np.zeros(len(rows), dtype=np.int64),
            )
        present = rows >= 0
        safe = np.maximum(rows, 0)
        starts = np.where(present, self.starts[safe], 0)
        ends = np.where(present, self.ends[safe], 0)
        lens = ends - starts
        total = int(lens.sum())
        if total == 0:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
                lens,
            )
        cum = np.cumsum(lens)
        out_pos = np.arange(total, dtype=np.int64)
        flat_idx = out_pos - np.repeat(cum - lens, lens) + np.repeat(starts, lens)
        row_ids = np.repeat(np.arange(len(rows), dtype=np.int64), lens)
        return self.flat[flat_idx], row_ids, lens


def intersect_count_csr(shard: CsrShard, u_keys: np.ndarray, v_keys: np.ndarray) -> np.ndarray:
    """|N(u_i) ∩ N(v_i)| for every edge i, via one encoded intersect1d.

    Both neighbor streams are gathered with CsrShard.gather (no per-edge
    Python), encoded as edge_id * stride + value, and intersected in a single
    numpy call — the batch analog of the reference's warp merge kernel.
    """
    n = len(u_keys)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    flat_a, rows_a, lens_a = shard.gather(shard.rows_of(u_keys))
    flat_b, rows_b, lens_b = shard.gather(shard.rows_of(v_keys))
    if flat_a.size == 0 or flat_b.size == 0:
        return np.zeros(n, dtype=np.int64)
    # shift to a non-negative base: intersections are invariant under a
    # common offset, and negative ids would silently collide in the encoding
    off = np.int64(min(flat_a.min(), flat_b.min()))
    max_v = np.int64(max(flat_a.max(), flat_b.max())) - off + 1
    if max_v > 0 and n > (np.iinfo(np.int64).max // max_v):
        # encoding would overflow int64 (raw sparse ids x huge batch):
        # per-edge fallback, still C-speed per row
        a_splits = np.split(flat_a, np.cumsum(lens_a)[:-1])
        b_splits = np.split(flat_b, np.cumsum(lens_b)[:-1])
        return np.fromiter(
            (
                np.intersect1d(a, b, assume_unique=True).size
                for a, b in zip(a_splits, b_splits)
            ),
            dtype=np.int64,
            count=n,
        )
    enc_a = rows_a * max_v + (flat_a - off)
    enc_b = rows_b * max_v + (flat_b - off)
    hits = np.intersect1d(enc_a, enc_b, assume_unique=True)
    return np.bincount(hits // max_v, minlength=n).astype(np.int64)
