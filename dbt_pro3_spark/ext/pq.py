"""Product quantization (PQ) approximate nearest neighbor search.

The third classic ANN scale path alongside sign-LSH (similarity.py) and
IVF (ivf.py): compress each vector to M subspace codes (here 8 codes of
4 bits each — 64 dims -> 8 bytes, a 32x compression), then rank by
distance against the RECONSTRUCTED (decoded) vectors. At 100 TB the win
is memory traffic: the scan reads 8-byte codes instead of 256-byte
vectors, and the decode is a literal table lookup baked into the plan.

Training follows the FAISS recipe exactly as ivf.py does: per-subspace
k-means over a bounded driver-side sample (<= 2048 vectors, ONE collect);
everything corpus-sized — encoding, decoding, scoring — is a pure Column
expression over baked centroid literals: no shuffle, no UDF, no second
driver round-trip.

Rows-only by design (k-means centroids are float-iteration artifacts, the
round-1 rationale for keeping iterative float keys out of the hash
contract); tests/test_ann_recall.py-style recall assertions against the
exact brute-force ground truth are the accuracy contract.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import as_double


def train_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ks: int = 16,
    iters: int = 5,
    seed: int = 42,
) -> list[list[list[float]]]:
    """Per-subspace k-means codebooks: m codebooks of ks centroids, each
    over dim/m dims. One bounded collect (the training sample); Lloyd runs
    driver-side in numpy — the FAISS PQ training recipe."""
    x = df.select(as_double(F.col(vec_col)).alias("_v"))
    sample = np.array([r["_v"] for r in x.limit(2048).collect()], dtype=np.float64)
    dim = sample.shape[1]
    assert dim % m == 0, f"dim {dim} must divide into {m} subspaces"
    sub = dim // m
    rng = np.random.RandomState(seed)
    books: list[list[list[float]]] = []
    for j in range(m):
        s = sample[:, j * sub : (j + 1) * sub]
        cents = s[rng.choice(len(s), size=ks, replace=False)]
        for _ in range(iters):
            d2 = ((s[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            cells = d2.argmin(axis=1)
            for c in range(ks):
                members = s[cells == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(cents.tolist())
    return books


def _sub_dist2(vec: Column, start: int, centroid: list[float]) -> Column:
    """Squared distance between vec[start:start+len(centroid)] and a
    centroid literal — aggregate/zip_with fold (see similarity.dot for why
    not an unrolled element_at sum)."""
    lit = F.array(*[F.lit(float(v)) for v in centroid])
    piece = F.slice(vec, start + 1, len(centroid))
    return F.aggregate(
        F.zip_with(piece, lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def encode(
    df: DataFrame,
    books: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
) -> DataFrame:
    """Attach the PQ code array (one int per subspace): per subspace the
    argmin-distance centroid index, ties to the lowest index (array_position
    finds the FIRST minimum — deterministic)."""
    vec = as_double(F.col(vec_col))
    sub = len(books[0][0])
    codes = []
    for j, book in enumerate(books):
        d = F.array(*[_sub_dist2(vec, j * sub, c) for c in book])
        codes.append((F.array_position(d, F.array_min(d)) - 1).cast("int"))
    return df.withColumn(code_col, F.array(*codes))


def decode_expr(books: list[list[list[float]]], code_col: str = "pq_codes") -> Column:
    """Reconstructed vector: per subspace, look the code up in a baked
    centroid-table literal; flatten the m pieces back to a full vector."""
    pieces = []
    for j, book in enumerate(books):
        table = F.array(*[F.array(*[F.lit(float(v)) for v in c]) for c in book])
        pieces.append(F.element_at(table, F.element_at(F.col(code_col), j + 1) + 1))
    return F.flatten(F.array(*pieces))
