"""Product quantization (PQ) for embedding corpora.

The memory math that makes 100 TB ANN serving possible: a 64-dim float32
vector is 256 bytes; its PQ code (m=4 subspaces × 1 byte) is 4 bytes — a
64× compression that turns a petabyte-scale vector corpus into something
executors can hold and scan. Jégou et al., "Product Quantization for
Nearest Neighbor Search" (TPAMI 2011) is the public reference; this is the
pipeline-side fit/encode plus the ADC (asymmetric distance computation)
scan.

Scale shape:

- **fit**: m independent k-means fits over dimension slices — reuses
  ``clustering.kmeans_fit`` (deterministic lowest-id seeding,
  order-independent DECIMAL centroid means), so the whole model is
  bit-reproducible and even SQL-expressible (the registry oracle unrolls
  all m fits as chained CTEs). Model size is m × k × d_sub floats —
  driver-resident by design.
- **encode**: ONE narrow projection — per subspace an argmin over k
  literal centroids, all inside whole-stage codegen (``slice`` +
  ``zip_with``/``aggregate`` folds). No shuffle, no joins, no Python; at
  100 TB this is a scan that writes 4-byte codes.
- **ADC query**: the query vector builds an m × k lookup table of partial
  squared distances driver-side (model-sized); each candidate's
  approximate distance is m table lookups summed in fixed order —
  ``TakeOrderedAndProject`` finishes top-k without a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import _sqdist_to, kmeans_fit


def pq_fit(
    emb: DataFrame,
    m: int = 4,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Fit m per-subspace codebooks (each k × dim/m) with the deterministic
    k-means. Returns plain Python lists — model-sized, never data-sized."""
    dim = emb.select(F.size(F.col(vec_col))).first()[0]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    books = []
    for s in range(m):
        sub = emb.select(
            F.col(id_col).alias("vec_id"),
            F.slice(F.col(vec_col), s * d_sub + 1, d_sub).alias("embedding"),
        )
        books.append(kmeans_fit(sub, k=k, n_iter=n_iter))
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors to (id, code_0..code_{m-1}) — one codegen projection,
    argmin ties resolved to the lowest code (``array_position`` finds the
    first minimum)."""
    cols = [F.col(id_col)]
    for s, cb in enumerate(codebooks):
        d_sub = len(cb[0])
        sub = F.slice(F.col(vec_col), s * d_sub + 1, d_sub)
        dists = F.array(*[_sqdist_to(sub, c) for c in cb])
        code = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        cols.append(code.alias(f"code_{s}"))
    return emb.select(*cols)


def pq_adc_topk(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    topk: int = 20,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k by ADC: per-subspace query→centroid squared
    distances become literal lookup arrays; each row's distance is m
    ``element_at`` lookups summed in fixed subspace order (deterministic
    IEEE evaluation both engines). Rounded to 6 decimals BEFORE the top-k
    order so the cut is stable cross-engine."""
    terms = []
    for s, cb in enumerate(codebooks):
        d_sub = len(cb[0])
        qs = query[s * d_sub : (s + 1) * d_sub]
        lut = []
        for c in cb:
            d = 0.0
            for a, b in zip(qs, c):
                d = d + (float(a) - float(b)) * (float(a) - float(b))
            lut.append(d)
        terms.append(
            F.element_at(
                F.array(*[F.lit(v) for v in lut]), F.col(f"code_{s}") + 1
            )
        )
    dist = terms[0]
    for t in terms[1:]:
        dist = dist + t
    m = len(codebooks)
    return (
        codes.withColumn("adc_dist", F.round(dist, 6))
        .orderBy("adc_dist", id_col)
        .limit(topk)
        .select(id_col, *[f"code_{s}" for s in range(m)], "adc_dist")
    )
