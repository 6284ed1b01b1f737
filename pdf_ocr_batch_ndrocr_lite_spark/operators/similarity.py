"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline; LSH/IVF bucketed
variants as the scale path.  All vector arithmetic is JVM-side
(`F.aggregate` / `F.zip_with` inside whole-stage codegen) — no Python in the
hot path.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# NOTE on the vector kernels: the left-fold F.aggregate/zip_with form is
# the DEFAULT because (a) the DuckDB oracle can replicate the exact IEEE
# addition sequence (bitwise-reproducible scores) — it is what every
# oracle-gated query runs — and (b) it is NOT the bottleneck: measured
# on a 100k × dim-768 cosine scan, local[32], the codegen'd JVM fold ran
# 12.4 s vs 18.4 s for the Arrow/numpy path (best-of-2) — the Arrow IPC
# of ~600 MB of vectors to Python costs more than the fold saves.
# kernel="blas" (a vectorized pandas_udf over numpy) exists for
# deployments where the vectors already cross into Python (a model-
# scoring stage downstream) or GPU-adjacent workers; its reduction order
# is UNSPECIFIED: scores agree to ~1e-12 relative (float64 inputs), so
# borderline threshold/rank decisions can differ — gated by the
# tolerance-based verifier tests (test_similarity.py), never by the
# exact-hash oracle.  The plan shape (map stage, no shuffle) is
# identical for both kernels, so none of the scale properties change.
from .vecmath import dot as _dot, norm as _norm  # noqa: E402 — shared
# exact fold kernels (one definition: the fold order is oracle contract)


def _blas_query_cosine_udf(query: Sequence[float]):
    """Arrow-batched numpy cosine against a constant query vector."""
    q = np.asarray([float(v) for v in query], dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))
    if qn == 0.0:
        raise ValueError("query vector has zero norm: cosine undefined")

    @F.pandas_udf("double")
    def _udf(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="float64")
        m = np.stack(v.to_numpy()).astype(np.float64)
        den = np.sqrt((m * m).sum(axis=1)) * qn
        # zero-norm row → NULL, never NaN (Spark sorts NaN above every
        # number — a NaN cosine would win a top-k); matches the exact
        # kernel's when(norm > 0) guard
        out = (m @ q) / np.where(den > 0, den, 1.0)
        res = pd.array(out, dtype="Float64")
        res[den <= 0] = pd.NA
        return pd.Series(res, dtype="Float64")

    return _udf


def _exact_query_cosine(vec_col, query):
    """Exact left-fold cosine against a constant query; zero-norm rows
    yield NULL instead of an ANSI DIVIDE_BY_ZERO."""
    qn = sum(float(v) * float(v) for v in query) ** 0.5
    if qn == 0.0:
        raise ValueError("query vector has zero norm: cosine undefined")
    q = F.array(*[F.lit(float(v)) for v in query])
    n = _norm(vec_col)
    return F.when(n > 0, _dot(vec_col, q) / (n * F.lit(qn)))


def cosine_to_query(emb: DataFrame, query: Sequence[float],
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    kernel: str = "exact") -> DataFrame:
    """(id, cosine) of every row against a constant query vector.

    The query broadcasts as a literal array (exact kernel) or inside the
    Arrow UDF closure (blas kernel) — a pure map stage either way, no
    shuffle, scan-bound at any scale.  See the kernel note above for the
    exact-vs-blas contract."""
    if kernel not in ("exact", "blas"):
        raise ValueError(f"unknown kernel {kernel!r} (exact|blas)")
    if kernel == "blas":
        return emb.select(
            F.col(id_col),
            _blas_query_cosine_udf(query)(F.col(vec_col)).alias("cosine"))
    return emb.select(
        F.col(id_col),
        _exact_query_cosine(F.col(vec_col), query).alias("cosine"),
    )


def brute_force_topk(emb: DataFrame, query: Sequence[float], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     kernel: str = "exact") -> DataFrame:
    """Global top-k by cosine: map stage + TakeOrdered (no full sort —
    Spark's sort-limit physical operator keeps k rows per partition)."""
    scored = cosine_to_query(emb, query, id_col, vec_col, kernel=kernel)
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def topk_per_bucket(emb: DataFrame, query: Sequence[float], k: int = 3,
                    bucket_col: str = "label", id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Top-k within each coarse bucket (IVF cell / LSH bucket / shard):
    window rank over bucket — the distributed ANN building block."""
    scored = cosine_to_query(emb, query, id_col, vec_col) \
        .join(emb.select(id_col, bucket_col), id_col)
    w = Window.partitionBy(bucket_col).orderBy(
        F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(bucket_col, id_col, "cosine", "rank")
    )


def random_hyperplane_buckets(emb: DataFrame, planes: List[Sequence[float]],
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Sign-LSH bucket id per row (random-hyperplane rounding, Charikar
    STOC 2002): bit b = (v · plane_b) > 0.

    `planes` are fixed constants (seeded off-line), so bucketing is a pure
    map stage; an ANN query probes only matching (or near-matching) buckets
    instead of the full corpus — the scan shrinks by ~2^len(planes)."""
    bucket = F.lit(0).cast("bigint")
    for b, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(_dot(F.col(vec_col), p) > 0,
                     F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        bucket = bucket + F.shiftleft(bit, b)
    return emb.select(F.col(id_col), bucket.alias("bucket"))


def lsh_topk(emb: DataFrame, query: Sequence[float],
             planes: List[Sequence[float]], k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: score only rows in the query's hyperplane bucket."""
    q_bucket = 0
    for b, plane in enumerate(planes):
        dot = sum(float(x) * float(y) for x, y in zip(query, plane))
        if dot > 0:
            q_bucket |= 1 << b
    buckets = random_hyperplane_buckets(emb, planes, id_col, vec_col)
    candidates = emb.join(
        buckets.filter(F.col("bucket") == q_bucket).select(id_col), id_col)
    return brute_force_topk(candidates, query, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path of
# Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor Search",
# TPAMI 2011: assign every vector to its nearest centroid cell (pure map
# stage over fixed centroids), then answer a query by scanning only the
# `nprobe` cells nearest to the query instead of the corpus.  At lake
# scale the assignment is computed once and the table is partitioned by
# cell, so a query touches nprobe/C of the data.
# ---------------------------------------------------------------------------


def _sq_dist(vec_col, centroid: Sequence[float]):
    """Left-fold squared L2 distance — the exact op order the SQL oracle
    replicates term by term, so cell assignment is bit-identical."""
    carr = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(vec_col, carr, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v)


def _sq_dist_col(vec_col, cvec_col):
    """The SAME left-fold squared L2, between two array COLUMNS — the
    broadcast-path twin of `_sq_dist`: identical per-element term order,
    so literal- and broadcast-path distances are bit-identical."""
    return F.aggregate(
        F.zip_with(vec_col, cvec_col, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v)


#: above this k, centroid transport switches from plan literals to the
#: broadcast one-row codebook (see `ivf_assign`).  16 keeps every
#: bit-proven small-k oracle (q51 k=4, q72 k=3) on the literal path
#: while any real coarse quantizer (k in the thousands) broadcasts.
BROADCAST_K_THRESHOLD = 16


def centroids_df(spark, centroids: List[Sequence[float]]) -> DataFrame:
    """(cell, cvec) centroid table from a driver-side list — rows travel
    the DATA plane (serialized relation), never the plan."""
    rows = [(i, [float(v) for v in c]) for i, c in enumerate(centroids)]
    return spark.createDataFrame(rows, "cell int, cvec array<double>")


def _packed_codebook(cents: DataFrame) -> DataFrame:
    """ONE row holding every centroid as array<struct<cell,cvec>>,
    cell-sorted (collect_list order is nondeterministic; array_sort on
    the struct restores the total order cells are unique under)."""
    return cents.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("cell").cast("int").alias("cell"),
                                    F.col("cvec")))).alias("_cents"))


def _ivf_assign_broadcast(emb: DataFrame, cents: DataFrame,
                          id_col: str, vec_col: str) -> DataFrame:
    """Scale path: nearest-cell assignment against a BROADCAST codebook.

    The k×dim centroid payload rides a broadcast relation (one row of
    array<struct<cell,cvec>>), so the PLAN stays O(1) in k — the literal
    formulation put O(k·dim) expressions in the plan, the same driver
    planning blow-up class the PSL notes measure for `Column.isin`, and
    at a real coarse quantizer (k=4096-65536, dim 768) that is millions
    of literals before any data moves.  Per row: one
    array_min(transform(codebook, struct(dist, cell))) — the struct min
    is (dist, cell)-ordered, i.e. lowest cell among equal minima,
    exactly the literal path's array_position first-minimum rule; the
    per-element fold arithmetic is `_sq_dist_col` = `_sq_dist`, so
    assignments are bit-identical (property-tested).  Zero shuffle: a
    1-row BroadcastNestedLoopJoin fuses into the scan stage.  A NULL or
    ragged (wrong-dim) vector yields NULL distances on BOTH paths —
    the final when() nulls the cell instead of letting NULLS-FIRST
    struct ordering elect a bogus winner."""
    joined = emb.select(F.col(id_col), F.col(vec_col)) \
        .join(F.broadcast(_packed_codebook(cents)))
    best = F.array_min(F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            _sq_dist_col(F.col(vec_col), c["cvec"]).alias("dist"),
            c["cell"].alias("cell"))))
    # stage `best` in its own projection: it is referenced twice (dist
    # guard + cell pick) and HOF expressions are never CSE'd
    staged = joined.select(F.col(id_col), best.alias("_best"))
    cell = F.when(F.col("_best")["dist"].isNotNull(),
                  F.col("_best")["cell"]).cast("int")
    return staged.select(F.col(id_col), cell.alias("cell"))


def ivf_assign(emb: DataFrame, centroids, id_col: str = "vec_id",
               vec_col: str = "embedding",
               broadcast_threshold: int = BROADCAST_K_THRESHOLD
               ) -> DataFrame:
    """(id, cell): nearest-centroid cell per row, first-minimum tie-break.

    Centroid transport is picked by size: below ``broadcast_threshold``
    the centroids enter the plan as literal arrays (bit-proven by the
    q51/q72 oracles; zero join); at or above it — or when ``centroids``
    is already a (cell, cvec) DataFrame, the lake-scale form — they ride
    a broadcast codebook row instead (`_ivf_assign_broadcast`), keeping
    the plan O(1) in k.  Both paths produce bit-identical assignments
    (same fold arithmetic, same tie rule)."""
    if isinstance(centroids, DataFrame):
        return _ivf_assign_broadcast(emb, centroids, id_col, vec_col)
    if len(centroids) >= broadcast_threshold:
        cents = centroids_df(emb.sparkSession, centroids)
        return _ivf_assign_broadcast(emb, cents, id_col, vec_col)
    dists = F.array(*[_sq_dist(F.col(vec_col), c) for c in centroids])
    cell = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return emb.select(F.col(id_col), cell.alias("cell"))


def kmeans_fit(emb: DataFrame, k: int = 3, iters: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               broadcast_threshold: int = BROADCAST_K_THRESHOLD
               ) -> List[List[float]]:
    """Train the IVF coarse quantizer: Lloyd's k-means over the
    embedding column, returning `k` centroids for
    :func:`ivf_assign` / :func:`ivf_topk` (previously the caller had to
    supply centroids from elsewhere).

    Scale/determinism design:

    - Deterministic init: the `k` lowest-id vectors (no RNG — the same
      corpus always trains the same index).
    - Centroids live on the DRIVER between rounds (k × dim floats —
      bytes, not data), entering each round as literals below
      ``broadcast_threshold`` and as a broadcast codebook row at or
      above it (plan stays O(1) in k): every round's plan is scan →
      one fused assign+sum aggregation, with NO iterative self-join
      and no lineage growth (the planning-explosion trap
      connected_components had to barrier around simply never arises).
    - Each round is ONE job: cell assignment (the same left-fold
      squared-L2 + first-minimum rule as `ivf_assign`) fused with
      per-cell per-dimension sums in a single groupBy — k rows come
      back, nothing else.
    - Per-dimension sums accumulate in DECIMAL(38,12): decimal addition
      is order-independent, so the trained centroids are bit-stable
      under any partitioning (a double sum would drift with task
      scheduling and flip boundary assignments); the single
      decimal→double + divide per centroid element is reproducible IEEE
      (and is exactly what the q72 oracle recomputes).
    - An empty cell keeps its previous centroid (deterministic; no
      re-seeding RNG).
    """
    if k <= 0 or iters < 0:
        raise ValueError(f"k must be positive, iters >= 0: {k=}, {iters=}")
    seed_rows = emb.select(F.col(id_col), F.col(vec_col)) \
        .filter(F.col(vec_col).isNotNull()) \
        .orderBy(id_col).limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(seed_rows)}")
    centroids = [[float(v) for v in r[vec_col]] for r in seed_rows]
    dim = len(centroids[0])
    for _ in range(iters):
        if k >= broadcast_threshold:
            # scale path: the round's centroids enter as a broadcast
            # codebook row, not O(k·dim) plan literals — same fold
            # arithmetic and tie rule, so the trained centroids are
            # bit-identical to the literal path (see
            # `_ivf_assign_broadcast`; property- and oracle-tested)
            cents = centroids_df(emb.sparkSession, centroids)
            joined = emb.select(F.col(vec_col).alias("_v")) \
                .join(F.broadcast(_packed_codebook(cents)))
            best = F.array_min(F.transform(
                F.col("_cents"),
                lambda c: F.struct(
                    _sq_dist_col(F.col("_v"), c["cvec"]).alias("dist"),
                    c["cell"].alias("cell"))))
            staged = joined.select(F.col("_v"), best.alias("_best"))
            cell = F.when(F.col("_best")["dist"].isNotNull(),
                          F.col("_best")["cell"]).cast("int")
        else:
            dists = F.array(*[_sq_dist(F.col(vec_col), c)
                              for c in centroids])
            # stage the distance array: it is referenced twice (min +
            # position) and HOF expressions are never CSE'd (SPARK-35410)
            staged = emb.select(F.col(vec_col).alias("_v"),
                                dists.alias("_d"))
            cell = (F.array_position(F.col("_d"),
                                     F.array_min(F.col("_d")))
                    - 1).cast("int")
        # try_element_at, not element_at: under Spark 4's default ANSI
        # mode an out-of-bounds index RAISES in the executor, so one
        # ragged (shorter-than-dim) embedding would abort the whole
        # training job — with try_ the ragged row's missing dims are
        # NULL (skipped by SUM) and its NULL cell (NULL distances via
        # zip_with) already keeps it out of every centroid
        agg = (staged.select(cell.alias("cell"), "_v")
               .groupBy("cell")
               .agg(F.count(F.lit(1)).alias("_n"),
                    *[F.sum(F.try_element_at("_v", F.lit(i + 1))
                            .cast("double")
                            .cast("decimal(38,12)")).alias(f"_s{i}")
                      for i in range(dim)])
               .collect())
        by_cell = {int(r["cell"]): r for r in agg if r["cell"] is not None}
        centroids = [
            [float(by_cell[j][f"_s{i}"]) / int(by_cell[j]["_n"])
             for i in range(dim)]
            if j in by_cell else centroids[j]
            for j in range(k)
        ]
    return centroids


def query_probe_cells(query: Sequence[float],
                      centroids: List[Sequence[float]],
                      nprobe: int = 2) -> List[int]:
    """The nprobe cells nearest to the query (driver-side: centroids are
    tiny constants).  Same left-fold arithmetic as `_sq_dist`, ties break
    by cell index."""
    def d2(c):
        acc = 0.0
        for x, y in zip(query, c):
            acc = acc + (float(x) - float(y)) * (float(x) - float(y))
        return acc
    order = sorted(range(len(centroids)), key=lambda i: (d2(centroids[i]), i))
    return order[:max(1, nprobe)]


def _cells_with_payload(emb: DataFrame, centroids, id_col: str,
                        vec_col: str,
                        broadcast_threshold: int = BROADCAST_K_THRESHOLD
                        ) -> DataFrame:
    """(id, vec, cell) in ONE scan of ``emb`` — nearest-cell assignment
    carrying the vector payload through the projection (the `knn_join`
    corpus-side formulation), so callers never re-join a separate
    (id, cell) frame back onto the embedding relation (a second full
    scan + an id-keyed exchange).  Centroid transport and tie rule are
    identical to `ivf_assign` (bit-identical assignments on both
    paths); rows with NULL/ragged vectors get a NULL cell."""
    if isinstance(centroids, DataFrame) \
            or len(centroids) >= broadcast_threshold:
        cents = centroids if isinstance(centroids, DataFrame) \
            else centroids_df(emb.sparkSession, centroids)
        joined = emb.select(F.col(id_col), F.col(vec_col)) \
            .join(F.broadcast(_packed_codebook(cents)))
        best = F.array_min(F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                _sq_dist_col(F.col(vec_col), c["cvec"]).alias("dist"),
                c["cell"].alias("cell"))))
        # stage the HOF min in its own projection (never CSE'd,
        # referenced twice: NULL guard + cell pick)
        staged = joined.select(F.col(id_col), F.col(vec_col),
                               best.alias("_best"))
        cell = F.when(F.col("_best")["dist"].isNotNull(),
                      F.col("_best")["cell"]).cast("int")
        return staged.select(F.col(id_col), F.col(vec_col),
                             cell.alias("cell"))
    dists = F.array(*[_sq_dist(F.col(vec_col), c) for c in centroids])
    staged = emb.select(F.col(id_col), F.col(vec_col), dists.alias("_d"))
    cell = (F.array_position(F.col("_d"), F.array_min(F.col("_d"))) - 1) \
        .cast("int")
    return staged.select(F.col(id_col), F.col(vec_col),
                         cell.alias("cell"))


def ivf_topk(emb: DataFrame, query: Sequence[float],
             centroids, k: int = 10, nprobe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             kernel: str = "exact") -> DataFrame:
    """ANN top-k: brute-force cosine restricted to the query's nprobe
    nearest IVF cells.  (id, cell, cosine), best first.  `kernel` picks
    the candidate-scoring arithmetic (see module kernel note); cell
    ASSIGNMENT always stays on the exact left-fold path — a flipped
    assignment would change which rows are scanned, not just a low bit
    of a score.  ``centroids`` may be a driver list or a (cell, cvec)
    DataFrame (lake-scale codebook) — with a DataFrame, probe selection
    runs as a tiny k-row job (query enters as O(dim) literals) instead
    of collecting the codebook to the driver."""
    if isinstance(centroids, DataFrame):
        probe_rows = (centroids
                      .select("cell",
                              _sq_dist(F.col("cvec"), query).alias("_d"))
                      .orderBy("_d", "cell").limit(max(1, nprobe))
                      .collect())
        probes = [int(r["cell"]) for r in probe_rows]
    else:
        probes = query_probe_cells(query, centroids, nprobe)
    # assignment carries the payload through the projection (ONE scan
    # of the embedding relation) — re-joining a separate (id, cell)
    # frame back on the id would scan the corpus twice plus an id-keyed
    # exchange, the shape knn_join's corpus side explicitly avoids
    candidates = _cells_with_payload(emb, centroids, id_col, vec_col) \
        .filter(F.col("cell").isin([int(p) for p in probes]))
    # score in place on the candidate frame — joining a separate scored
    # frame back would re-evaluate the centroid-argmin lineage twice
    if kernel not in ("exact", "blas"):
        raise ValueError(f"unknown kernel {kernel!r} (exact|blas)")
    if kernel == "blas":
        cos = _blas_query_cosine_udf(query)(F.col(vec_col))
    else:
        cos = _exact_query_cosine(F.col(vec_col), query)
    scored = candidates.select(F.col(id_col), F.col("cell"),
                               cos.alias("cosine"))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)) \
        .select(id_col, "cell", "cosine").limit(k)


# ---------------------------------------------------------------------------
# Batched k-NN JOIN: top-k nearest corpus vectors for EVERY row of a
# queries table (vs ivf_topk's single driver-side query).  This is the
# operator a training-data pipeline actually runs at scale — retrieval
# dedup across corpora, hard-negative mining, embedding-space
# decontamination — and a naive formulation is a queries × corpus cross
# join, which must never exist.  Shape:
#
#   corpus → broadcast-codebook cell assignment   (zero shuffle)
#   queries → per-row nprobe nearest cells        (zero shuffle, HOF
#             array_sort over the same broadcast codebook row; the
#             probe rule equals ivf_topk's (dist, cell) ordering)
#   join on cell through the salted two-sided guard (a degenerate
#             quantizer cell is split, never a straggler task)
#   exact left-fold cosine + per-query row_number ≤ k
#
# Two real exchanges total (the cell join and the per-query window) —
# both keyed, both bounded by candidate volume (nprobe/cells of the
# corpus per query), never by |queries| × |corpus|.
# ---------------------------------------------------------------------------


def query_probe_cells_df(queries: DataFrame, cents: DataFrame,
                         id_col: str = "query_id",
                         vec_col: str = "embedding",
                         nprobe: int = 2,
                         keep_cols: tuple = ()) -> DataFrame:
    """(id, *keep_cols, cell): each query row's ``nprobe`` nearest
    centroid cells — the per-ROW twin of `query_probe_cells`, via the
    one-row broadcast codebook.  array_sort on (dist, cell) structs
    reproduces the (dist asc, cell asc) probe ordering exactly.  Queries
    whose vector is NULL/ragged produce NULL distances and are dropped
    (no cells to probe — same contract as `ivf_assign`'s NULL cell).

    ``keep_cols``: extra columns of `queries` carried through to the
    output (may include ``vec_col`` itself) — lets a caller attach the
    query payload/norm in the SAME scan instead of re-reading the query
    table and joining the probe frame back on the id (the double-scan
    shape the corpus side of `knn_join` explicitly avoids)."""
    base = list(dict.fromkeys([id_col, *keep_cols, vec_col]))
    joined = queries.select(*[F.col(c) for c in base]) \
        .join(F.broadcast(_packed_codebook(cents)))
    scored = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            _sq_dist_col(F.col(vec_col), c["cvec"]).alias("dist"),
            c["cell"].alias("cell")))
    probes = F.slice(F.array_sort(scored), 1, max(1, int(nprobe)))
    out = [id_col, *keep_cols]
    # stage the HOF result: referenced once here but explode must not
    # re-evaluate k folds per output row (HOFs are never CSE'd)
    staged = joined.select(*[F.col(c) for c in out], probes.alias("_p"))
    return (staged.select(*[F.col(c) for c in out],
                          F.explode("_p").alias("_pc"))
            .filter(F.col("_pc.dist").isNotNull())
            .select(*[F.col(c) for c in out],
                    F.col("_pc.cell").alias("cell")))


def knn_join(queries: DataFrame, corpus: DataFrame, centroids,
             k: int = 10, nprobe: int = 2,
             query_id_col: str = "query_id",
             corpus_id_col: str = "vec_id",
             vec_col: str = "embedding",
             bucket_cap: int = 100_000,
             max_salts: int = 64) -> DataFrame:
    """(query_id, corpus_id, cosine, rank): the ``k`` highest-cosine
    corpus vectors per query among the query's ``nprobe`` IVF cells.

    ``centroids``: driver list or (cell, cvec) DataFrame codebook (from
    `centroids_df` / `kmeans_fit`).  Ranking is (cosine desc,
    corpus_id asc) — deterministic under ties; zero-norm corpus rows
    score NULL and are excluded before ranking on both engines (Spark
    and the DuckDB oracle disagree on NULL placement under DESC, so
    NULL candidates must never reach the window)."""
    from .dedup import salted_two_sided_join

    cents = (centroids if isinstance(centroids, DataFrame)
             else centroids_df(queries.sparkSession, centroids))

    # corpus side: broadcast-codebook cell assignment WITH the payload
    # (re-joining a separate (id, cell) frame would scan the corpus
    # twice) + the norm once per row
    cjoined = corpus.select(F.col(corpus_id_col), F.col(vec_col)) \
        .join(F.broadcast(_packed_codebook(cents)))
    cbest = F.array_min(F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            _sq_dist_col(F.col(vec_col), c["cvec"]).alias("dist"),
            c["cell"].alias("cell"))))
    cstaged = cjoined.select(F.col(corpus_id_col),
                             F.col(vec_col).alias("_cv"),
                             cbest.alias("_best"))
    cside = (cstaged
             .filter(F.col("_best")["dist"].isNotNull())
             .select(F.col(corpus_id_col),
                     F.col("_cv"),
                     _norm(F.col("_cv")).alias("_cn"),
                     F.col("_best")["cell"].cast("int").alias("cell")))

    # query side: payload + norm carried THROUGH the probe projection
    # (one scan, no probe-frame re-join on the id — r7 review finding)
    qside = query_probe_cells_df(
        queries.select(F.col(query_id_col),
                       F.col(vec_col).alias("_qv"),
                       _norm(F.col(vec_col)).alias("_qn")),
        cents, query_id_col, "_qv", nprobe, keep_cols=("_qv", "_qn"))

    # a corpus row owns exactly ONE cell and a query's probe cells are
    # distinct, so each (query, corpus) pair can match at most once —
    # no post-join distinct needed
    joined = salted_two_sided_join(qside, cside, ["cell"], corpus_id_col,
                                   bucket_cap, max_salts)
    den = F.col("b._cn") * F.col("a._qn")
    cos = F.when(den > 0, _dot(F.col("a._qv"), F.col("b._cv")) / den)
    scored = (joined.select(
        F.col(f"a.{query_id_col}").alias(query_id_col),
        F.col(f"b.{corpus_id_col}").alias(corpus_id_col),
        cos.alias("cosine"))
        .filter(F.col("cosine").isNotNull()))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(corpus_id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= int(k)))
