"""Similarity search over the embedding column (array<float>).

Three tiers:
- ``embedding_stats``  : per-label norm statistics (sanity surface)
- ``knn_bruteforce``   : exact cosine top-k for a query set — the
  correctness baseline. O(|Q| * N) dot products, all JVM-side
  (zip_with + aggregate higher-order functions, no Python).
- ``knn_lsh_bucketed`` : random-hyperplane LSH bucketing — the scale
  path. Vectors are assigned a bucket from the sign pattern of dot
  products with fixed integer hyperplanes; each query searches only
  its bucket. Deterministic hyperplanes => the DuckDB oracle
  reproduces the exact same buckets and results.

At 100 TB the brute-force tier is only for oracle/recall testing; the
LSH tier's bucket join shuffles each vector once by bucket id, and
top-k within buckets is a per-group window — no cross-bucket traffic.
Multi-probe (flipping one plane's bit) would raise recall at 2x probe
cost; single-probe keeps the demo simple.
"""

from __future__ import annotations

import os
import stat

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from dfs_w_mapreduce_spark.catalog import fan_out, load_table
from dfs_w_mapreduce_spark.registry import QuerySpec

TOP_K = 5
N_QUERIES = 20  # query set = vec_id < 20

# --- adaptive LSH granularity -------------------------------------------
# The active plane count (=> bucket count 2^np) is derived IN-QUERY from
# the corpus size: np = smallest p in [MIN_PLANES, MAX_PLANES] with
# n <= TARGET_BUCKET_POP * 2^p, i.e. expected bucket population tracks
# TARGET_BUCKET_POP as the corpus grows. Within-bucket pair generation
# is O(sum b_i^2) ~= O(n * TARGET_BUCKET_POP) — linear in n — where a
# fixed bucket count would be O(n^2 / 2^planes), quadratic at 100x.
# The cascade is pure integer comparisons, so Spark and DuckDB derive
# the identical np from the identical count — no float log2 edge cases.
MIN_PLANES = 4    # 16 buckets — the small-fixture floor (<= 2048 vectors)
MAX_PLANES = 12   # 4096 buckets
TARGET_BUCKET_POP = 128

# Deterministic integer hyperplanes: hp_k[d] = ((a_k*(d+1) + b_k) % 97) - 48.
# Two independent bands (plane groups) support OR-construction for the
# dedup pair path: a pair is a candidate if it collides in ANY band,
# which holds recall up as np grows (P_hit = 1 - (1 - s^np)^bands).
# Band 0's first MIN_PLANES planes are the original 4, so small-fixture
# buckets are bit-identical to the fixed-width era.
PLANE_BANDS = [
    [(37, 11), (59, 29), (73, 47), (89, 5), (17, 53), (23, 71),
     (41, 13), (7, 61), (53, 19), (67, 3), (79, 31), (11, 43)],
    [(13, 7), (19, 23), (29, 41), (31, 59), (43, 17), (47, 67),
     (61, 37), (71, 2), (83, 29), (3, 83), (5, 73), (2, 89)],
]
N_BANDS = len(PLANE_BANDS)
PLANE_AB = PLANE_BANDS[0][:MIN_PLANES]  # legacy alias (docs/tests)


def _dot(x: Column, y: Column) -> Column:
    return F.aggregate(F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda a, v: a + v)


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out before the per-vector math: the fixture's embeddings
    # parquet is one scan split, so the norm computation and every
    # downstream bucket/dot fan-out otherwise start on a single task
    # (no-op at real scale — see catalog.fan_out)
    e = fan_out(spark, load_table(spark, sf_dir, "embeddings"))
    v = F.transform("embedding", lambda x: x.cast("double"))
    return e.select("vec_id", v.alias("v")).select(
        "vec_id", "v", F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nrm")
    )


_VECS_SQL = """
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
           sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                 list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS nrm
    FROM embeddings
"""


def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Norm statistics per label over the embedding column."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    nrm = F.sqrt(_dot(v, v))
    return (
        e.select("label", nrm.alias("nrm"), F.size("embedding").alias("dim"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
            F.round(F.min("nrm"), 4).alias("min_norm"),
            F.round(F.max("nrm"), 4).alias("max_norm"),
            F.max("dim").alias("dim"),
        )
    )


EMBEDDING_STATS_ORACLE = """
    SELECT label, count(*) AS n,
           round(avg(nrm), 4) AS avg_norm,
           round(min(nrm), 4) AS min_norm,
           round(max(nrm), 4) AS max_norm,
           CAST(max(dim) AS INT) AS dim
    FROM (SELECT label,
                 sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                       list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS nrm,
                 len(embedding) AS dim
          FROM embeddings)
    GROUP BY label
"""


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for the query set (vec_id < 20).
    Ranking on round(cos, 6) with vec_id tie-break keeps order
    deterministic across engines and accumulation orders."""
    v = _vecs(spark, sf_dir)
    q = v.filter(F.col("vec_id") < N_QUERIES).alias("q")
    c = v.alias("c")
    cos = F.round(
        _dot(F.col("q.v"), F.col("c.v")) / (F.col("q.nrm") * F.col("c.nrm")), 6
    )
    scored = q.join(c, F.col("q.vec_id") != F.col("c.vec_id")).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        cos.alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= TOP_K)


KNN_BRUTEFORCE_ORACLE = f"""
    WITH v AS ({_VECS_SQL})
    SELECT query_id, neighbor_id, cosine, CAST(rk AS INT) AS rk FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) DESC,
                            c.vec_id) AS rk
        FROM v q JOIN v c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ) WHERE rk <= {TOP_K}
"""


def q_knn_bruteforce_numpy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exact top-5 as knn_bruteforce, through the Arrow tier: the
    query block (20 x 64 doubles) broadcasts into a mapInPandas
    closure and each Arrow batch does ONE numpy matmul against it —
    BLAS instead of per-element Catalyst lambdas. Shares the
    brute-force oracle; bench shows which tier wins for dense math."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings")
    qrows = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )  # 20 x 64 floats — metadata-sized driver state, broadcast by closure
    q_ids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    if qrows:
        Q = np.array([list(r.embedding) for r in qrows], dtype=np.float64)
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    else:
        Qn = np.zeros((0, 0))

    def score(batches):
        empty = pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                              "neighbor_id": pd.Series(dtype="int64"),
                              "cosine": pd.Series(dtype="float64")})
        yield empty  # schema anchor for zero-batch partitions
        for pdf in batches:
            if len(pdf) == 0 or len(q_ids) == 0:
                continue
            C = np.array(list(pdf["embedding"]), dtype=np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            sims = Qn @ Cn.T  # (20, batch)
            n_q, n_c = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, n_c),
                    "neighbor_id": np.tile(pdf["vec_id"].to_numpy(), n_q),
                    "cosine": np.round(sims.ravel(), 6),
                }
            )

    scored = e.select("vec_id", "embedding").mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= TOP_K)


def _n_planes_py(n: int) -> int:
    """Smallest p in [MIN_PLANES, MAX_PLANES] with n <= TARGET * 2^p."""
    for p in range(MIN_PLANES, MAX_PLANES):
        if n <= TARGET_BUCKET_POP * (2**p):
            return p
    return MAX_PLANES


def _n_planes_sql(n: str) -> str:
    whens = " ".join(
        f"WHEN {n} <= {TARGET_BUCKET_POP * 2**p} THEN {p}"
        for p in range(MIN_PLANES, MAX_PLANES)
    )
    return f"(CASE {whens} ELSE {MAX_PLANES} END)"


def _bucket_spark(v: Column, n_planes: int, band: int = 0) -> Column:
    """LSH bucket id: bit k = sign of dot(v, hyperplane_k) for the
    band's first `n_planes` planes. `n_planes` is a plan-parameter
    scalar (derived driver-side from the corpus count, like tfidf's
    n_docs), so only the ACTIVE planes' dot products compute per row
    — at the 4-plane fixture floor that is 3x less per-row work than
    evaluating all MAX_PLANES bits and masking. The oracle computes
    the full signature and masks with % 2^np; the low n_planes bits
    are untouched by that modulo, so the values agree exactly."""
    bucket = F.lit(0)
    for k, (a, b) in enumerate(PLANE_BANDS[band][:n_planes]):
        d = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(1), F.size(v)),
                lambda x, i: x * (((F.lit(a) * i + F.lit(b)) % 97) - 48),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(2**k)).otherwise(F.lit(0))
    # int on both engines (np <= 12 => bucket < 4096)
    return bucket.cast("int")


def _bucket_sql(v: str, np: str = "np", band: int = 0) -> str:
    parts = []
    for k, (a, b) in enumerate(PLANE_BANDS[band]):
        dot = (
            f"list_sum(list_transform(range(1, len({v}) + 1), "
            f"i -> {v}[i] * ((({a} * i + {b}) % 97) - 48)))"
        )
        parts.append(f"(CASE WHEN {dot} > 0 THEN {2**k} ELSE 0 END)")
    return f"(({' + '.join(parts)}) % (1 << {np}))"


# one-row np relation, cross-joined onto the vectors on both engines
_NP_SQL = f"(SELECT {_n_planes_sql('(SELECT count(*) FROM embeddings)')} AS np)"


_PLANES_MEMO: dict[tuple, int] = {}


def _corpus_planes(spark: SparkSession, sf_dir: str) -> int:
    """Active plane count for this corpus — a plan-parameter scalar.
    count(*) on parquet is a metadata-cheap job; the Python cascade is
    the same integer comparison ladder the oracle's scalar subquery
    runs, so both engines derive the identical np from the identical
    count (no float log2 edge cases). Memoized per fixture dir (the
    test data is immutable) — the analyzed-statistics-cache pattern,
    so the LSH family pays the count job once per corpus, not once
    per query invocation. The memo key folds in the file's
    (mtime, size) so a fixture regenerated IN PLACE with different
    cardinality re-derives np instead of bucketing with a stale
    plane count while the oracle re-counts the new file."""
    path = os.path.abspath(os.path.join(sf_dir, "embeddings.parquet"))
    try:
        st = os.stat(path)
        if stat.S_ISDIR(st.st_mode):
            # directory-style parquet: an in-place overwrite with the
            # same part filenames can leave the directory's own stat
            # unchanged, so key by the sorted entry (name, mtime, size)
            # tuples instead.
            key = (
                path,
                tuple(
                    sorted(
                        (e.name, e.stat().st_mtime_ns, e.stat().st_size)
                        for e in os.scandir(path)
                    )
                ),
            )
        else:
            key = (path, st.st_mtime_ns, st.st_size)
    except OSError:  # missing or remote path: key by name only
        key = (path, 0, 0)
    if key not in _PLANES_MEMO:
        n = load_table(spark, sf_dir, "embeddings").count()
        _PLANES_MEMO[key] = _n_planes_py(n)
    return _PLANES_MEMO[key]


def bucket_pair_scores(
    spark: SparkSession, sf_dir: str, digits: int, ordered: bool
) -> DataFrame:
    """Scored within-bucket vector pairs — the shared candidate
    frame of the whole LSH family (knn_lsh_bucketed, knn_graph, and
    dedup's embedding pair path). `ordered=True` keeps each unordered
    pair once (a < b, the dedup shape); `ordered=False` keeps both
    directions (a != b, the per-query search shape). One shuffle on
    the bucket id; any change to the plane constants or the cosine
    rounding propagates to every consumer from here. Bucket width is
    the corpus-adaptive band-0 signature (_corpus_planes)."""
    npl = _corpus_planes(spark, sf_dir)
    v = _vecs(spark, sf_dir).withColumn(
        "bucket", _bucket_spark(F.col("v"), npl)
    )
    a, b = v.alias("a"), v.alias("b")
    ids = (
        F.col("a.vec_id") < F.col("b.vec_id")
        if ordered
        else F.col("a.vec_id") != F.col("b.vec_id")
    )
    cos = F.round(
        _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")), digits
    )
    return a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & ids).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("a.bucket").alias("bucket"),
        F.col("b.vec_id").alias("vec_b"),
        cos.alias("cosine"),
    )


def banded_pair_scores(
    spark: SparkSession, sf_dir: str, digits: int, threshold: float
) -> DataFrame:
    """OR-construction candidate pairs: a pair qualifies if it collides
    in ANY band's bucket — union of per-band within-bucket joins, then
    distinct. As the adaptive np grows (smaller buckets, cheaper pair
    generation), single-band recall decays like s^np; two independent
    bands recover it to 1-(1-s^np)^2 at 2x the (linear) bucketing
    cost. Each branch filters to the cosine threshold BEFORE the
    distinct, so the dedup shuffle carries only surviving near-dups.
    The cosine is deterministic (round to `digits`), so the distinct
    over (vec_a, vec_b, cosine) never sees conflicting rows."""
    npl = _corpus_planes(spark, sf_dir)
    out = None
    for band in range(N_BANDS):
        v = _vecs(spark, sf_dir).withColumn(
            "bucket", _bucket_spark(F.col("v"), npl, band)
        )
        a, b = v.alias("a"), v.alias("b")
        cos = F.round(
            _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")),
            digits,
        )
        part = (
            a.join(
                b,
                (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                cos.alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )
        out = part if out is None else out.unionByName(part)
    return out.distinct()


def banded_pairs_sql(digits: int, threshold: float) -> str:
    """DuckDB twin of banded_pair_scores (UNION = distinct union)."""
    branches = []
    for band in range(N_BANDS):
        branches.append(f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), {digits}) AS cosine
        FROM vb a JOIN vb b
          ON a.b{band} = b.b{band} AND a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), {digits}) >= {threshold}
        """)
    bucket_cols = ", ".join(
        f"{_bucket_sql('v', 'np', band)} AS b{band}" for band in range(N_BANDS)
    )
    # single-SELECT body (the UNION sits in a subquery) so the nested
    # WITH composes cleanly inside outer recursive CTEs
    return f"""
        WITH v0 AS ({_VECS_SQL}),
        vb AS (SELECT vec_id, v, nrm, {bucket_cols}
               FROM v0 CROSS JOIN {_NP_SQL} npc)
        SELECT vec_a, vec_b, cosine
        FROM ({" UNION ".join(branches)}) u
    """


def q_knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: random-hyperplane LSH — each query searches only its own
    bucket (top-5 by cosine within bucket). Deterministic planes make
    the result exactly oracle-checkable; recall vs brute force is
    asserted separately in tests. The query-block filter sits on the
    shared pair frame; Catalyst pushes it below the bucket join, so
    only the 20 query rows build join candidates."""
    scored = bucket_pair_scores(spark, sf_dir, digits=6, ordered=False).filter(
        F.col("vec_a") < N_QUERIES
    ).select(
        F.col("vec_a").alias("query_id"),
        "bucket",
        F.col("vec_b").alias("neighbor_id"),
        "cosine",
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= TOP_K)


def _knn_lsh_oracle() -> str:
    return f"""
        WITH v0 AS ({_VECS_SQL}),
        v AS (SELECT vec_id, v, nrm, {_bucket_sql('v')} AS bucket
              FROM v0 CROSS JOIN {_NP_SQL} npc)
        SELECT query_id, bucket, neighbor_id, cosine, CAST(rk AS INT) AS rk FROM (
            SELECT q.vec_id AS query_id, q.bucket AS bucket, c.vec_id AS neighbor_id,
                   round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) DESC,
                                c.vec_id) AS rk
            FROM v q JOIN v c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
            WHERE q.vec_id < {N_QUERIES}
        ) WHERE rk <= {TOP_K}
    """


N_CENTROIDS_MOD = 50  # centroids = vectors with vec_id % 50 == 0
N_PROBE = 2


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: an inverted-file index with deterministic
    centroids (every 50th vector), no iterative training so the
    DuckDB oracle reproduces the exact same partitioning.

    Build: assign every vector to its nearest centroid (broadcast the
    centroid list; argmax over cosine). Query: probe the N_PROBE
    nearest centroid lists and take top-5 within them. At 100 TB the
    centroid assignment is one broadcast-join pass and queries touch
    ~nprobe/nlist of the corpus — the standard IVF trade."""
    v = _vecs(spark, sf_dir)
    cent = v.filter(F.col("vec_id") % N_CENTROIDS_MOD == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cnrm")
    )
    # assignment: nearest centroid per vector (rank over broadcast join)
    vc = v.crossJoin(F.broadcast(cent)).select(
        "vec_id", "v", "nrm", "cid",
        F.round(_dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm")), 6).alias("ccos"),
    )
    w_assign = W.partitionBy("vec_id").orderBy(F.desc("ccos"), "cid")
    assigned = vc.withColumn("crk", F.row_number().over(w_assign))
    members = assigned.filter(F.col("crk") == 1).select(
        "vec_id", "v", "nrm", F.col("cid").alias("list_id")
    )
    probes = assigned.filter(
        (F.col("crk") <= N_PROBE) & (F.col("vec_id") < N_QUERIES)
    ).select(F.col("vec_id").alias("query_id"), F.col("cid").alias("list_id"))
    q = members.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    cand = probes.join(q, "query_id").join(members, "list_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 6).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= TOP_K)


def _knn_ivf_oracle() -> str:
    return f"""
        WITH v AS ({_VECS_SQL}),
        cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM v
                 WHERE vec_id % {N_CENTROIDS_MOD} = 0),
        vc AS (
            SELECT v.vec_id, v.v, v.nrm, cent.cid,
                   round(list_dot_product(v.v, cent.cv) / (v.nrm * cent.cnrm), 6) AS ccos,
                   row_number() OVER (PARTITION BY v.vec_id
                                      ORDER BY round(list_dot_product(v.v, cent.cv) / (v.nrm * cent.cnrm), 6) DESC,
                                               cent.cid) AS crk
            FROM v CROSS JOIN cent
        ),
        members AS (SELECT vec_id, v, nrm, cid AS list_id FROM vc WHERE crk = 1),
        probes AS (SELECT vec_id AS query_id, cid AS list_id FROM vc
                   WHERE crk <= {N_PROBE} AND vec_id < {N_QUERIES}),
        q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM members
              WHERE vec_id < {N_QUERIES}),
        scored AS (
            SELECT DISTINCT p.query_id, m.vec_id AS neighbor_id,
                   round(list_dot_product(q.qv, m.v) / (q.qnrm * m.nrm), 6) AS cosine
            FROM probes p JOIN q ON p.query_id = q.query_id
            JOIN members m ON p.list_id = m.list_id
            WHERE m.vec_id <> p.query_id
        )
        SELECT query_id, neighbor_id, cosine, CAST(rk AS INT) AS rk FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, neighbor_id) AS rk
            FROM scored
        ) WHERE rk <= {TOP_K}
    """


def q_embedding_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (chunk->document pooling), emitted as
    (label, pos, n, mean_val) rows — long form both because the driver
    canonicalizer needs scalar cells and because at 100 TB the long
    form is one explode + one hash aggregate on (label, pos): evenly
    spread keys, no wide-row skew. Element sums run in DECIMAL so the
    1000-executor reduction-tree order cannot perturb the mean (a
    float32 widened to double then cast to DECIMAL(20,10) can never
    sit on a rounding tie: binary fractions have no exact 5e-11
    remainder)."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select("label", F.posexplode("embedding").alias("pos", "x"))
    return (
        ex.groupBy("label", "pos")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("x").cast("double").cast("decimal(20,10)")).alias("_s"),
        )
        .select(
            "label",
            "pos",
            "n",
            # + 0.0 collapses IEEE negative zero (round can yield -0.0
            # in one engine and +0.0 in the other for tiny negatives)
            (F.round(F.col("_s").cast("double") / F.col("n"), 4) + 0.0).alias(
                "mean_val"
            ),
        )
    )


EMBEDDING_POOL_ORACLE = """
    SELECT label, CAST(pos - 1 AS INT) AS pos, count(*) AS n,
           round(CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(20,10))) AS DOUBLE)
                 / count(*), 4) + 0.0 AS mean_val
    FROM (
        SELECT label, pos, embedding[pos] AS x
        FROM embeddings,
             LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos) g
    )
    GROUP BY 1, 2
"""


QUANT_LEVELS = 256


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar quantization: per-dimension global [min,max] ->
    code = floor((x-min)/(max-min)*256) clamped to 255. Returns one
    row per vector with a position-weighted code checksum and the max
    reconstruction error. The dim table (one min/max per position) is
    vocabulary-sized and broadcasts; everything else is a projection +
    one (vec_id) aggregate. Quantization arithmetic is single IEEE
    ops, bit-identical across engines; code sums are exact ints."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "xf")
    ).select("vec_id", "pos", F.col("xf").cast("double").alias("x"))
    dims = ex.groupBy("pos").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    q = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(QUANT_LEVELS - 1),
            F.floor(
                (F.col("x") - F.col("lo")) / (F.col("hi") - F.col("lo")) * QUANT_LEVELS
            ),
        )
    ).cast("long")
    recon = F.col("lo") + (F.col("q") + 0.5) * (F.col("hi") - F.col("lo")) / QUANT_LEVELS
    return (
        ex.join(F.broadcast(dims), "pos")
        .withColumn("q", q)
        .withColumn("err", F.abs(recon - F.col("x")))
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("q") * (F.col("pos") + 1)).alias("code_checksum"),
            F.round(F.max("err"), 6).alias("max_err"),
        )
    )


EMBEDDING_QUANTIZE_ORACLE = f"""
    WITH ex AS (
        SELECT vec_id, pos - 1 AS pos, CAST(embedding[pos] AS DOUBLE) AS x
        FROM embeddings,
             LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos) g
    ),
    dims AS (SELECT pos, min(x) AS lo, max(x) AS hi FROM ex GROUP BY 1),
    coded AS (
        SELECT vec_id, ex.pos, x, lo, hi,
               CAST(CASE WHEN hi = lo THEN 0
                         ELSE least({QUANT_LEVELS - 1},
                                    floor((x - lo) / (hi - lo) * {QUANT_LEVELS}))
                    END AS BIGINT) AS q
        FROM ex JOIN dims ON ex.pos = dims.pos
    )
    SELECT vec_id,
           CAST(sum(q * (pos + 1)) AS BIGINT) AS code_checksum,
           round(max(abs(lo + (q + 0.5) * (hi - lo) / {QUANT_LEVELS} - x)), 6) AS max_err
    FROM coded GROUP BY 1
"""


PQ_SUB = 8        # subspaces (64-dim vectors -> 8 x 8-dim subvectors)
PQ_SUBDIM = 8
PQ_K = 16         # codewords per subspace
PQ_SEED_MOD = 7   # codebook seeds: first PQ_K vectors with vec_id % 7 == 0


def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (ADC): compress every vector to
    PQ_SUB 4-bit codes and answer queries from a per-query distance
    table instead of full vectors.

    Training-free deterministic codebook (the first PQ_K seed vectors'
    subvectors per subspace) so the DuckDB oracle reproduces encoding
    exactly. Encode = nearest codeword per subspace; query = ADC:
    d2(q, x) ~= sum_j dtable[j, code_x[j]], with every L2 expanded to
    dot products (|a-b|^2 = a.a + b.b - 2 a.b) so both engines run the
    identical left-fold arithmetic. The 8 per-subspace distances are
    re-added in fixed j order via single-valued conditional sums —
    aggregation-order-proof.

    Scale shape: the codebook is 128 tiny rows (broadcast); encoding
    is one broadcast join over the corpus (the 100 TB pass that turns
    64 floats into 8 nibbles — 64x compression); a query scan touches
    codes + a 20x128 distance table, never the original vectors."""
    v = _vecs(spark, sf_dir)
    sub = v.select(
        "vec_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(PQ_SUB - 1)),
                lambda j: F.struct(
                    j.alias("j"),
                    F.slice("v", j * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sv"),
                ),
            )
        ).alias("s"),
    ).select("vec_id", F.col("s.j").alias("j"), F.col("s.sv").alias("sv"))

    # Take the PQ_K smallest seed ids with a distributed top-K
    # (TakeOrderedAndProject) FIRST, so the unpartitioned ranking
    # window only ever sees PQ_K rows — the previous formulation ran
    # row_number over every seed candidate in a single partition
    # (corpus/PQ_SEED_MOD rows at scale).
    seed_w = W.orderBy("vec_id")
    seeds = (
        v.filter(F.col("vec_id") % PQ_SEED_MOD == 0)
        .select("vec_id")
        .orderBy("vec_id")
        .limit(PQ_K)
        .select("vec_id", (F.row_number().over(seed_w) - 1).alias("code_id"))
    )
    codebook = (
        sub.join(F.broadcast(seeds), "vec_id")
        .select("code_id", "j", F.col("sv").alias("cw"))
    )

    def _d2(a, b):
        return _dot(a, a) + _dot(b, b) - 2 * _dot(a, b)

    enc = sub.join(F.broadcast(codebook), "j").select(
        "vec_id", "j", "code_id",
        F.round(_d2(F.col("sv"), F.col("cw")), 6).alias("d2"),
    )
    w_enc = W.partitionBy("vec_id", "j").orderBy("d2", "code_id")
    codes = (
        enc.withColumn("rk", F.row_number().over(w_enc))
        .filter(F.col("rk") == 1)
        .select("vec_id", "j", "code_id")
    )

    dtable = (
        sub.filter(F.col("vec_id") < N_QUERIES)
        .withColumnRenamed("vec_id", "query_id")
        .join(F.broadcast(codebook), "j")
        .select(
            "query_id", "j", "code_id",
            _d2(F.col("sv"), F.col("cw")).alias("qd"),
        )
    )
    joined = codes.join(F.broadcast(dtable), ["j", "code_id"]).filter(
        F.col("vec_id") != F.col("query_id")
    )
    parts = joined.groupBy("query_id", F.col("vec_id").alias("neighbor_id")).agg(
        *[
            F.sum(F.when(F.col("j") == k, F.col("qd"))).alias(f"_d{k}")
            for k in range(PQ_SUB)
        ]
    )
    total = F.col("_d0")
    for k in range(1, PQ_SUB):
        total = total + F.col(f"_d{k}")
    scored = parts.select(
        "query_id", "neighbor_id", F.round(total, 6).alias("approx_d2")
    )
    w = W.partitionBy("query_id").orderBy("approx_d2", "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "approx_d2", F.col("rk").cast("int").alias("rk"))
    )


def _knn_pq_oracle() -> str:
    d2 = (
        "(list_dot_product({a}, {a}) + list_dot_product({b}, {b})"
        " - 2 * list_dot_product({a}, {b}))"
    )
    cond = " + ".join(f"sum(CASE WHEN j = {k} THEN qd END)" for k in range(PQ_SUB))
    return f"""
        WITH v AS ({_VECS_SQL}),
        sub AS (
            SELECT vec_id, CAST(j AS INT) AS j,
                   v[(j * {PQ_SUBDIM} + 1):(j * {PQ_SUBDIM} + {PQ_SUBDIM})] AS sv
            FROM (SELECT vec_id, v, unnest(range(0, {PQ_SUB})) AS j FROM v)
        ),
        seeds AS (
            SELECT vec_id, rn - 1 AS code_id FROM (
                SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn
                FROM v WHERE vec_id % {PQ_SEED_MOD} = 0
            ) WHERE rn <= {PQ_K}
        ),
        codebook AS (
            SELECT seeds.code_id, sub.j, sub.sv AS cw
            FROM sub JOIN seeds USING (vec_id)
        ),
        enc AS (
            SELECT vec_id, j, code_id,
                   row_number() OVER (
                       PARTITION BY vec_id, j
                       ORDER BY round({d2.format(a='sv', b='cw')}, 6), code_id
                   ) AS rk
            FROM sub JOIN codebook USING (j)
        ),
        codes AS (SELECT vec_id, j, code_id FROM enc WHERE rk = 1),
        dtable AS (
            SELECT sub.vec_id AS query_id, j, code_id,
                   {d2.format(a='sv', b='cw')} AS qd
            FROM sub JOIN codebook USING (j)
            WHERE sub.vec_id < {N_QUERIES}
        ),
        scored AS (
            SELECT query_id, vec_id AS neighbor_id,
                   round({cond}, 6) AS approx_d2
            FROM codes JOIN dtable USING (j, code_id)
            WHERE vec_id <> query_id
            GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id, approx_d2, CAST(rk AS INT) AS rk FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY approx_d2, neighbor_id) AS rk
            FROM scored
        ) WHERE rk <= {TOP_K}
    """


def q_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC — the canonical billion-scale ANN layout (Jegou et al.,
    'Product Quantization for Nearest Neighbor Search', TPAMI 2011;
    the FAISS IVFPQ index): a coarse inverted file narrows the scan to
    N_PROBE cells, and inside the cells distances come from
    product-quantized RESIDUALS (v - centroid) — composing the two
    scale tiers this module already verifies separately (knn_ivf's
    cell pruning, knn_pq's 64x compression) into the structure
    production systems actually deploy.

    Deterministic contract (both engines reproduce it exactly):
    centroids = every N_CENTROIDS_MOD-th vector, assignment by L2
    (expanded to dot products, rounded at 6 dp before ranking);
    PQ codebook = the first PQ_K seed vectors' RESIDUAL subvectors;
    queries probe their N_PROBE nearest cells and build one ADC
    distance table per (query, probed cell) — the per-cell query
    residual is what distinguishes IVFADC from flat PQ. Per-subspace
    distances re-add in fixed j order via conditional sums.

    At 100 TB: the corpus pass is one broadcast-join encode (8 nibbles
    per vector); a query touches nprobe/nlist of the CODES (never the
    vectors) against a 2*8*16-row broadcast distance table; the final
    top-K is a per-query window over probed candidates only."""
    v = _vecs(spark, sf_dir)

    def _d2(a, b):
        return _dot(a, a) + _dot(b, b) - 2 * _dot(a, b)

    cent = v.filter(F.col("vec_id") % N_CENTROIDS_MOD == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    vc = v.crossJoin(F.broadcast(cent)).select(
        "vec_id", "v", "cid", "cv",
        F.round(_d2(F.col("v"), F.col("cv")), 6).alias("cd2"),
    )
    w_assign = W.partitionBy("vec_id").orderBy("cd2", "cid")
    assigned = vc.withColumn("crk", F.row_number().over(w_assign))
    resid = F.zip_with("v", "cv", lambda x, y: x - y)
    members = assigned.filter(F.col("crk") == 1).select(
        "vec_id", F.col("cid").alias("list_id"), resid.alias("r")
    )
    probes = assigned.filter(
        (F.col("crk") <= N_PROBE) & (F.col("vec_id") < N_QUERIES)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("cid").alias("list_id"),
        resid.alias("qr"),
    )

    def _subspaces(df, vcol, out):
        return df.select(
            *[c for c in df.columns if c != vcol],
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(PQ_SUB - 1)),
                    lambda j: F.struct(
                        j.alias("j"),
                        F.slice(vcol, j * PQ_SUBDIM + 1, PQ_SUBDIM).alias(out),
                    ),
                )
            ).alias("s"),
        ).select(
            *[c for c in df.columns if c != vcol],
            F.col("s.j").alias("j"),
            F.col(f"s.{out}").alias(out),
        )

    rsub = _subspaces(members, "r", "sv")
    seed_w = W.orderBy("vec_id")
    seeds = (
        v.filter(F.col("vec_id") % PQ_SEED_MOD == 0)
        .select("vec_id")
        .orderBy("vec_id")
        .limit(PQ_K)
        .select("vec_id", (F.row_number().over(seed_w) - 1).alias("code_id"))
    )
    codebook = rsub.join(F.broadcast(seeds), "vec_id").select(
        "code_id", "j", F.col("sv").alias("cw")
    )
    enc = rsub.join(F.broadcast(codebook), "j").select(
        "vec_id", "list_id", "j", "code_id",
        F.round(_d2(F.col("sv"), F.col("cw")), 6).alias("d2"),
    )
    w_enc = W.partitionBy("vec_id", "j").orderBy("d2", "code_id")
    codes = (
        enc.withColumn("rk", F.row_number().over(w_enc))
        .filter(F.col("rk") == 1)
        .select("vec_id", "list_id", "j", "code_id")
    )
    qsub = _subspaces(probes, "qr", "qsv")
    dtable = qsub.join(F.broadcast(codebook), "j").select(
        "query_id", "list_id", "j", "code_id",
        _d2(F.col("qsv"), F.col("cw")).alias("qd"),
    )
    joined = codes.join(
        F.broadcast(dtable), ["list_id", "j", "code_id"]
    ).filter(F.col("vec_id") != F.col("query_id"))
    parts = joined.groupBy(
        "query_id", F.col("vec_id").alias("neighbor_id")
    ).agg(
        *[
            F.sum(F.when(F.col("j") == k, F.col("qd"))).alias(f"_d{k}")
            for k in range(PQ_SUB)
        ]
    )
    total = F.col("_d0")
    for k in range(1, PQ_SUB):
        total = total + F.col(f"_d{k}")
    scored = parts.select(
        "query_id", "neighbor_id", F.round(total, 6).alias("approx_d2")
    )
    w = W.partitionBy("query_id").orderBy("approx_d2", "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id", "neighbor_id", "approx_d2",
            F.col("rk").cast("int").alias("rk"),
        )
    )


def _knn_ivfpq_oracle() -> str:
    d2 = (
        "(list_dot_product({a}, {a}) + list_dot_product({b}, {b})"
        " - 2 * list_dot_product({a}, {b}))"
    )
    cond = " + ".join(f"sum(CASE WHEN j = {k} THEN qd END)" for k in range(PQ_SUB))
    resid = "[{v}[i] - {c}[i] FOR i IN range(1, len({v}) + 1)]"
    return f"""
        WITH v AS ({_VECS_SQL}),
        cent AS (SELECT vec_id AS cid, v AS cv FROM v
                 WHERE vec_id % {N_CENTROIDS_MOD} = 0),
        vc AS (
            SELECT v.vec_id, v.v, cent.cid, cent.cv,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round({d2.format(a='v.v', b='cent.cv')}, 6),
                                cent.cid) AS crk
            FROM v CROSS JOIN cent
        ),
        members AS (SELECT vec_id, cid AS list_id,
                           {resid.format(v='v', c='cv')} AS r
                    FROM vc WHERE crk = 1),
        probes AS (SELECT vec_id AS query_id, cid AS list_id,
                          {resid.format(v='v', c='cv')} AS qr
                   FROM vc WHERE crk <= {N_PROBE} AND vec_id < {N_QUERIES}),
        rsub AS (
            SELECT vec_id, list_id, CAST(j AS INT) AS j,
                   r[(j * {PQ_SUBDIM} + 1):(j * {PQ_SUBDIM} + {PQ_SUBDIM})] AS sv
            FROM (SELECT vec_id, list_id, r, unnest(range(0, {PQ_SUB})) AS j
                  FROM members)
        ),
        seeds AS (
            SELECT vec_id, rn - 1 AS code_id FROM (
                SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn
                FROM v WHERE vec_id % {PQ_SEED_MOD} = 0
            ) WHERE rn <= {PQ_K}
        ),
        codebook AS (
            SELECT seeds.code_id, rsub.j, rsub.sv AS cw
            FROM rsub JOIN seeds USING (vec_id)
        ),
        enc AS (
            SELECT vec_id, list_id, j, code_id,
                   row_number() OVER (
                       PARTITION BY vec_id, j
                       ORDER BY round({d2.format(a='sv', b='cw')}, 6), code_id
                   ) AS rk
            FROM rsub JOIN codebook USING (j)
        ),
        codes AS (SELECT vec_id, list_id, j, code_id FROM enc WHERE rk = 1),
        qsub AS (
            SELECT query_id, list_id, CAST(j AS INT) AS j,
                   qr[(j * {PQ_SUBDIM} + 1):(j * {PQ_SUBDIM} + {PQ_SUBDIM})] AS qsv
            FROM (SELECT query_id, list_id, qr, unnest(range(0, {PQ_SUB})) AS j
                  FROM probes)
        ),
        dtable AS (
            SELECT query_id, qsub.list_id, j, code_id,
                   {d2.format(a='qsv', b='cw')} AS qd
            FROM qsub JOIN codebook USING (j)
        ),
        scored AS (
            SELECT query_id, vec_id AS neighbor_id, round({cond}, 6) AS approx_d2
            FROM codes JOIN dtable USING (list_id, j, code_id)
            WHERE vec_id <> query_id
            GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id, approx_d2, CAST(rk AS INT) AS rk FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY approx_d2, neighbor_id) AS rk
            FROM scored
        ) WHERE rk <= {TOP_K}
    """


PCA_DIMS = 64     # fixture embedding dimensionality (PQ_SUB * PQ_SUBDIM)
PCA_ROUNDS = 5


def q_embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by POWER
    ITERATION — the whitening/anisotropy-removal step embedding
    pipelines run before semantic dedup and retrieval (dominant-
    direction removal, ABTT 'all-but-the-top'): PCA_ROUNDS rounds of
    v <- normalize(C v) from v0 = 1/8 (exact binary, unit 64-norm).

    Exactness follows the kmeans recipe (quantize every cross-
    iteration artifact): the centered covariance accumulates
    12-dp-scaled LONG products (order-invariant, exact) and stores
    6-dp entries; each matvec re-accumulates scaled longs; the norm is
    an 8-dp round of a sqrt whose input is an exact scaled sum; the
    next vector is an 8-dp round (+0.0 kills -0.0 drift). Nothing
    unrounded crosses an iteration boundary, so both engines walk the
    identical trajectory and the oracle just unrolls the rounds as
    CTEs.

    At 100 TB the ONLY corpus-scale work is the one covariance pass
    (a dims^2-per-row fan-out into a 4096-group map-side-combined
    aggregate); every iteration then runs on the 64x64 matrix —
    localCheckpointed once so rounds never re-touch the corpus. The
    driver holds no data (cov stays a DataFrame; rounds are tiny
    distributed jobs)."""
    v, nrm_frame = _pca_top_component(spark, sf_dir)
    return v.crossJoin(F.broadcast(nrm_frame)).select(
        F.col("i").alias("pos"),
        F.col("x").alias("loading"),
        F.col("nrm").alias("eigenvalue"),
    )


def _pca_top_component(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The quantized power iteration shared by q_embedding_pca_power
    (which reports it) and q_embedding_abtt (which projects it out):
    returns (v: (i, x) unit top component, nrm: 1-row eigenvalue)."""
    e = load_table(spark, sf_dir, "embeddings")
    n_vecs = e.count()  # scalar plan parameter (metadata-sized)
    ex = e.select(
        "vec_id", F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias("i", "x")
    )
    sl6 = F.round(F.round(F.col("x"), 6) * 1000000, 0).cast("long")
    mu = ex.groupBy("i").agg(
        (
            F.round(
                F.sum(sl6).cast("double") / 1000000 / F.lit(float(n_vecs)), 8
            )
            + 0.0
        ).alias("mu")
    )
    # Outer products WITHOUT a self-join: broadcast the dims-sized mean
    # as one array, center each row once (its own projection, so the
    # nested transform below references a materialized column — an
    # element_at over an ATTRIBUTE is a cheap lookup, where indexing
    # into the centering EXPRESSION inside the lambda would re-evaluate
    # it per (i, j): the Catalyst quadratic trap), then explode the
    # dims^2 (i, j, product) structs row-locally. One corpus pass, the
    # only shuffle is the 4096-group aggregate's map-side-combined
    # exchange — the previous formulation shuffled the exploded corpus
    # TWICE through an n*dims x n*dims self-join.
    mua = mu.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "mu"))),
            lambda s: s["mu"],
        ).alias("mu_arr")
    )
    seq = F.sequence(F.lit(1), F.lit(PCA_DIMS))
    # the outer-product pass does dims^2 work per ROW, so a
    # small-file scan that arrives as one split serializes the whole
    # pass onto one core (measured 9.4s -> 1.2s at sf0.1); widen only
    # when the scan is narrower than the cluster — at real scale the
    # scan already has >= par splits and no shuffle is added
    par = spark.sparkContext.defaultParallelism
    src = e.repartition(par) if e.rdd.getNumPartitions() < par else e
    centered = src.crossJoin(F.broadcast(mua)).select(
        F.zip_with(
            F.transform("embedding", lambda x: x.cast("double")),
            F.col("mu_arr"),
            lambda x, m: x - m,
        ).alias("cd")
    )
    # primitive long array of the dims^2 scaled products in fixed
    # row-major order; posexplode's index IS (i, j) — structs here
    # cost 1.5x the whole pass in allocation (measured)
    pairs = centered.select(
        F.posexplode(
            F.flatten(
                F.transform(
                    seq,
                    lambda i: F.transform(
                        seq,
                        lambda j: F.round(
                            F.round(
                                F.element_at("cd", i) * F.element_at("cd", j),
                                12,
                            )
                            * 1000000000000,
                            0,
                        ).cast("long"),
                    ),
                )
            )
        ).alias("pos", "p")
    )
    cov = (
        pairs.groupBy("pos")
        .agg(
            (
                F.round(
                    F.sum("p").cast("double") / 1000000000000 / F.lit(float(n_vecs)),
                    6,
                )
                + 0.0
            ).alias("c")
        )
        .select(
            (F.col("pos") / PCA_DIMS).cast("int").alias("i"),
            (F.col("pos") % PCA_DIMS).cast("int").alias("j"),
            "c",
        )
        # 4096 rows; eager-materialize so the 5 rounds never re-run
        # the corpus-scale covariance pass
        .localCheckpoint()
    )
    v = spark.range(PCA_DIMS).select(
        F.col("id").cast("int").alias("i"), F.lit(0.125).cast("double").alias("x")
    )
    w12 = F.round(F.round(F.col("c") * F.col("x"), 12) * 1000000000000, 0).cast(
        "long"
    )
    nrm_frame = None
    for _ in range(PCA_ROUNDS):
        w = (
            cov.join(v.withColumnRenamed("i", "j"), "j")
            .groupBy("i")
            .agg((F.sum(w12).cast("double") / 1000000000000).alias("w"))
            .localCheckpoint()
        )
        sq12 = F.round(F.round(F.col("w") * F.col("w"), 12) * 1000000000000, 0).cast(
            "long"
        )
        nrm_frame = w.agg(
            F.round(
                F.sqrt(F.sum(sq12).cast("double") / 1000000000000), 8
            ).alias("nrm")
        )
        v = w.crossJoin(F.broadcast(nrm_frame)).select(
            "i",
            F.when(
                F.col("nrm") > 0, F.round(F.col("w") / F.col("nrm"), 8) + 0.0
            )
            .otherwise(F.lit(0.0))
            .alias("x"),
        )
    return v, nrm_frame


def _pca_rounds_ctes() -> str:
    """The CTE chain through v{PCA_ROUNDS}/nrm{PCA_ROUNDS}, shared by
    the pca_power oracle and the ABTT oracle."""
    sl = "CAST(round(round({expr}, 12) * 1000000000000, 0) AS BIGINT)"
    body = [
        f"""
        ex AS (
            SELECT vec_id, CAST(pos - 1 AS INT) AS i,
                   CAST(embedding[pos] AS DOUBLE) AS x
            FROM embeddings,
                 LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos) g
        ),
        n AS (SELECT count(*) AS nv FROM embeddings),
        mu AS (
            SELECT i, round(CAST(SUM(CAST(round(round(x, 6) * 1000000, 0) AS BIGINT))
                                 AS DOUBLE) / 1000000 / nv, 8) + 0.0 AS mu
            FROM ex CROSS JOIN n GROUP BY i, nv
        ),
        cd AS (SELECT vec_id, ex.i, x - mu AS d FROM ex JOIN mu USING (i)),
        cov AS (
            SELECT a.i AS i, b.i AS j,
                   round(CAST(SUM({sl.format(expr='a.d * b.d')}) AS DOUBLE)
                         / 1000000000000 / nv, 6) + 0.0 AS c
            FROM cd a JOIN cd b ON a.vec_id = b.vec_id CROSS JOIN n
            GROUP BY 1, 2, nv
        ),
        v0 AS (SELECT CAST(i AS INT) AS i, CAST(0.125 AS DOUBLE) AS x
               FROM range(0, {PCA_DIMS}) t(i))"""
    ]
    for r in range(1, PCA_ROUNDS + 1):
        body.append(f"""
        w{r} AS (
            SELECT cov.i AS i,
                   CAST(SUM({sl.format(expr='cov.c * v.x')}) AS DOUBLE)
                   / 1000000000000 AS w
            FROM cov JOIN v{r - 1} v ON cov.j = v.i GROUP BY 1
        ),
        nrm{r} AS (
            SELECT round(sqrt(CAST(SUM({sl.format(expr='w * w')}) AS DOUBLE)
                              / 1000000000000), 8) AS nrm
            FROM w{r}
        ),
        v{r} AS (
            SELECT i, CASE WHEN nrm > 0 THEN round(w / nrm, 8) + 0.0
                           ELSE 0.0 END AS x
            FROM w{r} CROSS JOIN nrm{r}
        )""")
    return ",".join(body)


def _pca_power_oracle() -> str:
    return (
        "WITH " + _pca_rounds_ctes()
        + f"""
        SELECT v.i AS pos, v.x AS loading, nrm.nrm AS eigenvalue
        FROM v{PCA_ROUNDS} v CROSS JOIN nrm{PCA_ROUNDS} nrm"""
    )


def q_embedding_abtt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-but-the-top (Mu & Viswanath, ICLR 2018): remove the corpus'
    dominant principal direction from every embedding — the isotropy
    correction retrieval/semantic-dedup pipelines apply because a few
    dominant directions otherwise swamp cosine similarity. Composes
    the quantized power iteration (_pca_top_component) with a single
    projection pass and reports, per label, the mean |cosine to the
    top component| BEFORE and AFTER removal — the before column is the
    measured anisotropy, the after column its near-zero residual
    (nonzero only through the 8-dp quantization of the projection).

    Exactness: the component vector is the hash-proven quantized
    trajectory; the projection coefficient rounds at 8 dp before the
    subtraction; per-row cosines round at 8 dp and aggregate as
    1e8-scaled longs (order-invariant), and the per-label means round
    at 6 dp. At 100 TB: one broadcast of a dims-sized vector, one
    corpus pass, one label-cardinality aggregate."""
    v, _ = _pca_top_component(spark, sf_dir)
    varr = v.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "x"))), lambda s: s["x"]
        ).alias("v_arr")
    )
    e = load_table(spark, sf_dir, "embeddings")
    # each projection stage is its own projection so every reused
    # array/scalar is a materialized attribute, never a re-evaluated
    # expression inside a lambda (the Catalyst quadratic trap)
    ed = e.crossJoin(F.broadcast(varr)).select(
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("ed"),
        "v_arr",
    )
    dotted = ed.select(
        "label", "ed", "v_arr",
        F.round(_dot(F.col("ed"), F.col("v_arr")), 8).alias("d8"),
        F.sqrt(_dot(F.col("ed"), F.col("ed"))).alias("nrm_e"),
    )
    resid = dotted.select(
        "label", "v_arr", "d8", "nrm_e",
        F.zip_with(
            "ed", "v_arr", lambda x, w: x - F.col("d8") * w
        ).alias("rd"),
    )
    cos_b = F.when(
        F.col("nrm_e") > 0,
        F.round(F.abs(F.col("d8")) / F.col("nrm_e"), 8) + 0.0,
    ).otherwise(F.lit(0.0))
    nrm_r = F.sqrt(_dot(F.col("rd"), F.col("rd")))
    cos_a = F.when(
        nrm_r > 0,
        F.round(F.abs(_dot(F.col("rd"), F.col("v_arr"))) / nrm_r, 8) + 0.0,
    ).otherwise(F.lit(0.0))
    scored = resid.select(
        "label",
        F.round(cos_b * 100000000, 0).cast("long").alias("cb8"),
        F.round(cos_a * 100000000, 0).cast("long").alias("ca8"),
    )
    return scored.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.sum("cb8").cast("double") / 100000000 / F.count("*"), 6)
        .alias("mean_cos_before"),
        F.round(F.sum("ca8").cast("double") / 100000000 / F.count("*"), 6)
        .alias("mean_cos_after"),
    )


def _abtt_oracle() -> str:
    rng = f"range(1, {PCA_DIMS} + 1)"
    return (
        "WITH " + _pca_rounds_ctes()
        + f""",
        varr AS (SELECT list(x ORDER BY i) AS v_arr FROM v{PCA_ROUNDS}),
        ed AS (
            SELECT label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed,
                   v_arr
            FROM embeddings CROSS JOIN varr
        ),
        dotted AS (
            SELECT label, ed, v_arr,
                   round(list_dot_product(ed, v_arr), 8) AS d8,
                   sqrt(list_dot_product(ed, ed)) AS nrm_e
            FROM ed
        ),
        resid AS (
            SELECT label, v_arr, d8, nrm_e,
                   [ed[i] - d8 * v_arr[i] FOR i IN {rng}] AS rd
            FROM dotted
        ),
        scored AS (
            SELECT label,
                   CAST(round((CASE WHEN nrm_e > 0
                               THEN round(abs(d8) / nrm_e, 8) + 0.0
                               ELSE 0.0 END) * 100000000, 0) AS BIGINT) AS cb8,
                   CAST(round((CASE WHEN sqrt(list_dot_product(rd, rd)) > 0
                               THEN round(abs(list_dot_product(rd, v_arr))
                                          / sqrt(list_dot_product(rd, rd)), 8)
                                    + 0.0
                               ELSE 0.0 END) * 100000000, 0) AS BIGINT) AS ca8
            FROM resid
        )
        SELECT label, count(*) AS n,
               round(CAST(SUM(cb8) AS DOUBLE) / 100000000 / count(*), 6)
                   AS mean_cos_before,
               round(CAST(SUM(ca8) AS DOUBLE) / 100000000 / count(*), 6)
                   AS mean_cos_after
        FROM scored GROUP BY 1"""
    )


CORESET_K = 5


def q_sample_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-based data selection: greedy k-center (farthest-point
    traversal, the 2-approximation of Gonzalez 1985) over the
    embedding corpus — the coreset construction data-pruning pipelines
    use to pick a maximally-diverse training subset. Seed = smallest
    vec_id; each round adds the point FARTHEST from the chosen set
    (ties -> smallest id) and reports the k-center objective (the
    coverage radius = max distance of any point to its nearest chosen
    center) after the pick — a decreasing curve that IS the coreset
    quality report.

    Deterministic contract: squared L2 distances rounded at 6 dp
    (+0.0) before every min/argmax, so both engines walk the identical
    selection path. Per round the corpus does ONE broadcast-join
    min-update pass (running min distance to the chosen set is kept as
    a localCheckpointed (vec_id, md) frame — the standard incremental
    farthest-point trick, O(n) per round, not O(n*k)); the argmax is a
    1-row TakeOrdered; the driver holds k ids, never data. At 100 TB:
    k linear passes, each map-side only."""
    v = _vecs(spark, sf_dir).select("vec_id", "v")

    def _d2(a, b):
        return _dot(a, a) + _dot(b, b) - 2 * _dot(a, b)

    seed = v.orderBy("vec_id").limit(1)
    srow = seed.first()
    if srow is None:  # empty corpus: nothing to select
        return spark.createDataFrame([], "sel_rank int, vec_id long, radius double")
    seed_id = srow[0]
    md = (
        v.crossJoin(F.broadcast(seed.select(F.col("v").alias("cv"))))
        .select(
            "vec_id", "v",
            (F.round(_d2(F.col("v"), F.col("cv")), 6) + 0.0).alias("md"),
        )
        .localCheckpoint()
    )
    rows = [(1, int(seed_id))]
    radii = [md.agg(F.max("md")).first()[0]]
    for k in range(2, CORESET_K + 1):
        pick = md.orderBy(F.desc("md"), F.col("vec_id").asc()).limit(1).first()
        rows.append((k, int(pick["vec_id"])))
        pv = v.filter(F.col("vec_id") == int(pick["vec_id"])).select(
            F.col("v").alias("cv")
        )
        md = (
            md.crossJoin(F.broadcast(pv))
            .select(
                "vec_id", "v",
                F.least(
                    F.col("md"),
                    F.round(_d2(F.col("v"), F.col("cv")), 6) + 0.0,
                ).alias("md"),
            )
            .localCheckpoint()
        )
        radii.append(md.agg(F.max("md")).first()[0])
    out = [
        (k, vid, float(r)) for (k, vid), r in zip(rows, radii)
    ]
    return spark.createDataFrame(
        out, "sel_rank int, vec_id long, radius double"
    )


def _coreset_oracle() -> str:
    d2 = (
        "(list_dot_product({a}, {a}) + list_dot_product({b}, {b})"
        " - 2 * list_dot_product({a}, {b}))"
    )
    body = [
        f"""
        v AS ({_VECS_SQL}),
        p1 AS (SELECT vec_id, v FROM v ORDER BY vec_id LIMIT 1),
        r1 AS (
            SELECT v.vec_id, v.v,
                   round({d2.format(a='v.v', b='p.v')}, 6) + 0.0 AS md
            FROM v CROSS JOIN p1 p
        )"""
    ]
    for k in range(2, CORESET_K + 1):
        body.append(f"""
        p{k} AS (
            SELECT v.vec_id, v.v
            FROM (SELECT vec_id FROM r{k - 1}
                  ORDER BY md DESC, vec_id LIMIT 1) s JOIN v USING (vec_id)
        ),
        r{k} AS (
            SELECT r.vec_id, r.v,
                   LEAST(r.md,
                         round({d2.format(a='r.v', b='p.v')}, 6) + 0.0) AS md
            FROM r{k - 1} r CROSS JOIN p{k} p
        )""")
    selects = [
        "SELECT 1 AS sel_rank, (SELECT vec_id FROM p1) AS vec_id,"
        " (SELECT max(md) FROM r1) AS radius"
    ] + [
        f"SELECT {k}, (SELECT vec_id FROM p{k}),"
        f" (SELECT max(md) FROM r{k})"
        for k in range(2, CORESET_K + 1)
    ]
    # wrap so an EMPTY corpus yields 0 rows (matching the engine's
    # early return) — scalar subqueries over empty relations would
    # otherwise produce CORESET_K rows of NULLs
    return (
        "WITH " + ",".join(body)
        + " SELECT * FROM (" + " UNION ALL ".join(selects)
        + ") WHERE vec_id IS NOT NULL"
    )


MATRYOSHKA_DIMS = (8, 16, 32)


def q_embedding_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (MRL) truncation evaluation: how much top-K recall
    survives when vectors are cut to their first 8/16/32 components —
    the measurement behind serving embeddings at reduced dimension
    (truncate + renormalize, MRL-style). For each prefix dim, rank the
    same query block by cosine WITHIN the truncated space and report
    overlap with the full-vector exact top-K. All three prefixes score
    in ONE pass over the q x corpus join (the cosines stack through a
    single explode — no per-dim rescan); ranking is per (dim, query)
    on round(cos, 6) with neighbor-id tie-break, so the hit sets are
    engine-order independent and the whole table is hash-checkable.

    Scale shape: the query block is a constant (N_QUERIES), so cost is
    linear in corpus size at any SF — this is the evaluation harness
    (like ann_recall); the serving path at scale is the LSH/IVF/PQ
    tiers over the truncated column. The per-dim top-K table
    (dims x Q x K <= 400 rows, driver-scale) is localCheckpoint-pinned
    so the recall rollup's three consumers read it instead of each
    re-deriving the corpus join."""
    topk = _matryoshka_topk(spark, sf_dir).localCheckpoint()
    full = topk.filter(F.col("dim") == 0).select("query_id", "neighbor_id")
    tot = full.agg(F.count("*").alias("n_total"))
    return (
        topk.filter(F.col("dim") != 0)
        .join(full, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("dim")
        .agg(F.count("*").alias("n_hits"))
        .crossJoin(F.broadcast(tot))
        .select(
            "dim",
            "n_hits",
            "n_total",
            F.round(F.try_divide(F.col("n_hits"), F.col("n_total")), 4).alias("recall"),
        )
    )


def _matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ONE corpus pass: q x corpus join scoring the full vector
    plus every prefix dim through a stacked explode, ranked per
    (dim, query). Output is dims x Q x K rows."""
    v = _vecs(spark, sf_dir)
    q = v.filter(F.col("vec_id") < N_QUERIES).alias("q")
    c = v.alias("c")
    entries = [
        F.struct(
            F.lit(0).alias("dim"),
            F.round(
                _dot(F.col("q.v"), F.col("c.v"))
                / (F.col("q.nrm") * F.col("c.nrm")),
                6,
            ).alias("cos"),
        )
    ]
    for d in MATRYOSHKA_DIMS:
        qa, ca = F.slice("q.v", 1, d), F.slice("c.v", 1, d)
        entries.append(
            F.struct(
                F.lit(d).alias("dim"),
                F.round(
                    _dot(qa, ca)
                    / (F.sqrt(_dot(qa, qa)) * F.sqrt(_dot(ca, ca))),
                    6,
                ).alias("cos"),
            )
        )
    scored = (
        q.join(c, F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            F.explode(F.array(*entries)).alias("e"),
        )
        .select("query_id", "neighbor_id", F.col("e.dim").alias("dim"), F.col("e.cos").alias("cos"))
    )
    w = W.partitionBy("dim", "query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("dim", "query_id", "neighbor_id")
    )


def _matryoshka_oracle() -> str:
    full_cos = "round(list_dot_product(qv, cv) / (qn * cn), 6)"
    prefix_rows = []
    for d in MATRYOSHKA_DIMS:
        cos = (
            f"round(list_dot_product(qv[1:{d}], cv[1:{d}]) / "
            f"(sqrt(list_dot_product(qv[1:{d}], qv[1:{d}])) * "
            f"sqrt(list_dot_product(cv[1:{d}], cv[1:{d}]))), 6)"
        )
        prefix_rows.append(
            f"SELECT query_id, neighbor_id, {d} AS dim, {cos} AS cos FROM pairs"
        )
    return f"""
        WITH v AS ({_VECS_SQL}),
        pairs AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   q.v AS qv, c.v AS cv, q.nrm AS qn, c.nrm AS cn
            FROM v q JOIN v c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < {N_QUERIES}
        ),
        scored AS (
            SELECT query_id, neighbor_id, 0 AS dim, {full_cos} AS cos FROM pairs
            UNION ALL {" UNION ALL ".join(prefix_rows)}
        ),
        topk AS (
            SELECT dim, query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY dim, query_id
                    ORDER BY cos DESC, neighbor_id) AS rk
                FROM scored
            ) WHERE rk <= {TOP_K}
        ),
        fulltop AS (SELECT query_id, neighbor_id FROM topk WHERE dim = 0)
        SELECT CAST(t.dim AS INT) AS dim, count(*) AS n_hits,
               (SELECT count(*) FROM fulltop) AS n_total,
               round(count(*) * 1.0 / (SELECT count(*) FROM fulltop), 4) AS recall
        FROM topk t JOIN fulltop f
          ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
        WHERE t.dim <> 0
        GROUP BY t.dim
    """


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@K report for every ANN tier against the exact brute
    force, as one hash-checkable table — the acceptance metric an ANN
    rollout is judged by. Every tier is deterministic (fixed planes /
    centroids / codebooks), so recall is a reproducible number, not a
    sample: the oracle recomputes all four searches and the same set
    intersection."""
    # the exact-neighbor frame is referenced FIVE times in the final
    # union plan (four per-tier semi-joins + the total); materialize
    # the n x TOP_K row result once so the brute-force scoring pass
    # does not re-execute per reference (r11)
    brute = (
        q_knn_bruteforce(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .localCheckpoint()
    )
    tot = brute.agg(F.count("*").alias("n_total"))
    rows = None
    for method, fn in (
        ("lsh", q_knn_lsh_bucketed),
        ("ivf", q_knn_ivf),
        ("pq", q_knn_pq),
        ("graph", q_knn_graph_search),
    ):
        approx = fn(spark, sf_dir).select("query_id", "neighbor_id").distinct()
        row = (
            brute.join(approx, ["query_id", "neighbor_id"], "left_semi")
            .agg(F.count("*").alias("n_hits"))
            .crossJoin(F.broadcast(tot))
            .select(
                F.lit(method).alias("method"),
                "n_hits",
                "n_total",
                # try_divide: an empty corpus yields n_total = 0, and
                # ANSI mode would turn the plain division into a
                # DIVIDE_BY_ZERO error instead of a NULL recall
                F.round(F.try_divide(F.col("n_hits"), F.col("n_total")), 4).alias("recall"),
            )
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows


def _ann_recall_oracle() -> str:
    def one(method, cte):
        return f"""
        SELECT '{method}' AS method,
               (SELECT count(*) FROM brute b
                JOIN (SELECT DISTINCT query_id, neighbor_id FROM {cte}) a
                  ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id) AS n_hits,
               (SELECT count(*) FROM brute) AS n_total,
               round((SELECT count(*) FROM brute b
                      JOIN (SELECT DISTINCT query_id, neighbor_id FROM {cte}) a
                        ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id) * 1.0
                     / (SELECT count(*) FROM brute), 4) AS recall"""

    return f"""
        WITH brute AS (SELECT query_id, neighbor_id FROM ({KNN_BRUTEFORCE_ORACLE}) t),
        lsh AS (SELECT query_id, neighbor_id FROM ({_knn_lsh_oracle()}) t),
        ivf AS (SELECT query_id, neighbor_id FROM ({_knn_ivf_oracle()}) t),
        pq AS (SELECT query_id, neighbor_id FROM ({_knn_pq_oracle()}) t),
        graph AS (SELECT query_id, neighbor_id
                  FROM ({_knn_graph_search_oracle()}) t)
        {one('lsh', 'lsh')}
        UNION ALL
        {one('ivf', 'ivf')}
        UNION ALL
        {one('pq', 'pq')}
        UNION ALL
        {one('graph', 'graph')}
    """


def q_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search: top-3 cosine neighbors restricted to
    candidates sharing the query's label — the metadata-prefiltered
    ANN every vector store exposes (filter-then-search, not
    search-then-filter, so recall is not silently lost to the
    filter). Same determinism contract as the other knn tiers."""
    v = _vecs(spark, sf_dir)
    lab = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    vl = v.join(lab, "vec_id")
    q = vl.filter(F.col("vec_id") < N_QUERIES).alias("q")
    c = vl.alias("c")
    cos = F.round(
        _dot(F.col("q.v"), F.col("c.v")) / (F.col("q.nrm") * F.col("c.nrm")), 6
    )
    scored = q.join(
        c,
        (F.col("q.label") == F.col("c.label"))
        & (F.col("q.vec_id") != F.col("c.vec_id")),
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("q.label").alias("label"),
        F.col("c.vec_id").alias("neighbor_id"),
        cos.alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("query_id", "label", "neighbor_id", "cosine", F.col("rk").cast("int").alias("rk"))
    )


def _knn_filtered_oracle() -> str:
    return f"""
        WITH v AS ({_VECS_SQL}),
        vl AS (SELECT v.*, e.label FROM v JOIN embeddings e USING (vec_id))
        SELECT query_id, label, neighbor_id, cosine, CAST(rk AS INT) AS rk FROM (
            SELECT q.vec_id AS query_id, q.label AS label, c.vec_id AS neighbor_id,
                   round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) DESC,
                                c.vec_id) AS rk
            FROM vl q JOIN vl c ON q.label = c.label AND q.vec_id <> c.vec_id
            WHERE q.vec_id < {N_QUERIES}
        ) WHERE rk <= 3
    """


KNN_GRAPH_K = 3


def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-graph construction: top-3 in-bucket neighbors for EVERY
    vector (not just a query block) — the build step of graph-based
    ANN indexes and the edge input to semantic clustering. Same
    bucketed shape as knn_lsh_bucketed generalized to all-vectors-as-
    queries: the pair space is sum over buckets of n_b^2, not n^2, and
    the per-query top-k resolves in a WindowGroupLimit (rank pushdown,
    no full sort of the candidate stream). At 100 TB you shard further
    by running per-bucket applyInPandas BLAS blocks; the join/topk
    shape here is the distributed skeleton that approach plugs into."""
    scored = bucket_pair_scores(spark, sf_dir, digits=6, ordered=False).select(
        F.col("vec_a").alias("vec_id"),
        F.col("vec_b").alias("neighbor_id"),
        "cosine",
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= KNN_GRAPH_K
    )


def _knn_graph_oracle() -> str:
    return f"""
        WITH v0 AS ({_VECS_SQL}),
        v AS (SELECT vec_id, v, nrm, {_bucket_sql('v')} AS bucket
              FROM v0 CROSS JOIN {_NP_SQL} npc)
        SELECT vec_id, neighbor_id, cosine, CAST(rk AS INT) AS rk FROM (
            SELECT a.vec_id, b.vec_id AS neighbor_id,
                   round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) DESC,
                                b.vec_id) AS rk
            FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        ) WHERE rk <= {KNN_GRAPH_K}
    """


# --- Graph-ANN search over the built kNN graph ----------------------
# Greedy beam search (the HNSW-style search shape) with a FIXED entry
# point, fixed round count, and deterministic tie-breaks — so the
# DuckDB oracle unrolls the rounds exactly (the kmeans/perceptron
# fixed-iteration recipe).
GRAPH_SEARCH_BEAM = 8
GRAPH_SEARCH_ROUNDS = 3
GRAPH_SEARCH_ENTRY = 0  # fixed entry node (smallest vec_id)


def q_knn_graph_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beam search over q_knn_graph's neighbor lists — the retrieval
    half of the graph-ANN pair (build: knn_graph), completing the
    index->search couple the way IVF -> IVFADC did. All queries start
    at the fixed entry node; each round expands the current beam's
    out-edges, scores candidates by exact cosine, and keeps the top
    GRAPH_SEARCH_BEAM of everything visited; after
    GRAPH_SEARCH_ROUNDS rounds the answer is the top TOP_K visited
    nodes (self excluded).

    Scale shape: the graph index is built once (localCheckpoint — the
    bucketed pair scores are not re-derived per round) and joined by
    its natural vec_id key each round; the per-query beam state is
    tiny (queries x BEAM rows) and explicitly broadcast against the
    corpus-sized graph and vector tables, so each round is two
    broadcast joins + one window over a frame that never exceeds
    queries x (BEAM x K + BEAM) rows. Rounds are fixed, not
    converged — no driver-side data, plan depth bounded by
    localCheckpoint per round."""
    v = _vecs(spark, sf_dir)
    g = (
        q_knn_graph(spark, sf_dir)
        .select(F.col("vec_id").alias("g_src"), F.col("neighbor_id").alias("g_dst"))
        .localCheckpoint()
    )
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    vn = v.select(F.col("vec_id").alias("node"), "v", "nrm")

    def score(nodes: DataFrame) -> DataFrame:
        c = F.broadcast(nodes).join(vn, "node").join(F.broadcast(q), "query_id")
        cos = F.round(
            _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 6
        )
        return c.select("query_id", "node", cos.alias("cosine"))

    visited = score(
        q.select("query_id").withColumn(
            "node", F.lit(GRAPH_SEARCH_ENTRY).cast("long")
        )
    ).localCheckpoint()
    beam = visited
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "node")
    for _ in range(GRAPH_SEARCH_ROUNDS):
        cand = (
            F.broadcast(beam.select("query_id", "node"))
            .join(g, F.col("node") == F.col("g_src"))
            .select("query_id", F.col("g_dst").alias("node"))
            .distinct()
        )
        visited = visited.unionByName(score(cand)).distinct().localCheckpoint()
        beam = (
            visited.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= GRAPH_SEARCH_BEAM)
            .drop("rk")
        )
    return (
        visited.filter(F.col("node") != F.col("query_id"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            F.col("node").alias("neighbor_id"),
            "cosine",
            F.col("rk").cast("int").alias("rk"),
        )
    )


def _knn_graph_search_oracle() -> str:
    def cos(qa: str, xa: str) -> str:
        return (
            f"round(list_dot_product({qa}.qv, {xa}.v) "
            f"/ ({qa}.qnrm * {xa}.nrm), 6)"
        )

    parts = [
        f"""
        v AS ({_VECS_SQL}),
        g AS (SELECT vec_id AS g_src, neighbor_id AS g_dst
              FROM ({_knn_graph_oracle()}) t),
        q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm
              FROM v WHERE vec_id < {N_QUERIES}),
        vis0 AS (
            SELECT q.query_id, c.vec_id AS node, {cos('q', 'c')} AS cosine
            FROM q JOIN v c ON c.vec_id = {GRAPH_SEARCH_ENTRY}
        ),
        beam0 AS (SELECT query_id, node, cosine FROM vis0)"""
    ]
    for r in range(1, GRAPH_SEARCH_ROUNDS + 1):
        parts.append(
            f""",
        cand{r} AS (
            SELECT DISTINCT b.query_id, g.g_dst AS node
            FROM beam{r - 1} b JOIN g ON g.g_src = b.node
        ),
        sc{r} AS (
            SELECT c.query_id, c.node, {cos('q', 'x')} AS cosine
            FROM cand{r} c
            JOIN q USING (query_id)
            JOIN v x ON x.vec_id = c.node
        ),
        vis{r} AS (
            SELECT query_id, node, cosine FROM vis{r - 1}
            UNION
            SELECT query_id, node, cosine FROM sc{r}
        ),
        beam{r} AS (
            SELECT query_id, node, cosine FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY cosine DESC, node) AS rk
                FROM vis{r})
            WHERE rk <= {GRAPH_SEARCH_BEAM}
        )"""
        )
    parts.append(
        f"""
        SELECT query_id, node AS neighbor_id, cosine, CAST(rk AS INT) AS rk
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY query_id
                  ORDER BY cosine DESC, node) AS rk
              FROM vis{GRAPH_SEARCH_ROUNDS}
              WHERE node <> query_id)
        WHERE rk <= {TOP_K}
    """
    )
    return "WITH " + "".join(parts)


SEMDECON_MOD = 50   # benchmark set = vec_id % 50 == 0 (~2% of corpus)
SEMDECON_T = 0.35   # same near-dup threshold as the embedding dedup path


def q_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC benchmark decontamination: flag corpus vectors whose
    embedding near-duplicates a held-out benchmark vector — catches
    the paraphrased contamination that n-gram decontamination
    (pipeline.decontaminate) structurally misses. Candidates come
    from the SAME corpus-adaptive 2-band hyperplane-LSH machinery as
    the embedding dedup path (banded_pair_scores: linear-in-n pair
    generation, exact-cosine verify), filtered to pairs crossing the
    benchmark boundary; per flagged corpus vector, emits its hit
    count and the strongest benchmark match (ties broken by lowest
    benchmark id — deterministic). At 100 TB the benchmark side is
    tiny but the bucket join never assumes that: both sides bucket,
    so the same plan serves benchmark sets of any size."""
    pairs = banded_pair_scores(spark, sf_dir, digits=4, threshold=SEMDECON_T)
    is_bench_a = F.col("vec_a") % SEMDECON_MOD == 0
    is_bench_b = F.col("vec_b") % SEMDECON_MOD == 0
    crossing = pairs.filter(is_bench_a != is_bench_b).select(
        F.when(is_bench_a, F.col("vec_b")).otherwise(F.col("vec_a")).alias("corpus_id"),
        F.when(is_bench_a, F.col("vec_a")).otherwise(F.col("vec_b")).alias("bench_id"),
        "cosine",
    )
    win = W.partitionBy("corpus_id").orderBy(F.desc("cosine"), F.col("bench_id"))
    return (
        crossing.withColumn("rk", F.row_number().over(win))
        .withColumn("n_hits", F.count("*").over(W.partitionBy("corpus_id")))
        .filter(F.col("rk") == 1)
        .select("corpus_id", "bench_id", F.col("cosine").alias("max_cosine"), "n_hits")
    )


def _decontaminate_semantic_oracle() -> str:
    return f"""
        WITH pairs AS ({banded_pairs_sql(digits=4, threshold=SEMDECON_T)}),
        crossing AS (
            SELECT CASE WHEN vec_a % {SEMDECON_MOD} = 0 THEN vec_b ELSE vec_a END
                       AS corpus_id,
                   CASE WHEN vec_a % {SEMDECON_MOD} = 0 THEN vec_a ELSE vec_b END
                       AS bench_id,
                   cosine
            FROM pairs
            WHERE (vec_a % {SEMDECON_MOD} = 0) <> (vec_b % {SEMDECON_MOD} = 0)
        )
        SELECT corpus_id, bench_id, cosine AS max_cosine,
               CAST(n_hits AS BIGINT) AS n_hits
        FROM (
            SELECT corpus_id, bench_id, cosine,
                   row_number() OVER (PARTITION BY corpus_id
                                      ORDER BY cosine DESC, bench_id) AS rk,
                   count(*) OVER (PARTITION BY corpus_id) AS n_hits
            FROM crossing
        )
        WHERE rk = 1
    """


# --- Distributed k-means (Lloyd's), exactly oracled -----------------
#
# Embedding-space clustering for corpus bucketing / mixing: KMEANS_K
# centroids initialized to the first K vectors (deterministic across
# engines), KMEANS_ROUNDS Lloyd iterations, then a final assignment
# pass for membership and inertia. Exactness discipline: centroid
# updates sum components in DECIMAL(20,10) (reduction-order-invariant,
# see q_embedding_pool's tie argument) and divide/round(8) in-query;
# squared distances use the expanded form x2 - 2x.c + c2 rounded to 6
# (the knn-family discipline) with a `+ 0.0` negative-zero guard;
# inertia sums round(d2*1e6) as exact longs. Per round, the driver
# holds only the K x D centroid matrix (plan-parameter scalars) — all
# corpus-scale work is one broadcast fan-out + one hash aggregate
# (min-of-struct argmin, no sort window) + one (cid,pos) aggregate.
KMEANS_K = 8
KMEANS_ROUNDS = 3
KMEANS_SCALE = 1_000_000  # inertia fixed-point scale

_KMEANS_OUT_SCHEMA = "cluster long, n_members long, id_sum long, inertia double"


def _kmeans_cent_df(spark: SparkSession, cents) -> DataFrame:
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("cid", LongType()),
            StructField("cv", ArrayType(DoubleType())),
        ]
    )
    df = spark.createDataFrame(
        [(int(c), [float(x) for x in vec]) for c, vec in cents], schema
    )
    return df.withColumn("c2", _dot(F.col("cv"), F.col("cv")))


def _kmeans_assign(spark: SparkSession, v: DataFrame, cents) -> DataFrame:
    """Nearest-centroid assignment as ONE hash aggregate: broadcast
    the K centroids, fan out K distance rows per vector, take the
    lexicographic min of struct(d2, cid, v, x2) — cid is unique so the
    comparison never reaches the payload fields. Partial aggregation
    applies; no per-vector sort window."""
    vc = v.crossJoin(F.broadcast(_kmeans_cent_df(spark, cents)))
    d2 = (
        F.round(
            F.col("x2") - 2 * _dot(F.col("v"), F.col("cv")) + F.col("c2"), 6
        )
        + F.lit(0.0)
    ).alias("d2")
    return (
        vc.select("vec_id", d2, "cid", "v", "x2")
        .groupBy("vec_id")
        .agg(F.min(F.struct("d2", "cid", "v", "x2")).alias("m"))
        .select(
            "vec_id",
            F.col("m.cid").alias("cid"),
            F.col("m.v").alias("v"),
            F.col("m.x2").alias("x2"),
            F.col("m.d2").alias("d2"),
        )
    )


def _lloyd_final(spark: SparkSession, sf_dir: str) -> DataFrame | None:
    """Run the KMEANS_ROUNDS Lloyd loop and return the FINAL
    assignment frame (vec_id, cid, v, x2, d2) — shared by
    q_kmeans_lloyd and q_embedding_outliers so both queries cluster
    identically. None when the corpus is empty."""
    # fan_out: every Lloyd round's broadcast fan-out + argmin aggregate
    # runs over v's partitioning — one scan split at fixture scale
    # would keep all K x n distance work on a single task
    e = fan_out(spark, load_table(spark, sf_dir, "embeddings"))
    v = e.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    ).select("vec_id", "v", _dot(F.col("v"), F.col("v")).alias("x2"))
    init = (
        v.filter(F.col("vec_id") < KMEANS_K)
        .select("vec_id", "v")
        .orderBy("vec_id")
        .collect()
    )
    if not init:
        return None
    cents = [(r.vec_id, r.v) for r in init]
    v = v.persist()
    for _ in range(KMEANS_ROUNDS):
        assigned = _kmeans_assign(spark, v, cents)
        means = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("x").cast("decimal(20,10)")).alias("s"),
            )
            .select(
                "cid",
                "pos",
                (
                    F.round(F.col("s").cast("double") / F.col("n"), 8)
                    + F.lit(0.0)
                ).alias("mv"),
            )
            .collect()
        )
        by_cid: dict = {}
        for r in means:
            by_cid.setdefault(r.cid, {})[r.pos] = r.mv
        nxt = []
        for cid, old in cents:
            m = by_cid.get(cid)
            nxt.append((cid, [m[p] for p in sorted(m)]) if m else (cid, old))
        cents = nxt
    # The cache only serves the per-round collects above; release it
    # before returning so the driver's long single session does not
    # accumulate leaked storage across queries (the final lazy
    # assignment recomputes v from parquet once — bounded, cheap).
    v.unpersist()
    return _kmeans_assign(spark, v, cents)


def q_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means over the embedding corpus — Lloyd's
    algorithm with deterministic init, exactly oracle-checkable (the
    DuckDB twin unrolls the same KMEANS_ROUNDS rounds as CTEs).
    Returns per-cluster membership count, an exact membership
    fingerprint (sum of member vec_ids), and fixed-point inertia.
    Empty clusters deterministically keep their previous centroid."""
    final = _lloyd_final(spark, sf_dir)
    if final is None:
        return spark.createDataFrame([], _KMEANS_OUT_SCHEMA)
    return (
        final.groupBy(F.col("cid").alias("cluster"))
        .agg(
            F.count("*").alias("n_members"),
            F.sum("vec_id").alias("id_sum"),
            (
                F.round(
                    F.sum(
                        F.round(F.col("d2") * KMEANS_SCALE, 0).cast("long")
                    )
                    / F.lit(float(KMEANS_SCALE)),
                    6,
                )
                + F.lit(0.0)
            ).alias("inertia"),
        )
        .orderBy("cluster")
    )


def _kmeans_ctes() -> str:
    """The unrolled Lloyd rounds as a DuckDB CTE chain ending in
    `afinal` (the final assignment) — shared by the kmeans and the
    embedding-outliers oracles."""
    v_sql = """
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               list_dot_product(
                   list_transform(embedding, x -> CAST(x AS DOUBLE)),
                   list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x2
        FROM embeddings"""

    def assign(an: str, cn: str) -> str:
        d2 = f"round(v.x2 - 2 * list_dot_product(v.v, c.cv) + c.c2, 6) + 0.0"
        return f"""
        {an} AS (
            SELECT vec_id, v, x2, cid, d2 FROM (
                SELECT v.vec_id, v.v, v.x2, c.cid, {d2} AS d2,
                       row_number() OVER (PARTITION BY v.vec_id
                                          ORDER BY {d2}, c.cid) AS rk
                FROM v CROSS JOIN {cn} c
            ) WHERE rk = 1
        )"""

    def update(an: str, cprev: str, cn: str) -> str:
        return f"""
        {cn} AS (
            SELECT cid, cv, list_dot_product(cv, cv) AS c2 FROM (
                SELECT p.cid, COALESCE(n.cv, p.cv) AS cv
                FROM {cprev} p LEFT JOIN (
                    SELECT cid, list(mv ORDER BY pos) AS cv FROM (
                        SELECT cid, pos,
                               round(CAST(sum(CAST(x AS DECIMAL(20,10)))
                                          AS DOUBLE) / count(*), 8) + 0.0 AS mv
                        FROM (SELECT cid, pos, v[pos] AS x
                              FROM {an},
                              LATERAL (SELECT unnest(generate_series(1, len(v)))
                                       AS pos) g)
                        GROUP BY 1, 2
                    ) GROUP BY cid
                ) n USING (cid)
            )
        )"""

    ctes = [
        f"v AS ({v_sql})",
        f"""c0 AS (
            SELECT vec_id AS cid, v AS cv, list_dot_product(v, v) AS c2
            FROM v WHERE vec_id < {KMEANS_K}
        )""",
    ]
    for r in range(KMEANS_ROUNDS):
        ctes.append(assign(f"a{r + 1}", f"c{r}"))
        ctes.append(update(f"a{r + 1}", f"c{r}", f"c{r + 1}"))
    ctes.append(assign("afinal", f"c{KMEANS_ROUNDS}"))
    return ",".join(ctes)


def _kmeans_oracle() -> str:
    return f"""
        WITH {_kmeans_ctes()}
        SELECT cid AS cluster,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(sum(vec_id) AS BIGINT) AS id_sum,
               round(sum(CAST(round(d2 * {KMEANS_SCALE}, 0) AS BIGINT))
                     / {KMEANS_SCALE}.0, 6) + 0.0 AS inertia
        FROM afinal
        GROUP BY cid
        ORDER BY cid
    """


_OUTLIER_SIGMAS = 2  # flag d2 > mean + 2*sigma within the cluster

_OUTLIERS_SCHEMA = (
    "cluster long, n_members long, n_outliers long, pct_outliers double, "
    "max_d2 double, thr_d2 double"
)


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier detection — the corpus-curation filter that
    drops vectors far from their semantic neighborhood: cluster with
    the SAME Lloyd loop as kmeans_lloyd, then flag members whose
    squared distance exceeds mean + {_OUTLIER_SIGMAS} sigma within
    their cluster. Exactness: d2 is already 6-dp fixed-point, so the
    per-cluster first and second moments accumulate as exact integers
    (DECIMAL(38,0) / HUGEINT — e^2 sums overflow a signed 64-bit long
    at 100x, measured) and the derived mean/variance/threshold are
    identical doubles on both engines; every flag is a comparison of
    identical values. One extra aggregate + one broadcast join past
    the shared clustering."""
    final = _lloyd_final(spark, sf_dir)
    if final is None:
        return spark.createDataFrame([], _OUTLIERS_SCHEMA)
    e = final.select(
        "cid",
        F.round(F.col("d2") * KMEANS_SCALE, 0).cast("long").alias("e"),
    )
    dec = F.col("e").cast("decimal(38,0)")
    st = e.groupBy("cid").agg(
        F.count("*").alias("nm"),
        F.sum(dec).alias("s"),
        F.sum(dec * F.col("e")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("nm")
    var = F.col("ss").cast("double") / F.col("nm") - mean * mean
    st2 = st.select(
        "cid",
        "nm",
        (mean + _OUTLIER_SIGMAS * F.sqrt(F.greatest(var, F.lit(0.0)))).alias("thr"),
    )
    return (
        e.join(F.broadcast(st2), "cid")
        .groupBy(F.col("cid").alias("cluster"))
        .agg(
            F.max("nm").alias("n_members"),
            F.sum(
                F.when(F.col("e") > F.col("thr"), 1).otherwise(0)
            ).alias("n_outliers"),
            F.max("e").alias("max_e"),
            F.max("thr").alias("thr_raw"),
        )
        .select(
            "cluster",
            "n_members",
            "n_outliers",
            (
                F.round(F.col("n_outliers") * 100.0 / F.col("n_members"), 2)
                + F.lit(0.0)
            ).alias("pct_outliers"),
            (
                F.round(F.col("max_e") / F.lit(float(KMEANS_SCALE)), 6)
                + F.lit(0.0)
            ).alias("max_d2"),
            (
                F.round(F.col("thr_raw") / F.lit(float(KMEANS_SCALE)), 6)
                + F.lit(0.0)
            ).alias("thr_d2"),
        )
        .orderBy("cluster")
    )


def _embedding_outliers_oracle() -> str:
    return f"""
        WITH {_kmeans_ctes()},
        e AS (SELECT cid, CAST(round(d2 * {KMEANS_SCALE}, 0) AS BIGINT) AS e
              FROM afinal),
        st AS (SELECT cid, count(*) AS nm,
                      sum(CAST(e AS HUGEINT)) AS s,
                      sum(CAST(e AS HUGEINT) * e) AS ss
               FROM e GROUP BY 1),
        st2 AS (SELECT cid, nm,
                       CAST(s AS DOUBLE) / nm
                       + {_OUTLIER_SIGMAS} * sqrt(greatest(
                             CAST(ss AS DOUBLE) / nm
                             - (CAST(s AS DOUBLE) / nm)
                               * (CAST(s AS DOUBLE) / nm), 0.0)) AS thr
                FROM st)
        SELECT e.cid AS cluster,
               CAST(max(st2.nm) AS BIGINT) AS n_members,
               CAST(sum(CASE WHEN e.e > st2.thr THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers,
               round(sum(CASE WHEN e.e > st2.thr THEN 1 ELSE 0 END) * 100.0
                     / max(st2.nm), 2) + 0.0 AS pct_outliers,
               round(max(e.e) / {KMEANS_SCALE}.0, 6) + 0.0 AS max_d2,
               round(max(st2.thr) / {KMEANS_SCALE}.0, 6) + 0.0 AS thr_d2
        FROM e JOIN st2 USING (cid)
        GROUP BY 1
        ORDER BY 1
    """


SEMDEDUP_T = 0.35  # same near-dup threshold as the embedding dedup path

_SEMDEDUP_SCHEMA = (
    "cluster long, n_members long, n_dropped long, kept_id_sum long, "
    "keep_rate double"
)


def q_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): cluster the embedding corpus,
    then prune near-duplicates WITHIN each cluster — the k-means
    pre-partition is what makes semantic dedup affordable, because
    pairwise comparison only happens inside a cluster, never across
    the corpus. Rides the exact same Lloyd result as kmeans_lloyd /
    embedding_outliers (shared `_lloyd_final`); a member is dropped
    iff a lower-vec_id member of ITS cluster has cosine >=
    SEMDEDUP_T (the min-keeper rule the exact-dedup family uses).
    Emits per cluster: member/dropped counts, an exact kept-membership
    fingerprint (sum of kept vec_ids), and the keep rate.

    Scale posture: the within-cluster self-join is the algorithm's
    published cost — O(sum of cluster_size^2) — and the production
    knob is k tracking n (SemDeDup runs k ~ n/1000). Here k is pinned
    at KMEANS_K because the DuckDB oracle unrolls the Lloyd rounds;
    both join sides carry an explicit repartition so AQE cannot
    coalesce the pre-fan-out exchange to one task."""
    final = _lloyd_final(spark, sf_dir)
    if final is None:
        return spark.createDataFrame([], _SEMDEDUP_SCHEMA)
    par = spark.sparkContext.defaultParallelism * 2
    m = final.select(
        "cid", "vec_id", "v", F.sqrt(F.col("x2")).alias("nrm")
    )
    a = m.select(
        F.col("cid").alias("cid"),
        F.col("vec_id").alias("va"),
        F.col("v").alias("xa"),
        F.col("nrm").alias("na"),
    ).repartition(par, "cid")
    b = m.select(
        F.col("cid").alias("cid"),
        F.col("vec_id").alias("vb"),
        F.col("v").alias("xb"),
        F.col("nrm").alias("nb"),
    ).repartition(par, "cid")
    cos = F.round(_dot(F.col("xa"), F.col("xb")) / (F.col("na") * F.col("nb")), 6)
    dropped = (
        a.join(b, "cid")
        .filter(F.col("vb") < F.col("va"))
        .filter(cos >= SEMDEDUP_T)
        .select("cid", "va")
        .distinct()
    )
    mem = m.groupBy("cid").agg(
        F.count("*").alias("n_members"), F.sum("vec_id").alias("id_sum")
    )
    dr = dropped.groupBy("cid").agg(
        F.count("*").alias("n_dropped"), F.sum("va").alias("dsum")
    )
    return (
        mem.join(dr, "cid", "left")
        .select(
            F.col("cid").alias("cluster"),
            "n_members",
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            (F.col("id_sum") - F.coalesce("dsum", F.lit(0))).alias("kept_id_sum"),
            F.round(
                (F.col("n_members") - F.coalesce("n_dropped", F.lit(0)))
                / F.col("n_members"),
                4,
            ).alias("keep_rate"),
        )
    )


def _semdedup_oracle() -> str:
    return f"""
        WITH {_kmeans_ctes()},
        m AS (SELECT cid, vec_id, v, sqrt(x2) AS nrm FROM afinal),
        dropped AS (
            SELECT DISTINCT a.cid, a.vec_id
            FROM m a JOIN m b ON a.cid = b.cid AND b.vec_id < a.vec_id
            WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
                  >= {SEMDEDUP_T}
        ),
        mem AS (SELECT cid, count(*) AS nm, sum(vec_id) AS id_sum
                FROM m GROUP BY 1),
        dr AS (SELECT cid, count(*) AS nd, sum(vec_id) AS dsum
               FROM dropped GROUP BY 1)
        SELECT mem.cid AS cluster,
               CAST(nm AS BIGINT) AS n_members,
               CAST(COALESCE(nd, 0) AS BIGINT) AS n_dropped,
               CAST(id_sum - COALESCE(dsum, 0) AS BIGINT) AS kept_id_sum,
               round((nm - COALESCE(nd, 0)) * 1.0 / nm, 4) AS keep_rate
        FROM mem LEFT JOIN dr USING (cid)
    """


def specs() -> list[QuerySpec]:
    return [
        QuerySpec("semdedup_prune", q_semdedup_prune, _semdedup_oracle(),
                  ("similarity", "llm", "dedup", "clustering"),
                  "SemDeDup: k-means pre-partition + within-cluster cosine "
                  "prune, min-keeper rule, exact kept fingerprint."),
        QuerySpec("decontaminate_semantic", q_decontaminate_semantic,
                  _decontaminate_semantic_oracle(),
                  ("similarity", "llm", "decontamination"),
                  "Embedding-space benchmark decontamination: adaptive-LSH "
                  "candidates crossing the benchmark boundary + exact-cosine "
                  "verify, strongest match per flagged vector."),
        QuerySpec("embedding_pool", q_embedding_pool, EMBEDDING_POOL_ORACLE,
                  ("embedding", "llm"),
                  "Per-label element-wise mean pooling (decimal-exact sums)."),
        QuerySpec("knn_filtered", q_knn_filtered, _knn_filtered_oracle(),
                  ("similarity", "llm", "filtered"),
                  "Metadata-prefiltered (same-label) exact top-3 search."),
        QuerySpec("ann_recall", q_ann_recall, _ann_recall_oracle(),
                  ("similarity", "llm", "recall"),
                  "Recall@K of LSH/IVF/PQ tiers vs exact brute force."),
        QuerySpec("embedding_matryoshka", q_embedding_matryoshka, _matryoshka_oracle(),
                  ("similarity", "llm", "recall"),
                  "MRL truncation evaluation: top-K recall at prefix dims "
                  "8/16/32 vs the full vector, one pass, hash-checkable."),
        QuerySpec("knn_graph", q_knn_graph, _knn_graph_oracle(),
                  ("similarity", "llm", "graph"),
                  "Bucketed kNN-graph build: top-3 in-bucket neighbors for every vector."),
        QuerySpec("knn_graph_search", q_knn_graph_search,
                  _knn_graph_search_oracle(),
                  ("similarity", "llm", "graph", "iterative"),
                  "Greedy beam search over the kNN graph (HNSW-style search "
                  "half): fixed entry, fixed rounds, exact-cosine scoring, "
                  "unrolled-round oracle."),
        QuerySpec("kmeans_lloyd", q_kmeans_lloyd, _kmeans_oracle(),
                  ("similarity", "llm", "iterative", "clustering"),
                  "Distributed Lloyd's k-means (3 rounds, decimal-exact "
                  "centroid updates), membership + inertia exactly oracled."),
        QuerySpec("embedding_outliers", q_embedding_outliers,
                  _embedding_outliers_oracle(),
                  ("similarity", "llm", "clustering", "quality"),
                  "Cluster-relative outlier flags (d2 > mean + 2 sigma) with "
                  "overflow-safe exact moment accumulation."),
        QuerySpec("embedding_quantize", q_embedding_quantize, EMBEDDING_QUANTIZE_ORACLE,
                  ("embedding", "llm", "compression"),
                  "int8 scalar quantization with reconstruction-error report."),
        QuerySpec("embedding_stats", q_embedding_stats, EMBEDDING_STATS_ORACLE,
                  ("similarity", "llm"), "Per-label embedding norm statistics."),
        QuerySpec("knn_bruteforce", q_knn_bruteforce, KNN_BRUTEFORCE_ORACLE,
                  ("similarity", "llm"), "Exact cosine top-5 neighbors (baseline)."),
        QuerySpec("knn_lsh_bucketed", q_knn_lsh_bucketed, _knn_lsh_oracle(),
                  ("similarity", "llm", "lsh"),
                  "Random-hyperplane LSH bucketed ANN top-5, oracle-identical buckets."),
        QuerySpec("knn_bruteforce_numpy", q_knn_bruteforce_numpy, KNN_BRUTEFORCE_ORACLE,
                  ("similarity", "llm", "pandas"),
                  "Exact cosine top-5 via Arrow batches + numpy matmul (same oracle)."),
        QuerySpec("knn_ivf", q_knn_ivf, _knn_ivf_oracle(),
                  ("similarity", "llm", "ivf"),
                  "IVF-flat ANN (deterministic centroids, nprobe=2), oracle-identical lists."),
        QuerySpec("knn_pq", q_knn_pq, _knn_pq_oracle(),
                  ("similarity", "llm", "pq", "compression"),
                  "Product-quantization ANN (8x4-bit codes, ADC distance tables)."),
        QuerySpec("knn_ivfpq", q_knn_ivfpq, _knn_ivfpq_oracle(),
                  ("similarity", "llm", "pq", "ivf", "scale"),
                  "IVFADC: coarse cell probe + residual-PQ ADC distance "
                  "tables — the canonical billion-scale ANN layout."),
        QuerySpec("embedding_pca_power", q_embedding_pca_power,
                  _pca_power_oracle(),
                  ("similarity", "llm", "iterative", "scale"),
                  "Top principal component by quantized power iteration "
                  "(5 exact rounds over a one-pass covariance)."),
        QuerySpec("sample_coreset", q_sample_coreset, _coreset_oracle(),
                  ("similarity", "llm", "sampling", "iterative"),
                  "Greedy k-center coreset selection (farthest-point "
                  "traversal) with the coverage-radius quality curve."),
        QuerySpec("embedding_abtt", q_embedding_abtt, _abtt_oracle(),
                  ("similarity", "llm", "iterative"),
                  "All-but-the-top isotropy correction: project out the "
                  "top component, report per-label anisotropy before/after."),
    ]
