"""Similarity search over the embeddings table.

Baseline: brute-force cosine top-k (broadcast query set x all vectors,
JVM zip_with/aggregate dot products, window top-k).

Exactness trick for the DuckDB oracle: embeddings are quantized to the
1/1024 grid (round(x*1024)/1024). Quantized values are exact binary
fractions; products and partial sums stay EXACT in float64 (well under
2^53), so dot products are identical regardless of summation order in
either engine, and ranking ties are true ties (broken by vec_id).

Scale paths (oracle-checked since round 2): IVF-flat (deterministic
coarse centroids + nprobe inverted lists) and multi-table
random-hyperplane LSH. Both are fully deterministic, and the LSH
hyperplane components are EXACT BINARY FRACTIONS (k/1024 - 1), so
projections — sums of products of 2^-10-grid values — are exact in
float64 and order-independent: the DuckDB oracles match bit-for-bit.
NOTE on this corpus: the synthetic embeddings are near-isotropic (true
top-10 neighbors sit at cosine ~0.3 and only ~11% share the query's
label), so sublinear recall of the exact top-10 is
information-theoretically limited — recall ~0.4 for both variants at
sf0.01 reflects the data, not the plumbing (bench.py emits recall@k
per round). The CLUSTERED mode (clustered=True / *_clustered queries)
proves that: the identical IVF/LSH code over a planted-cluster table
(32 exact-binary centers + small noise, derived deterministically from
vec_id) measures recall@10 = 1.0 at sf0.01, with the same bit-exact
DuckDB oracles green.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUANT = "1024e0"

N_PLANES = 5
N_TABLES = 4

# -- clustered synth mode ------------------------------------------------------
# The raw embeddings table is near-isotropic (see module docstring), which
# information-theoretically caps sublinear recall. The CLUSTERED mode
# re-derives a vector per vec_id with planted structure: 32 pseudo-random
# cluster centers + per-vector noise, every term an EXACT binary fraction
# (k/1024), so dot products stay order-independent and the DuckDB oracles
# match bit-for-bit. Same row count as the embeddings table at each sf.
N_CLUSTERS = 32
CLUST_DIM = 64
_CLUSTER_VEC = (
    "(((({vid} % 32) * 433 + d * 127) % 2048) / 1024e0 - 1e0)"
    " + ((({vid} * 7919 + d * 104729) % 129) - 64) / 1024e0"
)


def _cluster_vec_sql(vid: str, engine: str) -> str:
    body = _CLUSTER_VEC.format(vid=vid)
    if engine == "spark":
        return f"transform(sequence(0, {CLUST_DIM - 1}), d -> {body})"
    return f"list_transform(generate_series(0, {CLUST_DIM - 1}), d -> {body})"


def _plane_seed(t: int, p: int) -> int:
    """Small reduced seed for (table, plane): hyperplane component for
    dim d is ((seed + d*433) % 2048) / 1024 - 1, an EXACT binary
    fraction (433 = 2654435761 mod 2048; reduction mod 2048 keeps the
    literals small and the arithmetic identical in Spark and DuckDB)."""
    return ((t * 7919 + p) * 1315423911) % 2048


def _plane_proj_sql(seed: int, vec: str, engine: str) -> str:
    """Projection of `vec` onto the (exact-binary) hyperplane — shared
    math, per-engine array syntax."""
    comp = f"((({seed} + d * 433) % 2048) / 1024e0 - 1e0)"
    if engine == "spark":
        return (
            f"aggregate(zip_with({vec}, sequence(0, size({vec}) - 1), (x, d) -> "
            f"x * {comp}), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        )
    # duckdb: list_sum over a zip of the vector with its 0-based index
    return (
        f"list_sum(list_transform(generate_series(0, len({vec}) - 1), "
        f"d -> {vec}[d + 1] * {comp}))"
    )


def _quantized(spark, sf_dir, alias, clustered: bool = False):
    vexpr = (
        _cluster_vec_sql("vec_id", "spark") if clustered else
        f"transform(embedding, x -> round(CAST(x AS DOUBLE) * {QUANT}) / {QUANT})"
    )
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").selectExpr(
        f"vec_id AS {alias}_id",
        f"{vexpr} AS {alias}_v",
    ).selectExpr(
        f"{alias}_id",
        f"{alias}_v",
        f"aggregate({alias}_v, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x) AS {alias}_n",
    )


def _vec_cte(clustered: bool) -> str:
    """The shared DuckDB vector CTE body: vid + exact-binary vector."""
    vexpr = (
        _cluster_vec_sql("vec_id", "duckdb") if clustered else
        f"list_transform(embedding, x -> round(CAST(x AS DOUBLE) * {QUANT}) / {QUANT})"
    )
    return f"SELECT vec_id AS vid, {vexpr} AS vv\n  FROM embeddings"


def q_ann_topk(spark: SparkSession, sf_dir: str, k: int = 10, every: int = 40,
               clustered: bool = False) -> DataFrame:
    """Top-k cosine neighbors for every (vec_id % every == 0) query."""
    qs = _quantized(spark, sf_dir, "q", clustered).where(f"q_id % {every} = 0")
    vs = _quantized(spark, sf_dir, "v", clustered)
    pairs = vs.join(F.broadcast(qs), F.expr("q_n > 0 AND v_n > 0"))
    scored = pairs.selectExpr(
        "q_id AS query_id",
        "v_id AS neighbor_id",
        "aggregate(zip_with(q_v, v_v, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        " / sqrt(q_n * v_n) AS cosine",
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def oracle_ann_topk(k: int = 10, every: int = 40, clustered: bool = False) -> str:
    return f"""
WITH vsrc AS (
  {_vec_cte(clustered)}
),
q AS (SELECT vid AS qid, vv AS qv FROM vsrc WHERE vid % {every} = 0),
v AS (SELECT vid, vv FROM vsrc),
flat AS (
  SELECT qid, vid, unnest(qv) AS qe, unnest(vv) AS ve FROM q, v
),
dots AS (
  SELECT qid, vid, sum(qe * ve) AS dot, sum(qe * qe) AS qn, sum(ve * ve) AS vn
  FROM flat GROUP BY 1, 2
),
scored AS (
  SELECT qid AS query_id, vid AS neighbor_id, dot / sqrt(qn * vn) AS cosine
  FROM dots WHERE qn > 0 AND vn > 0
)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= {k}
""".strip()


def q_embedding_near_dup(spark: SparkSession, sf_dir: str, threshold: str = "3e-1",
                         every: int = 20) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, cosine) with
    cosine >= threshold, a from the (vec_id % every == 0) anchor subset,
    a < b. Quantized-exact cosines (see module docstring), so the DuckDB
    oracle matches bit-for-bit. At scale the anchor subset becomes an
    LSH/IVF bucket join; this is the exact small-scale twin."""
    qs = _quantized(spark, sf_dir, "q").where(f"q_id % {every} = 0")
    vs = _quantized(spark, sf_dir, "v")
    pairs = vs.join(F.broadcast(qs), F.expr("q_n > 0 AND v_n > 0 AND q_id < v_id"))
    return pairs.selectExpr(
        "q_id AS a",
        "v_id AS b",
        "aggregate(zip_with(q_v, v_v, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        " / sqrt(q_n * v_n) AS cosine",
    ).where(f"cosine >= {threshold}")


def oracle_embedding_near_dup(threshold: str = "3e-1", every: int = 20) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS qid,
         list_transform(embedding, x -> round(CAST(x AS DOUBLE) * {QUANT}) / {QUANT}) AS qv
  FROM embeddings WHERE vec_id % {every} = 0
),
v AS (
  SELECT vec_id AS vid,
         list_transform(embedding, x -> round(CAST(x AS DOUBLE) * {QUANT}) / {QUANT}) AS vv
  FROM embeddings
),
flat AS (
  SELECT qid, vid, unnest(qv) AS qe, unnest(vv) AS ve FROM q, v WHERE qid < vid
),
dots AS (
  SELECT qid, vid, sum(qe * ve) AS dot, sum(qe * qe) AS qn, sum(ve * ve) AS vn
  FROM flat GROUP BY 1, 2
)
SELECT qid AS a, vid AS b, dot / sqrt(qn * vn) AS cosine
FROM dots WHERE qn > 0 AND vn > 0 AND dot / sqrt(qn * vn) >= {threshold}
""".strip()


# -- IVF variant (scale path; oracle-checked) -----------------------------------


def q_ann_ivf(spark: SparkSession, sf_dir: str, k: int = 10, every: int = 40,
              n_centroids: int = 16, nprobe: int = 3,
              clustered: bool = False) -> DataFrame:
    """IVF-flat: deterministic coarse centroids (every (n/C)-th vector),
    each vector assigned to its nearest centroid (one broadcast argmin
    pass), queries probe the `nprobe` nearest inverted lists. At scale
    the assignment is a map-side broadcast join and each probe touches
    ~nprobe/C of the corpus. Quantized-exact cosines (module docstring)
    make every comparison bit-identical to the DuckDB oracle."""
    emb = _quantized(spark, sf_dir, "v", clustered).persist()
    total = emb.count()
    stride = max(total // n_centroids, 1)
    cents = (
        emb.where(f"v_id % {stride} = 0 AND v_n > 0")
        .orderBy("v_id")  # bare limit() takes arbitrary rows — keep deterministic
        .limit(n_centroids)
        .selectExpr("v_id AS c_id", "v_v AS c_v", "v_n AS c_n")
    )
    dot = (
        "aggregate(zip_with(v_v, c_v, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        " / sqrt(v_n * c_n)"
    )
    sims = emb.where("v_n > 0").join(F.broadcast(cents), F.lit(True)).selectExpr(
        "v_id", "v_v", "v_n", "c_id", f"{dot} AS csim"
    )
    w_assign = Window.partitionBy("v_id").orderBy(F.col("csim").desc(), F.col("c_id").asc())
    ranked = sims.withColumn("crank", F.row_number().over(w_assign))
    assigned = ranked.where("crank = 1").select("v_id", "v_v", "v_n", "c_id")
    probes = (
        ranked.where(f"crank <= {nprobe} AND v_id % {every} = 0")
        .selectExpr("v_id AS q_id", "v_v AS q_v", "v_n AS q_n", "c_id")
    )
    cand = assigned.join(F.broadcast(probes), on="c_id").dropDuplicates(["q_id", "v_id"])
    scored = cand.selectExpr(
        "q_id AS query_id",
        "v_id AS neighbor_id",
        "aggregate(zip_with(q_v, v_v, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        " / sqrt(q_n * v_n) AS cosine",
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def q_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str,
                             threshold: str = "3e-1",
                             n_planes: int = N_PLANES,
                             n_tables: int = N_TABLES) -> DataFrame:
    """The SCALE path for embedding near-dup over the WHOLE corpus (the
    anchor-subset exact twin is q_embedding_near_dup): LSH buckets feed
    the exact quantized-cosine verify, so the bucket self-join shuffles
    on (table, bucket) instead of forming all pairs. Approximate by
    construction (a near-dup pair in no shared bucket is missed); every
    emitted pair is exactly verified, and the DuckDB oracle mirrors the
    construction bit-for-bit."""
    emb = _quantized(spark, sf_dir, "v")
    vb = _lsh_bands(emb, n_planes, n_tables)
    anchors = vb.selectExpr("v_id AS a_id", "v_v AS a_v", "v_n AS a_n", "tbl", "bucket")
    cand = (
        vb.join(anchors, on=["tbl", "bucket"])
        .where("a_n > 0 AND v_n > 0 AND a_id < v_id")
        .select("a_id", "a_v", "a_n", "v_id", "v_v", "v_n")
        .dropDuplicates(["a_id", "v_id"])
    )
    return cand.selectExpr(
        "a_id AS a",
        "v_id AS b",
        "aggregate(zip_with(a_v, v_v, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        " / sqrt(a_n * v_n) AS cosine",
    ).where(f"cosine >= {threshold}")


def oracle_embedding_near_dup_lsh(threshold: str = "3e-1", n_planes: int = None,
                                  n_tables: int = None) -> str:
    n_planes = N_PLANES if n_planes is None else n_planes
    n_tables = N_TABLES if n_tables is None else n_tables

    def bucket_expr(t: int) -> str:
        terms = []
        for p in range(n_planes):
            proj = _plane_proj_sql(_plane_seed(t, p), "vv", "duckdb")
            terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    band_sel = "\nUNION ALL\n".join(
        f"SELECT vid, n2, {t} AS tbl, {bucket_expr(t)} AS bucket FROM vn"
        for t in range(n_tables)
    )
    return f"""
WITH e AS (
  SELECT vec_id AS vid,
         list_transform(embedding, x -> round(CAST(x AS DOUBLE) * {QUANT}) / {QUANT}) AS vv
  FROM embeddings
),
vn AS (SELECT vid, vv, list_sum(list_transform(vv, x -> x * x)) AS n2 FROM e),
bands AS ({band_sel}),
cand AS (
  SELECT DISTINCT a.vid AS aid, x.vid AS vid2
  FROM bands x JOIN bands a ON x.tbl = a.tbl AND x.bucket = a.bucket
  WHERE a.n2 > 0 AND x.n2 > 0 AND a.vid < x.vid
),
flat AS (
  SELECT c.aid, c.vid2, unnest(p.vv) AS qe, unnest(q.vv) AS ve
  FROM cand c JOIN vn p ON p.vid = c.aid JOIN vn q ON q.vid = c.vid2
),
dots AS (SELECT aid, vid2, sum(qe * ve) AS dot FROM flat GROUP BY 1, 2)
SELECT d.aid AS a, d.vid2 AS b, d.dot / sqrt(p.n2 * q.n2) AS cosine
FROM dots d JOIN vn p ON p.vid = d.aid JOIN vn q ON q.vid = d.vid2
WHERE d.dot / sqrt(p.n2 * q.n2) >= {threshold}
""".strip()


def oracle_ann_ivf(k: int = 10, every: int = 40, n_centroids: int = 16,
                   nprobe: int = 3, clustered: bool = False) -> str:
    """DuckDB twin of q_ann_ivf: same centroid stride, argmin
    assignment, nprobe probing and quantized-exact cosines."""
    return f"""
WITH e AS (
  {_vec_cte(clustered)}
),
vn AS (SELECT vid, vv, list_sum(list_transform(vv, x -> x * x)) AS n2 FROM e),
cents AS (
  SELECT vid AS cid, vv AS cv, n2 AS cn FROM vn
  WHERE vid % (SELECT greatest(count(*) // {n_centroids}, 1) FROM embeddings) = 0
    AND n2 > 0
  ORDER BY vid LIMIT {n_centroids}
),
cflat AS (
  SELECT v.vid, c.cid, unnest(v.vv) AS x, unnest(c.cv) AS y
  FROM vn v, cents c WHERE v.n2 > 0
),
cdots AS (SELECT vid, cid, sum(x * y) AS dot FROM cflat GROUP BY 1, 2),
ranked AS (
  SELECT s.vid, s.cid,
         row_number() OVER (
           PARTITION BY s.vid
           ORDER BY s.dot / sqrt(v.n2 * c.cn) DESC, s.cid ASC
         ) AS crank
  FROM cdots s JOIN vn v ON v.vid = s.vid JOIN cents c ON c.cid = s.cid
),
assigned AS (SELECT vid, cid FROM ranked WHERE crank = 1),
probes AS (SELECT vid AS qid, cid FROM ranked WHERE crank <= {nprobe} AND vid % {every} = 0),
cand AS (SELECT DISTINCT p.qid, a.vid FROM assigned a JOIN probes p ON a.cid = p.cid),
flat AS (
  SELECT c.qid, c.vid, unnest(q.vv) AS qe, unnest(b.vv) AS ve
  FROM cand c JOIN vn q ON q.vid = c.qid JOIN vn b ON b.vid = c.vid
),
dots AS (SELECT qid, vid, sum(qe * ve) AS dot FROM flat GROUP BY 1, 2),
scored AS (
  SELECT d.qid AS query_id, d.vid AS neighbor_id, d.dot / sqrt(q.n2 * b.n2) AS cosine
  FROM dots d JOIN vn q ON q.vid = d.qid JOIN vn b ON b.vid = d.vid
)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= {k}
""".strip()


def oracle_ann_lsh(k: int = 10, every: int = 40, n_planes: int = None,
                   n_tables: int = None, clustered: bool = False) -> str:
    """DuckDB twin of q_ann_lsh: identical exact-binary hyperplanes,
    band self-join and quantized-exact cosine ranking."""
    n_planes = N_PLANES if n_planes is None else n_planes
    n_tables = N_TABLES if n_tables is None else n_tables

    def bucket_expr(t: int) -> str:
        terms = []
        for p in range(n_planes):
            proj = _plane_proj_sql(_plane_seed(t, p), "vv", "duckdb")
            terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    band_sel = "\nUNION ALL\n".join(
        f"SELECT vid, n2, {t} AS tbl, {bucket_expr(t)} AS bucket FROM vn"
        for t in range(n_tables)
    )
    return f"""
WITH e AS (
  {_vec_cte(clustered)}
),
vn AS (SELECT vid, vv, list_sum(list_transform(vv, x -> x * x)) AS n2 FROM e),
bands AS ({band_sel}),
cand AS (
  SELECT DISTINCT q.vid AS qid, x.vid AS vid2
  FROM bands x JOIN bands q ON x.tbl = q.tbl AND x.bucket = q.bucket
  WHERE q.vid % {every} = 0 AND q.n2 > 0 AND x.n2 > 0
),
flat AS (
  SELECT c.qid, c.vid2, unnest(a.vv) AS qe, unnest(b.vv) AS ve
  FROM cand c JOIN vn a ON a.vid = c.qid JOIN vn b ON b.vid = c.vid2
),
dots AS (SELECT qid, vid2, sum(qe * ve) AS dot FROM flat GROUP BY 1, 2),
scored AS (
  SELECT d.qid AS query_id, d.vid2 AS neighbor_id, d.dot / sqrt(a.n2 * b.n2) AS cosine
  FROM dots d JOIN vn a ON a.vid = d.qid JOIN vn b ON b.vid = d.vid2
)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= {k}
""".strip()


def _lsh_bands(emb: DataFrame, n_planes: int, n_tables: int) -> DataFrame:
    """(v_id, v_v, v_n, tbl, bucket) — one row per vector per LSH table;
    bucket = sign bits of the exact-binary hyperplane projections."""

    def bucket_expr(t: int) -> str:
        terms = []
        for p in range(n_planes):
            proj = _plane_proj_sql(_plane_seed(t, p), "v_v", "spark")
            terms.append(f"CASE WHEN {proj} >= 0 THEN {1 << p} ELSE 0 END")
        return " + ".join(terms)

    return emb.selectExpr(
        "v_id", "v_v", "v_n",
        f"array({', '.join(f'CAST({bucket_expr(t)} AS INT)' for t in range(n_tables))}) AS bks",
    ).select(
        "v_id", "v_v", "v_n", F.posexplode("bks").alias("tbl", "bucket")
    )


def q_ann_lsh(spark: SparkSession, sf_dir: str, k: int = 10, every: int = 40,
              n_planes: int = N_PLANES, n_tables: int = N_TABLES,
              clustered: bool = False) -> DataFrame:
    """Multi-table random-hyperplane LSH: per table t, bucket = sign
    bits of projections onto deterministic pseudo-random hyperplanes
    (hash-derived, no RNG state); candidates = union over tables of
    same-(table, bucket) vectors. Approximate by construction — recall
    grows with n_tables, probe cost with 1/2^n_planes. Hyperplane
    components are exact binary fractions so bucket assignment (and
    hence output) is bit-identical to the DuckDB oracle."""
    emb = _quantized(spark, sf_dir, "v", clustered)
    vb = _lsh_bands(emb, n_planes, n_tables)
    qb = vb.where(f"v_id % {every} = 0").selectExpr(
        "v_id AS q_id", "v_v AS q_v", "v_n AS q_n", "tbl", "bucket"
    )
    cand = (
        vb.join(F.broadcast(qb), on=["tbl", "bucket"])
        .where("q_n > 0 AND v_n > 0")
        .select("q_id", "q_v", "q_n", "v_id", "v_v", "v_n")
        .dropDuplicates(["q_id", "v_id"])
    )
    scored = cand.selectExpr(
        "q_id AS query_id",
        "v_id AS neighbor_id",
        "aggregate(zip_with(q_v, v_v, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        " / sqrt(q_n * v_n) AS cosine",
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


# -- clustered-mode driver entries ---------------------------------------------
# Same machinery over the planted-cluster table; these exist so recall@k
# is measured where it is information-theoretically achievable, with the
# same bit-exact oracle guarantees.


def q_ann_topk_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q_ann_topk(spark, sf_dir, clustered=True)


def q_ann_ivf_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q_ann_ivf(spark, sf_dir, clustered=True)


def q_ann_lsh_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q_ann_lsh(spark, sf_dir, clustered=True)
