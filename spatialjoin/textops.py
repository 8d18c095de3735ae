"""Training-data text ops over the documents table.

Everything is expressed with built-in JVM-side column functions (split,
explode, md5, regexp_count, window aggregates) — no Python UDFs — and
each op has an exact DuckDB oracle: all intermediate values are
integers/strings (md5 hex, counts) or doubles derived from integers, so
the comparisons are bit-exact.

Ops (SURVEY.md §2.2 "training-data pipeline" additions per the task):
  exact_dedup        hash-groupBy duplicate clustering (md5 of text)
  ngram_jaccard      exact 3-word-shingle Jaccard similarity join
  minhash_lsh        MinHash signatures (min of seeded md5 over
                     shingles) -> banded LSH candidates -> verified
  simhash            64-bit SimHash from token md5 nibbles; 4x16-bit
                     banded candidate pairs within Hamming distance
                     (4 bands provably cover every pair at Hamming<=3)
  doc_stats          token counts / quality scoring (regexp built-ins)
  lang_guess         marker-word language heuristic
  fingerprint        document fingerprint = min shingle hash

Scale notes (100 TB): the shingle self-joins shuffle on shingle text —
FREQUENT-SHINGLE CAPPING (shingles with doc-frequency > MAX_SHINGLE_DF
are dropped from the shingle sets, identically in Spark and the
oracle) bounds every shingle join to MAX_SHINGLE_DF^2 pairs per
shingle; minhash_lsh is the scale path (bounded signature width),
ngram_jaccard is the exact small-scale oracle twin. The frequent set
itself is tiny by construction, so the cap is a broadcast anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_HASHES = 8
N_BANDS = 4  # 2 signatures per band
JACCARD_T = "8e-1"
SIMHASH_BITS = 64
SIMHASH_BANDS = 4  # 16 bits each; covers all pairs at hamming <= 3
SIMHASH_HAMMING = 3
MAX_SHINGLE_DF = 64  # frequent-shingle cap (doc-frequency)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _shingles(docs: DataFrame, id_col="doc_id") -> DataFrame:
    """DISTINCT 3-word shingles per doc — pure JVM."""
    ws = F.split(F.trim(F.col("text")), " ")
    # NOTE: Spark's sequence(1, 0) yields [1, 0] (auto step -1), unlike
    # DuckDB's empty generate_series — guard short docs explicitly
    idxs = F.when(F.size(ws) >= 3, F.sequence(F.lit(1), F.size(ws) - 2)).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(
        idxs,
        lambda i: F.concat_ws(
            " ", F.element_at(ws, i), F.element_at(ws, i + 1), F.element_at(ws, i + 2)
        ),
    )
    return (
        docs.select(F.col(id_col), F.explode(sh).alias("s"))
        .distinct()
    )


def _shingles_capped(docs: DataFrame, max_df: int = MAX_SHINGLE_DF) -> DataFrame:
    """Shingles minus the frequent ones (doc-frequency > max_df): the
    100-TB guard for the shingle self-joins. The frequent set is small
    (few distinct shingles can exceed any nontrivial cap), so it
    broadcasts; the anti-join is map-side."""
    sh = _shingles(docs)
    frequent = (
        sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > max_df)
        .select("s")
    )
    return sh.join(F.broadcast(frequent), "s", "left_anti")


_SHINGLES_SQL = """
toks AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM toks, unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS t(i)
)
""".strip()

# capped twin: re-binds `sh` to the frequency-filtered set so the
# jaccard/minhash oracle bodies stay textually identical
_SHINGLES_CAPPED_SQL = f"""
toks AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
sh_all AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM toks, unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS t(i)
),
sh AS (
  SELECT sh_all.doc_id, sh_all.s
  FROM sh_all
  JOIN (SELECT s FROM sh_all GROUP BY s HAVING count(*) <= {MAX_SHINGLE_DF}) ok USING (s)
)
""".strip()


# -- exact dedup ---------------------------------------------------------------


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    w = Window.partitionBy(F.md5("text"))
    return docs.select(
        F.col("doc_id").alias("doc_id"),
        F.min("doc_id").over(w).alias("keeper_id"),
    )


ORACLE_EXACT_DEDUP = """
SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper_id FROM documents
""".strip()


# -- exact n-gram jaccard join ---------------------------------------------------


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    sh = _shingles_capped(docs).persist()
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ca = cnt.select(F.col("doc_id").alias("d1"), F.col("n").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("d2"), F.col("n").alias("nb"))
    out = (
        inter.join(ca, "d1").join(cb, "d2")
        .withColumn("jaccard", F.expr("c * 1e0 / (na + nb - c)"))
        .where(F.expr(f"c * 1e0 / (na + nb - c) >= {JACCARD_T}"))
        .select("d1", "d2", "jaccard")
    )
    return out


ORACLE_NGRAM_JACCARD = f"""
WITH {_SHINGLES_CAPPED_SQL},
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d1, d2, c * 1e0 / (ca.n + cb.n - c) AS jaccard
FROM inter JOIN cnt ca ON ca.doc_id = d1 JOIN cnt cb ON cb.doc_id = d2
WHERE c * 1e0 / (ca.n + cb.n - c) >= {JACCARD_T}
""".strip()


# -- minhash LSH -----------------------------------------------------------------


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection, verified with exact jaccard.
    Signature h_i(doc) = min over shingles of md5('<i>|' || shingle);
    min over lowercase hex strings is identical in any engine."""
    docs = _docs(spark, sf_dir)
    sh = _shingles_capped(docs).persist()
    seeded = sh.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(N_HASHES - 1))).alias("seed"), "s"
    ).withColumn("m", F.md5(F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("s"))))
    sig = seeded.groupBy("doc_id").agg(
        *[F.min(F.when(F.col("seed") == i, F.col("m"))).alias(f"h{i}") for i in range(N_HASHES)]
    )
    # band via ONE explode over a persisted frame: the union-of-bands
    # form re-evaluated the whole signature aggregation once per band
    # per join side (8x the minhash compute — sig was never cached)
    band_arr = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat(F.col(f"h{2 * b}"), F.col(f"h{2 * b + 1}")).alias("key"),
        )
        for b in range(N_BANDS)
    ])
    bands = sig.select("doc_id", F.explode(band_arr).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    ).persist()
    x = bands.alias("x")
    y = bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2"))
        .distinct()
    )
    # verify candidates with exact jaccard
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b2 = sh.alias("b")
    inter = (
        cand.join(a, F.col("a.doc_id") == F.col("d1"))
        .join(b2, (F.col("b.doc_id") == F.col("d2")) & (F.col("a.s") == F.col("b.s")))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ca = cnt.select(F.col("doc_id").alias("d1"), F.col("n").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("d2"), F.col("n").alias("nb"))
    return (
        inter.join(ca, "d1").join(cb, "d2")
        .withColumn("jaccard", F.expr("c * 1e0 / (na + nb - c)"))
        .where(F.expr(f"c * 1e0 / (na + nb - c) >= {JACCARD_T}"))
        .select("d1", "d2", "jaccard")
    )


def _oracle_minhash() -> str:
    sig_cols = ",\n       ".join(
        f"min(CASE WHEN seed = {i} THEN m END) AS h{i}" for i in range(N_HASHES)
    )
    band_sel = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, h{2 * b} || h{2 * b + 1} AS key FROM sig"
        for b in range(N_BANDS)
    )
    return f"""
WITH {_SHINGLES_CAPPED_SQL},
seeded AS (
  SELECT doc_id, t.seed, md5(CAST(t.seed AS VARCHAR) || '|' || s) AS m
  FROM sh, unnest(generate_series(0, {N_HASHES - 1})) AS t(seed)
),
sig AS (SELECT doc_id, {sig_cols} FROM seeded GROUP BY doc_id),
bands AS ({band_sel}),
cand AS (
  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT d1, d2, count(*) AS c
  FROM cand JOIN sh a ON a.doc_id = d1 JOIN sh b ON b.doc_id = d2 AND a.s = b.s
  GROUP BY 1, 2
)
SELECT d1, d2, c * 1e0 / (ca.n + cb.n - c) AS jaccard
FROM inter JOIN cnt ca ON ca.doc_id = d1 JOIN cnt cb ON cb.doc_id = d2
WHERE c * 1e0 / (ca.n + cb.n - c) >= {JACCARD_T}
""".strip()


# -- simhash ---------------------------------------------------------------------


def _simhash_bits_spark(docs: DataFrame) -> DataFrame:
    """64-bit SimHash per doc from token md5 nibbles — pure JVM.
    bit j of token hash = bit (3 - j%4) of hex digit (1 + j/4) of
    md5(token); simhash bit j = 1 iff sum over DISTINCT tokens of
    (2*bit - 1) >= 0 (deterministic; matches the oracle). Bit 63 is
    the sign bit of the signed int64 (-2^63 term)."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    ).distinct()
    h = F.md5("tok")
    bit_cols = []
    for j in range(SIMHASH_BITS):
        digit = F.substring(h, 1 + j // 4, 1)
        val = F.instr(F.lit("0123456789abcdef"), digit) - 1
        bit = F.shiftright(val, 3 - (j % 4)).bitwiseAND(F.lit(1))
        bit_cols.append((bit * 2 - 1).alias(f"b{j}"))
    per_tok = toks.select("doc_id", *bit_cols)
    agg = per_tok.groupBy("doc_id").agg(
        *[F.sum(f"b{j}").alias(f"s{j}") for j in range(SIMHASH_BITS)]
    )
    sim = None
    for j in range(SIMHASH_BITS):
        weight = -(1 << 63) if j == 63 else (1 << j)
        term = F.when(F.col(f"s{j}") >= 0, F.lit(weight).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded 64-bit simhash self-join: SIMHASH_BANDS 16-bit bands give
    band-key cardinality 2^16 per band (vs 2^8 in round 1), so the
    candidate self-join stays near-linear at corpus scale, and every
    pair at Hamming <= SIMHASH_HAMMING shares at least one band
    (pigeonhole: 4 bands, <= 3 differing bits).

    SCALE BOUND: each band's key space is 2^16 = 65,536, so with N
    docs the expected bucket size is N/65,536 and the self-join emits
    ~N^2/65,536 candidate pairs per band (for uniformly-spread
    fingerprints). That is near-linear up to N ~ 10^8 docs per band
    (~150 k pair-candidates per bucket-key worst case at uniform
    load); beyond that — trillion-doc corpora — the standard fix is
    the Manku/Jain/Sarma rotation-table construction (WWW'07 §3): for
    each of a handful of bit-rotations of the fingerprint, sort by the
    top ~p bits (p sized so 2^p >> N/2^16) and scan a window of
    neighbors, turning the band self-join into a sort + bounded
    window-scan with no quadratic bucket. The banded join here IS the
    Spark-friendly equivalent for N <= ~10^8, which covers the 100 TB
    design point (~10^8 x 1 MB docs); the rotation tables are the
    documented next step, not implemented."""
    docs = _docs(spark, sf_dir)
    simdf = _simhash_bits_spark(docs).persist()
    # one explode beats a 4-way union of cache scans (same rows; the
    # plan keeps a single InMemoryTableScan per join side)
    band_arr = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), 16 * b).bitwiseAND(F.lit(65535)).alias("band_key"),
        )
        for b in range(SIMHASH_BANDS)
    ])
    bands = simdf.select("doc_id", "simhash", F.explode(band_arr).alias("bk")).select(
        "doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    x = bands.alias("x")
    y = bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("d1"),
            F.col("y.doc_id").alias("d2"),
            F.col("x.simhash").alias("sa"),
            F.col("y.simhash").alias("sb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cand.where(ham <= SIMHASH_HAMMING)
        .select("d1", "d2", ham.cast("int").alias("hamming"))
    )


def _oracle_simhash() -> str:
    bit_sums = []
    for j in range(SIMHASH_BITS):
        digit = f"substr(md5(tok), {1 + j // 4}, 1)"
        val = f"(strpos('0123456789abcdef', {digit}) - 1)"
        bit = f"((({val} >> {3 - (j % 4)}) & 1) * 2 - 1)"
        bit_sums.append(f"sum({bit}) AS s{j}")
    # bit 63 is the int64 sign bit; -2^63 spelled overflow-safe
    sim_terms = " + ".join(
        f"(CASE WHEN s{j} >= 0 THEN "
        + ("(-9223372036854775807 - 1)" if j == 63 else str(1 << j))
        + " ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    band_sel = "\nUNION ALL\n".join(
        f"SELECT doc_id, simhash, {b} AS band, (simhash >> {16 * b}) & 65535 AS band_key FROM sim"
        for b in range(SIMHASH_BANDS)
    )
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, t.tok
  FROM documents, unnest(string_split(trim(text), ' ')) AS t(tok)
),
sums AS (SELECT doc_id, {", ".join(bit_sums)} FROM toks GROUP BY doc_id),
sim AS (SELECT doc_id, CAST({sim_terms} AS BIGINT) AS simhash FROM sums),
bands AS (
{band_sel}
),
cand AS (
  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2, x.simhash AS sa, y.simhash AS sb
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id
)
SELECT d1, d2, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {SIMHASH_HAMMING}
""".strip()


# -- doc stats / quality ---------------------------------------------------------


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.selectExpr(
        "doc_id",
        "length(text) AS n_chars_calc",
        "regexp_count(text, '[a-z0-9]+') AS n_tokens",
        "regexp_count(text, ' the | a ') AS n_stop",
        "CASE WHEN length(text) > 0 THEN regexp_count(text, '[a-z]') * 1e0 / length(text) ELSE 0e0 END AS alpha_ratio",
        "least(regexp_count(text, '[a-z0-9]+') * 1e0 / 100e0, 1e0) AS quality",
    )


ORACLE_DOC_STATS = """
SELECT doc_id,
       length(text) AS n_chars_calc,
       len(regexp_extract_all(text, '[a-z0-9]+')) AS n_tokens,
       len(regexp_extract_all(text, ' the | a ')) AS n_stop,
       CASE WHEN length(text) > 0 THEN len(regexp_extract_all(text, '[a-z]')) * 1e0 / length(text) ELSE 0e0 END AS alpha_ratio,
       least(len(regexp_extract_all(text, '[a-z0-9]+')) * 1e0 / 100e0, 1e0) AS quality
FROM documents
""".strip()


# -- language heuristic -----------------------------------------------------------


def q_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword heuristic (the corpus shares one vocabulary, so
    this grades the machinery, not detector quality)."""
    docs = _docs(spark, sf_dir)
    return docs.selectExpr(
        "doc_id",
        "lang",
        "CASE WHEN regexp_count(text, ' the | a ') >= 2 THEN 'en' ELSE 'other' END AS guess",
    )


ORACLE_LANG_GUESS = """
SELECT doc_id, lang,
       CASE WHEN len(regexp_extract_all(text, ' the | a ')) >= 2 THEN 'en' ELSE 'other' END AS guess
FROM documents
""".strip()


# -- fingerprint -------------------------------------------------------------------


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min md5 over 3-word shingles (1-seed MinHash)."""
    docs = _docs(spark, sf_dir)
    sh = _shingles(docs)
    return sh.groupBy("doc_id").agg(F.min(F.md5("s")).alias("fingerprint"))


ORACLE_FINGERPRINT = f"""
WITH {_SHINGLES_SQL}
SELECT doc_id, min(md5(s)) AS fingerprint FROM sh GROUP BY doc_id
""".strip()


def q_token_top_terms(spark: SparkSession, sf_dir: str, topn: int = 20) -> DataFrame:
    """Corpus token histogram (whitespace tokenization + subword-ish
    alnum chunks via regexp): top terms by frequency, deterministic
    tie-break. The groupBy is a hash shuffle on the token — the same
    plan at 100 TB, with partial map-side aggregation."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        F.explode(F.expr(r"regexp_extract_all(text, '[a-z0-9]+', 0)")).alias("tok")
    )
    return (
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(topn)
    )


ORACLE_TOKEN_TOP_TERMS = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS tok FROM documents
)
SELECT tok, count(*) AS n FROM toks GROUP BY tok
ORDER BY n DESC, tok ASC LIMIT 20
""".strip()


# rounds taken by the most recent dup_clusters call, keyed by
# algorithm — read by tests asserting the star alternation's
# O(log n)-round bound vs min-label's diameter-bound rounds
LAST_CC_ROUNDS: dict = {}


def _cc_large_small_star(docs: DataFrame, pairs: DataFrame, id_col: str,
                         a_col: str, b_col: str, max_rounds: int) -> DataFrame:
    """Connected components via the alternating large-star/small-star
    rounds of Kiveris et al., "Connected Components in MapReduce and
    Beyond" (SoCC'14): converges in O(log^2 n) rounds INDEPENDENT of
    component diameter (min-label propagation needs diameter rounds —
    a chained-duplicate run of n docs takes n-1 of them).

    Edges are kept canonical as (h, l) with h > l. Per round:
      large-star: every node u attaches its strictly-larger neighbors
                  to min(neighborhood(u) + {u});
      small-star: every node h attaches its lower neighbors (and
                  itself) to its minimum lower neighbor.
    Fixed point: one star per component centered at the component
    minimum; labels read off the star edges (isolated docs label
    themselves)."""
    ids = docs.select(F.col(id_col).alias("id"))
    e = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("h"), F.least("a", "b").alias("l"))
        .distinct().localCheckpoint(eager=True)
    )
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        # LARGE-STAR over the symmetric neighborhood
        sym = e.select(F.col("h").alias("u"), F.col("l").alias("v")).unionByName(
            e.select(F.col("l").alias("u"), F.col("h").alias("v")))
        mins = (sym.groupBy("u").agg(F.min("v").alias("mv"))
                .select("u", F.least("mv", F.col("u")).alias("m")))
        lg = (
            sym.where(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("h"), F.col("m").alias("l"))
            .distinct()
        )
        # SMALL-STAR: lg is canonical (h > l); per h the lower
        # neighborhood is exactly its l's
        sm = lg.join(lg.groupBy("h").agg(F.min("l").alias("m")), "h")
        new_e = (
            sm.where(F.col("l") != F.col("m"))
            .select(F.col("l").alias("h"), F.col("m").alias("l"))
            .unionByName(sm.select("h", F.col("m").alias("l")))
            .distinct().localCheckpoint(eager=True)
        )
        changed = (
            new_e.join(e, ["h", "l"], "left_anti").limit(1).count()
            + e.join(new_e, ["h", "l"], "left_anti").limit(1).count()
        )
        e = new_e
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"dup_clusters(star) did not converge in {max_rounds} rounds")
    LAST_CC_ROUNDS["star"] = rounds
    centers = e.groupBy("h").agg(F.min("l").alias("lbl")).withColumnRenamed("h", "id")
    return (
        ids.join(centers, on="id", how="left")
        .select(F.col("id").alias(id_col),
                F.coalesce("lbl", F.col("id")).alias("cluster_id"))
    )


def dup_clusters(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                 a_col: str = "d1", b_col: str = "d2",
                 max_rounds: int = 50, algorithm: str = "label") -> DataFrame:
    """Connected components over near-dup PAIRS -> DF[doc_id,
    cluster_id], cluster_id = MIN doc id in the component — the
    "keeper" a dedup pipeline retains per duplicate group (pair lists
    alone under-merge: a~b and b~c must collapse into ONE group even
    when a~c was never emitted).

    Iterative min-label propagation: each round every node takes the
    minimum of its own label and its neighbours' labels; converges in
    diameter(G) rounds (near-dup components are small cliques/chains,
    so typically 2-3). Each round is one shuffle join + map-side-
    combinable min aggregation; the label frame (2 longs/doc) is
    localCheckpoint'ed per round so lineage stays O(1) and the driver
    convergence check is one count.

    ``algorithm="star"`` (r6) runs the two-phase large-star/small-star
    alternation of Kiveris et al. (SoCC'14) instead — O(log^2 n) rounds
    independent of component DIAMETER, the 10^12-doc path for graphs
    with long chains (boilerplate-page duplicate runs); identical
    output. Default stays "label": near-dup components are small
    cliques and min-label does them in 2-3 cheaper rounds."""
    if algorithm == "star":
        return _cc_large_small_star(docs, pairs, id_col, a_col, b_col,
                                    max_rounds)
    if algorithm != "label":
        raise ValueError("algorithm must be label|star")
    e1 = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    e2 = pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v"))
    edges = e1.unionByName(e2).distinct().persist()
    labels = docs.select(F.col(id_col).alias("id"),
                         F.col(id_col).alias("lbl")).localCheckpoint(eager=True)
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        nbr = (
            edges.join(labels.select(F.col("id").alias("v"),
                                     F.col("lbl").alias("vlbl")), on="v")
            .groupBy("u").agg(F.min("vlbl").alias("nlbl"))
        )
        new = (
            labels.join(nbr.withColumnRenamed("u", "id"), on="id", how="left")
            .select("id", F.least("lbl", F.coalesce("nlbl", "lbl")).alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n").join(labels.alias("o"), on="id")
            .where(F.col("n.lbl") != F.col("o.lbl")).count()
        )
        labels = new
        if changed == 0:
            break
    else:
        edges.unpersist()
        raise RuntimeError(f"dup_clusters did not converge in {max_rounds} rounds")
    LAST_CC_ROUNDS["label"] = rounds
    edges.unpersist()
    return labels.select(F.col("id").alias(id_col), F.col("lbl").alias("cluster_id"))


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup GROUP FORMATION driver row: n-gram-jaccard near-dup pairs
    -> connected components -> (doc_id, cluster_id = min id in
    component). The oracle walks the same (symmetrized) edge set with
    a recursive CTE and takes min reachable id — exact."""
    docs = _docs(spark, sf_dir)
    prs = q_ngram_jaccard(spark, sf_dir).select("d1", "d2")
    return dup_clusters(docs, prs)


def q_chain_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-DIAMETER connected components driver row (r6, VERDICT r05
    ask #6): documents chained by sorted-id adjacency in segments of 64
    (edge between the rn-th and (rn+1)-th doc unless rn+1 crosses a
    segment boundary) — component diameter 63, where min-label
    propagation needs 63 rounds (beyond its default budget) but the
    Kiveris large-star/small-star alternation converges in O(log)
    rounds (round count asserted in tests/test_textops.py). Oracle:
    segments are contiguous runs of 64 sorted ids, so cluster_id is the
    min id of each run — exact without recursion."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir).select("doc_id")
    d = docs.withColumn("rn", F.row_number().over(Window.orderBy("doc_id")) - 1)
    nxt = d.select((F.col("rn") - 1).alias("rn"), F.col("doc_id").alias("d2"))
    edges = (
        d.join(nxt, "rn")
        .where((F.col("rn") + 1) % 64 != 0)
        .select(F.col("doc_id").alias("d1"), "d2")
    )
    return dup_clusters(docs, edges, algorithm="star")


ORACLE_CHAIN_CLUSTERS = """
WITH d AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS rn FROM documents
)
SELECT doc_id, min(doc_id) OVER (PARTITION BY (rn // 64)) AS cluster_id FROM d
""".strip()


ORACLE_DUP_CLUSTERS = f"""
WITH RECURSIVE {_SHINGLES_CAPPED_SQL},
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
prs AS (
  SELECT d1, d2
  FROM inter JOIN cnt ca ON ca.doc_id = d1 JOIN cnt cb ON cb.doc_id = d2
  WHERE c * 1e0 / (ca.n + cb.n - c) >= {JACCARD_T}
),
edges AS (SELECT d1 AS u, d2 AS v FROM prs UNION SELECT d2, d1 FROM prs),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
)
SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
""".strip()


TEXT_QUERIES = {
    "exact_dedup": q_exact_dedup,
    "ngram_jaccard": q_ngram_jaccard,
    "minhash_lsh": q_minhash_lsh,
    "simhash_pairs": q_simhash_pairs,
    "doc_stats": q_doc_stats,
    "lang_guess": q_lang_guess,
    "doc_fingerprint": q_fingerprint,
    "token_top_terms": q_token_top_terms,
    "dup_clusters": q_dup_clusters,
    "chain_clusters": q_chain_clusters,
}

TEXT_ORACLES = {
    "token_top_terms": ORACLE_TOKEN_TOP_TERMS,
    "exact_dedup": ORACLE_EXACT_DEDUP,
    "ngram_jaccard": ORACLE_NGRAM_JACCARD,
    "minhash_lsh": _oracle_minhash(),
    "simhash_pairs": _oracle_simhash(),
    "doc_stats": ORACLE_DOC_STATS,
    "lang_guess": ORACLE_LANG_GUESS,
    "doc_fingerprint": ORACLE_FINGERPRINT,
    "dup_clusters": ORACLE_DUP_CLUSTERS,
    "chain_clusters": ORACLE_CHAIN_CLUSTERS,
}
