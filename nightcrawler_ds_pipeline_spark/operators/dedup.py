"""Deduplication operators for a large-scale training-data pipeline.

- exact: hash-groupBy on a content digest (scales as one shuffle)
- MinHash + LSH: shingle → minhash signature → band → bucket-join; banding
  turns the quadratic all-pairs problem into joins on band keys
- n-gram Jaccard: token-set explode + pair-join + ratio (bounded corpus)
- SimHash: 64-bit sign-of-weighted-sum fingerprint (Spark-only; verified in
  pytest — DuckDB lacks the 64-bit bit ops to mirror it cheaply)
- embedding cosine near-dup lives in similarity.py

MinHash components are ``min(md5(token || '#seed'))`` — hex strings order
identically in both engines, so the oracle can verify the exact signatures
without a shared 64-bit integer hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nightcrawler_ds_pipeline_spark.registry import register
from nightcrawler_ds_pipeline_spark.operators.sqlfrags import read_table

_WORDS_DUCK = "regexp_split_to_array(lower(trim(text)), '\\s+')"

NUM_MINHASHES = 8
BAND_SIZE = 2  # → 4 bands
# Default banding (b=4 bands × r=2 rows) targets the ~0.5 Jaccard knee
# ((1/b)^(1/r)) and is what every registered oracle mirrors. The per-PAIR
# false-positive rate of a band is j^r, and candidate edges grow with
# C(n,2)·b·j^r — a birthday effect that is invisible at oracle scale but
# measured at 1M synthetic docs (background Jaccard ≈ 10^-3): 2.2M
# candidate edges, collapsing 20k planted clusters into 3.2k giant
# components. At 10^9+ docs real pipelines run r=4-10 (Lee et al. ACL'22
# use b=20,r=45 per 0.8-threshold table); every function below therefore
# takes (num_hashes, band_size) overrides, and CurationConfig exposes
# them as lsh_num_hashes / lsh_band_size. Registered queries stay on the
# defaults — their DuckDB twins compose minhash_pairs_sql with the same
# parameters, so a override cannot desync an oracle.


# --- exact dedup ------------------------------------------------------------
@register(
    "dedup_exact",
    oracle="""
    SELECT md5(lower(trim(text))) AS content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS group_size
    FROM documents
    GROUP BY 1
    HAVING COUNT(*) >= 1
    ORDER BY content_hash
    """,
)
def dedup_exact(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.withColumn(
            "content_hash", F.md5(F.encode(F.lower(F.trim("text")), "utf-8"))
        )
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("group_size"))
        .orderBy("content_hash")
    )


# --- MinHash signatures (oracle-checked) -------------------------------------
def _minhash_sql_cols(num_hashes: int = NUM_MINHASHES) -> str:
    return ", ".join(
        f"min(md5(w || '#{i}')) AS h{i}" for i in range(num_hashes)
    )


def _check_banding(num_hashes: int, band_size: int) -> None:
    """Fail loudly on ragged banding: range(num_hashes // band_size) would
    silently DROP the trailing hashes — weaker banding than requested, with
    identical truncation on the Spark and DuckDB sides (so no oracle desync,
    just a silent semantic surprise). Same rule CurationConfig enforces."""
    if num_hashes <= 0 or band_size <= 0 or num_hashes % band_size:
        raise ValueError(
            "minhash banding: num_hashes must be a positive multiple of "
            f"band_size (got {num_hashes}/{band_size}); trailing hashes "
            "would be silently dropped"
        )


def minhash_pairs_sql(
    source: str,
    num_hashes: int = NUM_MINHASHES,
    band_size: int = BAND_SIZE,
) -> str:
    """DuckDB CTE fragment ``tok, sig, bands, pairs`` computing the banded
    MinHash candidate pairs over ``source`` (any table expression with
    doc_id, text). THE single definition of the salt scheme + banding on
    the SQL side — dedup / connected-components / curation oracles all
    compose this fragment, so a constant change cannot silently desync
    one of them."""
    _check_banding(num_hashes, band_size)
    band_union = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, "
        f"concat({', '.join(f'h{b * band_size + j}' for j in range(band_size))})"
        f" AS band_key FROM sig"
        for b in range(num_hashes // band_size)
    )
    return f"""tok AS (
      SELECT DISTINCT doc_id, unnest({_WORDS_DUCK}) AS w FROM {source}
    ),
    sig AS (SELECT doc_id, {_minhash_sql_cols(num_hashes)} FROM tok GROUP BY doc_id),
    bands AS (
      {band_union}
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    )"""


def minhash_signatures_df(
    docs: DataFrame, num_hashes: int = NUM_MINHASHES
) -> DataFrame:
    """(doc_id, text) → (doc_id, h0..h{n-1}) MinHash signatures — the
    single Spark-side definition of the token split + '#seed' salt.

    NO distinct on (doc_id, w): min(md5(w||seed)) over a token MULTISET
    equals min over the token set, so the oracle's SELECT DISTINCT is
    algebraically redundant here — and dropping it removes a full
    O(total-tokens)-row shuffle in favor of the groupBy's map-side partial
    agg, whose shuffle carries ~1 row x 8 hex mins per doc per partition
    (plan pinned single-Exchange in tests/test_plans_curation.py)."""
    # array_distinct is the same set-vs-multiset algebra applied per ROW:
    # repeated words inside one doc can't change any min, and dropping
    # them before the explode skips their 8 md5s per repeat (real-corpus
    # repeat fraction ~40%; no new exchange — the single-Exchange plan
    # tripwire still holds)
    tok = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.lower(F.trim("text")), r"\s+"))
        ).alias("w"),
    )
    aggs = [
        F.min(
            F.md5(F.encode(F.concat(F.col("w"), F.lit(f"#{i}")), "utf-8"))
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return tok.groupBy("doc_id").agg(*aggs)


def _band_rows_df(
    docs: DataFrame,
    num_hashes: int = NUM_MINHASHES,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """(doc_id, text) → (doc_id, band_id, band_key) — one row per document
    per band. The single Spark-side banding definition; both the clique-pair
    and star-edge formulations below derive from it."""
    _check_banding(num_hashes, band_size)
    sig = minhash_signatures_df(docs, num_hashes)
    band_exprs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.concat(
                *[F.col(f"h{b * band_size + j}") for j in range(band_size)]
            ).alias("band_key"),
        )
        for b in range(num_hashes // band_size)
    ]
    return sig.select(
        "doc_id", F.explode(F.array(*band_exprs)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_key")


def minhash_band_pairs_df(
    docs: DataFrame,
    num_hashes: int = NUM_MINHASHES,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """(doc_id, text) → distinct candidate pairs (id_a < id_b) via the
    banded bucket equi-join. The Spark twin of ``minhash_pairs_sql``.

    A bucket of k co-hashed documents emits k·(k-1)/2 pairs — correct when
    the pairs themselves are the product (verification, similarity scoring),
    but quadratic in the hottest bucket. When the pairs only feed connected
    components, use ``minhash_band_star_edges_df`` instead."""
    bands = _band_rows_df(docs, num_hashes, band_size)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def minhash_band_star_edges_df(
    docs: DataFrame,
    num_hashes: int = NUM_MINHASHES,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """(doc_id, text) → (id_a, id_b) star edges: every bucket member joined
    to its bucket's MINIMUM doc_id. Connectivity-equivalent to
    ``minhash_band_pairs_df`` — within one bucket the star reaches exactly
    the clique's node set, and components of a union of edge sets depend
    only on per-bucket connectivity — so connected components over either
    edge set are IDENTICAL (tests/test_plans_curation.py pins this).

    The scale difference is the point: a bucket of k documents emits k-1
    edges instead of k·(k-1)/2 pairs. At 10^10 docs a boilerplate cluster
    landing 10^6 docs in one band bucket means 10^6 star edges vs 5·10^11
    clique pairs — the difference between a shuffle AQE can size and a job
    that never finishes.

    Bucket mins come from a WINDOW over the band key, not groupBy + join
    back: the join formulation references ``bands`` in two different
    subplans (one under a partial agg), which defeats exchange reuse and
    re-executes the ENTIRE md5 signature chain twice (measured r5: the
    two duplicate map stages were ~800 core-s each at 10^6 docs — half
    the edge segment's cost). The window is one exchange of the band
    rows, one sort, zero joins, and the signature chain runs once. The
    window is per-bucket (partition spec present — the global-window
    tripwire in test_global_seq does not fire) and a 10^6-doc hot bucket
    is a 10^6-row partition sort, same order as the groupBy's shuffle."""
    from pyspark.sql import Window

    bands = _band_rows_df(docs, num_hashes, band_size)
    w = Window.partitionBy("band_id", "band_key")
    return (
        bands.withColumn("id_a", F.min("doc_id").over(w))
        .filter(F.col("doc_id") != F.col("id_a"))
        .select("id_a", F.col("doc_id").alias("id_b"))
        .distinct()
    )


@register(
    "dedup_minhash_signatures",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest({_WORDS_DUCK}) AS w
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id, {_minhash_sql_cols()}
    FROM tok GROUP BY doc_id ORDER BY doc_id
    """,
)
def dedup_minhash_signatures(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return minhash_signatures_df(docs).orderBy("doc_id")


# --- MinHash LSH candidate pairs (band bucket-join) ---------------------------
_DOCS_200 = "(SELECT doc_id, text FROM documents WHERE doc_id < 200)"


@register(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
    WITH {minhash_pairs_sql(_DOCS_200)}
    SELECT id_a, id_b FROM pairs ORDER BY id_a, id_b
    """,
)
def dedup_minhash_lsh_pairs(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return minhash_band_pairs_df(docs).orderBy("id_a", "id_b")


# --- n-gram (token-set) Jaccard ----------------------------------------------
def dedup_jaccard_pairs(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
    ).distinct()
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = tok.alias("a")
    b = tok.alias("b")
    inter = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("i") / (F.col("sa.sz") + F.col("sb.sz") - F.col("i"))
    return (
        inter.join(sa, F.col("id_a") == F.col("sa.doc_id"))
        .join(sb, F.col("id_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.8)
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


# --- 3-gram (word-shingle) Jaccard — the n-gram form of the above ------------
def dedup_shingle_jaccard_pairs(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    words = docs.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("w")
    ).filter(F.size("w") >= 3)
    # 3-word shingles: slice(w, i+1, 3) for i in 0..len-3
    shingles = words.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - 3),
                lambda i: F.concat_ws(" ", F.slice(F.col("w"), i + 1, 3)),
            )
        ).alias("s"),
    ).distinct()
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = shingles.alias("a"), shingles.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("i"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("i") / (F.col("sa.sz") + F.col("sb.sz") - F.col("i"))
    return (
        inter.join(sa, F.col("id_a") == F.col("sa.doc_id"))
        .join(sb, F.col("id_b") == F.col("sb.doc_id"))
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
        .orderBy(F.col("jaccard").desc(), "id_a", "id_b")
        .limit(100)
    )


# --- SimHash (Spark-only: verified by pytest, rows-only driver check) ---------
SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("simhash", T.LongType(), False),
    ]
)


def _simhash_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized per-batch SimHash: md5 each UNIQUE word once, expand the
    ±1 sign matrix for the whole vocabulary in one shot, and scatter-add
    per-document with np.add.at — no per-document Python loop. Output is
    bit-identical to the scalar definition (word-set ±1 votes, bit b set
    iff acc[b] > 0, two's-complement int64 packing; empty doc → 0)."""
    import hashlib

    texts = pdf["text"].values
    word_sets = [set((t or "").lower().split()) for t in texts]
    vocab: dict[str, int] = {}
    for ws in word_sets:
        for w in ws:
            if w not in vocab:
                vocab[w] = len(vocab)
    out = np.zeros(len(pdf), dtype=np.int64)
    if vocab:
        hashes = np.empty(len(vocab), dtype=np.uint64)
        for w, j in vocab.items():
            hashes[j] = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
        bits64 = np.arange(64, dtype=np.uint64)[None, :]
        signs = (
            ((hashes[:, None] >> bits64) & np.uint64(1)).astype(np.int64) * 2 - 1
        )  # (V, 64) ±1 votes
        n_pairs = sum(len(ws) for ws in word_sets)
        doc_idx = np.fromiter(
            (i for i, ws in enumerate(word_sets) for _ in ws),
            dtype=np.int64, count=n_pairs,
        )
        word_idx = np.fromiter(
            (vocab[w] for ws in word_sets for w in ws),
            dtype=np.int64, count=n_pairs,
        )
        acc = np.zeros((len(pdf), 64), dtype=np.int64)
        np.add.at(acc, doc_idx, signs[word_idx])
        packed = ((acc > 0).astype(np.uint64) << bits64).sum(
            axis=1, dtype=np.uint64
        )
        out = packed.view(np.int64)
    return pd.DataFrame({"doc_id": pdf["doc_id"].values, "simhash": out})


# DuckDB twin: md5_number_upper(w) is the LITTLE-endian uint64 of md5's
# first 8 bytes, while the engine packs them big-endian — bit b of the
# engine's word hash is bit m = 8*(7 - b//8) + b%8 of DuckDB's number, so
# the VALUES table below carries the (b, m) remap. Vote/threshold/packing
# arithmetic is otherwise identical (two's-complement int64 at the end).
_SIMHASH_BITS_ROWS = ", ".join(
    f"({b}, {8 * (7 - b // 8) + b % 8})" for b in range(64)
)


@register(
    "dedup_simhash",
    oracle=f"""
    WITH bits(b, m) AS (VALUES {_SIMHASH_BITS_ROWS}),
    words AS (
      SELECT doc_id,
             unnest(list_distinct(
               regexp_split_to_array(lower(trim(text)), '\\s+'))) AS w
      FROM documents WHERE trim(COALESCE(text, '')) <> ''
    ),
    votes AS (
      SELECT doc_id, bits.b AS b,
             SUM(CASE WHEN (md5_number_upper(w) >> bits.m) & 1 = 1
                 THEN 1 ELSE -1 END) AS acc
      FROM words CROSS JOIN bits GROUP BY doc_id, bits.b
    ),
    packed AS (
      SELECT doc_id,
             SUM(CASE WHEN acc > 0 THEN CAST(1 AS UBIGINT) << b
                 ELSE CAST(0 AS UBIGINT) END) AS uval
      FROM votes GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(CASE WHEN COALESCE(p.uval, 0) >= 9223372036854775808
                     THEN COALESCE(p.uval, 0) - 18446744073709551616
                     ELSE COALESCE(p.uval, 0) END AS BIGINT) AS simhash
    FROM documents d LEFT JOIN packed p ON d.doc_id = p.doc_id
    ORDER BY d.doc_id
    """,
)
def dedup_simhash(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        docs.mapInPandas(
            lambda it: (_simhash_batch(pdf) for pdf in it), schema=SIMHASH_SCHEMA
        )
        .orderBy("doc_id")
    )


# --- composite driver query --------------------------------------------------
# Token-set + 3-gram-shingle Jaccard folded into one registered entry so the
# driver's bounded sample always hash-checks both (sub-ops stay callable).
_JACCARD_SUITE_SQL = f"""
SELECT part, id_a, id_b, jaccard FROM (
  SELECT 'token' AS part, * FROM (
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest({_WORDS_DUCK}) AS w
      FROM documents WHERE doc_id < 150
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(i / (sa.sz + sb.sz - i), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE i / (sa.sz + sb.sz - i) >= 0.8
    ORDER BY id_a, id_b
  )
  UNION ALL
  SELECT 'shingle', * FROM (
    WITH words AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
      FROM documents WHERE doc_id < 150
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest([array_to_string(w[i:i+2], ' ')
                     for i in generate_series(1, len(w) - 2)]) AS s
      FROM words WHERE len(w) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, ROUND(i / (sa.sz + sb.sz - i), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    ORDER BY jaccard DESC, id_a, id_b
    LIMIT 100
  )
)
ORDER BY part, id_a, id_b
"""


@register("dedup_jaccard_suite", oracle=_JACCARD_SUITE_SQL)
def dedup_jaccard_suite(spark, sf_dir):
    tok = dedup_jaccard_pairs(spark, sf_dir).select(
        F.lit("token").alias("part"), "id_a", "id_b", "jaccard"
    )
    sh = dedup_shingle_jaccard_pairs(spark, sf_dir).select(
        F.lit("shingle").alias("part"), "id_a", "id_b", "jaccard"
    )
    return tok.unionByName(sh).orderBy("part", "id_a", "id_b")


# --- cross-document repeated n-grams (substring-level duplication) -----------
# The span-duplication signal from Lee et al., "Deduplicating Training Data
# Makes Language Models Better" (ACL'22): document-level near-dup (MinHash)
# misses verbatim SPANS repeated across otherwise-distinct documents
# (boilerplate, licenses, templates). Relational form: word 8-gram shingles
# per document (distinct within doc), a shingle is "duplicated" when ≥2
# distinct documents contain it; per document report the duplicated-shingle
# fraction. One groupBy(shingle) shuffle with map-side combine + one
# broadcast-able shared-shingle semi-join — no all-pairs anywhere, so the
# same plan runs at 10^10 documents (the shingle key space shards evenly;
# skewed boilerplate shingles are exactly what AQE skew-join handles).
_NGRAM_N = 8


def ngram_dup_sql(src: str, prefix: str = "nd") -> str:
    """DuckDB CTE fragment (same contract as ``minhash_pairs_sql``): computes
    per-document cross-document repeated-shingle counts over ``src`` (a
    relation with doc_id, text). Final CTE ``{prefix}_per_doc`` has
    (doc_id, n_shingles, n_dup). Embed inside an existing WITH list."""
    n = _NGRAM_N
    return f"""{prefix}_words AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
      FROM {src}
    ),
    {prefix}_sh AS (
      SELECT DISTINCT doc_id,
             unnest([array_to_string(w[i:i+{n - 1}], ' ')
                     for i in generate_series(1, len(w) - {n - 1})]) AS s
      FROM {prefix}_words WHERE len(w) >= {n}
    ),
    {prefix}_shared AS (
      SELECT s FROM {prefix}_sh GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    {prefix}_per_doc AS (
      SELECT sh.doc_id,
             COUNT(*) AS n_shingles,
             SUM(CASE WHEN shared.s IS NOT NULL THEN 1 ELSE 0 END) AS n_dup
      FROM {prefix}_sh sh LEFT JOIN {prefix}_shared shared ON sh.s = shared.s
      GROUP BY sh.doc_id
    )"""


def hashed_shingles_df(docs: DataFrame, n: int = _NGRAM_N) -> DataFrame:
    """(doc_id, s) — distinct xxhash64'd word n-gram shingles per document,
    for docs with ≥ n words. THE shared shingle definition: the span-dup
    stats, the curation span gate, and decontamination all build on this
    one builder so their shingle semantics can't drift.

    The shingle is xxhash64'd BEFORE the first shuffle: an 8-gram string
    averages ~50 bytes and the explode multiplies corpus bytes ~8×, so at
    the 10^10-doc point a distinct+groupBy on the string key would shuffle
    close to an order of magnitude more than the input corpus; the 8-byte
    key cuts that ~6×. Counts are identical to the oracle's string-keyed
    arithmetic unless two DIFFERENT shingles collide in 64 bits (~2^-64
    per pair — the same accepted risk as the seen-set key).

    Construction is arithmetic, not string-building: each word is hashed
    ONCE, then a shingle is xxhash64 over its n word hashes fetched by
    index. The earlier slice + concat_ws form allocated an ~50-byte
    string (plus an 8-slot array) per shingle inside an interpreted
    higher-order function — ~6 GB of short-lived garbage per 10^6 docs —
    and at 32 executor threads in one JVM the allocation/GC contention
    became the scaling ceiling of the whole curation chain (8→32
    speedup 1.35× before, measured r5; the long-arithmetic form keeps
    the lambda allocation-free). Hash VALUES are not a contract — every
    consumer (span-dup stats, curation gate, decontamination) derives
    both sides from this one builder and compares only counts/joins.

    "Distinct per doc" is per-ROW algebra, not a shuffle: a (doc_id, s)
    distinct only ever removes repeats of a shingle INSIDE one document
    (doc_id is part of the key), so ``array_distinct`` on the in-row
    shingle array before the explode is exactly equivalent — and deletes
    what was the chain's largest exchange (the full exploded shingle set,
    ~8× corpus rows). It also leaves the output partitioned by input
    file with each doc's shingles contiguous, so a downstream
    groupBy(doc_id) partial-agg compresses to ONE row per doc before its
    shuffle instead of one per (doc, partition)."""
    words = docs.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("w")
    ).filter(F.size("w") >= n)
    wh = words.select(
        "doc_id", F.transform("w", lambda x: F.xxhash64(x)).alias("wh")
    )
    return wh.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("wh") - n),
                    lambda i: F.xxhash64(
                        *[F.element_at(F.col("wh"), i + j) for j in range(1, n + 1)]
                    ),
                )
            )
        ).alias("s"),
    )


def ngram_dup_stats_df(docs: DataFrame) -> DataFrame:
    """Spark twin of ``ngram_dup_sql``: (doc_id, n_shingles, n_dup) for docs
    with ≥ N words; one groupBy(shingle) shuffle with map-side combine +
    one broadcast-able shared-shingle join — no all-pairs anywhere.
    Shingle definition: ``hashed_shingles_df`` (shared builder)."""
    sh = hashed_shingles_df(docs)
    # (doc_id, s) is distinct by construction (the builder dedupes each
    # row's shingles via array_distinct before the explode), so COUNT(*)
    # per shingle IS the distinct-doc count —
    # count_distinct here would plan a second expand+aggregate pass over
    # the full shingle set for nothing (same algebra as the r4
    # minhash-distinct removal; the oracle keeps COUNT(DISTINCT doc_id))
    shared = (
        sh.groupBy("s")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("s")
    )
    # shuffle_hash, not the SMJ default: the probe side is the full
    # shingle stream (~8× corpus rows) and sort-merge would SORT it;
    # hashing builds only on the shared-key side (≥2-doc shingles, the
    # small side by construction), per partition, AQE-skewable — and
    # unlike a broadcast it stays safe when the shared set is 10^9
    # boilerplate keys at the 10^10-doc point. When the shared side is
    # runtime-tiny AQE still upgrades this to a broadcast join.
    flagged = sh.join(
        shared.withColumn("__dup", F.lit(1)).hint("shuffle_hash"), "s", "left"
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.sum(F.coalesce(F.col("__dup"), F.lit(0))).alias("n_dup"),
    )


def text_dup_ngram_stats(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    per_doc = ngram_dup_stats_df(docs)
    return per_doc.select(
        "doc_id",
        F.col("n_shingles").cast("long"),
        F.col("n_dup").cast("long").alias("n_dup_shingles"),
        F.round(F.col("n_dup") / F.col("n_shingles"), 4).alias("dup_fraction"),
    ).orderBy("doc_id")


# --- line-level boilerplate removal -------------------------------------------
# CCNet's first stage (Wenzek et al. 2020 §3.1): drop LINES whose normalized
# form repeats across documents (nav menus, cookie banners, license headers)
# and rebuild each document from its surviving lines in original order.
# Relational form: posexplode(lines) → groupBy(line-hash) with map-side
# combine → anti-join → ordered re-assembly per doc. The line is xxhash64'd
# before the shuffle (same rationale as the shingle stats); blank lines are
# never counted as boilerplate (they'd match vacuously across every doc).
_BOILER_MIN_DOCS = 2


def remove_boilerplate_lines_df(
    docs: DataFrame, min_docs: int = _BOILER_MIN_DOCS
) -> DataFrame:
    """(doc_id, text_clean) — each doc rebuilt without lines whose
    trim+lower form is non-empty and appears in ≥ min_docs distinct docs.
    Docs whose every line is boilerplate come back as ''."""
    lines = docs.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "line")
    ).withColumn("lh", F.xxhash64(F.trim(F.lower("line"))))
    common = (
        lines.filter(F.trim("line") != "")
        .groupBy("lh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("lh")
    )
    kept = lines.join(common.withColumn("__b", F.lit(1)), "lh", "left").filter(
        F.col("__b").isNull()
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_clean")
    )
    return docs.select("doc_id").join(rebuilt, "doc_id", "left").select(
        "doc_id", F.coalesce("text_clean", F.lit("")).alias("text_clean")
    )


def boilerplate_sql(src: str, min_docs: int = _BOILER_MIN_DOCS) -> str:
    """DuckDB CTE fragment: final CTE ``bp_clean`` has (doc_id, text_clean)
    for every row of ``src`` (a relation with doc_id, text)."""
    return f"""bp_lines AS (
      SELECT doc_id,
             unnest([{{'pos': i, 'line': l[i]}}
                     for i in generate_series(1, len(l))], recursive := true)
      FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM {src})
    ),
    bp_common AS (
      SELECT trim(lower(line)) AS k FROM bp_lines
      WHERE trim(line) <> ''
      GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= {min_docs}
    ),
    bp_rebuilt AS (
      SELECT doc_id,
             string_agg(line, chr(10) ORDER BY pos) AS text_clean
      FROM bp_lines
      WHERE trim(lower(line)) NOT IN (SELECT k FROM bp_common)
      GROUP BY doc_id
    ),
    bp_clean AS (
      SELECT s.doc_id, COALESCE(r.text_clean, '') AS text_clean
      FROM {src} s LEFT JOIN bp_rebuilt r ON s.doc_id = r.doc_id
    )"""


# --- benchmark decontamination ------------------------------------------------
# Training corpora must be scrubbed of evaluation-set text or downstream
# benchmark numbers are meaningless (the "data contamination" check every
# published LLM run reports — e.g. GPT-3 App. C / PaLM §7 style n-gram
# overlap). Relational form: a training document is contaminated when it
# shares ≥1 word n-gram shingle with ANY benchmark document. Same shared
# shingle builder as the span-dup stats (hashed_shingles_df), so the
# decontamination n-gram is exactly the span-dup n-gram.
#
# Scale shape: benchmark sets are fixed-size (10^4-10^6 docs) while the
# corpus is 10^10 — the distinct benchmark shingle set is broadcast-sized,
# so the flagging join is a map-side BroadcastHashJoin with AQE picking it
# automatically; the per-doc rollup is one partial+final hash aggregate.
# No all-pairs, nothing scales with corpus × benchmark.
_DECONTAM_BENCH_MOD = 23  # synthetic benchmark split: doc_id % 23 == 0


def decontaminate_df(train_docs: DataFrame, bench_docs: DataFrame) -> DataFrame:
    """Per training document: (doc_id, n_shingles, n_overlap, contaminated)
    where n_overlap counts this doc's distinct shingles that appear anywhere
    in the benchmark corpus and contaminated = 1 iff n_overlap > 0.
    Docs with < _NGRAM_N words have no shingles and are vacuously clean
    (excluded from the output, same convention as ngram_dup_stats_df)."""
    tr = hashed_shingles_df(train_docs)
    be = hashed_shingles_df(bench_docs).select("s").distinct()
    flagged = tr.join(be.withColumn("__hit", F.lit(1)), "s", "left")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_overlap"),
        )
        .withColumn("contaminated", (F.col("n_overlap") > 0).cast("long"))
    )


def text_decontam_stats(spark, sf_dir):
    """Registered leg: deterministic synthetic benchmark = documents with
    doc_id % 23 == 0 (no external data in this sandbox); training set =
    the rest."""
    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % _DECONTAM_BENCH_MOD == 0)
    train = docs.filter(F.col("doc_id") % _DECONTAM_BENCH_MOD != 0)
    per_doc = decontaminate_df(train, bench)
    return per_doc.select(
        "doc_id",
        F.col("n_shingles").cast("long"),
        F.col("n_overlap").cast("long"),
        F.col("contaminated").cast("long"),
    ).orderBy("doc_id")


_DUP_DECONTAM_SQL = f"""
WITH {ngram_dup_sql("documents")},
dc_bench AS (
  SELECT DISTINCT s FROM nd_sh WHERE doc_id % {_DECONTAM_BENCH_MOD} = 0
),
dc_per_doc AS (
  SELECT tr.doc_id,
         COUNT(*) AS n_shingles,
         SUM(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS n_overlap
  FROM (SELECT * FROM nd_sh WHERE doc_id % {_DECONTAM_BENCH_MOD} <> 0) tr
  LEFT JOIN dc_bench b ON tr.s = b.s
  GROUP BY tr.doc_id
)
SELECT * FROM (
  SELECT 'ngram_stats' AS part, doc_id,
         CAST(n_shingles AS BIGINT) AS n_shingles,
         CAST(n_dup AS BIGINT) AS n_dup_shingles,
         ROUND(n_dup / n_shingles, 4) AS dup_fraction,
         CAST(-1 AS BIGINT) AS n_overlap,
         CAST(-1 AS BIGINT) AS contaminated
  FROM nd_per_doc
  UNION ALL
  SELECT 'decontam' AS part, doc_id,
         CAST(n_shingles AS BIGINT) AS n_shingles,
         CAST(-1 AS BIGINT) AS n_dup_shingles,
         CAST(-1.0 AS DOUBLE) AS dup_fraction,
         CAST(n_overlap AS BIGINT) AS n_overlap,
         CAST(CASE WHEN n_overlap > 0 THEN 1 ELSE 0 END AS BIGINT)
           AS contaminated
  FROM dc_per_doc
)
ORDER BY part, doc_id
"""


@register("text_dup_decontam_suite", oracle=_DUP_DECONTAM_SQL)
def text_dup_decontam_suite(spark, sf_dir):
    """Tag-union composite (50-entry driver-sample cap): the span-dup stats
    leg (the former text_dup_ngram_stats registration, unchanged semantics)
    + the benchmark-decontamination leg. Sentinel fills (-1 / -1.0), never
    NULL, per the union sort-key rule; total order (part, doc_id)."""
    stats = text_dup_ngram_stats(spark, sf_dir).select(
        F.lit("ngram_stats").alias("part"),
        "doc_id",
        "n_shingles",
        "n_dup_shingles",
        "dup_fraction",
        F.lit(-1).cast("long").alias("n_overlap"),
        F.lit(-1).cast("long").alias("contaminated"),
    )
    dc = text_decontam_stats(spark, sf_dir).select(
        F.lit("decontam").alias("part"),
        "doc_id",
        "n_shingles",
        F.lit(-1).cast("long").alias("n_dup_shingles"),
        F.lit(-1.0).alias("dup_fraction"),
        "n_overlap",
        "contaminated",
    )
    return stats.unionByName(dc).orderBy("part", "doc_id")
