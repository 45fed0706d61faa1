"""Text-analysis queries over `documents` (north-star extensions).

Language ID, quality scoring, token counting, fingerprinting — the
training-data-pipeline text ops (BASELINE.json).  Implementations live in
``..operators.text``; every query has a full DuckDB oracle reproducing the
same md5-derived hashes and ratio formulas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators import text as TX
from ..sources import load_table
from . import register

# Shared oracle fragment: normalized text + token list.
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS = f"string_split({_NORM}, ' ')"

# CDC boundary window hash (polynomial Horner chain) — byte-exact with the
# engine's numpy scan on ASCII input; see operators/chunking.py.
from ..operators.chunking import cdc_boundary_sql as _cdc_boundary_sql
from ..ckpt import ckpt

_CDC_B = _cdc_boundary_sql("text", "i")


@register(
    "t1_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS n_bpe_tokens,
           CAST(length(text) AS INTEGER) AS n_chars_live,
           n_chars AS n_chars_meta
    FROM documents
    """,
    survey="NS-text (token counting)",
)
def t1_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish-regex token counts, char counts."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.bpe_token_count("text").alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_live"),
        F.col("n_chars").alias("n_chars_meta"),
    )


_STOP_SQL = "['" + "','".join(TX.STOPWORDS) + "']"


@register(
    "t2_quality_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               len({_TOKS}) AS n_tok,
               length(text) AS n_chr,
               length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
               len(list_filter({_TOKS}, x -> list_contains({_STOP_SQL}, x))) AS n_stop
        FROM documents
    )
    SELECT doc_id,
           CAST(n_tok AS INTEGER) AS n_tokens,
           CASE WHEN n_chr = 0 THEN 0.0 ELSE CAST(n_punct AS DOUBLE) / n_chr END AS punct_ratio,
           CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / n_tok END AS stopword_ratio,
           least(CAST(n_tok AS DOUBLE) / 100.0, 1.0) * 0.4
             + (1.0 - CASE WHEN n_chr = 0 THEN 0.0 ELSE CAST(n_punct AS DOUBLE) / n_chr END) * 0.3
             + least((CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / n_tok END) * 5.0, 1.0) * 0.3
             AS quality_score
    FROM t
    """,
    survey="NS-text (quality scoring)",
)
def t2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/punctuation/stopword quality heuristic, [0,1]."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.punct_ratio("text").alias("punct_ratio"),
        TX.stopword_ratio("text").alias("stopword_ratio"),
        TX.quality_score("text").alias("quality_score"),
    )


# Reusable oracle fragment: doc_id → quality_score (t2's exact formula) —
# shared with the quality-filtered ANN query (v7).
QUALITY_SQL = f"""
    SELECT doc_id,
           least(CAST(len({_TOKS}) AS DOUBLE) / 100.0, 1.0) * 0.4
             + (1.0 - CASE WHEN length(text) = 0 THEN 0.0
                           ELSE CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) / length(text) END) * 0.3
             + least((CASE WHEN len({_TOKS}) = 0 THEN 0.0
                           ELSE CAST(len(list_filter({_TOKS}, x -> list_contains({_STOP_SQL}, x))) AS DOUBLE) / len({_TOKS}) END) * 5.0, 1.0) * 0.3
           AS quality_score
    FROM documents
"""


def _hits_sql(lang: str) -> str:
    markers = "['" + "','".join(TX.LANG_MARKERS[lang]) + "']"
    return f"len(list_filter({_TOKS}, x -> list_contains({markers}, x)))"


_LANGS = sorted(TX.LANG_MARKERS)


@register(
    "t3_language_id",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, lang AS lang_meta,
               {", ".join(f"{_hits_sql(lg)} AS h_{lg}" for lg in _LANGS)}
        FROM documents
    )
    SELECT doc_id, lang_meta,
           {", ".join(f"CAST(h_{lg} AS INTEGER) AS hits_{lg}" for lg in _LANGS)},
           CASE WHEN greatest({", ".join("h_" + lg for lg in _LANGS)}) <= 0 THEN 'und'
                {" ".join(f"WHEN h_{lg} = greatest({', '.join('h_' + l2 for l2 in _LANGS)}) THEN '{lg}'" for lg in _LANGS)}
           END AS lang_pred
    FROM h
    """,
    survey="NS-text (language ID heuristic)",
)
def t3_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: per-language hit counts + argmax prediction.

    Ties break alphabetically; no hits → 'und'.  (The synthetic corpus is
    English-wordlist text for every lang value, so lang_pred is exercised
    against lang_meta without being expected to match it.)
    """
    d = load_table(spark, sf_dir, "documents")
    cols = [
        TX.marker_hits("text", TX.LANG_MARKERS[lg]).alias(f"hits_{lg}")
        for lg in _LANGS
    ]
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_meta"),
        *cols,
        TX.language_id("text").alias("lang_pred"),
    )


@register(
    "t4_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5({_NORM}) AS fp_md5,
           substr(md5({_NORM}), 1, 8) AS fp_bucket,
           ('0x' || substr(md5({_NORM}), 1, 8))::BIGINT AS fp_int
    FROM documents
    """,
    survey="NS-text (document fingerprinting)",
)
def t4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 digest, 32-bit bucket prefix, integer form."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.fingerprint_md5("text").alias("fp_md5"),
        F.substring(TX.fingerprint_md5("text"), 1, 8).alias("fp_bucket"),
        TX.fingerprint_int("text").alias("fp_int"),
    )


@register(
    "t5_top_bigrams",
    oracle="""
    WITH toks AS (
        SELECT string_split(text, ' ') AS t FROM documents
    ), bg AS (
        SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bigram
        FROM toks WHERE len(t) >= 2
    )
    SELECT bigram, CAST(count(*) AS BIGINT) AS freq
    FROM bg GROUP BY bigram
    ORDER BY freq DESC, bigram ASC
    LIMIT 20
    """,
    survey="NS-text (corpus n-gram frequency: zip_with bigrams → explode → count → top-k)",
)
def t5_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams.  Bigrams come from zip_with over the
    token array and its 1-shifted self (pure JVM lambdas, no Python);
    the count is one hash aggregate and the top-k is
    TakeOrderedAndProject with a lexicographic tie-break.  The shape that
    matters at 100 TB: tokenize → explode multiplies rows ~100×, so the
    filter (len>=2) and the projection to ONLY the bigram column happen
    before the explode."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    d2 = d.select(t.alias("t")).where(F.size("t") >= 2)
    bigrams = d2.select(
        F.explode(
            F.zip_with(
                F.slice("t", 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("bigram").asc())
        .limit(20)
    )


@register(
    "t6_vocabulary_stats",
    oracle=f"""
    WITH tok AS (
        SELECT d.source, unnest({_TOKS}) AS token
        FROM documents d
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS total_tokens,
           CAST(count(DISTINCT token) AS BIGINT) AS vocab_size,
           round(CAST(count(DISTINCT token) AS DOUBLE) / count(*), 6) AS type_token_ratio
    FROM tok GROUP BY source
    """,
    survey="NS-text (vocabulary growth: type/token ratio per corpus slice)",
)
def t6_vocabulary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary statistics (total tokens, distinct vocab,
    type/token ratio) — the Heaps-law monitoring metric for corpus
    diversity.  One explode + one two-function aggregate; at 100 TB the
    distinct count swaps to approx_count_distinct (a18's verified
    contract) and the plan shape is unchanged."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(TX.tokens("text")).alias("token"))
    return tok.groupBy("source").agg(
        F.count("*").alias("total_tokens"),
        F.countDistinct("token").alias("vocab_size"),
        F.round(
            F.countDistinct("token").cast("double") / F.count("*"), 6
        ).alias("type_token_ratio"),
    )


_URL_RE = "https?://[^ ]+"


@register(
    "t7_boilerplate_strip",
    oracle=f"""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(text, '{_URL_RE}', '', 'g'),
                               '\\s+', ' ', 'g')) AS clean_text,
           CAST(len(regexp_extract_all(text, '{_URL_RE}')) AS INTEGER) AS n_urls,
           CAST(length(text) - length(regexp_replace(text, '{_URL_RE}', '', 'g'))
                AS INTEGER) AS chars_removed
    FROM documents
    """,
    survey="NS-text (boilerplate stripping: URL removal + whitespace renormalization, audited)",
)
def t7_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data cleaning pass: strip URLs, re-normalize whitespace,
    and AUDIT the removal (count + chars removed per doc) — curation
    changes must be measurable, not silent.  Pure regexp expressions in
    codegen; the same shape extends to emails/markup with more patterns."""
    d = load_table(spark, sf_dir, "documents")
    stripped = F.regexp_replace("text", _URL_RE, "")
    return d.select(
        "doc_id",
        F.trim(F.regexp_replace(stripped, r"\s+", " ")).alias("clean_text"),
        F.size(F.regexp_extract_all("text", F.lit(_URL_RE), 0)).alias("n_urls"),
        (F.length("text") - F.length(stripped)).alias("chars_removed"),
    )


@register(
    "t8_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source, unnest({_TOKS}) AS term FROM documents
    ),
    tf AS (
        SELECT source, term, CAST(count(*) AS BIGINT) AS tf_sum
        FROM tok GROUP BY source, term
    ),
    dfreq AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.source, tf.term,
               round(tf.tf_sum * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)), 6) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT source, term, tfidf, rk FROM (
        SELECT source, term, tfidf,
               CAST(row_number() OVER (
                   PARTITION BY source ORDER BY tfidf DESC, term ASC
               ) AS INTEGER) AS rk
        FROM scored
    ) WHERE rk <= 5
    """,
    survey="NS-text (TF-IDF salient terms per corpus slice — corpus-relative term weighting)",
)
def t8_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per source by aggregated TF-IDF — the corpus-diagnostics
    view ("what is this slice about, relative to the whole corpus").

    Plan shape: one explode, two hash aggregates (term frequency per
    source; document frequency per term), then idf applied as a SINGLE
    multiplication on the already-summed tf (no order-dependent float
    accumulation — the rounded value is bit-stable on any partitioning).
    The 1-row corpus count is broadcast; the df table is NOT (round 9,
    the t14 lesson): df is keyed by corpus CONTENT — distinct terms —
    so it scales with vocabulary, and a forced broadcast of it is the
    same executor-memory hazard the cluster-longdocs tier killed t14
    with.  The tf⋈df join is pinned shuffled-hash: shards by term at any
    vocabulary size.  Top-k is a per-source window over the small
    (source × vocab) result with a pinned (score, term) tie-break."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "source", F.explode(TX.tokens("text")).alias("term"))
    tf = tok.groupBy("source", "term").agg(F.count("*").alias("tf_sum"))
    dfreq = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
    scored = (
        tf.join(dfreq.hint("shuffle_hash"), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "term",
            F.round(F.col("tf_sum") * idf, 6).alias("tfidf"),
        )
    )
    w = W.partitionBy("source").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select("source", "term", "tfidf", "rk")
    )


# PII patterns (RE2/Java-compatible — identical semantics in both engines).
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
_IP_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

# The synthetic corpus is wordlist-only text, so the PII scrub is exercised
# on a deterministic contact string derived from existing columns — both
# engines build the identical raw string, then redact it.
_RAW_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@' || source"
    " || '.example.com or +1-555-' ||"
    " lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')"
    " || ' from ' || CAST(doc_id % 223 + 1 AS VARCHAR) || '.0.0.'"
    " || CAST(doc_id % 254 + 1 AS VARCHAR)"
)


@register(
    "t9_pii_scrub",
    oracle=f"""
    WITH raw AS (SELECT doc_id, {_RAW_SQL} AS raw_text FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw_text, '{_EMAIL_RE}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(raw_text, '{_PHONE_RE}')) AS INTEGER) AS n_phones,
           CAST(len(regexp_extract_all(raw_text, '{_IP_RE}')) AS INTEGER) AS n_ips,
           regexp_replace(
               regexp_replace(
                   regexp_replace(raw_text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_PHONE_RE}', '<PHONE>', 'g'),
               '{_IP_RE}', '<IP>', 'g') AS redacted
    FROM raw
    """,
    survey="NS-text (PII detection + redaction with per-doc audit counts)",
)
def t9_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: detect and redact emails / phone numbers / IPv4 addresses,
    emitting per-document audit counts alongside the redacted text —
    curation must be measurable (cf. t7's audited boilerplate strip).

    All three passes are regexp expressions in whole-stage codegen (no
    Python in the hot path); redaction order is pinned (email → phone →
    ip) so later patterns can never match inside earlier placeholders.
    At 100 TB this is a pure map stage: no shuffle, scan-partition
    parallel, and the audit counts roll up with one small aggregate."""
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@"),
        F.col("source"),
        F.lit(".example.com or +1-555-"),
        F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
        F.lit(" from "),
        (F.col("doc_id") % 223 + 1).cast("string"),
        F.lit(".0.0."),
        (F.col("doc_id") % 254 + 1).cast("string"),
    )
    r = d.select("doc_id", raw.alias("raw_text"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("raw_text", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _IP_RE,
        "<IP>",
    )
    return r.select(
        "doc_id",
        F.size(F.regexp_extract_all("raw_text", F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("raw_text", F.lit(_PHONE_RE), 0)).alias("n_phones"),
        F.size(F.regexp_extract_all("raw_text", F.lit(_IP_RE), 0)).alias("n_ips"),
        redacted.alias("redacted"),
    )


@register(
    "t10_repetition_score",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY doc_id, term),
    n AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, max(c) AS max_c
        FROM tf GROUP BY doc_id
    ),
    top AS (
        SELECT tf.doc_id, min(tf.term) AS top_term
        FROM tf JOIN n ON tf.doc_id = n.doc_id AND tf.c = n.max_c
        GROUP BY tf.doc_id
    )
    SELECT n.doc_id, n.n_tokens,
           CAST(n.max_c AS BIGINT) AS top_freq,
           round(CAST(n.max_c AS DOUBLE) / n.n_tokens, 6) AS top_ratio,
           top.top_term,
           round(CAST(n.max_c AS DOUBLE) / n.n_tokens, 6) > 0.2 AS flagged
    FROM n JOIN top ON n.doc_id = top.doc_id
    """,
    survey="NS-text (intra-document repetition filter — Gopher-style quality rule)",
)
def t10_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition score: the most frequent token's share of
    the document, with the doc flagged when it exceeds 20% — the
    Gopher/C4-family quality rule that drops boilerplate- and
    spam-repetitive pages before training.

    The argmax term is pinned deterministically (max count, then
    lexicographically smallest term) — `max_by` alone is tie-ambiguous.
    All three aggregates key on doc_id, so the plan is one explode and a
    chain of same-key hash aggregates: a single logical shuffle at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    n = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"), F.max("c").alias("max_c")
    )
    top = (
        tf.join(n, ["doc_id"])
        .where(F.col("c") == F.col("max_c"))
        .groupBy("doc_id")
        .agg(F.min("term").alias("top_term"))
    )
    ratio = F.round(F.col("max_c").cast("double") / F.col("n_tokens"), 6)
    return n.join(top, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.col("max_c").alias("top_freq"),
        ratio.alias("top_ratio"),
        "top_term",
        (ratio > 0.2).alias("flagged"),
    )


@register(
    "t11_inverted_index",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest({_TOKS}) AS term FROM documents
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           array_to_string(list_sort(list(doc_id))[1:20], '|') AS postings_head
    FROM tok GROUP BY term
    """,
    survey="NS-text (inverted-index build: term → document-frequency + sorted posting list)",
)
def t11_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: per term, the document frequency and the
    first 20 doc ids of the sorted posting list — the search-infrastructure
    companion to t8's TF-IDF.  Dedup to (doc, term) pairs happens
    map-side (distinct before the term aggregate), and the posting list is
    SORTED then truncated so the output is deterministic; at 100 TB
    posting lists shard by (term, doc_id range) rather than collecting
    unbounded arrays — the head-truncation here is that discipline in
    miniature.  The head ships as a '|'-joined string so every top-level
    output column is scalar (driver-canonicalizer contract)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(TX.tokens("text")).alias("term")).distinct()
    head = F.slice(F.sort_array(F.collect_list("doc_id")), 1, 20)
    return tok.groupBy("term").agg(
        F.count("*").alias("df"),
        F.array_join(
            F.transform(head, lambda x: x.cast("string")), "|"
        ).alias("postings_head"),
    )


@register(
    "t12_zipf_fit",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS term FROM documents),
    tf AS (SELECT term, count(*) AS freq FROM tok GROUP BY term),
    r AS (
        SELECT term, freq,
               row_number() OVER (ORDER BY freq DESC, term ASC) AS rank
        FROM tf
    )
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(freq) AS BIGINT) AS total_tokens,
           round(regr_slope(ln(freq), ln(rank)), 6) AS zipf_slope,
           round(regr_intercept(ln(freq), ln(rank)), 6) AS zipf_intercept,
           round(regr_r2(ln(freq), ln(rank)), 6) AS zipf_r2
    FROM r
    """,
    survey="NS-text (Zipf rank-frequency fit — log-log regression over the term distribution)",
)
def t12_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law diagnostic: regress ln(frequency) on ln(rank) over the
    corpus term distribution — natural text fits slope ≈ -1, and large
    deviations flag synthetic/spammy/templated corpora slices (exactly
    what this wordlist corpus shows).  One term-count aggregate, a
    distributed exact rank, and a single-row regression aggregate — the
    regr_* family merges as constant-size co-moment state, the same
    single-shuffle shape as corr (a16).

    Scale shape (round 7 — the de-vacuumed window audit caught the old
    ``row_number() OVER (ORDER BY freq DESC)`` moving the WHOLE VOCABULARY
    onto one task; |vocab| grows with the corpus): ranks now come from
    the bucketed row-id operator over ``-floor(log2(freq))`` range
    buckets (monotone in -freq, ≤ ~64 buckets at any corpus size since
    freq ≤ 2^63), so the only unpartitioned window runs over the bucket
    offsets list and rank assembly shuffles on the bucket key only."""
    from .scale_ops2 import global_row_ids

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(TX.tokens("text")).alias("term"))
    tf = tok.groupBy("term").agg(F.count("*").alias("freq"))
    tfn = tf.withColumn("_negf", -F.col("freq")).transform(ckpt)  # round 10: global_row_ids references its input twice — the leaf
    # runs the corpus-wide explode+count once.  Vocab-scaled rows.
    r = global_row_ids(
        tfn,
        -F.floor(F.log2("freq")).cast("int"),
        ["_negf", "term"],
    ).withColumn("rank", F.col("row_id") + 1)
    ln_f, ln_r = F.log(F.col("freq")), F.log(F.col("rank"))
    return r.agg(
        F.count("*").alias("n_terms"),
        F.sum("freq").alias("total_tokens"),
        F.round(F.regr_slope(ln_f, ln_r), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(ln_f, ln_r), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(ln_f, ln_r), 6).alias("zipf_r2"),
    )


@register(
    "t13_token_entropy",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY doc_id, term),
    n AS (SELECT doc_id, sum(c) AS n_tok FROM tf GROUP BY doc_id)
    SELECT tf.doc_id,
           CAST(n.n_tok AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(-sum((CAST(tf.c AS DOUBLE) / n.n_tok)
                      * ln(CAST(tf.c AS DOUBLE) / n.n_tok)), 6) AS entropy_nats,
           round(ln(count(*)), 6) AS max_entropy_nats
    FROM tf JOIN n ON tf.doc_id = n.doc_id
    GROUP BY tf.doc_id, n.n_tok
    """,
    survey="NS-text (token-distribution Shannon entropy — information-density quality signal)",
)
def t13_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's token distribution (nats), with
    the uniform-distribution ceiling ln(n_distinct) for normalization —
    low entropy relative to the ceiling means repetitive/templated text
    (the continuous form of t10's max-frequency rule).

    Same single-logical-shuffle shape as t10: term counts, totals, and
    the entropy sum all key on doc_id.  The per-doc float sum spans at
    most |vocab| terms, so the 6-dp round is stable."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    n = tf.groupBy("doc_id").agg(F.sum("c").alias("n_tok"))
    p = F.col("c").cast("double") / F.col("n_tok")
    return (
        tf.join(n, "doc_id")
        .groupBy("doc_id", "n_tok")
        .agg(
            F.count("*").alias("n_distinct"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy_nats"),
            F.round(F.log(F.count("*")), 6).alias("max_entropy_nats"),
        )
        .select(
            "doc_id",
            F.col("n_tok").alias("n_tokens"),
            "n_distinct",
            "entropy_nats",
            "max_entropy_nats",
        )
    )


@register(
    "t14_bigram_lm_score",
    oracle=f"""
    WITH n AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    t AS (SELECT doc_id, unnest(toks) AS tok FROM n),
    v AS (SELECT count(DISTINCT tok) AS vsz FROM t),
    bgt AS (
        SELECT doc_id, concat(toks[i], ' ', toks[i+1]) AS bg, toks[i] AS w1
        FROM n, LATERAL (
            SELECT unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS i
        )
        WHERE len(toks) >= 2
    ),
    c12 AS (SELECT bg, count(*) AS c12 FROM bgt GROUP BY bg),
    c1 AS (SELECT w1, count(*) AS c1 FROM bgt GROUP BY w1)
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((c12.c12 + 1.0) / (c1.c1 + v.vsz))), 6) AS avg_logprob
    FROM bgt b
    JOIN c12 USING (bg)
    JOIN c1 USING (w1)
    CROSS JOIN v
    GROUP BY b.doc_id
    """,
    survey="NS-text (bigram language-model scoring — perplexity-style fluency/quality signal)",
)
def t14_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model score per document: train
    add-one-smoothed bigram/context counts over the WHOLE corpus in one
    pass, then score each document by its mean conditional log-probability
    ``avg ln((c(w1,w2)+1) / (c(w1)+|V|))`` — the classic perplexity-style
    fluency signal used to quality-filter LLM training data (low scores =
    disfluent/TEMPLATED/wrong-language text relative to the corpus).
    Documents with fewer than two tokens carry no bigram and are excluded
    (matching the oracle's WHERE).

    Scale shape: the LM "training" is two hash aggregates over the exploded
    bigram stream (map-side partial combine does most of the work), and
    scoring re-joins those counts back onto the same stream by key — at
    100 TB the count tables are orders of magnitude smaller than the corpus
    and shard by key; nothing ever collects to the driver.  The per-doc
    average is the only float accumulation, bounded by doc length and
    rounded to 6 dp.

    The count-table joins are PINNED to shuffled-hash (round 9): both
    tables are keyed by corpus CONTENT (distinct bigrams / distinct
    context words), so their true size scales with corpus vocabulary while
    Catalyst's static estimate is a fixed ratio of the pruned text scan —
    at the cluster-longdocs tier (x32 doc length, 6 GB executors) the
    planner auto-broadcast a multi-hundred-MB bigram table off a <10 MB
    estimate and executors died deserializing the hashed relation
    ("Could not allocate memory to grow BytesToBytesMap"; AQE cannot
    demote a statically-planned broadcast).  A content-keyed count table
    must never ride a size-estimate-gated broadcast: the shuffle join
    shards by key at ANY vocabulary size, and the build side per
    partition is 1/N of the table.  Caught by the round-9
    cluster-longdocs axis-product gate on its first run — the same way
    cluster10x caught x43."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", TX.tokens("text").alias("t")).where(F.size("t") >= 2)
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(concat(element_at(t, i), ' ', element_at(t, i + 1)) AS bg,"
                "             element_at(t, i) AS w1))"
            )
        ).alias("p"),
    ).select("doc_id", "p.bg", "p.w1")
    c12 = bg.groupBy("bg").agg(F.count("*").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (
        d.select(F.explode(TX.tokens("text")).alias("tok"))
        .agg(F.countDistinct("tok").alias("vsz"))
    )
    logp = F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("vsz")))
    return (
        bg.join(c12.hint("shuffle_hash"), "bg")
        .join(c1.hint("shuffle_hash"), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(logp), 6).alias("avg_logprob"),
        )
    )


@register(
    "t15_readability",
    oracle=f"""
    WITH m AS (
        SELECT doc_id,
               len({_TOKS}) AS n_words,
               greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
               len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
        FROM documents
        WHERE len({_TOKS}) > 0
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_syllables AS BIGINT) AS n_syllables,
           round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                         - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) AS flesch,
           CASE WHEN round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                                   - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) >= 60
                THEN 'easy'
                WHEN round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                                   - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) >= 30
                THEN 'medium'
                ELSE 'hard' END AS difficulty
    FROM m
    """,
    survey="NS-text (Flesch reading-ease readability — vowel-group syllable heuristic, pure expressions)",
)
def t15_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document with a vowel-group syllable
    heuristic (public formula: 206.835 − 1.015·words/sentences −
    84.6·syllables/words) plus an easy/medium/hard bucket — the classic
    complexity signal curation pipelines pair with t2's quality score.

    Everything is regexp + arithmetic inside whole-stage codegen: a
    shuffle-free map over the corpus scan, like t9's PII scrub.  The
    bucket thresholds compare the SAME 4-dp-rounded value the query
    emits, so the verdict can't straddle an ulp."""
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(TX.tokens("text"))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit(r"[.!?]+"), 0)), F.lit(1)
    )
    n_syl = F.size(F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), 0))
    m = d.where(n_words > 0).select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        n_sent.cast("bigint").alias("n_sentences"),
        n_syl.cast("bigint").alias("n_syllables"),
    )
    flesch = F.round(
        F.lit(206.835)
        - 1.015 * (F.col("n_words").cast("double") / F.col("n_sentences"))
        - 84.6 * (F.col("n_syllables").cast("double") / F.col("n_words")),
        4,
    )
    return m.withColumn("flesch", flesch).withColumn(
        "difficulty",
        F.when(F.col("flesch") >= 60, "easy")
        .when(F.col("flesch") >= 30, "medium")
        .otherwise("hard"),
    )


@register(
    "t16_intradoc_sentence_dedup",
    oracle="""
    WITH s AS (
        SELECT doc_id,
               list_filter(
                   list_transform(
                       regexp_split_to_array(lower(text), '[.!?]+'),
                       x -> trim(x)
                   ),
                   x -> x <> ''
               ) AS sents
        FROM documents
    )
    SELECT doc_id,
           CAST(len(sents) AS INTEGER) AS n_sentences,
           CAST(len(list_distinct(sents)) AS INTEGER) AS n_unique,
           round(CASE WHEN len(sents) = 0 THEN 0.0
                      ELSE CAST(len(list_distinct(sents)) AS DOUBLE) / len(sents)
                 END, 6) AS unique_ratio
    FROM s
    """,
    survey="NS-text extended (intra-document sentence dedup: repeated-line/boilerplate removal metric)",
)
def t16_intradoc_sentence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition cleanup metric: split each doc into
    normalized sentences, count total vs distinct — the dedup that removes
    repeated boilerplate lines WITHIN a page (t10 scores repetition,
    d1-d14 dedup ACROSS docs; this is the within-doc layer a web-scrape
    cleaning pipeline runs first).  Pure codegen array ops: split /
    transform / filter / array_distinct, zero Python, no shuffle at all —
    embarrassingly parallel over the corpus at any scale."""
    d = load_table(spark, sf_dir, "documents")
    sents = F.filter(
        F.transform(
            F.split(F.lower("text"), r"[.!?]+"), lambda x: F.trim(x)
        ),
        lambda x: x != "",
    )
    t = d.select("doc_id", sents.alias("sents"))
    n = F.size("sents")
    nu = F.size(F.array_distinct("sents"))
    return t.select(
        "doc_id",
        n.alias("n_sentences"),
        nu.alias("n_unique"),
        F.round(
            F.when(n == 0, F.lit(0.0)).otherwise(
                nu.cast("double") / n.cast("double")
            ),
            6,
        ).alias("unique_ratio"),
    )


@register(
    "t17_script_mix",
    oracle="""
    SELECT doc_id,
           CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_latin,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
           CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS n_other,
           round(CASE WHEN length(text) = 0 THEN 0.0
                      ELSE CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                           / length(text) END, 6) AS latin_ratio
    FROM documents
    """,
    survey="NS-text extended (character-class mix: script/noise profiling per document)",
)
def t17_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per document (latin letters, digits,
    other-noise, latin ratio) — the script-mix profile corpus filters use
    to drop mojibake, code-dumps and mixed-script spam before language
    ID even runs (t3 assumes mostly-clean text; this is its pre-filter).
    Pure regexp_replace + length codegen: zero Python, zero shuffle,
    embarrassingly parallel at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    n_latin = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    n_digit = F.length(F.regexp_replace("text", "[^0-9]", ""))
    n_other = F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", ""))
    return d.select(
        "doc_id",
        n_latin.cast("bigint").alias("n_latin"),
        n_digit.cast("bigint").alias("n_digit"),
        n_other.cast("bigint").alias("n_other"),
        F.round(
            F.when(F.length("text") == 0, F.lit(0.0)).otherwise(
                n_latin.cast("double") / F.length("text")
            ),
            6,
        ).alias("latin_ratio"),
    )


_T14_CTE = f"""
    n AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    t AS (SELECT doc_id, unnest(toks) AS tok FROM n),
    v AS (SELECT count(DISTINCT tok) AS vsz FROM t),
    bgt AS (
        SELECT doc_id, concat(toks[i], ' ', toks[i+1]) AS bg, toks[i] AS w1
        FROM n, LATERAL (
            SELECT unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS i
        )
        WHERE len(toks) >= 2
    ),
    c12 AS (SELECT bg, count(*) AS c12 FROM bgt GROUP BY bg),
    c1 AS (SELECT w1, count(*) AS c1 FROM bgt GROUP BY w1),
    scored AS (
        SELECT b.doc_id,
               round(avg(ln((c12.c12 + 1.0) / (c1.c1 + v.vsz))), 6) AS avg_logprob
        FROM bgt b
        JOIN c12 USING (bg)
        JOIN c1 USING (w1)
        CROSS JOIN v
        GROUP BY b.doc_id
    )
"""


@register(
    "t18_perplexity_buckets",
    oracle=f"""
    WITH {_T14_CTE},
    b AS (
        SELECT doc_id, avg_logprob,
               ntile(4) OVER (ORDER BY avg_logprob ASC, doc_id ASC) AS bucket
        FROM scored
    )
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(min(avg_logprob), 6) AS min_score,
           round(max(avg_logprob), 6) AS max_score,
           round(avg(avg_logprob), 6) AS mean_score
    FROM b GROUP BY bucket
    """,
    survey="NS-text extended (perplexity-quartile bucketing of the t14 LM score — curriculum/filter tiers)",
)
def t18_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile tiers of the t14 bigram-LM fluency score: rank every
    document by its corpus-LM mean log-probability and cut into 4 ntile
    buckets — the standard construction for perplexity-filtered or
    curriculum-ordered training mixes (keep top tiers, or feed easy→hard).
    Ordering is on the ROUNDED score with doc_id tie-break, so both engines
    compute identical tile boundaries.

    Scale shape (round 7 — the de-vacuumed window audit caught the old
    ``ntile(4) OVER (ORDER BY ...)`` moving every per-doc score onto one
    task): exact global ranks now come from the bucketed row-id operator
    (scale_ops2.global_row_ids — value-derived range buckets, |buckets|-row
    offsets aggregate, intra-bucket windows only) and ntile's front-loaded
    remainder rule is closed-form arithmetic on the rank
    (ntile_from_rank), identical output at any n.  The only unpartitioned
    window left runs over the ~120-row bucket-offsets list."""
    from .scale_ops2 import global_row_ids, ntile_from_rank

    scored = t14_bigram_lm_score(spark, sf_dir).select(
        "doc_id", "avg_logprob"
    ).transform(ckpt)  # round 10: global_row_ids references
    # its input twice (offsets + probe) and the count makes a third — the
    # leaf runs the full bigram-LM pipeline once instead of 3×.  2 cols ×
    # |docs| rows.
    # bucket key: monotone in the leading order column (scores land in
    # roughly [-12, 0], so floor(score*10) yields ~120 range buckets —
    # bounded by the score's range, not by corpus size)
    with_ids = global_row_ids(
        scored,
        F.floor(F.col("avg_logprob") * 10).cast("int"),
        ["avg_logprob", "doc_id"],
    )
    n = scored.agg(F.count("*").alias("_n"))
    b = with_ids.crossJoin(F.broadcast(n)).select(
        "avg_logprob",
        (ntile_from_rank("row_id", "_n", 4) + 1).cast("int").alias("bucket"),
    )
    return b.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.round(F.min("avg_logprob"), 6).alias("min_score"),
        F.round(F.max("avg_logprob"), 6).alias("max_score"),
        F.round(F.avg("avg_logprob"), 6).alias("mean_score"),
    )


@register(
    "t19_hashed_linear_scorer",
    oracle=f"""
    WITH n AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    t AS (SELECT doc_id, unnest(toks) AS tok FROM n),
    f AS (
        SELECT doc_id,
               (('0x' || substr(md5(concat('w:', tok)), 1, 8))::BIGINT % 201 - 100)
                   AS w
        FROM t
    ),
    s AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(w) AS BIGINT) AS logit_centi
        FROM f GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, logit_centi,
           round(1.0 / (1.0 + exp(-(logit_centi / (100.0 * n_tokens)))), 6) AS score,
           (1.0 / (1.0 + exp(-(logit_centi / (100.0 * n_tokens)))) >= 0.5) AS keep
    FROM s
    """,
    survey="NS-text extended (hashed-feature linear scorer: model-based quality filtering in codegen)",
)
def t19_hashed_linear_scorer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering, the fastText-linear-classifier shape
    used to score web text for LLM corpora: each token hashes into a
    weight (the hashing trick — no vocabulary table, fixed memory at any
    vocab size), the per-doc logit is the mean token weight, and the
    sigmoid score gates keep/drop.  The weights here are md5-derived
    stand-ins for trained parameters, which keeps the full pipeline —
    tokenize → hash → weight lookup → reduce → link function → gate —
    oracle-verifiable end-to-end.  Everything is codegen expressions;
    the logit accumulates in EXACT integer centi-units (the v9/x4
    discipline), so only the final sigmoid is float, rounded to 6 dp.
    Swapping in real weights is a broadcast-join against a (hash_bucket,
    weight) table — same plan shape."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(TX.tokens("text")).alias("tok"))
    w = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("w:"), F.col("tok"))), 1, 8), 16, 10
        ).cast("bigint")
        % 201
        - 100
    )
    s = tok.select("doc_id", w.alias("w")).groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("w").cast("bigint").alias("logit_centi"),
    )
    score = 1.0 / (
        1.0
        + F.exp(
            -(F.col("logit_centi") / (100.0 * F.col("n_tokens")))
        )
    )
    return s.select(
        "doc_id",
        "n_tokens",
        "logit_centi",
        F.round(score, 6).alias("score"),
        (score >= 0.5).alias("keep"),
    )


@register(
    "t20_bpe_merge_rank",
    oracle=f"""
    WITH n AS (SELECT {_TOKS} AS toks FROM documents),
    tok AS (SELECT unnest(toks) AS t FROM n),
    pairs AS (
        SELECT unnest(list_transform(range(1, greatest(length(t) - 1, 0) + 1),
                                     i -> substr(t, i, 2))) AS pair
        FROM tok
    ),
    c AS (SELECT pair, CAST(count(*) AS BIGINT) AS n FROM pairs GROUP BY pair)
    SELECT CAST(row_number() OVER (ORDER BY n DESC, pair ASC) AS INTEGER) AS merge_rank,
           pair, n
    FROM c ORDER BY n DESC, pair ASC LIMIT 32
    """,
    survey="NS-text (BPE merge ranking: corpus-wide adjacent-character pair counts → top merge candidates)",
)
def t20_bpe_merge_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first step of BPE vocabulary training at corpus scale: count
    every adjacent character pair inside every token occurrence, rank the
    top-32 merge candidates (count DESC, pair ASC — the deterministic
    tie-break real tokenizer trainers need for reproducible vocabs).

    Plan shape: explode to pairs → ONE hash aggregate with map-side
    combine (the pair vocabulary is tiny, so partials collapse hard) →
    top-k on the few-hundred-row count table.  Full BPE training iterates
    this with the chosen merge applied; each iteration is this same
    aggregate, which is why the one-pass shape is the thing to get right
    at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(TX.tokens("text")).alias("t")).where(
        F.length("t") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    top = counts.orderBy(F.col("n").desc(), F.col("pair").asc()).limit(32)
    return top.select(
        F.row_number()
        .over(W.orderBy(F.col("n").desc(), F.col("pair").asc()))
        .alias("merge_rank"),
        "pair",
        "n",
    )


@register(
    "t22_vocab_overlap",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest({_TOKS}) AS t FROM documents
    ),
    c AS (SELECT source, t, count(*) AS n FROM tok GROUP BY source, t),
    top AS (
        SELECT source, t FROM (
            SELECT source, t,
                   row_number() OVER (PARTITION BY source ORDER BY n DESC, t ASC) AS rn
            FROM c
        ) WHERE rn <= 200
    ),
    sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n_vocab FROM top GROUP BY source),
    inter AS (
        SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS n_common
        FROM top a JOIN top b ON a.t = b.t AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT i.src_a, i.src_b, sa.n_vocab AS n_a, sb.n_vocab AS n_b, i.n_common,
           round(CAST(i.n_common AS DOUBLE) / (sa.n_vocab + sb.n_vocab - i.n_common), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.src_a
    JOIN sizes sb ON sb.source = i.src_b
    """,
    survey="NS-text extended (cross-source vocabulary overlap: top-k vocab per source, pairwise Jaccard — mixture curation signal)",
)
def t22_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How similar are my corpus sources?  Top-200 vocabulary per source
    (deterministic count-desc/token-asc rank) and pairwise Jaccard
    between every source pair — the signal mixture curation uses to spot
    near-redundant sources before weighting them (x16's resample decides
    WITH this).  Plan: one token aggregate (map-side combined — the only
    full-data pass), per-source top-k windows on the count relation, and
    an equality self-join on token over ≤200·|sources| rows."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(TX.tokens("text")).alias("t"))
    c = tok.groupBy("source", "t").agg(F.count("*").alias("n"))
    w = W.partitionBy("source").orderBy(F.col("n").desc(), F.col("t").asc())
    top = (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 200)
        .select("source", "t")
    )
    sizes = top.groupBy("source").agg(F.count("*").cast("bigint").alias("n_vocab"))
    a = top.select(F.col("source").alias("src_a"), "t")
    b = top.select(F.col("source").alias("src_b"), "t")
    inter = (
        a.join(b, "t")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n_vocab").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n_vocab").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "t23_chunk_windows",
    oracle=f"""
    WITH n AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    starts AS (
        SELECT doc_id, toks,
               unnest(range(1, greatest(len(toks) - 16, 1) + 1, 48)) AS start
        FROM n WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST((start - 1) / 48 AS INTEGER) AS chunk_idx,
           CAST(least(64, len(toks) - start + 1) AS INTEGER) AS n_tokens,
           md5(list_aggr(toks[start:least(start + 63, len(toks))], 'string_agg', ' ')) AS chunk_md5
    FROM starts
    """,
    survey="NS-text extended (RAG chunking: fixed-size overlapping token windows, content-addressed by digest)",
)
def t23_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-ready chunking: every document splits into 64-token
    windows with stride 48 (16-token overlap, so no boundary sentence is
    lost to a cut) — THE preprocessing step between a raw corpus and an
    embedding index.  A trailing stub shorter than the overlap folds into
    the previous window (starts stop at len−16).  Chunks are emitted
    content-addressed (md5 of the joined tokens) rather than as raw text,
    which is both driver-hashable and the dedup-friendly form a chunk
    store keys on.  One tokenize + one explode of the per-doc start list;
    at 100 TB each doc's chunk fan-out is |tokens|/48, embarrassingly
    parallel, no shuffle at all."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", TX.tokens("text").alias("toks")).where(
        F.size("toks") > 0
    )
    starts = t.select(
        "doc_id",
        "toks",
        F.explode(
            F.expr("sequence(1, greatest(size(toks) - 16, 1), 48)")
        ).alias("start"),
    )
    return starts.select(
        "doc_id",
        ((F.col("start") - 1) / 48).cast("int").alias("chunk_idx"),
        F.least(F.lit(64), F.size("toks") - F.col("start") + 1)
        .cast("int")
        .alias("n_tokens"),
        F.md5(
            F.array_join(F.expr("slice(toks, start, 64)"), " ")
        ).alias("chunk_md5"),
    )


@register(
    "t24_langid_confusion",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, lang AS lang_meta,
               {", ".join(f"{{hits}} AS h_{{lg}}".format(hits=_hits_sql(lg), lg=lg) for lg in _LANGS)}
        FROM documents
    ),
    p AS (
        SELECT lang_meta,
               CASE WHEN greatest({", ".join("h_" + lg for lg in _LANGS)}) <= 0 THEN 'und'
                    {" ".join(f"WHEN h_{lg} = greatest({', '.join('h_' + l2 for l2 in _LANGS)}) THEN '{lg}'" for lg in _LANGS)}
               END AS lang_pred
        FROM h
    )
    SELECT lang_meta, lang_pred,
           CAST(count(*) AS BIGINT) AS n,
           lang_meta = lang_pred AS is_correct
    FROM p GROUP BY lang_meta, lang_pred
    """,
    survey="NS-text extended (language-ID evaluation: confusion matrix of heuristic prediction vs metadata ground truth)",
)
def t24_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation as a pipeline op: t3's marker-based language
    ID scored against the corpus's lang metadata as a confusion matrix —
    the per-cell counts every quality dashboard needs before trusting a
    heuristic filter at 100 TB (one wrong cell = one language silently
    dropped from the corpus).  One pass, one aggregate; the prediction
    expression is t3's codegen argmax, unchanged."""
    d = load_table(spark, sf_dir, "documents")
    p = d.select(
        F.col("lang").alias("lang_meta"),
        TX.language_id("text").alias("lang_pred"),
    )
    return p.groupBy("lang_meta", "lang_pred").agg(
        F.count("*").cast("bigint").alias("n"),
        (F.col("lang_meta") == F.col("lang_pred")).alias("is_correct"),
    )


@register(
    "x47_dataset_card",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, lang, source, length(text) AS n_chr,
               len({_TOKS}) AS n_tok,
               md5({_NORM}) AS fp
        FROM documents
    ),
    langs AS (
        SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM base GROUP BY lang
    ),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM base),
    ent AS (
        SELECT round(-sum((langs.n / tot.n) * log2(langs.n / tot.n)), 6) AS lang_entropy
        FROM langs, tot
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(n_chr) AS BIGINT) AS total_chars,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           round(CAST(sum(n_tok) AS DOUBLE) / count(*), 6) AS mean_tokens,
           round(1.0 - CAST(count(DISTINCT fp) AS DOUBLE) / count(*), 6) AS exact_dup_rate,
           ent.lang_entropy
    FROM base, ent
    GROUP BY ent.lang_entropy
    """,
    survey="NS-text extended (dataset card: corpus-level size / dedup / language-diversity summary in one pass)",
)
def x47_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card's quantitative block, computed not hand-waved:
    corpus size (docs/chars/tokens), exact-duplicate rate (1 − distinct
    normalized fingerprints / docs — d1's statistic as a ratio), and
    language diversity as Shannon entropy over the lang mix — the
    one-row summary every corpus release ships.  One pass for the
    per-doc stats; the entropy runs on the |langs|-row count relation."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").alias("n_chr"),
        TX.token_count("text").alias("n_tok"),
        F.md5(TX.normalize("text")).alias("fp"),
    )
    tot = base.agg(F.count("*").cast("double").alias("n"))
    langs = base.groupBy("lang").agg(F.count("*").cast("double").alias("ln"))
    ent = (
        langs.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                -F.sum(
                    (F.col("ln") / F.col("n"))
                    * F.log2(F.col("ln") / F.col("n"))
                ),
                6,
            ).alias("lang_entropy")
        )
    )
    card = base.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.sum("n_chr").cast("bigint").alias("total_chars"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.round(F.sum("n_tok").cast("double") / F.count("*"), 6).alias(
            "mean_tokens"
        ),
        F.round(
            1.0 - F.countDistinct("fp").cast("double") / F.count("*"), 6
        ).alias("exact_dup_rate"),
    )
    return card.crossJoin(F.broadcast(ent))


def _cdc_chunk_relation(d: DataFrame, keep: list[str]) -> DataFrame:
    """Shared CDC chunk stream: (keep..., chunk_idx, start_pos, chunk_len,
    chunk_md5) — one row per content-defined chunk of ``text``.

    One vectorized Arrow pass (:func:`..operators.chunking.cdc_chunks`):
    numpy Horner boundary scan + per-chunk md5 inside ``mapInPandas`` —
    ZERO Exchange, zero Window, zero Generate, O(bytes) CPU.  Round 6's
    higher-order-function form was still quadratic in document length
    (a lambda referencing the row's text column re-evaluates the column
    access per element — ×293 wall at the ×128 doc-length tier); the
    full execution-form history and microbenchmarks live in the operator
    module docstring and SCALE.md round 7."""
    from ..operators import chunking as CH

    return CH.cdc_chunks(d, keep)


@register(
    "t25_content_defined_chunks",
    oracle=f"""
    WITH pos AS (
        SELECT doc_id, text, length(text) AS n,
               unnest(range(1, greatest(length(text) - 7, 0) + 1)) AS i
        FROM documents WHERE length(text) >= 8
    ),
    b AS (
        SELECT doc_id, text, n, i
        FROM pos
        WHERE i = 1
           OR ({_CDC_B}) % 32 = 0
    ),
    c AS (
        SELECT doc_id, text, n, i AS start_pos,
               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) AS INTEGER) AS chunk_idx,
               coalesce(lead(i) OVER (PARTITION BY doc_id ORDER BY i), n + 1) - i AS chunk_len
        FROM b
    )
    SELECT doc_id, chunk_idx, CAST(start_pos AS BIGINT) AS start_pos,
           CAST(chunk_len AS BIGINT) AS chunk_len,
           md5(substr(text, start_pos, chunk_len)) AS chunk_md5
    FROM c
    """,
    survey="NS-text extended (content-defined chunking: rolling-hash boundaries stable under edits — the storage-dedup chunker)",
)
def t25_content_defined_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS/backup-dedup primitive):
    a chunk boundary falls wherever the hash of the local 8-byte window
    hits a target residue (1-in-32), so boundaries are anchored to
    CONTENT, not offsets — insert a byte and only the neighboring chunks
    change, unlike t23's fixed windows, where every downstream chunk
    shifts.  Emitted content-addressed (md5 per chunk) for the chunk
    store.  Plan (see :func:`_cdc_chunk_relation`): one narrow
    vectorized Arrow pass (MapInPandas, numpy Horner boundary scan) —
    ZERO Exchange, zero Window, zero Generate; cost linear in doc
    length and text never leaves its scan task."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") >= 8)
    return _cdc_chunk_relation(d, ["doc_id"])


@register(
    "x48_chunk_dedup_ratio",
    oracle=f"""
    WITH pos AS (
        SELECT doc_id, source, text, length(text) AS n,
               unnest(range(1, greatest(length(text) - 7, 0) + 1)) AS i
        FROM documents WHERE length(text) >= 8
    ),
    b AS (
        SELECT doc_id, source, text, n, i
        FROM pos
        WHERE i = 1
           OR ({_CDC_B}) % 32 = 0
    ),
    c AS (
        SELECT doc_id, source, text, i AS start_pos,
               coalesce(lead(i) OVER (PARTITION BY doc_id ORDER BY i), n + 1) - i AS chunk_len
        FROM b
    ),
    h AS (
        SELECT source, chunk_len,
               md5(substr(text, start_pos, chunk_len)) AS chunk_md5
        FROM c
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT chunk_md5) AS BIGINT) AS n_unique,
           CAST(sum(chunk_len) AS BIGINT) AS raw_bytes,
           round(1.0 - CAST(count(DISTINCT chunk_md5) AS DOUBLE) / count(*), 6) AS chunk_dup_rate
    FROM h GROUP BY source
    """,
    survey="NS-text extended (chunk-store dedup ratio: the CDC payoff metric — unique vs total content-addressed chunks per source)",
)
def x48_chunk_dedup_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What CDC chunking buys: per source, total chunks vs DISTINCT
    content-addressed chunks — the storage dedup ratio a chunk store
    realizes (duplicated passages across documents collapse to one
    stored chunk even when no two documents are globally identical,
    which is exactly where document-level d1 sees nothing).  Same chunk
    pipeline as t25 (:func:`_cdc_chunk_relation` — one narrow Arrow
    pass, no Exchange carries text), one extra distinct aggregate:
    the only shuffle in the plan is the final per-source aggregate over
    (source, chunk_len, chunk_md5) rows."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") >= 8)
    hashes = _cdc_chunk_relation(d, ["source"]).select(
        "source", "chunk_len", "chunk_md5"
    )
    return hashes.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.countDistinct("chunk_md5").cast("bigint").alias("n_unique"),
        F.sum("chunk_len").cast("bigint").alias("raw_bytes"),
        F.round(
            1.0 - F.countDistinct("chunk_md5").cast("double") / F.count("*"),
            6,
        ).alias("chunk_dup_rate"),
    )


@register(
    "t26_chat_turns_audit",
    oracle="""
    WITH t AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type IN ('purchase', 'signup') THEN 'assistant'
                    ELSE 'user' END AS role
        FROM events
    ),
    o AS (
        SELECT user_id, role,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS turn,
               lag(role) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_role
        FROM t
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(sum(CASE WHEN prev_role IS NOT NULL AND prev_role = role
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_role_repeats,
           min(CASE WHEN turn = 1 THEN role END) = 'user' AS starts_with_user,
           max(CASE WHEN turn = n.mx THEN role END) = 'assistant' AS ends_with_assistant
    FROM o JOIN (SELECT user_id, max(turn) AS mx FROM o GROUP BY user_id) n USING (user_id)
    GROUP BY user_id
    """,
    survey="NS-text extended (SFT conversation audit: role alternation, first/last-turn contracts per dialogue)",
)
def t26_chat_turns_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instruction-data validation, the gate every SFT corpus passes
    before a tokenizer sees it: treat each user's event stream as a
    dialogue (deterministic role mapping), and audit the structural
    contracts chat templates assume — no consecutive same-role turns,
    opens with 'user', closes with 'assistant'.  Per-dialogue violation
    counts, not a filter: the curation layer decides repair vs drop.

    Window-with-carry (round 8, VERDICT r7 #7): the audit used one
    window partitioned by user — a hot dialogue (one user owning 30% of
    the stream, the skew tier's shape) serialized in a single task.  All
    four audit columns decompose over TIME BUCKETS: per-(user, day)
    stats run in the bucketed window (hot user parallelizes across its
    days), and adjacency across bucket boundaries is reconstructed on
    the tiny per-(user, day) relation — each bucket's first/last role,
    lag over buckets (the carry), repeats = within-bucket repeats +
    boundary matches.  The per-user sequential floor drops from the hot
    user's EVENT count to its per-day event count; the stitch window
    handles |days| rows per user, not |events|."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.to_date("ts").alias("_bkt"),
        F.when(
            F.col("event_type").isin("purchase", "signup"), "assistant"
        )
        .otherwise("user")
        .alias("role"),
    )
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    wb = W.partitionBy("user_id", "_bkt").orderBy("ts", "event_id")
    x = t.withColumn("_prev_in", F.lag("role").over(wb))
    per_bkt = x.groupBy("user_id", "_bkt").agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(
                F.col("_prev_in").isNotNull()
                & (F.col("_prev_in") == F.col("role")),
                1,
            ).otherwise(0)
        ).alias("rep_in"),
        F.min_by("role", ordk).alias("first_role"),
        F.max_by("role", ordk).alias("last_role"),
    )
    wu = W.partitionBy("user_id").orderBy("_bkt")
    st = per_bkt.withColumn("_carry", F.lag("last_role").over(wu))
    return st.groupBy("user_id").agg(
        F.sum("n").cast("bigint").alias("n_turns"),
        (
            F.sum("rep_in")
            + F.sum(
                F.when(
                    F.col("_carry").isNotNull()
                    & (F.col("_carry") == F.col("first_role")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("n_role_repeats"),
        (F.min_by("first_role", F.col("_bkt")) == "user").alias(
            "starts_with_user"
        ),
        (F.max_by("last_role", F.col("_bkt")) == "assistant").alias(
            "ends_with_assistant"
        ),
    )


@register(
    "t27_hashed_linear_quality",
    oracle=f"""
    WITH n AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (
        SELECT doc_id,
               toks || list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]) AS grams
        FROM n
    ),
    s AS (
        SELECT doc_id,
               len(grams) AS n_feat,
               list_sum(list_transform(grams,
                 x -> ((('0x' || substr(md5('qf:' || x), 1, 8))::BIGINT % 65536) % 2001 - 1000) / 1000.0)) AS wsum
        FROM g
    )
    SELECT doc_id,
           CAST(n_feat AS BIGINT) AS n_features,
           round(CASE WHEN n_feat = 0 THEN 0.0 ELSE wsum / n_feat END, 6) AS mean_w,
           round(1.0 / (1.0 + exp(-4.0 * (0.1 + CASE WHEN n_feat = 0 THEN 0.0 ELSE wsum / n_feat END))), 6) AS prob,
           round(1.0 / (1.0 + exp(-4.0 * (0.1 + CASE WHEN n_feat = 0 THEN 0.0 ELSE wsum / n_feat END))), 6) > 0.5 AS accept
    FROM s
    """,
    survey="NS-text extended (fastText-style quality classifier INFERENCE: hashed unigram+bigram features → linear score → sigmoid gate, zero shuffles)",
)
def t27_hashed_linear_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier INFERENCE at corpus scale, the fastText linear
    shape: features are hashed word unigrams + bigrams (hashing trick,
    2^16 buckets), the model is a weight per bucket (here a deterministic
    md5-derived stand-in for trained weights — swap the weight expression
    for a broadcast lookup of real weights), and the document score is
    sigmoid(bias + mean feature weight) with a 0.5 accept gate.

    The 100 TB shape is the point: the whole classifier is per-row array
    expressions (transform + aggregate inside codegen) — ZERO shuffles,
    zero Python, no explode; scoring a petabyte is one embarrassingly
    parallel scan.  Contrast t14, whose LM score needs corpus-level count
    tables; a hashed linear model ships the table IN the expression (or
    as one broadcast array), which is why fastText-style filters are the
    workhorse for pretraining-corpus quality gates."""
    d = load_table(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    n = d.select("doc_id", toks.alias("toks"))
    grams = F.concat(
        F.col("toks"),
        F.when(
            F.size("toks") >= 2,
            F.zip_with(
                F.slice("toks", 1, F.size("toks") - 1),
                F.slice(F.col("toks"), 2, F.size("toks") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).otherwise(F.array()),
    )
    bucket = lambda x: (
        F.conv(F.substring(F.md5(F.concat(F.lit("qf:"), x)), 1, 8), 16, 10)
        .cast("bigint")
        % 65536
    )
    weight = lambda x: (bucket(x) % 2001 - 1000) / 1000.0
    s = n.select(
        "doc_id",
        F.size(grams).cast("bigint").alias("n_features"),
        F.aggregate(
            grams, F.lit(0.0), lambda acc, x: acc + weight(x)
        ).alias("wsum"),
    )
    mean_w = F.when(F.col("n_features") == 0, 0.0).otherwise(
        F.col("wsum") / F.col("n_features")
    )
    prob = F.round(1.0 / (1.0 + F.exp(-4.0 * (0.1 + mean_w))), 6)
    return s.select(
        "doc_id",
        "n_features",
        F.round(mean_w, 6).alias("mean_w"),
        prob.alias("prob"),
        (prob > 0.5).alias("accept"),
    )


@register(
    "d23_chunk_contamination",
    oracle=f"""
    WITH pos AS (
        SELECT doc_id, text, length(text) AS n,
               unnest(range(1, greatest(length(text) - 7, 0) + 1)) AS i
        FROM documents WHERE length(text) >= 8
    ),
    b AS (
        SELECT doc_id, text, n, i
        FROM pos
        WHERE i = 1
           OR ({_CDC_B}) % 32 = 0
    ),
    c AS (
        SELECT doc_id, text, i AS start_pos,
               coalesce(lead(i) OVER (PARTITION BY doc_id ORDER BY i), n + 1) - i AS chunk_len
        FROM b
    ),
    h AS (
        SELECT DISTINCT doc_id,
               md5(substr(text, start_pos, chunk_len)) AS chunk_md5,
               chunk_len
        FROM c
    ),
    bench AS (SELECT doc_id AS bench_doc_id, chunk_md5, chunk_len FROM h WHERE doc_id % 20 = 0),
    corpus AS (SELECT doc_id AS corpus_doc_id, chunk_md5 FROM h WHERE doc_id % 20 <> 0),
    bt AS (SELECT bench_doc_id, sum(chunk_len) AS bench_chars FROM bench GROUP BY bench_doc_id),
    ov AS (
        SELECT corpus_doc_id, bench_doc_id,
               CAST(count(*) AS BIGINT) AS n_shared_chunks,
               CAST(sum(chunk_len) AS BIGINT) AS shared_chars
        FROM corpus JOIN bench USING (chunk_md5)
        GROUP BY corpus_doc_id, bench_doc_id
    )
    SELECT o.corpus_doc_id, o.bench_doc_id, o.n_shared_chunks, o.shared_chars,
           round(CAST(o.shared_chars AS DOUBLE) / bt.bench_chars, 6) AS contamination
    FROM ov o JOIN bt USING (bench_doc_id)
    """,
    survey="NS-dedup extended (substring-level benchmark contamination via content-defined chunks — catches verbatim spans n-gram sampling can miss)",
)
def d23_chunk_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-granular decontamination: d10 samples word-5-grams; this
    pass content-addresses every CDC chunk (t25's rolling-hash
    boundaries) and reports, per (corpus doc, benchmark doc) pair, how
    many chunks and how many CHARACTERS of the benchmark doc appear
    verbatim in the corpus doc — the evidence a 'remove or keep' appeal
    actually needs.  Chunk boundaries are anchored to content, so a
    verbatim span is shared chunk-for-chunk even when its byte offset
    differs between the two documents (the property fixed windows lack).

    Scale shape: identical to d10 — the benchmark side is tiny, its
    chunk table broadcasts, the corpus chunk stream never shuffles for
    the join; per-doc DISTINCT chunks make shared_chars a true matched
    character count (same md5 ⇒ same content ⇒ same length).  Chunking
    itself is :func:`_cdc_chunk_relation` — one narrow Arrow pass, so
    the first Exchange anywhere in the plan is the (doc_id, md5, len)
    DISTINCT, which never carries document text."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") >= 8)
    h = (
        _cdc_chunk_relation(d, ["doc_id"])
        .select("doc_id", "chunk_md5", "chunk_len")
        .distinct()
    )
    bench = h.where(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("bench_doc_id"), "chunk_md5", "chunk_len"
    )
    corpus = h.where(F.col("doc_id") % 20 != 0).select(
        F.col("doc_id").alias("corpus_doc_id"), "chunk_md5"
    )
    bt = bench.groupBy("bench_doc_id").agg(
        F.sum("chunk_len").alias("bench_chars")
    )
    ov = (
        corpus.join(F.broadcast(bench), "chunk_md5")
        .groupBy("corpus_doc_id", "bench_doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shared_chunks"),
            F.sum("chunk_len").cast("bigint").alias("shared_chars"),
        )
    )
    return ov.join(F.broadcast(bt), "bench_doc_id").select(
        "corpus_doc_id",
        "bench_doc_id",
        "n_shared_chunks",
        "shared_chars",
        F.round(
            F.col("shared_chars").cast("double") / F.col("bench_chars"), 6
        ).alias("contamination"),
    )


@register(
    "d25_chunk_contamination_capped",
    oracle=f"""
    WITH pos AS (
        SELECT doc_id, text, length(text) AS n,
               unnest(range(1, greatest(length(text) - 7, 0) + 1)) AS i
        FROM documents WHERE length(text) >= 8
    ),
    b AS (
        SELECT doc_id, text, n, i
        FROM pos
        WHERE i = 1
           OR ({_CDC_B}) % 32 = 0
    ),
    c AS (
        SELECT doc_id, text, i AS start_pos,
               coalesce(lead(i) OVER (PARTITION BY doc_id ORDER BY i), n + 1) - i AS chunk_len
        FROM b
    ),
    h AS (
        SELECT DISTINCT doc_id,
               md5(substr(text, start_pos, chunk_len)) AS chunk_md5,
               chunk_len
        FROM c
    ),
    bench AS (SELECT doc_id AS bench_doc_id, chunk_md5, chunk_len FROM h WHERE doc_id % 20 = 0),
    corpus AS (SELECT doc_id AS corpus_doc_id, chunk_md5 FROM h WHERE doc_id % 20 <> 0),
    bt AS (SELECT bench_doc_id, sum(chunk_len) AS bench_chars FROM bench GROUP BY bench_doc_id),
    ov AS (
        SELECT corpus_doc_id, bench_doc_id,
               CAST(count(*) AS BIGINT) AS n_shared_chunks,
               CAST(sum(chunk_len) AS BIGINT) AS shared_chars
        FROM corpus JOIN bench USING (chunk_md5)
        GROUP BY corpus_doc_id, bench_doc_id
    ),
    pairs AS (
        SELECT o.bench_doc_id, o.corpus_doc_id, o.n_shared_chunks, o.shared_chars,
               round(CAST(o.shared_chars AS DOUBLE) / bt.bench_chars, 6) AS contamination
        FROM ov o JOIN bt USING (bench_doc_id)
    ),
    r AS (
        SELECT *,
               CAST(row_number() OVER (
                   PARTITION BY bench_doc_id
                   ORDER BY contamination DESC, corpus_doc_id ASC) AS INTEGER) AS rank_k,
               CAST(count(*) OVER (PARTITION BY bench_doc_id) AS BIGINT) AS n_offending_docs,
               CAST(sum(shared_chars) OVER (PARTITION BY bench_doc_id) AS BIGINT) AS total_shared_chars
        FROM pairs
    )
    SELECT bench_doc_id, rank_k, corpus_doc_id, n_shared_chunks, shared_chars,
           contamination, n_offending_docs, total_shared_chars
    FROM r WHERE rank_k <= 5
    """,
    survey="NS-dedup extended (d23's contamination evidence with a per-benchmark-doc top-k cap + exact totals — the d14 output-bound discipline)",
)
def d25_chunk_contamination_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d23 with a bounded OUTPUT (VERDICT r6 #3): at the 100x probe tier
    the uncapped pair report emitted 81 M rows — a contamination report
    that can exceed its input is a sink hazard.  This variant keeps the
    d14 discipline: per benchmark doc, the top-k (k=5) most-contaminating
    corpus docs, PLUS exact totals (how many corpus docs share ≥1 chunk,
    and the total shared characters) so the cap loses no accounting —
    output rows ≤ k·|bench| by construction.

    Plan: d23's pair relation (map-side chunking, broadcast benchmark
    side), then ONE window partitioned by bench_doc_id computes the rank
    and both exact totals on the same shuffle — no second aggregate, no
    self-join, and the window partitions are per-benchmark-doc (bounded
    by the corpus-doc fan-in, never global)."""
    pairs = d23_chunk_contamination(spark, sf_dir)
    wb = W.partitionBy("bench_doc_id")
    ranked = pairs.select(
        "bench_doc_id",
        F.row_number()
        .over(
            wb.orderBy(
                F.col("contamination").desc(), F.col("corpus_doc_id").asc()
            )
        )
        .cast("int")
        .alias("rank_k"),
        "corpus_doc_id",
        "n_shared_chunks",
        "shared_chars",
        "contamination",
        F.count("*").over(wb).cast("bigint").alias("n_offending_docs"),
        F.sum("shared_chars").over(wb).cast("bigint").alias(
            "total_shared_chars"
        ),
    )
    return ranked.where(F.col("rank_k") <= 5)


@register(
    "t28_rule_filter_report",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               {_TOKS} AS toks,
               length(text) AS n_chr,
               text
        FROM documents
    ),
    r AS (
        SELECT doc_id,
               CASE WHEN len(toks) < 5 THEN 1 ELSE 0 END AS r_too_short,
               CASE WHEN len(toks) = 0 OR n_chr = 0 THEN 1
                    WHEN (CAST(n_chr - len(toks) + 1 AS DOUBLE) / len(toks)) < 3.0
                      OR (CAST(n_chr - len(toks) + 1 AS DOUBLE) / len(toks)) > 10.0
                    THEN 1 ELSE 0 END AS r_word_length,
               CASE WHEN len(toks) > 0
                     AND CAST(len(list_filter(toks, x -> x = toks[1])) AS DOUBLE)
                         / len(toks) > 0.2
                    THEN 1 ELSE 0 END AS r_repetitive,
               CASE WHEN contains(lower(text), 'lorem ipsum') THEN 1 ELSE 0 END AS r_boilerplate
        FROM t
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(r_too_short) AS BIGINT) AS drop_too_short,
           CAST(sum(r_word_length) AS BIGINT) AS drop_word_length,
           CAST(sum(r_repetitive) AS BIGINT) AS drop_repetitive,
           CAST(sum(r_boilerplate) AS BIGINT) AS drop_boilerplate,
           CAST(sum(CASE WHEN r_too_short + r_word_length + r_repetitive + r_boilerplate = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(CAST(sum(CASE WHEN r_too_short + r_word_length + r_repetitive + r_boilerplate = 0
                               THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS keep_rate
    FROM r
    """,
    survey="NS-text extended (C4-style rule-cascade filter with PER-RULE drop accounting — the corpus-cleaning observability readout)",
)
def t28_rule_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4-style heuristic cleaning cascade (Raffel et al. 2020) with
    the accounting a production pipeline needs: each rule — too few
    words, implausible mean word length, head-token repetition,
    boilerplate marker — reports HOW MANY documents it would drop, plus
    the overall keep rate, so a rule that suddenly eats a corpus slice is
    visible before anything is deleted (rules mask independently; the
    kept set requires all clear).  Every rule is a codegen expression
    over the token array; the whole report is one scan + one aggregate —
    zero shuffles beyond the final 1-row reduce, trivially extendable
    with more WHEN columns."""
    d = load_table(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    t = d.select(
        toks.alias("toks"), F.length("text").alias("n_chr"), F.lower("text").alias("lt")
    )
    n_tok = F.size("toks")
    mean_wlen = (F.col("n_chr") - n_tok + 1).cast("double") / n_tok
    r = t.select(
        F.when(n_tok < 5, 1).otherwise(0).alias("r_too_short"),
        F.when((n_tok == 0) | (F.col("n_chr") == 0), 1)
        .when((mean_wlen < 3.0) | (mean_wlen > 10.0), 1)
        .otherwise(0)
        .alias("r_word_length"),
        F.when(
            (n_tok > 0)
            & (
                F.size(
                    F.filter("toks", lambda x: x == F.element_at("toks", 1))
                ).cast("double")
                / n_tok
                > 0.2
            ),
            1,
        )
        .otherwise(0)
        .alias("r_repetitive"),
        F.when(F.col("lt").contains("lorem ipsum"), 1).otherwise(0).alias(
            "r_boilerplate"
        ),
    )
    all_clear = (
        F.col("r_too_short")
        + F.col("r_word_length")
        + F.col("r_repetitive")
        + F.col("r_boilerplate")
        == 0
    )
    return r.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("r_too_short").cast("bigint").alias("drop_too_short"),
        F.sum("r_word_length").cast("bigint").alias("drop_word_length"),
        F.sum("r_repetitive").cast("bigint").alias("drop_repetitive"),
        F.sum("r_boilerplate").cast("bigint").alias("drop_boilerplate"),
        F.sum(F.when(all_clear, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.round(
            F.sum(F.when(all_clear, 1).otherwise(0)).cast("double") / F.count("*"),
            6,
        ).alias("keep_rate"),
    )
