"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are built-in ``pyspark.sql.functions`` (JVM-side, whole-stage codegen) —
no Python UDFs.  Each operator has a matching DuckDB-oracle SQL in __spark_entry__.py.

Operators: language-ID (stopword-vote heuristic), quality scoring, token counting,
shingle counting, document fingerprinting (rolling polynomial hash + md5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocr_engine_spark.operators.relational import load

# tiny per-language stopword lists for the n-gram/stopword-vote heuristic; the vote is
# deterministic with ties broken by fixed language order (like the parser vote, E4)
LANG_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to"],
    "de": ["der", "die", "das", "und", "nicht"],
    "es": ["el", "la", "los", "que", "y"],
    "fr": ["le", "les", "des", "et", "un"],
    "zh": ["的", "是", "了", "在", "我"],
}
LANG_ORDER = ["en", "de", "es", "fr", "zh"]


def _tokens(col: str = "text"):
    return F.split(F.trim(F.col(col)), " +")


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish-regex token counting per document."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_tokens()).cast("bigint").alias("n_tokens"),
        # BPE-ish proxy: alnum runs + standalone punctuation marks
        F.size(
            F.split(F.trim(F.regexp_replace(F.col("text"), r"([^\w\s])", r" $1 ")), r"\s+")
        ).cast("bigint").alias("n_bpe_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID: score = |tokens ∩ stopwords(lang)|, argmax with
    fixed tie order (the detection-count orientation vote A6 at the text layer)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.array_distinct(_tokens())
    scored = docs.select(
        "doc_id",
        *[
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])))
            .alias(f"score_{lang}")
            for lang in LANG_ORDER
        ],
    )
    pred = F.lit(LANG_ORDER[0])
    best = F.col(f"score_{LANG_ORDER[0]}")
    for lang in LANG_ORDER[1:]:  # strictly-greater keeps the first language on ties
        pred = F.when(F.col(f"score_{lang}") > best, F.lit(lang)).otherwise(pred)
        best = F.greatest(best, F.col(f"score_{lang}"))
    return scored.select(
        "doc_id", pred.alias("pred_lang"), best.cast("bigint").alias("best_score"))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/punct/stopword-ratio quality scoring (rounded for cross-engine parity)."""
    docs = load(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("double")
    n_punct = (n_chars - F.length(F.regexp_replace(F.col("text"), r"[.,;:!?]", "")))
    n_tok = F.size(_tokens()).cast("double")
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(_tokens()),
            F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]]),
        )
    ).cast("double")
    mean_tok_len = (n_chars - n_tok + 1) / n_tok  # chars minus separators per token
    return docs.select(
        "doc_id",
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
        F.round(n_stop / F.greatest(n_tok, F.lit(1.0)), 6).alias("stop_ratio"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        (n_tok.cast("bigint")).alias("n_tokens"),
    )


def q_shingle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 8-char shingles over the first 200 chars (near-dup feature base)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        # substring(text, i, 8) == substring(substring(text,1,200), i, 8) for every
        # generated i (windows never cross position 200), and avoids re-slicing a
        # 200-char copy per lambda element (lambda bodies re-evaluate per element)
        F.expr(
            "cast(size(array_distinct(transform(sequence(1, greatest(least(length(text), 200)-7, 1)),"
            " i -> substring(text, i, 8)))) as bigint)"
        ).alias("n_shingles"),
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 head-fingerprint + rolling polynomial hash
    (acc*31 + code) mod 1e9+7 over the first 64 chars (overflow-free under ANSI)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.substring("text", 1, 64)).alias("md5_head"),
        F.expr(
            "aggregate(sequence(1, least(length(text), 64)), 0L,"
            " (acc, i) -> (acc * 31 + ascii(substring(text, i, 1))) % 1000000007)"
        ).alias("rolling_hash"),
    )


def quality_filter(docs: DataFrame, min_tokens: int = 10,
                   max_punct_ratio: float = 0.1,
                   min_stop_ratio: float = 0.02) -> DataFrame:
    """The keep/drop decision stage of a training-data pipeline: a document
    survives iff it clears token-count, punctuation-density, and stopword-density
    thresholds (the classic Gopher/C4-style heuristics over the same ratios
    q_quality_score reports).  Pure built-in expressions — the filter pushes into
    the scan's surviving columns and pipelines with any downstream dedup stage
    without an extra pass."""
    n_chars = F.length("text").cast("double")
    n_punct = (n_chars - F.length(F.regexp_replace(F.col("text"), r"[.,;:!?]", "")))
    n_tok = F.size(_tokens()).cast("double")
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(_tokens()),
            F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]]),
        )
    ).cast("double")
    return (
        docs.withColumn("n_tokens", n_tok.cast("bigint"))
        .withColumn("punct_ratio", F.round(n_punct / n_chars, 6))
        .withColumn("stop_ratio",
                    F.round(n_stop / F.greatest(n_tok, F.lit(1.0)), 6))
        .where((F.col("n_tokens") >= min_tokens)
               & (F.col("punct_ratio") <= max_punct_ratio)
               & (F.col("stop_ratio") >= min_stop_ratio))
    )


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return quality_filter(docs).select(
        "doc_id", "source", "n_tokens", "punct_ratio", "stop_ratio")


def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: document frequency + total occurrence count
    per token, top-50 by df (the table a tokenizer/stopword build reads, and the
    same df computation the prefix-filtered Jaccard join uses internally).  One
    map-side-combinable aggregation over exploded tokens; the shuffle carries one
    row per distinct token, never the corpus."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", F.explode(F.array_distinct(_tokens())).alias("tok"))
    occ = docs.select("doc_id", F.explode(_tokens()).alias("tok"))
    df_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    occ_counts = occ.groupBy("tok").agg(F.count(F.lit(1)).alias("occurrences"))
    return (
        df_counts.join(occ_counts, "tok")
        .orderBy(F.desc("df"), F.asc("tok"))
        .limit(50)
        .select("tok", "df", "occurrences")
    )


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 distinctive tokens by tf x inverse-document-frequency.

    The weight is the LOG-FREE variant tf * N / df: every operand is an exact
    integer, so the single double division is bit-identical across engines
    (ln() would risk last-ULP libm differences at the rounding boundary).
    Plan shape: one explode -> two map-side-combinable aggregations (term
    frequency, then document frequency over the tf table — the vocabulary-sized
    shuffle, not the corpus-sized one) -> broadcast-joined scalar N -> windowed
    top-3 per doc with a total tie-break order."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " +")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfx = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    weighted = (
        tf.join(dfx, "tok").crossJoin(F.broadcast(total))
        .withColumn(
            "weight",
            (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("weight"), F.asc("tok"))
    return (
        weighted.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("doc_id", "tok", "tf", "df", "weight", "rank")
    )
