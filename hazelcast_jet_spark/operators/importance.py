"""Data-selection importance weights — DSIR (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling").

Given a RAW crawl corpus and a small TARGET corpus (the distribution you
want more of — e.g. curated reference text), DSIR scores every raw
document by the log-likelihood ratio of its hashed n-gram features under
bag-of-ngrams models of target vs raw:

    w(doc) = Σ_{g ∈ ngrams(doc)}  ln p_target(bucket(g))
                                 - ln p_raw(bucket(g))

then resamples raw docs proportional to exp(w).  Hashing n-grams into a
fixed bucket space keeps both models a bounded table regardless of
vocabulary size — the property that makes this a two-aggregate Spark job
instead of an open vocabulary join.

Scale shape (no reference analog; beyond-inventory LLM-pipeline op):

1. one explode of the corpus into (doc, bucket) pairs — bucket is the
   first ``bucket_hex`` hex chars of md5(ngram), so the feature space is
   16^bucket_hex buckets and needs NO modulo arithmetic to be
   engine-portable;
2. ONE aggregation over buckets computing raw and target counts together
   (the target flag rides the same rows — the target corpus is a
   predicate over the raw corpus, the common "quality subset" setup);
   an unpartitioned window over the ≤16^bucket_hex-row counts table
   derives the totals and per-bucket log-ratios without any driver
   round-trip;
3. the tiny log-ratio table joins back BROADCAST onto the exploded
   pairs; per-doc weights accumulate in DECIMAL(28,12) (exact,
   order-independent) so results hash identically on any engine.

Smoothing: add-one on both numerators against ``B = 16^bucket_hex``
denominator inflation — every bucket has a finite probability under both
models, so no doc weight is ±inf.

Cross-engine determinism: ``ln`` is bit-identical across engines
(probed; same discipline as text.unigram_lm_score), inputs to every
``ln`` are exact integers, and the two-term groupings are fixed as
``(ln(c+1) - ln(N+B))`` per model before the subtraction, so the double
arithmetic is reproducible term for term.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hazelcast_jet_spark.operators.text import normalize_text, word_ngrams

__all__ = ["dsir_weights", "hashed_classifier_score",
           "fit_hashed_classifier"]


def dsir_weights(
    df: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    bucket_hex: int = 3,
    out_col: str = "weight",
) -> DataFrame:
    """Per-document DSIR importance weight of every raw doc.

    ``target_pred``: boolean Column selecting the target subset within
    ``df`` (rows where it is true train the target model; ALL rows train
    the raw model and are scored).  Docs with fewer than ``n`` words
    have no features and are omitted (their weight is an empty sum).

    Returns ``(id_col, n_grams, out_col)`` — ``n_grams`` the feature
    count, ``out_col`` the summed log-ratio (resample ∝ exp(weight)).
    """
    B = 16 ** bucket_hex
    toks = df.select(
        F.col(id_col),
        target_pred.cast("boolean").alias("__is_target"),
        F.split(normalize_text(text_col), " ").alias("__t"),
    )
    # pairs feeds BOTH the model aggregate and the scoring join — persist
    # so the corpus normalize/ngram/md5 pipeline executes once, not twice
    # (the dedup LRU registry bounds cache lifetime across queries)
    from hazelcast_jet_spark.operators.dedup import _register_cache

    pairs = (
        toks.filter(F.size("__t") >= n)
        .select(
            id_col, "__is_target",
            F.explode(word_ngrams("__t", n)).alias("__gram"),
        )
        .select(
            id_col, "__is_target",
            F.substring(F.md5("__gram"), 1, bucket_hex).alias("__bucket"),
        )
        .persist()
    )
    _register_cache(pairs)
    counts = pairs.groupBy("__bucket").agg(
        F.count(F.lit(1)).alias("__c_raw"),
        F.sum(F.when(F.col("__is_target"), 1).otherwise(0)).alias("__c_tgt"),
    )
    from pyspark.sql.window import Window

    all_w = Window.partitionBy()  # ≤ B rows: a single tiny partition
    lr = counts.select(
        "__bucket",
        (
            (F.log(F.col("__c_tgt") + F.lit(1))
             - F.log(F.sum("__c_tgt").over(all_w) + F.lit(B)))
            - (F.log(F.col("__c_raw") + F.lit(1))
               - F.log(F.sum("__c_raw").over(all_w) + F.lit(B)))
        ).alias("__lr"),
    )
    return (
        pairs.join(F.broadcast(lr), "__bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.col("__lr").cast("decimal(28,12)")).alias("__s"),
        )
        .select(
            id_col, "n_grams",
            F.col("__s").cast("double").alias(out_col),
        )
    )


def hashed_classifier_score(
    df: DataFrame,
    weights: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    bucket_hex: int = 3,
    bias: float = 0.0,
    out_col: str = "score",
    prob_col: str | None = None,
) -> DataFrame:
    """Linear-classifier inference over hashed n-gram features — the
    "offline-trained quality classifier applied at corpus scale" step
    (the fasttext-style LID / GPT-3-era LR quality-filter shape): a
    model is trained elsewhere on labeled docs, its weight vector is
    hashed into the same ``16^bucket_hex`` feature space DSIR uses, and
    scoring is ``bias + Σ_g w(bucket(g))`` per document.

    ``weights`` maps bucket hex-prefixes to model weights (≤ 16^
    bucket_hex entries — bounded regardless of vocabulary, the hashing-
    trick property).  Buckets absent from the map score 0.

    Scale shape: one explode into (doc, bucket) pairs, the weight table
    broadcast-joined back (left), per-doc sums in DECIMAL(28,12) —
    exact and order-independent, so weights are effectively rounded to
    12 dp and the result hashes identically on any engine.  The corpus
    is never shuffled except by the final per-doc aggregate.

    ``prob_col`` adds the sigmoid ``1/(1+exp(−score))`` (double libm —
    monotone in score; use ``out_col`` for bit-exact comparisons).
    """
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(b, float(w)) for b, w in sorted(weights.items())],
        "__bucket string, __w double")
    toks = df.select(
        F.col(id_col), F.split(normalize_text(text_col), " ").alias("__t"))
    pairs = (
        toks.filter(F.size("__t") >= n)
        .select(id_col, F.explode(word_ngrams("__t", n)).alias("__gram"))
        .select(id_col,
                F.substring(F.md5("__gram"), 1, bucket_hex).alias("__bucket"))
    )
    scored = pairs.join(F.broadcast(wdf), "__bucket", "left")
    score = F.col("__s").cast("double") + F.lit(float(bias))
    extra = []
    if prob_col:
        extra.append((F.lit(1.0) / (F.lit(1.0) + F.exp(-score))).alias(prob_col))
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("__w"), F.lit(0.0))
                  .cast("decimal(28,12)")).alias("__s"),
        )
        .select(id_col, "n_grams", score.alias(out_col), *extra)
    )


def fit_hashed_classifier(
    df: DataFrame,
    label_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    bucket_hex: int = 3,
    lr: float = 1.0,
    iters: int = 15,
    l2: float = 0.0,
):
    """Train the quality classifier IN-ENGINE: batch-gradient logistic
    regression over hashed n-gram counts — the fit half whose weights
    :func:`hashed_classifier_score` applies at corpus scale.

    ``label_pred`` is the boolean label column (e.g. "is curated
    source").  Returns ``(weights: dict[bucket, float], bias: float)``
    in exactly the format ``hashed_classifier_score`` consumes.

    Scale shape, per iteration: score = (doc, bucket) pairs ⋈ broadcast
    weight table → per-doc sums; residuals join back onto the pairs by
    doc (hash join, reuses the pairs partitioning) → per-bucket
    gradient sums — ≤ 16^bucket_hex rows to the driver, never a
    feature matrix.  The pairs/labels persist across iterations, so
    each pass is aggregation-only.  Train on a deterministic sample at
    100 TB (the kmeans/pq_fit discipline); LR quality needs labeled
    examples, not the corpus.
    """
    import numpy as np

    from hazelcast_jet_spark.operators.dedup import _register_cache

    spark = df.sparkSession
    toks = df.select(
        F.col(id_col).alias("__id"),
        label_pred.cast("double").alias("__y"),
        F.split(normalize_text(text_col), " ").alias("__t"),
    )
    pairs = (
        toks.filter(F.size("__t") >= n)
        .select("__id", F.explode(word_ngrams("__t", n)).alias("__gram"))
        .select("__id",
                F.substring(F.md5("__gram"), 1, bucket_hex).alias("__bucket"))
        .persist()
    )
    labels = toks.select("__id", "__y").persist()
    _register_cache(pairs)
    _register_cache(labels)
    n_docs = labels.count()
    if n_docs == 0:
        raise ValueError("fit_hashed_classifier on an empty DataFrame")

    w: dict[str, float] = {}
    b = 0.0
    for _ in range(iters):
        if w:
            wdf = spark.createDataFrame(
                sorted(w.items()), "__bucket string, __w double")
            scores = (
                pairs.join(F.broadcast(wdf), "__bucket", "left")
                .groupBy("__id")
                .agg(F.sum(F.coalesce(F.col("__w"), F.lit(0.0))).alias("__s"))
            )
        else:
            scores = pairs.groupBy("__id").agg(F.lit(0.0).alias("__s"))
        resid = (
            labels.join(scores, "__id", "left")
            .select(
                "__id",
                ((F.lit(1.0) / (F.lit(1.0) + F.exp(
                    -(F.lit(b) + F.coalesce(F.col("__s"), F.lit(0.0))))))
                 - F.col("__y")).alias("__r"),
            )
        )
        grad_rows = (
            pairs.join(resid, "__id")
            .groupBy("__bucket").agg(F.sum("__r").alias("__g"))
            .collect()
        )
        grad_b = resid.agg(F.sum("__r")).collect()[0][0]
        scale = lr / n_docs
        b -= scale * grad_b
        for row in grad_rows:
            g = row["__g"] + l2 * w.get(row["__bucket"], 0.0)
            w[row["__bucket"]] = w.get(row["__bucket"], 0.0) - scale * g
    return w, b


def lift_table(df: DataFrame, score_col: str, label_col: str,
               id_col: str = "doc_id", n_bins: int = 10,
               round_digits: int = 6) -> DataFrame:
    """Gains/lift table of a ranked selection policy: rank rows by
    ``score_col`` (desc, ties on ``id_col``), cut into ``n_bins``
    ntile bins, and report per bin the positive rate, the cumulative
    share of ALL positives captured so far, and the lift over the base
    rate — the decide-the-threshold curve for every quality-classifier
    filtering stage (a classifier with great calibration but lift ~1 in
    the top decile selects nothing).

    One ntile window over the scored table (|rows| of the SCORED frame,
    not the corpus — score upstream, rank here), one K-bounded
    aggregate, window cumsums on the n_bins-row result.

    Returns ``(bin INT, n_rows, n_pos, pos_rate, cum_pos_share, lift)``
    ordered by bin (bin 1 = highest scores).
    """
    from pyspark.sql import Window

    ranked = df.select(
        F.col(label_col).cast("bigint").alias("__pos"),
        F.ntile(n_bins).over(
            Window.orderBy(F.col(score_col).desc(), F.col(id_col)))
        .alias("bin"))
    g = ranked.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("__pos").alias("n_pos"))
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    tot_rows = F.sum("n_rows").over(wall).cast("double")
    tot_pos = F.sum("n_pos").over(wall).cast("double")
    pos_rate = F.col("n_pos").cast("double") / F.col("n_rows").cast("double")
    base_rate = tot_pos / tot_rows
    return (g.select(
        "bin", "n_rows", "n_pos",
        (F.round(pos_rate, round_digits) + F.lit(0.0)).alias("pos_rate"),
        F.when(tot_pos > 0,
               F.round(F.sum("n_pos").over(wcum).cast("double") / tot_pos,
                       round_digits) + F.lit(0.0)).alias("cum_pos_share"),
        F.when(tot_pos > 0,
               F.round(pos_rate / base_rate, round_digits) + F.lit(0.0))
        .alias("lift"))
        .orderBy("bin"))
