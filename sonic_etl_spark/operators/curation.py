"""End-to-end corpus curation: the composed training-data pipeline.

One operator chaining the engine's LLM-pipeline stages the way a real
pretraining-corpus build does — each stage is an already-verified operator,
this module only composes them:

1. **quality gate** — drop documents below a word-count floor or above a
   punctuation ceiling (``operators.text.quality_features``);
2. **exact dedup** — keep the smallest doc_id per normalized-content
   fingerprint (``operators.text.fingerprint``; one shuffle on the hash);
3. **near-dup dedup** — hyperplane-LSH candidate pairs over the survivors'
   embeddings → connected components → keep the smallest member
   (``operators.similarity.near_dup_pairs`` +
   ``operators.dedup.dedup_keep_canonical``);
4. **corpus stats** — per predicted language (``operators.text.language_id``):
   surviving doc count and total whitespace tokens.

Scale shape: stages 1-2 are narrow maps plus one hash shuffle; stage 3 is
the bucketed pair path (never all-pairs) over an already-filtered corpus;
stage 4 is a narrow map + one small aggregation. Nothing here collects data
rows to the driver.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from sonic_etl_spark.operators import dedup as dedup_ops
from sonic_etl_spark.operators import similarity as sim_ops
from sonic_etl_spark.operators import text as text_ops


def curate_corpus(
    docs: DataFrame,
    emb: DataFrame | None = None,
    *,
    min_words: int = 5,
    max_punct_ratio: float = 0.3,
    near_dup_threshold: float = 0.2,
    near_dup_on: str = "embedding",
    text_jaccard_threshold: float = 0.6,
    id_col: str = "doc_id",
    emb_id_col: str = "vec_id",
    return_docs: bool = False,
) -> DataFrame:
    """Curated per-language corpus stats
    (lang_pred, n_docs, total_tokens) — or, with ``return_docs=True``, the
    curated DOCUMENTS themselves (original columns, survivors only): the
    frame a pipeline actually writes out as its training corpus.

    ``near_dup_on``: 'embedding' (default) finds near-dup pairs through
    the hyperplane-LSH bucket join over ``emb``; 'text' needs no
    embeddings — it uses the df-capped shingle-Jaccard join over the
    documents themselves (pairs with Jaccard ≥ ``text_jaccard_threshold``).
    Both paths feed the same connected-component canonical-keep."""
    q = text_ops.quality_features(docs)
    survivors = docs.join(
        q.select(id_col, "n_words", "punct_ratio"), id_col
    ).where(
        (F.col("n_words") >= min_words)
        & (F.col("punct_ratio") <= max_punct_ratio)
    )

    fp = text_ops.fingerprint(survivors)
    keep_exact = fp.groupBy("fp_sha256").agg(F.min(id_col).alias(id_col))
    survivors = survivors.join(keep_exact.select(id_col), id_col)

    if near_dup_on == "embedding":
        if emb is None:
            raise ValueError(
                "near_dup_on='embedding' needs an embeddings frame; "
                "pass emb= or use near_dup_on='text'"
            )
        surv_emb = emb.join(
            survivors.select(F.col(id_col).alias(emb_id_col)), emb_id_col
        )
        pairs = sim_ops.near_dup_pairs(surv_emb, threshold=near_dup_threshold)
    elif near_dup_on == "text":
        pairs = dedup_ops.ngram_jaccard_pairs(
            survivors, threshold=text_jaccard_threshold
        ).select(
            F.col("doc_a").alias("vec_a"), F.col("doc_b").alias("vec_b")
        )
    else:
        raise ValueError("near_dup_on must be 'embedding' or 'text'")
    final = dedup_ops.dedup_keep_canonical(survivors, pairs, id_col=id_col)

    if return_docs:
        return final.select(*docs.columns)

    lang = text_ops.language_id(final)
    toks = final.select(
        id_col, text_ops.word_count(F.col("text")).cast("long").alias("n_toks")
    )
    return (
        final.select(id_col)
        .join(lang, id_col)
        .join(toks, id_col)
        .groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
        )
    )


# 2^60 — split thresholds live in the 60-bit md5-prefix hash space (the same
# portable hash as operators.sketch; exact integer literals on both engines)
_TWO_POW_60 = 1 << 60


def _split_thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """(name, exclusive upper bound in hash space) per split, cumulative in
    the dict's insertion order; weights are normalized so any positive
    numbers work (98/1/1 == 0.98/0.01/0.01). Computed ONCE driver-side and
    embedded as integer literals in both engines' expressions — no
    cross-engine float rounding can disagree."""
    if not weights:
        raise ValueError("split_dataset: weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"split_dataset: weights must be positive, got {weights}")
    total = float(sum(weights.values()))
    out, acc = [], 0.0
    for name, w in weights.items():
        acc += w / total
        out.append((name, int(acc * _TWO_POW_60)))
    out[-1] = (out[-1][0], _TWO_POW_60)  # exact cover of the hash space
    return out


def _split_hash(id_col: str, seed: str) -> F.Column:
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")


def split_dataset(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment — the split every training
    pipeline needs, as a pure column function (no sampling state, no RNG).

    Each row's split is a function of (seed, id) ONLY: stable across runs,
    partitioning, cluster size, and row order; disjoint and exhaustive by
    construction (cumulative thresholds partition the 60-bit hash space);
    changing ``seed`` re-rolls the whole assignment, changing nothing else.
    A narrow map — zero shuffles, zero actions — so it composes anywhere in
    a pipeline at any scale. md5-based like the engine's other portable
    hashes, so a DuckDB oracle replays the assignment bit-for-bit
    (:func:`split_dataset_sql`).
    """
    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    h = _split_hash(id_col, seed)
    expr = None
    for name, bound in _split_thresholds(weights):
        cond = h < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def split_dataset_sql(
    table: str,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: str = "split-v1",
) -> str:
    """DuckDB mirror of :func:`split_dataset` (same hash, same thresholds)."""
    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    h = (
        "CAST(CAST(('0x' || substr(md5('"
        + seed
        + f":' || CAST({id_col} AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT)"
    )
    cases = " ".join(
        f"WHEN {h} < {bound} THEN '{name}'"
        for name, bound in _split_thresholds(weights)
    )
    return f"SELECT *, CASE {cases} END AS split FROM {table}"
