"""spark-submit entry point: documents parquet → training-ready corpus.

Composes the engine's verified training-data operators end to end:

    optional PII scrub (text.redact_pii)
      → quality gate + exact dedup + near-dup canonical keep
        (curation.curate_corpus, return_docs=True)
      → optional per-language stratified downsample (sample_stratified)
      → deterministic train/val/test split (split_dataset)
      → greedy token-budget sequence packing PER SPLIT (pack_sequences;
        packing within splits so no pack ever mixes train and eval data)
      → pack_stats utilization report.

Every assignment (sample membership, split, pack group/order) is a pure
function of (seed, doc_id) — re-running the job on re-partitioned input,
another cluster size, or tomorrow produces byte-identical corpus, split
and packs. Usage:

    cd /root/repo && python tools/package.py /tmp/sonic_etl_spark.zip
    spark-submit --py-files /tmp/sonic_etl_spark.zip jobs/curate_job.py \
        --docs /data/documents.parquet --out /data/corpus_v1 \
        --near-dup-on text --redact-pii \
        --sample en=0.25,zh=0.5 --split train=0.98,val=0.01,test=0.01 \
        --budget 2048 --n-groups 64 --seed corpus-v1

Writes <out>/corpus (parquet, partitioned by split), <out>/packs (one row
per doc: split, pack_group, pack_index, pack_offset, n_tokens) and
<out>/report.json; prints the report as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def _kv_floats(s: str) -> dict[str, float]:
    out = {}
    for part in s.split(","):
        if not part:
            continue
        k, v = part.split("=", 1)
        out[k.strip()] = float(v)
    return out


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True, help="input documents parquet")
    ap.add_argument("--emb", default=None, help="embeddings parquet (for near_dup_on=embedding)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--near-dup-on", choices=["text", "embedding"], default="text")
    ap.add_argument("--min-words", type=int, default=5)
    ap.add_argument("--max-punct-ratio", type=float, default=0.3)
    ap.add_argument("--redact-pii", action="store_true")
    ap.add_argument("--sample", type=_kv_floats, default={},
                    help="per-language keep rates, e.g. en=0.25,zh=0.5")
    ap.add_argument("--sample-default", type=float, default=1.0,
                    help="keep rate for languages not listed in --sample")
    ap.add_argument("--split", type=_kv_floats,
                    default={"train": 0.98, "val": 0.01, "test": 0.01})
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--n-groups", type=int, default=64)
    ap.add_argument("--seed", default="corpus-v1")
    args = ap.parse_args(argv)

    from sonic_etl_spark.operators import curation, text
    from sonic_etl_spark.session import get_spark

    # fail fast BEFORE any Spark work: an empty --split ('' parses to {})
    # would skip the packing loop and crash on packs.write AFTER the corpus
    # write already succeeded; same validation split_dataset applies later
    curation._split_thresholds(args.split)

    spark = get_spark("curate-corpus")
    docs = spark.read.parquet(args.docs)
    report: dict = {"input_docs": docs.count()}

    if args.redact_pii:
        scrubbed = text.redact_pii(docs)
        pii = scrubbed.agg(
            F.sum("n_urls").alias("u"), F.sum("n_emails").alias("e"),
            F.sum("n_ips").alias("i"),
        ).first()
        report["pii_redacted"] = {
            "urls": int(pii["u"] or 0), "emails": int(pii["e"] or 0),
            "ips": int(pii["i"] or 0),
        }
        docs = scrubbed.withColumn("text", F.col("text_redacted")).drop(
            "text_redacted", "n_urls", "n_emails", "n_ips"
        )

    emb = spark.read.parquet(args.emb) if args.emb else None
    curated = curation.curate_corpus(
        docs, emb=emb,
        min_words=args.min_words, max_punct_ratio=args.max_punct_ratio,
        near_dup_on=args.near_dup_on, return_docs=True,
    )
    if args.sample:
        curated = curation.sample_stratified(
            curated, args.sample, stratum_col="lang",
            default_rate=args.sample_default, seed=f"{args.seed}-sample",
        )
    curated = curation.split_dataset(
        curated, args.split, seed=f"{args.seed}-split"
    )
    corpus_path = os.path.join(args.out, "corpus")
    curated.write.mode("overwrite").partitionBy("split").parquet(corpus_path)

    # pack within each split: a pack must never mix train and eval docs
    corpus = spark.read.parquet(corpus_path)  # one write, reread for packing
    packs = None
    report["splits"] = {}
    for split_name in sorted(args.split):
        part = corpus.where(F.col("split") == split_name)
        packed = curation.pack_sequences(
            part, budget=args.budget, n_groups=args.n_groups,
            seed=f"{args.seed}-pack-{split_name}",
        ).withColumn("split", F.lit(split_name))
        packs = packed if packs is None else packs.unionByName(packed)
        st = curation.pack_stats(
            packed.drop("split"), budget=args.budget
        ).agg(
            F.sum("n_docs").alias("docs"),
            F.sum("n_packs").alias("packs"),
            F.sum("total_tokens").alias("tokens"),
            F.sum("waste_tokens").alias("waste"),
            F.sum("oversize_packs").alias("oversize"),
        ).first()
        report["splits"][split_name] = {
            "docs": int(st["docs"] or 0),
            "packs": int(st["packs"] or 0),
            "tokens": int(st["tokens"] or 0),
            "waste_tokens": int(st["waste"] or 0),
            "oversize_packs": int(st["oversize"] or 0),
        }
    packs.write.mode("overwrite").parquet(os.path.join(args.out, "packs"))

    report["curated_docs"] = sum(s["docs"] for s in report["splits"].values())
    by_lang = {
        r["lang"]: r["n"]
        for r in corpus.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    report["docs_by_lang"] = dict(sorted(by_lang.items()))
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    print(json.dumps(report, sort_keys=True))
    return report


if __name__ == "__main__":
    main()
