"""Deterministic change-log synthesis (the engine's raw input).

The reference's raw input is hex-quantity JSON pulled per offset from a node
(extraction/traits/basic.rs:186-193; golden fixture
tests/millionthb_1000000_1000020/extraction/basic_1000004.json shows
``gasPrice: "0x4190ab00"``-style quantities). Our domain analog
(BASELINE.json input_hint) is an ordered change log of source-code events:

    (partition_id, offset, repo, path, commit, lang, content_raw, op, ts)

``content_raw`` is the undecoded payload — a JSON document whose quantities
are hex strings and whose content is base64-wrapped — so the decode stage has
real raw→typed work to do (the analog of transformation/common.rs).

Design constraints (SURVEY.md §7.3):

- **Pure column functions of the global event id.** Every attribute derives
  from ``xxhash64``/``sha2`` of the id + seed, so the same seed produces
  byte-identical rows at any parallelism and any scale — goldens never depend
  on partition layout.
- **Zipf-skewed repos.** Hot repos exercise the salted merge-apply path
  (north_rule skew requirement); skew is produced by cubing a uniform hash.
- **Injected duplicates.** A fraction of events replays the payload of an
  earlier event — same (repo, path, commit, content), later offset — modeling
  Pub/Sub at-least-once redelivery (mod.rs:140-164).
- **Deletes.** A small fraction are op='delete' tombstones.
- **Everything JVM-side.** No Python UDFs here at all: synthesis of 10^10
  rows must run at scan speed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

CHANGE_EVENT_COLUMNS = [
    "partition_id",
    "offset",
    "repo",
    "path",
    "commit",
    "lang",
    "content_raw",
    "op",
    "ts",
]

_LANGS = ["py", "rs", "go", "sql", "js", "c"]
_WORDS = [
    "def", "fn", "select", "from", "where", "return", "import", "struct",
    "class", "async", "await", "merge", "into", "table", "offset", "commit",
    "batch", "shuffle", "partition", "broadcast", "decode", "hash", "value",
    "schema", "column", "stream", "replay", "upsert", "lineage", "checkpoint",
]


def _h(seed: int, *cols) -> F.Column:
    """Deterministic 64-bit hash column; xxhash64 is seed-stable across runs."""
    return F.xxhash64(F.lit(seed), *cols)


def _uniform(seed: int, tag: str, id_col: F.Column) -> F.Column:
    """Uniform double in [0,1) derived from (seed, tag, id)."""
    return (F.pmod(_h(seed, F.lit(tag), id_col), F.lit(1_000_000)) / 1_000_000.0).cast(
        "double"
    )


def synthesize_change_events(
    spark: SparkSession,
    n_events: int,
    *,
    seed: int = 42,
    n_partitions: int = 8,
    n_repos: int = 200,
    paths_per_repo: int = 500,
    dup_fraction: float = 0.05,
    delete_fraction: float = 0.02,
    skew_exponent: int = 3,
    poison_fraction: float = 0.0,
    num_slices: int | None = None,
) -> DataFrame:
    """Synthesize ``n_events`` deterministic change events.

    Duplicates: an event whose dup-roll fires copies the *logical* payload of
    the event ``base_id = id - lag`` (same repo/path/commit/content) but keeps
    its own (partition_id, offset, ts) — a faithful redelivery.

    Skew: repo index = floor(n_repos * u^skew_exponent), so repo 0 receives
    ~(1 - (1-1/n_repos)^(1/exp))-ish of the traffic — enough to make an
    unsalted merge-apply visibly lopsided at scale.

    Poison (``poison_fraction`` > 0): a deterministic subset of events gets a
    corrupted raw payload — half truncated JSON ('payload: malformed json'),
    half a size field off by one ('size: mismatch vs content') — modeling
    rows that will NEVER pass retry (the dead-letter case, dataflow.tf:1-31).
    Corruption keys off the physical event_id, not base_id: redelivery of a
    good payload stays good.
    """
    base = spark.range(0, n_events, 1, num_slices or spark.sparkContext.defaultParallelism)
    ev = base.withColumn("event_id", F.col("id")).drop("id")

    # --- duplicate injection: resolve the logical payload id first ---------
    dup_roll = _uniform(seed, "dup", F.col("event_id"))
    lag = (F.pmod(_h(seed, F.lit("dlag"), F.col("event_id")), F.lit(50)) + 1).cast("long")
    ev = ev.withColumn(
        "base_id",
        F.when(
            (dup_roll < F.lit(dup_fraction)) & (F.col("event_id") >= lag),
            F.col("event_id") - lag,
        ).otherwise(F.col("event_id")),
    )

    # --- logical payload: all functions of base_id -------------------------
    u_repo = _uniform(seed, "repo", F.col("base_id"))
    repo_idx = F.least(
        F.floor(F.lit(float(n_repos)) * F.pow(u_repo, F.lit(float(skew_exponent)))),
        F.lit(n_repos - 1),
    ).cast("long")
    path_idx = F.pmod(_h(seed, F.lit("path"), F.col("base_id")), F.lit(paths_per_repo))
    lang_idx = F.pmod(_h(seed, F.lit("lang"), F.col("base_id")), F.lit(len(_LANGS)))
    lang_arr = F.array(*[F.lit(w) for w in _LANGS])

    ev = (
        ev.withColumn("repo", F.concat(F.lit("org/repo-"), repo_idx.cast("string")))
        .withColumn(
            "path",
            F.concat(
                F.lit("src/mod"),
                F.pmod(path_idx, F.lit(20)).cast("string"),
                F.lit("/file_"),
                path_idx.cast("string"),
                F.lit("."),
                F.element_at(lang_arr, (lang_idx + 1).cast("int")),
            ),
        )
        .withColumn("lang", F.element_at(lang_arr, (lang_idx + 1).cast("int")))
        .withColumn(
            "commit",
            F.substring(
                F.sha2(
                    F.concat_ws(":", F.lit("commit"), F.lit(seed), F.col("base_id")), 256
                ),
                1,
                40,
            ),
        )
    )

    # --- content: token sequence chosen by per-position hash ---------------
    # length 16..143 tokens; each token picked from _WORDS by hash(base_id,pos)
    word_arr = F.array(*[F.lit(w) for w in _WORDS])
    n_tokens = (F.pmod(_h(seed, F.lit("len"), F.col("base_id")), F.lit(128)) + 16).cast(
        "int"
    )
    content = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_tokens),
            lambda pos: F.element_at(
                word_arr,
                (
                    F.pmod(_h(seed, F.lit("w"), F.col("base_id") * 1000 + pos), F.lit(len(_WORDS)))
                    + 1
                ).cast("int"),
            ),
        ),
    )
    ev = ev.withColumn("_content", content)

    # --- raw payload: hex quantities + base64 content (the undecoded form) -
    # size: honest byte length (hex). value: uint256-ish, 128-bit hex built
    # from two hashes so a fraction exceeds the 38-nines BIGNUMERIC cap
    # (analog of common.rs:148-160). mode: small quantity for checked i64.
    value_hex = F.concat(
        F.lit("0x"),
        F.lower(F.hex(F.abs(_h(seed, F.lit("v1"), F.col("base_id"))))),
        F.when(
            _uniform(seed, "big", F.col("base_id")) < 0.25,
            F.lower(F.hex(F.abs(_h(seed, F.lit("v2"), F.col("base_id"))))),
        ).otherwise(F.lit("")),
    )
    # poison class B corrupts the declared size (+1) at struct-build time;
    # class A truncates the serialized JSON below. Both keyed on event_id.
    poison_roll = _uniform(seed, "poison", F.col("event_id"))
    poison_a = poison_roll < F.lit(poison_fraction / 2)  # malformed json
    poison_b = (poison_roll >= F.lit(poison_fraction / 2)) & (
        poison_roll < F.lit(poison_fraction)
    )  # size mismatch
    size_bytes = F.length(F.encode(F.col("_content"), "utf-8"))
    raw_json = F.to_json(
        F.struct(
            F.base64(F.encode(F.col("_content"), "utf-8")).alias("content_b64"),
            F.concat(
                F.lit("0x"),
                F.lower(F.hex(size_bytes + F.when(poison_b, 1).otherwise(0))),
            ).alias("size"),
            value_hex.alias("value"),
            F.concat(
                F.lit("0x"),
                F.lower(F.hex(F.pmod(_h(seed, F.lit("mode"), F.col("base_id")), F.lit(0o1000)))),
            ).alias("mode"),
        )
    )
    ev = ev.withColumn(
        "content_raw",
        F.when(poison_a, F.substring(raw_json, 1, 20)).otherwise(raw_json),
    ).drop("_content")

    # --- physical log coordinates: partition_id, per-partition offset, ts --
    # Round-robin by event_id keeps offsets dense per partition (offset =
    # event_id div n_partitions), mirroring a multi-partition WAL.
    ev = (
        ev.withColumn("partition_id", F.pmod(F.col("event_id"), F.lit(n_partitions)).cast("int"))
        .withColumn("offset", (F.col("event_id") / n_partitions).cast("long"))
        .withColumn(
            "op",
            F.when(
                (_uniform(seed, "del", F.col("event_id")) < F.lit(delete_fraction))
                & (F.col("event_id") != F.col("base_id")),  # deletes only on replay slots
                F.lit("delete"),
            )
            .when(
                _uniform(seed, "del2", F.col("event_id")) < F.lit(delete_fraction),
                F.lit("delete"),
            )
            .otherwise(F.lit("upsert")),
        )
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(1_700_000_000)
                + F.col("event_id") * 3
                + F.pmod(_h(seed, F.lit("jit"), F.col("event_id")), F.lit(3))
            ),
        )
    )

    return ev.select("event_id", "base_id", *CHANGE_EVENT_COLUMNS)
