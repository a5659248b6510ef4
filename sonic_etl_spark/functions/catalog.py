"""Lang-keyed decode catalog — the engine's analog of the reference's event
catalog (U1-U6 in SURVEY.md §2.3).

The reference decodes logs through a static catalog of event signatures
(`EventMapCatalog`, events/mapped.rs:10-74; 29 entries built from ABI strings
in events/erc.rs:13-187) with structural conflict resolution at build time
(`compare_events`, events/compare.rs:1-72). Misses are skipped, structural
conflicts fail the build.

Here the catalog keys on ``lang`` and carries per-language decode traits
(comment marker, block-comment pair, token class). It is tiny and static, so
it compiles to a chained CASE expression (whole-stage codegen, no UDF, no
broadcast join needed) — the Spark idiom for a reference-data lookup that
small; a bigger catalog would become a broadcast-hash-joined dimension
DataFrame with the same call shape.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column


@dataclass(frozen=True)
class LangSpec:
    """Decode traits for one language (analog of one ABI event entry)."""

    lang: str
    comment_marker: str
    block_open: str | None = None
    block_close: str | None = None


class ConflictingSpec(Exception):
    """Two catalog entries for the same key decode differently
    (analog of compare_events → MismatchedParamIndexing/NoEquivalence)."""


DEFAULT_SPECS = [
    LangSpec("py", "#"),
    LangSpec("rs", "//", "/*", "*/"),
    LangSpec("go", "//", "/*", "*/"),
    LangSpec("c", "//", "/*", "*/"),
    LangSpec("js", "//", "/*", "*/"),
    LangSpec("sql", "--", "/*", "*/"),
]


class LangCatalog:
    """Static decode catalog with build-time conflict resolution.

    ``add`` mirrors EventMapCatalog.add (events/mapped.rs:29-58): re-adding
    an identical spec is a no-op; a structurally different spec for the same
    key raises — never silently overwrite decode semantics.
    """

    def __init__(self, specs: list[LangSpec] | None = None):
        self._by_lang: dict[str, LangSpec] = {}
        for s in specs if specs is not None else DEFAULT_SPECS:
            self.add(s)

    def add(self, spec: LangSpec) -> None:
        cur = self._by_lang.get(spec.lang)
        if cur is None:
            self._by_lang[spec.lang] = spec
        elif cur != spec:
            raise ConflictingSpec(f"{spec.lang}: {cur} vs {spec}")

    def get(self, lang: str) -> LangSpec | None:
        return self._by_lang.get(lang)

    @property
    def langs(self) -> list[str]:
        return sorted(self._by_lang)

    def comment_marker_col(self, lang_col: Column) -> Column:
        """Chained-CASE lookup; unknown lang → NULL (decode miss ⇒ skip,
        the NotFound semantics of attempt_decode_log, generic.rs:5-31)."""
        expr = F.lit(None).cast("string")
        for lang in self.langs:
            expr = F.when(
                lang_col == lang, F.lit(self._by_lang[lang].comment_marker)
            ).otherwise(expr)
        return expr

    def count_comment_lines(self, text_col: Column, lang_col: Column) -> Column:
        """Decode application: count tokens that open a comment per the
        catalog's marker for the row's language. NULL for catalog misses."""
        marker = self.comment_marker_col(lang_col)
        toks = F.split(F.trim(text_col), " +")
        return F.when(marker.isNull(), F.lit(None).cast("long")).otherwise(
            F.size(F.filter(toks, lambda t: t.startswith(marker))).cast("long")
        )


class NullCatalog(LangCatalog):
    """Always-miss catalog (decode disabled) — analog of NullEventCatalog
    (events/null.rs:1-21)."""

    def __init__(self):
        super().__init__(specs=[])
