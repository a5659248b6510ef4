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


# --------------------------------------------------------------------------
# Ordered-args event decode (U4 depth): the reference's generic event decode
# interleaves INDEXED params (from topic slots) and BODY params (from the
# data blob) back into the event's declared parameter order before emitting
# JSON (solval_to_serdeval / args_to_json, events/generic.rs:75-137). The
# analog: each catalog entry declares an ordered arg list, each arg sourced
# from either a row column ('col' ≙ indexed/topic) or the props JSON
# ('json' ≙ body blob), with a declared type; decode emits a JSON array of
# canonical strings in catalog order. Unknown event_type → NULL (the
# NotFound miss-skip, generic.rs:5-31).


@dataclass(frozen=True)
class ArgSpec:
    """One declared event parameter (analog of one ABI param)."""

    name: str
    source: str  # 'col' (indexed/topic slot) | 'json' (body blob)
    key: str  # column name or JSON key
    type: str = "string"  # 'long' | 'string'


class EventArgsCatalog:
    """event_type → ordered [ArgSpec], with LangCatalog's build-time
    conflict rules (re-add identical: no-op; re-add different: raise)."""

    def __init__(self, entries: dict[str, list[ArgSpec]] | None = None):
        self._by_type: dict[str, tuple[ArgSpec, ...]] = {}
        for etype, specs in (entries or {}).items():
            self.add(etype, specs)

    def add(self, event_type: str, specs: list[ArgSpec]) -> None:
        new = tuple(specs)
        cur = self._by_type.get(event_type)
        if cur is None:
            self._by_type[event_type] = new
        elif cur != new:
            raise ConflictingSpec(f"{event_type}: {cur} vs {new}")

    @property
    def event_types(self) -> list[str]:
        return sorted(self._by_type)

    def _arg_expr(self, spec: ArgSpec, props_col: Column) -> Column:
        if spec.source == "col":
            raw = F.col(spec.key)
        elif spec.source == "json":
            raw = F.get_json_object(props_col, f"$.{spec.key}")
        else:
            raise ValueError(f"unknown source {spec.source!r}")
        # canonical string per declared type — longs round-trip through the
        # integer cast so '069'/'69' normalize identically on both engines
        if spec.type == "long":
            return raw.cast("long").cast("string")
        if spec.type == "string":
            return raw.cast("string")
        raise ValueError(f"unknown type {spec.type!r}")

    def args_json_col(self, event_type_col: Column, props_col: Column) -> Column:
        """JSON array of typed args in CATALOG-DECLARED order; miss → NULL.

        Chained CASE over the (small, static) catalog — whole-stage codegen,
        no UDF; a large catalog would become a broadcast-joined dimension
        with a per-type struct schema instead.
        """
        expr = F.lit(None).cast("string")
        for etype in self.event_types:
            arr = F.array(
                *[self._arg_expr(s, props_col) for s in self._by_type[etype]]
            )
            expr = F.when(event_type_col == etype, F.to_json(arr)).otherwise(expr)
        return expr
