"""Reference-entry enrichment: structured fields out of raw citation strings.

The reference repo parses each raw entry with the ``refextract`` library and
then enriches via CrossRef HTTP (rich_docs/references/elaborator_class.py:
185-219,144-174) — both unavailable/out of correctness scope here (network,
external lib).  This module is the deterministic analog: a clean-room parser
for the IEEE-ish citation shape the reference's own test string uses
(elaborator_class.py:239), producing the full ``Reference`` field set
(base.py:75-102) with enrichment-only fields left null — the
"schema-compatible stub" SURVEY.md §7 calls for.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_TITLE_RE = re.compile(r'"(.+?),?"')
_YEAR_RE = re.compile(r"(\b(?:1[89]|20)\d{2})\.?\s*$")
_VENUE_RE = re.compile(r"_([^_]+)_")
# "A. Alpha" / "J. K. Rowling" / "and B. Beta-Smith": initials + surname
_NAME_RE = re.compile(r"^(?:and\s+)?(?:[A-Z]\.[\s-]*)+[A-Z][\w-]*\.?$")
# comma-parts that can never be a title (numbering/paging/year tails)
_NON_TITLE_RE = re.compile(r"^(?:vol|no|pp?|pages|in)\b[.\s]|^(?:19|20)\d{2}\.?$", re.IGNORECASE)


def _split_authors(head: str) -> list[str] | None:
    """Comma-separated names, "and" dropped — mirrors the reference's
    post-processing of refextract author output (split on commas, strip
    "and " — elaborator_class.py:192-198)."""
    parts = [p.strip() for p in head.split(",") if p.strip()]
    if len(parts) == 1:
        parts = parts[0].split(" and ")
    authors = [re.sub(r"^and\s+", "", p).strip() for p in parts if p.strip()]
    return [a for a in authors if a] or None


def parse_citation(raw: str) -> dict:
    """Parse one raw citation into (title, authors, venue, year).

    Two shapes, mirroring the reference's refextract path
    (elaborator_class.py:185-219):
    - quoted title (IEEE style): title = the quoted span, authors = the names
      before it;
    - unquoted title: underscores stripped (``ref.replace("_", "")``,
      :186-187), the leading run of name-shaped comma-parts becomes the
      author list, and the title is the first following part that contains no
      author — the reference's "first part not containing any author"
      fallback (:205-212).

    DELIBERATE DEVIATION from elaborator_class.py:205-212: the reference
    accepts ANY first non-author comma-part as the title — including
    numbering/venue tails like ``"vol. 3"`` or ``"2019"`` — because it only
    tests author containment.  This version stops at the first non-name part
    and additionally suppresses numbering/year tails via ``_NON_TITLE_RE``,
    returning ``title=None`` where the reference would return a garbage
    title.  Chosen on purpose: a null title is recoverable downstream (the
    enrichment join skips it), a wrong title silently poisons enrichment
    keys.  Not part of any byte-parity oracle (citation_parse's oracle
    predicts THIS function's output, not the reference's).
    """
    year_m = _YEAR_RE.search(raw.strip())
    year = int(year_m.group(1)) if year_m else None
    venue_m = _VENUE_RE.search(raw)
    venue = venue_m.group(1).strip() if venue_m else None

    title_m = _TITLE_RE.search(raw)
    if title_m:
        title = title_m.group(1).strip()
        head = raw[: title_m.start()].strip()
        head = re.sub(r"^\[\d+\]\s*", "", head).rstrip(",").strip()
        authors = _split_authors(head) if head else None
        return {"title": title, "authors": authors, "venue": venue, "year": year}

    body = re.sub(r"^\[\d+\]\s*", "", raw.replace("_", "")).strip()
    parts = [p.strip() for p in body.split(",") if p.strip()]
    names: list[str] = []
    title = None
    for p in parts:
        if _NAME_RE.match(p):
            names.append(p)
            continue
        # title fallback requires detected authors ("if authors is None:
        # pass" — elaborator_class.py:206-207); first non-name part that is
        # not a numbering/year tail → title
        if names and not _NON_TITLE_RE.match(p):
            title = p.rstrip(".").strip() or None
        break
    authors = _split_authors(", ".join(names)) if names else None
    return {"title": title, "authors": authors, "venue": venue, "year": year}


def enrich_references(refs: DataFrame, raw_col: str = "raw") -> DataFrame:
    """(conv_id?, ref_number, raw) → full Reference-shaped columns.

    Vectorized pandas pass (lookarounds stay Python-side); CrossRef-only
    fields (doi, url, publisher, publication_type, keywords, date) are null
    by design — the enrichment seam where a network stage would plug in."""
    in_cols = refs.columns

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_citation(r or "") for r in pdf[raw_col]]
            out = pdf.copy()
            out["title"] = [p["title"] for p in parsed]
            out["authors"] = [p["authors"] for p in parsed]
            out["venue"] = [p["venue"] for p in parsed]
            out["year"] = [p["year"] for p in parsed]
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in refs.schema.fields
    ) + ", title string, authors array<string>, venue string, year int"
    enriched = refs.mapInPandas(process, schema=schema)
    return enriched.select(
        *in_cols,
        "title",
        "authors",
        "venue",
        "year",
        F.lit(None).cast("string").alias("doi"),
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("string").alias("publisher"),
        F.lit(None).cast("string").alias("publication_type"),
        F.lit(None).cast("double").alias("date"),
        # elaborated references are promoted to complexity level 2 (high) —
        # rich_docs/helper_classes/paper_sections.py:99-105,126 sets 2 after
        # ReferenceExtr.run(); raw-only references stay at low (base.py:69-73)
        F.lit(2).alias("reference_complexity_level"),
    )


# enrichment-catalog fields an offline CrossRef snapshot carries, in the
# order they land on the output (Reference field set, base.py:75-102)
_CATALOG_FIELDS = ("doi", "url", "publisher", "publication_type", "date")


def enrich_references_offline(
    refs: DataFrame,
    catalog: DataFrame,
    title_col: str = "title",
    year_col: str = "year",
) -> DataFrame:
    """Offline CrossRef-style enrichment: fill the null enrichment seam
    (doi/url/publisher/publication_type/date) from a local catalog snapshot
    keyed by normalised title + publication year — the network-free analog
    of ``ElaboratorReference.run`` (elaborator_class.py:83-138,144-174):

    - a ref with a null ``title`` is never enriched (":86-87 — no CrossRef
      query without a title");
    - when the ref's ``year`` is known it filters the match exactly (the
      ``from-pub-date``/``until-pub-date`` filter, :150-153); a null year
      matches any catalog year (no filter, :154);
    - titles match on ``lower(trim(...))`` equality (:163-166 — the
      exact-title scan over the top ``limit=3`` results; CrossRef's fuzzy
      relevance ranking has no offline analog, so ambiguity among several
      exact-title rows is broken deterministically by lowest ``doi``);
    - a matched catalog row with a creation ``date`` overrides the parsed
      year with that date's year (:115-121).

    Scale shape: the catalog is the SMALL side — it alone is deduplicated
    (one shuffle of the dim table) and broadcast; the refs fact table is
    never shuffled.  Year-known and year-null refs take separate broadcast
    equi-joins (different join keys) and union back.
    """
    norm = lambda c: F.lower(F.trim(c))  # noqa: E731
    cat = catalog.select(
        norm(F.col("title")).alias("_ct"),
        F.col("year").alias("_cy"),
        *[F.col(f).alias(f"_c_{f}") for f in _CATALOG_FIELDS],
    )
    pick = F.min_by(
        F.struct(*[F.col(f"_c_{f}") for f in _CATALOG_FIELDS]), F.col("_c_doi")
    ).alias("_hit")
    by_title_year = cat.groupBy("_ct", "_cy").agg(pick)
    by_title = cat.groupBy("_ct").agg(pick)

    def merge(side: DataFrame) -> DataFrame:
        out_cols = []
        for c in refs.columns:
            if c in _CATALOG_FIELDS:
                out_cols.append(
                    F.coalesce(F.col(c), F.col(f"_hit._c_{c}")).alias(c)
                )
            elif c == year_col:
                # creation-date year wins over the parsed year on a match
                out_cols.append(
                    F.when(
                        F.col("_hit._c_date").isNotNull(),
                        F.year(F.timestamp_seconds(F.col("_hit._c_date"))),
                    )
                    .otherwise(F.col(year_col))
                    .alias(year_col)
                )
            else:
                out_cols.append(F.col(c))
        return side.select(*out_cols)

    with_year = refs.where(
        F.col(title_col).isNotNull() & F.col(year_col).isNotNull()
    ).join(
        F.broadcast(by_title_year),
        on=(norm(F.col(title_col)) == F.col("_ct"))
        & (F.col(year_col) == F.col("_cy")),
        how="left",
    )
    no_year = refs.where(
        F.col(title_col).isNotNull() & F.col(year_col).isNull()
    ).join(
        F.broadcast(by_title),
        on=norm(F.col(title_col)) == F.col("_ct"),
        how="left",
    )
    no_title = refs.where(F.col(title_col).isNull()).withColumn(
        "_hit",
        F.lit(None).cast(
            "struct<" + ",".join(
                f"_c_{f}:{'double' if f == 'date' else 'string'}"
                for f in _CATALOG_FIELDS
            ) + ">"
        ),
    )
    return merge(with_year).unionByName(merge(no_year)).unionByName(merge(no_title))
