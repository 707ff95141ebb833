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


def parse_citation(raw: str) -> dict:
    """Parse one IEEE-ish raw citation into (title, authors, venue, year).

    Authors = the comma-separated names before the quoted title, "and"
    dropped; semantics chosen to mirror the reference's post-processing of
    refextract output (split on commas, strip "and " —
    elaborator_class.py:192-198)."""
    title_m = _TITLE_RE.search(raw)
    title = title_m.group(1).strip() if title_m else None
    year_m = _YEAR_RE.search(raw.strip())
    year = int(year_m.group(1)) if year_m else None
    venue_m = _VENUE_RE.search(raw)
    venue = venue_m.group(1).strip() if venue_m else None

    authors = None
    if title_m:
        head = raw[: title_m.start()].strip()
        head = re.sub(r"^\[\d+\]\s*", "", head).rstrip(",").strip()
        if head:
            parts = [p.strip() for p in head.split(",") if p.strip()]
            if len(parts) == 1:
                parts = parts[0].split(" and ")
            authors = [re.sub(r"^and\s+", "", p).strip() for p in parts if p.strip()]
            authors = [a for a in authors if a] or None
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
        F.lit(0).alias("reference_complexity_level"),
    )
