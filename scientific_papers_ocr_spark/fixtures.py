"""Deterministic synthetic transcript corpus generator.

Builds the seeded ``transcripts`` input table described in FIXTURES.md: one
row per turn ``(conv_id, turn_idx, role, text, tool, ts)``, where a
conversation plays the reference's "document" role, a turn its "page", and
the ``tool`` column carries the layout-block side channel (tesseract analog)
plus turn-0 document metadata.

Pure Python + ``random.Random(seed)`` — no external data, fully reproducible.
Document shapes rotate through the branch-coverage matrix of FIXTURES.md §2.
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta, timezone

_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)

_VOCAB = (
    "signal lattice tensor phase margin vector duct cascade kernel drift "
    "modal spectrum damping ratio beam flux gradient node mesh solver "
    "window filter carrier klystron plasma waveguide resonant cavity mode "
    "tuning factor domain bound error probe metric sample antenna array "
    "surface charge dipole moment field scan couple radiate emission board"
).split()

_SHAPES = (
    "full_paper", "no_abstract", "no_references", "bare", "no_sections",
    "single_page", "sentinel_pages", "mathy", "long_blocks",
    "boilerplate_noise", "repairable",
)

_ABSTRACT_KEYS = (
    "## Abstract", "##Abstract", "# Abstract", "#Abstract",
    "_Abstract_", "_Abstract:_", "_Abstract--_",
    "## abstract", "_abstract_",
)

_NUMERAL_STYLES = ("arabic", "upper_roman", "lower_roman", "none")
_ROMANS = ("I", "II", "III", "IV", "V", "VI", "VII", "VIII")
_SECTION_TITLES = (
    "Introduction", "Methods", "Results", "Discussion",
    "Related Work", "Evaluation", "Model", "Analysis",
)


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_VOCAB) for _ in range(n))


def _sentence(rng: random.Random, n_words: int = 12) -> str:
    return _words(rng, n_words) + "."


def _paragraph(rng: random.Random, n_sentences: int = 3) -> str:
    return " ".join(_sentence(rng) for _ in range(n_sentences))


def _ieee_ref(rng: random.Random, n: int) -> str:
    a1 = rng.choice(_VOCAB).capitalize()
    a2 = rng.choice(_VOCAB).capitalize()
    title = _words(rng, 6)
    year = 1990 + rng.randrange(35)
    return (
        f'[{n}] {a1[0]}. {a1}, and {a2[0]}. {a2}, "{title}," '
        f"_IEEE Trans. Synth. Data._, vol. {rng.randrange(1, 60)}, "
        f"no. {rng.randrange(1, 12)}, pp. {rng.randrange(1, 400)}-{rng.randrange(400, 900)}, {year}."
    )


def _section_heading(style: str, ordinal: int, title: str) -> str:
    if style == "arabic":
        return f"## {ordinal}. {title}"
    if style == "upper_roman":
        return f"## {_ROMANS[ordinal - 1]}. {title}"
    if style == "lower_roman":
        return f"## {_ROMANS[ordinal - 1].lower()}. {title}"
    return f"## {title}"


def _mathy_paragraphs(rng: random.Random) -> list[str]:
    return [
        "the **bold claim** holds for *all modes* and `code term` here "
        "with inline math \\(x + y\\) in the flow " + _sentence(rng),
        "\\[ \\alpha = \\big{\\beta} + \\left( \\gamma \\]"
        " trailing text after display math " + _sentence(rng, 8),
        "doubled openers \\[ \\[ a = b \\] and unmatched closer \\] tail "
        + _sentence(rng, 6),
        "_italic run_ and lone * star and __not bold__ " + _sentence(rng, 6),
    ]


def _noise_paragraphs(rng: random.Random) -> list[str]:
    return [
        "@@ ## $$ %% ^^ && (( )) 1234 5678 " * 2,
        "ab cd ef gh ij kl",
        "the mth and nth harmonics Stay Capitalized Here "
        + _sentence(rng, 6),
        _paragraph(rng, 2),
    ]


def _layout_tool(
    rng: random.Random,
    page_words: str,
    complete: bool,
    repairable: bool = False,
    meta: dict | None = None,
) -> str:
    """Layout side channel: one level-1 page block + level-2 blocks.

    ``complete=True``: block word-streams are substrings of the page text →
    presence score = max.  ``complete=False``: block words are foreign to the
    page → score 0 → incomplete.  ``repairable`` lays blocks out as two
    half-columns so the column-split repair path fires.
    """
    page_w, page_h = 2550, 3300
    blocks: list[dict] = []
    if meta is not None:
        blocks.append({"level": 0, "meta": meta})
    blocks.append(
        {"level": 1, "block_num": 0, "x": 0, "y": 0, "w": page_w, "h": page_h, "text": ""}
    )
    words = page_words.split()
    if complete:
        geoms = [(150, 200, 2200, 800), (150, 1100, 2200, 900)]
        half = max(len(words) // 2, 1)
        streams = [" ".join(words[:half]), " ".join(words[half:])]
    else:
        foreign = [w + "x" for w in rng.sample(_VOCAB, 24)] * 2
        stream = " ".join(foreign)
        if repairable:
            geoms = [(100, 300, 1000, 900), (1400, 300, 1000, 900)]
            streams = [" ".join(foreign[:24]), " ".join(foreign[24:])]
        else:
            geoms = [(150, 200, 2200, 800)]
            streams = [stream]
    for i, ((x, y, w, h), s) in enumerate(zip(geoms, streams), start=1):
        blocks.append(
            {"level": 2, "block_num": i, "x": x, "y": y, "w": w, "h": h, "text": s}
        )
    return json.dumps(blocks)


def _body_words(pages: list[str], idx: int) -> str:
    """Longest CONTIGUOUS run of bare lowercase words within one line of the
    page — guaranteed to be a verbatim substring of the page text, so probe
    windows drawn from it score as present."""
    best: list[str] = []
    for line in pages[idx].split("\n"):
        run: list[str] = []
        for tok in line.split(" "):
            if tok.isalpha() and tok.islower() and len(tok) >= 2:
                run.append(tok)
                if len(run) > len(best):
                    best = list(run)
            else:
                run = []
    return " ".join(best)


def _build_pages(shape: str, rng: random.Random, conv_ord: int) -> list[str]:
    """Per-shape page (turn) text list."""
    abstract_key = _ABSTRACT_KEYS[conv_ord % len(_ABSTRACT_KEYS)]
    style = _NUMERAL_STYLES[conv_ord % len(_NUMERAL_STYLES)]
    n_sections = 3 + rng.randrange(4)
    titles = [
        _SECTION_TITLES[i % len(_SECTION_TITLES)] for i in range(n_sections)
    ]
    has_abstract = shape not in ("no_abstract", "bare")
    has_refs = shape not in ("no_references", "bare")
    has_sections = shape not in ("no_sections",)

    chunks: list[str] = []
    chunks.append(f"# {_words(rng, 5)}\n\n" + _paragraph(rng, 2))
    if has_abstract:
        if abstract_key.startswith("_"):
            chunks.append(abstract_key + " " + _paragraph(rng, 2))
        else:
            chunks.append(abstract_key + "\n\n" + _paragraph(rng, 2))
    if has_sections:
        for i, t in enumerate(titles, start=1):
            body: list[str] = [_paragraph(rng, 3)]
            if shape == "mathy":
                body = _mathy_paragraphs(rng)
            elif shape == "long_blocks":
                body = [_paragraph(rng, 40), _words(rng, 260)]
            elif shape == "boilerplate_noise":
                body = _noise_paragraphs(rng)
            chunks.append(_section_heading(style, i, t) + "\n\n" + "\n\n".join(body))
    else:
        chunks.append(_paragraph(rng, 6))
    # word-soup paragraph: a long run of bare lowercase words that the layout
    # side channel can reference as verbatim-present block text
    chunks.append(_words(rng, 80))
    if has_refs:
        n_refs = 3 + rng.randrange(4)
        refs = "\n\n".join(_ieee_ref(rng, n) for n in range(1, n_refs + 1))
        chunks.append("## References\n\n" + refs)

    doc = "\n\n".join(chunks) + "\n\n"
    if shape == "single_page":
        return [doc]
    # split into pages at paragraph boundaries, keeping the "\n\n" separators
    # attached so page concatenation is loss-aware like real OCR pagination
    paras = doc.split("\n\n")
    n_pages = min(3 + rng.randrange(3), max(len(paras) // 2, 1))
    per = max(len(paras) // n_pages, 1)
    pages = []
    for p in range(n_pages):
        lo = p * per
        hi = (p + 1) * per if p < n_pages - 1 else len(paras)
        if lo >= len(paras):
            break
        pages.append("\n\n".join(paras[lo:hi]) + "\n\n")
    if shape == "sentinel_pages" and len(pages) >= 2:
        pages.insert(1, f"\n\n[MISSING_PAGE_EMPTY:{2}]\n\n")
        pages.append(f"\n\n[MISSING_PAGE_FAIL:{len(pages) + 1}]\n\n")
    return pages


def generate_corpus(
    num_convs: int = 44,
    seed: int = 42,
    mega_conv_turns: int = 0,
    turns_per_conv: int | None = None,
) -> list[dict]:
    """Generate the seeded corpus as a list of row dicts.

    ``mega_conv_turns > 0`` appends one skewed mega-conversation (the
    salting/skew test); ``turns_per_conv`` forces a fixed page count (bench
    scaling mode).
    """
    rng = random.Random(seed)
    rows: list[dict] = []
    for c in range(num_convs):
        shape = _SHAPES[c % len(_SHAPES)]
        conv_id = f"conv-{seed}-{c:05d}-{shape}"
        conv_rng = random.Random((seed << 20) ^ c)
        pages = _build_pages(shape, conv_rng, c)
        if turns_per_conv is not None:
            while len(pages) < turns_per_conv:
                pages.append(_paragraph(conv_rng, 4) + "\n\n")
            pages = pages[:turns_per_conv]
        meta = _conv_meta(conv_rng, c)
        rows.extend(_conv_rows(conv_id, c, shape, pages, meta, conv_rng))
    if mega_conv_turns > 0:
        conv_rng = random.Random((seed << 21) ^ 7)
        pages = [_paragraph(conv_rng, 4) + "\n\n" for _ in range(mega_conv_turns)]
        rows.extend(
            _conv_rows(f"conv-{seed}-mega", num_convs, "mega_conv", pages, None, conv_rng)
        )
    return rows


def _conv_meta(conv_rng: random.Random, c: int) -> dict | None:
    """Turn-0 document metadata for conv ordinal ``c`` (shared by the driver
    and distributed generators — MUST stay deterministic and identical)."""
    if c % 3 == 0:
        return None
    meta = {
        "title": _words(conv_rng, 4),
        "authors": [
            f"{conv_rng.choice(_VOCAB).capitalize()} {conv_rng.choice(_VOCAB).capitalize()}"
            for _ in range(1 + conv_rng.randrange(3))
        ],
        "creation_date": float(1_500_000_000 + conv_rng.randrange(10**9)),
    }
    if c % 2 == 0:
        # raw PDF-metadata keyword string (mixed , and ; separators,
        # hyphens/extra spaces exercise capitalize_name) — T16
        meta["keywords"] = (
            f"{_words(conv_rng, 2)}; {conv_rng.choice(_VOCAB)}-based , "
            f"{_words(conv_rng, 1)}"
        )
    return meta


def _conv_rows(
    conv_id: str,
    conv_ord: int,
    shape: str,
    pages: list[str],
    meta: dict | None,
    rng: random.Random,
) -> list[dict]:
    from .oracle import textnorm

    rows = []
    roles = ("user", "assistant", "tool")
    for i, page in enumerate(pages):
        if textnorm.is_sentinel_page(page):
            tool = ""
        elif shape == "repairable" and i == len(pages) - 2:
            tool = _layout_tool(rng, page, complete=False, repairable=True,
                                meta=meta if i == 0 else None)
        elif shape == "boilerplate_noise" and i == 1:
            tool = _layout_tool(rng, page, complete=False, repairable=False,
                                meta=meta if i == 0 else None)
        else:
            stream = _body_words(pages, i)
            if len(stream.split()) >= 40:
                tool = _layout_tool(rng, stream, complete=True,
                                    meta=meta if i == 0 else None)
            elif meta is not None and i == 0:
                tool = json.dumps([{"level": 0, "meta": meta}])
            else:
                tool = ""
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": i,
                "role": roles[i % 3] if i > 0 else "user",
                "text": page,
                "tool": tool,
                "ts": _EPOCH + timedelta(hours=conv_ord, seconds=i),
            }
        )
    return rows


def spark_corpus(
    spark,
    num_convs: int,
    seed: int = 42,
    turns_per_conv: int | None = None,
    zipf_max_turns: int | None = None,
):
    """Generate the corpus DISTRIBUTED: each executor builds its conv range
    deterministically (same seeding as ``generate_corpus``), so bench-scale
    corpora (millions of turns) never pass through the driver.

    ``zipf_max_turns`` draws a skewed turns-per-conv distribution (most
    convs short, a heavy tail up to the cap) — the mega-conversation skew
    profile of FIXTURES.md §6.
    """
    from pyspark.sql import functions as F

    from . import schemas

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows: list[dict] = []
            for c in pdf["id"]:
                c = int(c)
                shape = _SHAPES[c % len(_SHAPES)]
                conv_id = f"conv-{seed}-{c:05d}-{shape}"
                conv_rng = random.Random((seed << 20) ^ c)
                pages = _build_pages(shape, conv_rng, c)
                tpc = turns_per_conv
                if zipf_max_turns is not None:
                    # zipf-ish: 1 / rank tail capped at zipf_max_turns
                    u = conv_rng.random()
                    tpc = max(2, min(zipf_max_turns, int(2.0 / max(u, 1e-9))))
                if tpc is not None:
                    while len(pages) < tpc:
                        # realistic filler: prose + markup-bearing paragraphs
                        # so per-turn tokenization cost matches real pages
                        filler = [
                            _paragraph(conv_rng, 8),
                            _mathy_paragraphs(conv_rng)[len(pages) % 4],
                            _paragraph(conv_rng, 6),
                        ]
                        pages.append("\n\n".join(filler) + "\n\n")
                    pages = pages[:tpc]
                meta = _conv_meta(conv_rng, c)
                rows.extend(_conv_rows(conv_id, c, shape, pages, meta, conv_rng))
            yield pd.DataFrame(
                {
                    "conv_id": [r["conv_id"] for r in rows],
                    "turn_idx": [r["turn_idx"] for r in rows],
                    "role": [r["role"] for r in rows],
                    "text": [r["text"] for r in rows],
                    "tool": [r["tool"] for r in rows],
                    "ts": [r["ts"] for r in rows],
                }
            )

    n_parts = max(int(spark.sparkContext.defaultParallelism), 8)
    return (
        spark.range(num_convs)
        .repartition(n_parts)
        .mapInPandas(gen, schema=schemas.TRANSCRIPTS)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def corpus_to_parquet(path: str, **kwargs) -> int:
    """Write the corpus to a parquet file with pyarrow (no Spark needed);
    returns the row count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = generate_corpus(**kwargs)
    table = pa.Table.from_pylist(
        [
            {**r, "ts": r["ts"]}
            for r in rows
        ],
        schema=pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("role", pa.string()),
                ("text", pa.string()),
                ("tool", pa.string()),
                ("ts", pa.timestamp("us", tz="UTC")),
            ]
        ),
    )
    pq.write_table(table, path)
    return len(rows)
