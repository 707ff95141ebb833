"""PySpark-native transcript extraction engine.

A from-scratch rebuild of the *computation* performed by
``jtom95/scientific-papers-ocr`` (reference, read-only at ``/root/reference``),
re-targeted at an Iceberg-style table of multi-turn conversation transcripts
``(conv_id, turn_idx, role, text, tool, ts)``.

Layout:

- ``oracle/``     pure-Python single-node mirror of the reference's text
                  semantics (the correctness contract; no Spark imports).
- ``operators/``  Spark DataFrame / pandas-UDF stages (tokenize, verify,
                  repair, segment, dedup, similarity, text analysis).
- ``sources/``    readers/writers for the transcript and output tables.
- ``pipeline.py`` end-to-end job with per-partition lineage + resume.
- ``fixtures.py`` deterministic synthetic transcript corpus generator.
"""

__version__ = "0.1.0"
