"""Pure-Python oracle: single-node mirror of the reference's text semantics.

Every function here reproduces — bit-exactly, quirks included — a deterministic
text operation of ``jtom95/scientific-papers-ocr`` (citations in docstrings).
No Spark, no network, no models: these functions ARE the correctness contract;
the Spark pipeline runs the very same functions inside vectorized pandas UDFs,
and pytest compares the distributed output against driver-side oracle runs.
"""

from . import textnorm, probes, markup, katex, layout, segmentation, assembly  # noqa: F401
