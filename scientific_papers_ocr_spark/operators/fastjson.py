"""Byte-identical fast path for ``json.dumps(obj, indent=4)``.

The EDocument golden contract is the stdlib serialization with ``indent=4``
(reference: ``rich_docs/edocument_class.py:110`` ``json.dumps(self.to_dict(),
indent=4)``),
and ``indent`` forces CPython's pure-Python encoder — which profiling shows is
~40% of the per-conversation assembly kernel.  This module re-implements only
the combination the engine uses (``ensure_ascii=True`` via the C
``encode_basestring_ascii``, default separators, str keys) and produces the
SAME BYTES.  Anything outside that domain (non-str keys, exotic types) falls
back to the stdlib for the whole object, so output equality holds universally.

The pure-Python oracle (``oracle/assembly.py``) deliberately keeps stdlib
``json.dumps``: every byte-parity test between the Spark path and the oracle
is therefore also a continuous regression test of this serializer.
Dedicated equivalence tests live in ``tests/test_oracle_properties.py``.
"""
from __future__ import annotations

import json
from json.encoder import encode_basestring_ascii as _esc

_INF = float("inf")
# fixed-size cache: never mutated after import, so concurrent serializers
# (one per Python worker thread) can share it without a growth race
_INDENTS = tuple("\n" + " " * (4 * i) for i in range(32))


def _indent(level: int) -> str:
    if level < 32:
        return _INDENTS[level]
    return "\n" + " " * (4 * level)


def _enc(o, level: int, add) -> None:
    # exact-class checks (not isinstance): a str/int/float *subclass* may
    # customize repr and must take the stdlib path for byte parity
    t = o.__class__
    if t is str:
        add(_esc(o))
    elif t is dict:
        if not o:
            add("{}")
            return
        nl = _indent(level + 1)
        sep = "," + nl
        add("{")
        first = True
        for k, v in o.items():
            if k.__class__ is not str:
                raise TypeError(k)
            add(nl if first else sep)
            first = False
            add(_esc(k))
            add(": ")
            _enc(v, level + 1, add)
        add(_indent(level))
        add("}")
    elif t is list:
        if not o:
            add("[]")
            return
        nl = _indent(level + 1)
        sep = "," + nl
        add("[")
        first = True
        for v in o:
            add(nl if first else sep)
            first = False
            _enc(v, level + 1, add)
        add(_indent(level))
        add("]")
    elif t is int:
        add(int.__repr__(o))
    elif t is float:
        # stdlib floatstr: NaN/Infinity literals, else float.__repr__
        if o != o:
            add("NaN")
        elif o == _INF:
            add("Infinity")
        elif o == -_INF:
            add("-Infinity")
        else:
            add(float.__repr__(o))
    elif o is None:
        add("null")
    elif o is True:
        add("true")
    elif o is False:
        add("false")
    else:
        raise TypeError(type(o))


def dumps_indent4(obj) -> str:
    """``json.dumps(obj, indent=4)``, ~1.9x faster, byte-identical output."""
    try:
        out: list[str] = []
        _enc(obj, 0, out.append)
        return "".join(out)
    except (TypeError, ValueError, RecursionError):
        # outside the supported domain (non-str dict keys, subclasses,
        # tuples, unknown types, circular references): defer to the stdlib
        # wholesale — it raises the canonical diagnostics (e.g.
        # ValueError('Circular reference detected'))
        return json.dumps(obj, indent=4)
