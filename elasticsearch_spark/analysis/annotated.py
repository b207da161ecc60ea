"""annotated_text mapper: inline entity annotations in markdown form.

Reference: plugins/mapper-annotated-text/src/main/java/org/
elasticsearch/index/mapper/annotatedtext/AnnotatedTextFieldMapper.java
— text like "[Paris](City&Capital) is nice" indexes the anchor words
("paris", "is", "nice") through the normal analyzer AND injects each
annotation value ("City", "Capital") as an UNANALYZED keyword token at
the position of the anchor's first token (position increment 0), so
phrase/intervals queries still see the plain word positions while
entity values are searchable as exact terms.

The parser here walks the text segment by segment (plain runs and
[anchor](value) spans), tokenizes each run with the base analyzer, and
re-bases positions onto one global counter — the same effect as the
plugin's AnnotationsInjector char-filter + position-increment replay.
Annotation values are URL-decoded and split on '&', as in the plugin.
"""

from __future__ import annotations

import re
from urllib.parse import unquote

from elasticsearch_spark.analysis.analyzers import ANALYZERS

_ANNOTATION = re.compile(r"\[([^\]\[]*)\]\(([^)(]+)\)")


def annotated_text_analyzer(base: str = "standard"):
    base_fn = ANALYZERS[base]

    def fn(text: str) -> tuple[list[str], list[int]]:
        terms: list[str] = []
        positions: list[int] = []
        next_pos = 0

        def emit_plain(chunk: str) -> None:
            nonlocal next_pos
            ts, ps = base_fn(chunk)
            for t, p in zip(ts, ps):
                terms.append(t)
                positions.append(next_pos + p)
            if ps:
                next_pos += ps[-1] + 1

        i = 0
        for m in _ANNOTATION.finditer(text or ""):
            emit_plain(text[i:m.start()])
            anchor, raw_vals = m.group(1), m.group(2)
            anchor_pos = next_pos
            emit_plain(anchor)
            for val in raw_vals.split("&"):
                val = unquote(val.strip())
                if val:
                    terms.append(val)
                    positions.append(anchor_pos)
            i = m.end()
        emit_plain(text[i:] if text else "")
        # keep doc-major position-ascending ordering for the index
        order = sorted(range(len(terms)), key=lambda j: (positions[j], j))
        return [terms[j] for j in order], [positions[j] for j in order]

    return fn


def register_annotated() -> None:
    ANALYZERS.setdefault("annotated_text", annotated_text_analyzer())


register_annotated()
