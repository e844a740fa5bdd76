"""Span scrubbing (north-star stage N6, BASELINE.json north_rule).

Not present in the reference (which stops at detection); semantics are
fixed here so Spark engine and oracle agree by construction:

 - candidate spans sorted by (start asc, end desc)
 - overlap resolution: a span is DROPPED if it starts before the end of
   the previously kept span (inner/overlapping spans lose to the earlier,
   longer-at-same-start span)
 - kept spans replaced right-to-left with ``<TYPE>`` placeholders so
   earlier offsets stay valid — deterministic ⇒ byte-identical output.
"""

from typing import Iterable, List, Tuple

# span = (start, end, type_name)
Span = Tuple[int, int, str]


def resolve_spans(spans: Iterable[Span]) -> List[Span]:
    """Sort by (start asc, end desc) and drop overlapping spans."""
    out: List[Span] = []
    last_end = -1
    for s in sorted(spans, key=lambda x: (x[0], -x[1])):
        if s[0] >= last_end:
            out.append(s)
            last_end = s[1]
    return out


def scrub_text(text: str, spans: Iterable[Span]) -> str:
    """Replace each resolved span with ``<TYPE>``, applied right-to-left."""
    for start, end, typ in reversed(resolve_spans(spans)):
        text = text[:start] + "<" + typ + ">" + text[end:]
    return text
