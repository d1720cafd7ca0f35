"""Lucene classic QueryParser (subset) — the syntax the reference feeds to
``MultiFieldQueryParser`` (``cLuceneIndexReader.java:320-338``), parsed into
typed clauses the engine executes on its own scorers.

Supported grammar (documented subset of the Lucene classic syntax):

- bare atoms are SHOULD (Lucene default operator OR)
- ``+atom`` MUST, ``-atom`` MUST_NOT, ``NOT atom`` == ``-atom``
- ``a AND b`` promotes both neighbors to MUST; ``OR`` keeps SHOULD
- ``field:atom`` scopes the atom to a metadata field (``path:parseJson``),
  including quoted phrases (``path:"file txt"``)
- ``"a b"`` quoted phrase; ``"a b"~3`` span-near with slop 3
- ``te*`` prefix, ``t?ble``/``ta*le`` wildcard, ``term~``/``term~1`` fuzzy
- ``/regex/`` RegexpQuery (anchored, Lucene ``RegexpQuery``; whitespace
  inside the pattern is not supported — atoms split on whitespace)
- ``field:[lo TO hi]`` inclusive range (Lucene ``TermRangeQuery`` /
  ``IntPoint.newRangeQuery``): numeric compare when both bounds parse as
  numbers, else lexicographic; executes as a non-scoring MUST filter
  (Lucene's constant-score rewrite contributes a flat 1.0 — documented
  divergence); exclusive ``{lo TO hi}`` bounds raise loudly
- ``atom^2`` / ``atom^0.5`` boost (Lucene query boost), valid on terms,
  phrases, and multi-term atoms; parsed outermost (``term~1^2``)
- ``(a b)`` parenthesized SHOULD group of plain terms: ``+(a b)`` MUST
  (doc must match at least one group term), ``-(a b)`` MUST_NOT (doc must
  match none), ``(a b)^2`` boosts every group term. Groups may contain
  only plain terms (no nesting, phrases, or wildcards — loud ValueError)

Divergences (each pinned by tests): an analyzed multi-token atom
contributes one clause per token with the same occur (Lucene's parser
would auto-phrase them); quoted phrases always execute as MUST clauses.
"""
from __future__ import annotations

import re
from dataclasses import dataclass

#: a clause token: ``[+-]?(field:)?"phrase"(~N)?(^B)?``, a paren group
#: ``[+-]?(...)(^B)?``, or a bare atom
_TOKEN_RE = re.compile(
    r'[+\-]?(?:[A-Za-z_]\w*:)?"[^"]*"(?:~\d+)?(?:\^\d+(?:\.\d+)?)?'
    r'|[+\-]?\([^()]*\)(?:\^\d+(?:\.\d+)?)?'
    r'|[+\-]?(?:[A-Za-z_]\w*:)?\[[^\]]*\]'
    r'|[+\-]?(?:[A-Za-z_]\w*:)?\{[^}]*\}'
    r'|\S+')
_FIELD_RE = re.compile(r'^([A-Za-z_]\w*):(.+)$', re.S)
_PHRASE_RE = re.compile(r'^"([^"]*)"(?:~(\d+))?$')
_FUZZY_RE = re.compile(r'^(.+?)~(\d?)$')
_BOOST_RE = re.compile(r'^(.+?)\^(\d+(?:\.\d+)?)$')
_REGEX_RE = re.compile(r'^/(.+)/$', re.S)
_RANGE_RE = re.compile(r'^\[\s*(\S+)\s+TO\s+(\S+)\s*\]$', re.I)


@dataclass(frozen=True)
class Clause:
    occur: str       # "+" MUST | "" SHOULD | "-" MUST_NOT
    field: str       # "" = content
    kind: str        # term | phrase | prefix | wildcard | fuzzy | regexp
                     #      | group (text = space-separated plain terms)
                     #      | range (text = "lo TO hi", inclusive)
    text: str        # raw atom text (unanalyzed)
    num: int = 0     # phrase slop / fuzzy max edits
    boost: float = 1.0  # Lucene ^boost (multiplies the clause's score)


def parse_query_string(q: str) -> list[Clause]:
    """Parse a Lucene classic query string into clauses. Raises ValueError
    on malformed input (unbalanced quote, empty field atom)."""
    if q.count('"') % 2:
        raise ValueError(f"unbalanced quote in query: {q!r}")
    clauses: list[Clause] = []
    pending_not = False
    pending_and = False
    for tok in _TOKEN_RE.findall(q):
        up = tok.upper()
        if up in ("AND", "&&"):
            if clauses and clauses[-1].occur == "":
                last = clauses[-1]
                clauses[-1] = Clause("+", last.field, last.kind,
                                     last.text, last.num, last.boost)
            pending_and = True
            continue
        if up in ("OR", "||"):
            pending_and = False
            continue
        if up == "NOT":
            pending_not = True
            continue
        occur = ""
        if tok.startswith("+"):
            occur, tok = "+", tok[1:]
        elif tok.startswith("-"):
            occur, tok = "-", tok[1:]
        if pending_not:
            occur = "-"
            pending_not = False
        if pending_and and occur == "":
            occur = "+"
        pending_and = False
        if not tok:
            raise ValueError("dangling +/- with no atom")
        boost = 1.0
        m = _BOOST_RE.match(tok)
        if m is not None and not tok.endswith('"'):
            tok, boost = m.group(1), float(m.group(2))
            if not tok:
                raise ValueError("dangling ^boost with no atom")
        if tok.startswith("(") and tok.endswith(")"):
            inner = tok[1:-1].strip()
            if not inner:
                raise ValueError("empty () group")
            if any(ch in inner for ch in '"*?~/^(') or ":" in inner:
                raise ValueError(
                    "() groups may contain only plain terms: " + tok)
            clauses.append(Clause(occur, "", "group", inner, boost=boost))
            continue
        if "(" in tok or ")" in tok:
            raise ValueError(f"unbalanced or nested parens in atom: {tok!r}")
        field = ""
        if not tok.startswith(('"', '/')):
            m = _FIELD_RE.match(tok)
            if m:
                field, tok = m.group(1), m.group(2)
        m = _RANGE_RE.match(tok)
        if m is not None:
            if not field:
                raise ValueError(
                    f"range clause needs a field: {tok!r}")
            clauses.append(Clause(occur, field, "range",
                                  f"{m.group(1)} TO {m.group(2)}",
                                  boost=boost))
            continue
        if tok.startswith("{") and tok.endswith("}"):
            raise ValueError(
                "exclusive {lo TO hi} ranges are not supported; "
                "use inclusive [lo TO hi]")
        m = _PHRASE_RE.match(tok)
        if m is not None:
            clauses.append(Clause(occur, field, "phrase",
                                  m.group(1), int(m.group(2) or 0),
                                  boost))
            continue
        m = _REGEX_RE.match(tok)
        if m is not None:
            clauses.append(Clause(occur, field, "regexp", m.group(1),
                                  boost=boost))
            continue
        m = _FUZZY_RE.match(tok)
        if m is not None and '"' not in tok:
            clauses.append(Clause(occur, field, "fuzzy",
                                  m.group(1), int(m.group(2) or 2),
                                  boost))
            continue
        if tok.endswith("*") and "*" not in tok[:-1] and "?" not in tok:
            if len(tok) < 2:
                raise ValueError("bare * is not a query")
            clauses.append(Clause(occur, field, "prefix", tok[:-1],
                                  boost=boost))
            continue
        if "*" in tok or "?" in tok:
            clauses.append(Clause(occur, field, "wildcard", tok,
                                  boost=boost))
            continue
        clauses.append(Clause(occur, field, "term", tok, boost=boost))
    return clauses
