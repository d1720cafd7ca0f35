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
  — including legacy fractional similarity (``term~0.8``), mapped to max
  edits via Lucene ``FuzzyQuery.floatToEdits`` (round 4, final)
- ``/regex/`` RegexpQuery (anchored, Lucene ``RegexpQuery``; whitespace
  inside the pattern is not supported — atoms split on whitespace)
- ``field:[lo TO hi]`` inclusive range (Lucene ``TermRangeQuery`` /
  ``IntPoint.newRangeQuery``): numeric compare when both bounds parse as
  numbers, else lexicographic; executes as a non-scoring MUST filter
  (Lucene's constant-score rewrite contributes a flat 1.0 — documented
  divergence). Exclusive ``{lo TO hi}`` and the mixed ``[lo TO hi}`` /
  ``{lo TO hi]`` forms (round 4) exclude the marked endpoint, exactly
  Lucene's bracket grammar; a ``*`` bound is open-ended (round 4,
  final — Lucene's null bound), ``[* TO *]`` and the ``field:*``
  FieldExistsQuery sugar match docs with the field present
- ``*:*`` MatchAllDocsQuery (round 4, final): every live doc at
  constant score ``Σ boosts``; composes with range filters, MUST_NOT
  clauses, and BM25-scoring clauses (exact BooleanQuery mixing —
  scored docs gain the constant, the rest match at the constant)
- ``atom^2`` / ``atom^0.5`` boost (Lucene query boost), valid on terms,
  phrases, and multi-term atoms; parsed outermost (``term~1^2``)
- ``(a b)`` parenthesized SHOULD group: ``+(a b)`` MUST (doc must match
  at least one member), ``-(a b)`` MUST_NOT (doc must match none),
  ``(a b)^2`` boosts every member; ``field:(a b)`` (round 4) scopes a
  group to a metadata field's namespace — with the FULL member grammar
  (round 4, final): quoted phrases, occur prefixes, connectives,
  boosts, and nested subgroups distribute the field recursively,
  ``f:(a "b c" -d)`` == ``(f:a f:"b c" -f:d)`` (MultiFieldQueryParser
  field-grouping sugar); flat-group members may be expansions
  (``(wind* t?ble fuzz~1 /re.ex/)``, round 4) and may carry member
  ``^boosts`` (``(a^2 wind*^3 b)``)
- **nested boolean groups** (``+(foo (bar baz))``, ``+(+a +(b c) -d)``):
  arbitrary nesting of plain terms and quoted phrases (round 4:
  ``+("a b" c)``, with ``~N`` slop) with
  ``+``/``-``/``AND``/``OR``/``NOT`` inside parens, matching the
  reference's ``MultiFieldQueryParser`` acceptance
  (``cLuceneIndexReader.java:336-337``). Matching is exact boolean
  algebra over per-subtree match sets (phrases match consecutively).
  Scoring is exact Lucene BooleanQuery for EVERY nesting shape
  (round 4): ungated leaves flatten to the sum of present positive
  leaves; leaves under a SHOULD-positioned structured subgroup — and
  phrase leaves, which gate on their own match set — score via the
  engine's gated sum (``leaf_gate_classes``), so a present leaf
  stranded by an unmatched enclosing subgroup contributes nothing.
  Nested groups also accept expansion members (ExpansionLeaf —
  Lucene's SHOULD-of-expansions rewrite, optionally field-scoped:
  ``(+lang:py* x)``), field-scoped terms and phrases (FieldLeaf /
  PhraseLeaf with ``field`` — field-namespace matching + field norms),
  field-scoped GROUPS at any depth (``(+lang:(en fr) x)``, round 4
  final — a pure-SHOULD GroupNode of field-namespace leaves),
  and matching-only field ranges in ANY occur position (RangeLeaf; a
  SHOULD range joins the match union but never scores; ``field:*``
  presence members ride the same leaf). Members and
  whole subgroups may carry ``^boosts`` (round 4, final:
  ``(+a b^2)``, ``(a (b c)^2)``) — boosts multiply down the tree into
  each leaf's scoring weight; range boosts raise (ranges never score)

Divergences (each pinned by tests): an analyzed multi-token atom
contributes one clause per token with the same occur (Lucene's parser
would auto-phrase them). Quoted phrases carry their occur exactly
(round 4, final): ``+"a b"`` restricts the match set, a bare ``"a b"``
is a true SHOULD clause (classic-parser default OR).
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field as _dc_field

_FIELD_RE = re.compile(r'^([A-Za-z_]\w*):(.+)$', re.S)
_PHRASE_RE = re.compile(r'^"([^"]*)"(?:~(\d+))?$')


def _split_tokens(q: str) -> list[str]:
    """Whitespace-split into clause tokens, keeping quoted phrases,
    (nested) paren groups, and bracketed ranges intact. A regex cannot
    match nested parens, so this is a small depth-tracking scanner."""
    toks: list[str] = []
    i, n = 0, len(q)
    while i < n:
        if q[i].isspace():
            i += 1
            continue
        start = i
        depth = 0
        in_quote = False
        bracket: str | None = None      # closing char of [..] / {..}
        while i < n:
            c = q[i]
            if in_quote:
                if c == '"':
                    in_quote = False
            elif bracket is not None:
                if c == bracket:
                    bracket = None
            elif c == '"':
                in_quote = True
            elif c in "[{":
                bracket = "]" if c == "[" else "}"
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth < 0:
                    raise ValueError(f"unbalanced ')' in query: {q!r}")
            elif c.isspace() and depth == 0:
                break
            i += 1
        if depth > 0:
            raise ValueError(f"unbalanced '(' in query: {q!r}")
        toks.append(q[start:i])
    return toks


def _outer_parens_match(tok: str) -> bool:
    """True when tok is one (...) group — the opening paren closes at the
    very end (``(a)(b)`` starts with ( and ends with ) but is not one)."""
    if not (tok.startswith("(") and tok.endswith(")")):
        return False
    depth = 0
    for i, c in enumerate(tok):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i == len(tok) - 1
    return False


#: chars legal inside a NESTED group: plain terms, occurs, nesting,
#: quoted phrases with optional ~slop, expansions, field-scoped terms,
#: phrases and ranges, ^boosts (round 4), spaces
_NESTED_OK_RE = re.compile(r'^[\w .+\-()"~*?/:\[\]{}^]*$')
#: structure markers that route a group to the nested parser
_STRUCT_RE = re.compile(r'[()]|(?:^|[\s(])[+\-]\S|\b(?:AND|NOT|&&)\b')


@dataclass(frozen=True)
class TermLeaf:
    """A ``^boosted`` plain term inside a () group (round 4, final:
    member boosts inside STRUCTURED groups — ``(+a b^2)``). Unboosted
    terms stay raw strings (the pre-existing leaf shape); the engine
    multiplies ``boost`` into the leaf's scoring weight."""
    text: str
    boost: float = 1.0


@dataclass(frozen=True)
class PhraseLeaf:
    """A quoted phrase inside a () group (round 4): ``("a b"~1 c)``,
    field-scoped ``(path:"file txt" c)`` and ``^boosted`` forms included
    (round 4, final). Matching is exact (consecutive / span-near
    positions, in ``field``'s namespace when scoped); scoring gates the
    phrase's constituent terms on the phrase's own match set — the same
    term-scoring-over-phrase-docs convention as top-level query-string
    phrases (pinned divergence from Lucene phrase-freq)."""
    text: str
    slop: int = 0
    field: str = ""
    boost: float = 1.0


@dataclass(frozen=True)
class ExpansionLeaf:
    """A multi-term expansion inside a () group (round 4):
    ``(+par* main)``, ``(fuzz~1 (a b))``, field-scoped and ``^boosted``
    forms included (round 4, final: ``(+lang:pyth* x)``, ``(par*^2 b)``).
    Lucene rewrites a MultiTermQuery inside a BooleanQuery to a
    SHOULD-of-expansions — a pure-SHOULD subquery, auto-matched by any
    present expanded term, so it never gates scoring. ``kind`` is
    prefix/wildcard/fuzzy/regexp; ``num`` is fuzzy max edits; ``field``
    scopes the expansion to that field's ``field:token`` namespace."""
    kind: str
    text: str
    num: int = 0
    field: str = ""
    boost: float = 1.0


@dataclass(frozen=True)
class FieldLeaf:
    """A field-scoped term atom inside a () group (round 4):
    ``(+lang:python parser)``, optionally ``^boosted``. The engine
    analyzes ``text`` and matches / scores the tokens in the field's
    ``field:token`` namespace with the field's own norms."""
    field: str
    text: str
    boost: float = 1.0


@dataclass(frozen=True)
class RangeLeaf:
    """A ``field:[lo TO hi]`` member inside a () group (round 4) —
    matching-only (ranges never score here, the same constant-score
    divergence as top-level ranges), legal in any occur position.
    A SHOULD-positioned range (round 4, final) joins the group's match
    union — a doc can MATCH through it — but contributes zero score, so
    a doc matched ONLY through range members (no scoring term present
    anywhere) carries zero BM25 mass and is omitted from results — the
    documented top-level range convention (Lucene's constant-score
    rewrite would emit it at 1.0). ``num`` = bracket exclusivity bits
    (bit0 lo, bit1 hi). Range boosts raise (they would never apply)."""
    field: str
    text: str
    num: int = 0


@dataclass
class GroupNode:
    """One boolean level of a nested () group. Children are raw atom
    strings (analyzed by the engine), TermLeaf boosted terms, PhraseLeaf
    phrases, ExpansionLeaf expansions, FieldLeaf field-scoped terms,
    RangeLeaf range filters, or nested GroupNodes. ``boost`` (round 4,
    final — Lucene subquery boost ``(a (b c)^2)``) multiplies the
    scoring weight of every leaf under this node."""
    musts: list = _dc_field(default_factory=list)
    shoulds: list = _dc_field(default_factory=list)
    nots: list = _dc_field(default_factory=list)
    boost: float = 1.0

    def positive_leaves(self) -> list[str]:
        """Raw term atoms that contribute to scoring (everything not under
        a MUST_NOT), document order, duplicates preserved. PhraseLeaf
        texts are included as their raw text (callers that need phrase
        semantics walk the tree; see has_phrase)."""
        out: list[str] = []
        for item in self.musts + self.shoulds:
            if isinstance(item, GroupNode):
                out += item.positive_leaves()
            elif isinstance(item, (TermLeaf, PhraseLeaf, ExpansionLeaf,
                                   FieldLeaf)):
                out.append(item.text)
            elif not isinstance(item, RangeLeaf):  # ranges never score
                out.append(item)
        return out

    def has_phrase(self) -> bool:
        """True when any bucket (incl. MUST_NOT) holds a PhraseLeaf —
        term-level De Morgan is then unsound for deny groups (a phrase's
        terms may co-occur non-consecutively) and the id channel is
        required."""
        return any(
            isinstance(i, PhraseLeaf)
            or (isinstance(i, GroupNode) and i.has_phrase())
            for i in self.musts + self.shoulds + self.nots)

    def has_expansion(self) -> bool:
        """True when any bucket holds an ExpansionLeaf — deny groups then
        ride the id channel (the engine expands against the dictionary,
        which the parser cannot)."""
        return any(
            isinstance(i, ExpansionLeaf)
            or (isinstance(i, GroupNode) and i.has_expansion())
            for i in self.musts + self.shoulds + self.nots)

    def has_nonterm_leaf(self) -> bool:
        """True when any bucket (incl. MUST_NOT) holds a non-plain-term
        leaf (phrase / expansion / field / range) — the deny fast path's
        term-level De Morgan is then unsound or insufficient and the id
        channel is required. A boosted TermLeaf counts as plain: boosts
        never affect matching, so De Morgan stays sound."""
        return any(
            (isinstance(i, GroupNode) and i.has_nonterm_leaf())
            or not isinstance(i, (str, TermLeaf, GroupNode))
            for i in self.musts + self.shoulds + self.nots)

    def is_pure_should(self) -> bool:
        return (not self.musts and not self.nots
                and all(not isinstance(s, GroupNode) or s.is_pure_should()
                        for s in self.shoulds))

    def leaf_gate_classes(self, top_guaranteed: bool = True
                          ) -> list[tuple[tuple, list]]:
        """Positive leaves grouped by their scoring GATE (round 4): the
        tuple of STRUCTURED strict-ancestor subgroups (ones with +/-
        children) that must all match a doc for the leaf to score under
        Lucene BooleanQuery semantics. Pure-SHOULD ancestors never gate —
        a present leaf propagates a match up any pure-SHOULD chain, so a
        leaf's contribution is conditioned exactly on its structured
        ancestors matching. ``top_guaranteed=False`` (the group sits in
        SHOULD position) adds the root itself as a gate when structured.
        A structured subgroup whose match is already IMPLIED is never a
        gate: candidacy (or the nearest enclosing gate matching)
        propagates down MUST edges — if P matches, every MUST child of P
        matches — so only structured subgroups off that covered MUST
        spine gate. Trees whose structured subgroups all sit on the MUST
        spine thus yield all-empty gates, and the caller keeps the
        pre-round-4 flatten plan bit-identically. An empty-gate class flattens
        exactly; each non-empty class scores only over its gates'
        match-set intersection. Returns [(gates, [leaf atoms])] in
        first-seen order, duplicates preserved; atoms are raw strings,
        TermLeaf/PhraseLeaf/ExpansionLeaf/FieldLeaf objects. Subgroup
        ``boost`` multipliers (round 4, final) fold into each descendant
        leaf's effective boost — an unboosted raw-string leaf under a
        boosted subgroup is emitted as a TermLeaf carrying the product,
        so boost-free trees return bit-identical atoms to pre-boost
        rounds."""
        from dataclasses import replace as _replace
        classes: dict[tuple, tuple[tuple, list]] = {}
        order: list[tuple] = []

        def leaf(gates: tuple, atom) -> None:
            key = tuple(id(g) for g in gates)  # GroupNode is unhashable
            if key not in classes:
                classes[key] = (gates, [])
                order.append(key)
            classes[key][1].append(atom)

        def boosted(item, mult: float):
            """Fold an enclosing-subgroup multiplier into the leaf."""
            if mult == 1.0:
                return item
            if isinstance(item, str):
                return TermLeaf(item, mult)
            return _replace(item, boost=item.boost * mult)

        def walk(node: "GroupNode", gates: tuple, covered: bool,
                 mult: float) -> None:
            mult = mult * node.boost
            for bucket, is_must in ((node.musts, True),
                                    (node.shoulds, False)):
                for item in bucket:
                    if isinstance(item, PhraseLeaf):
                        # a phrase leaf gates its own constituent terms
                        # on the phrase's match set — unless its match is
                        # already implied (MUST position on the covered
                        # spine), where plain term scoring is identical
                        if covered and is_must:
                            leaf(gates, boosted(item, mult))
                        else:
                            leaf(gates + (item,), boosted(item, mult))
                    elif isinstance(item, RangeLeaf):
                        pass    # matching-only, never a scoring leaf
                    elif not isinstance(item, GroupNode):
                        leaf(gates, boosted(item, mult))
                    elif item.musts or item.nots:  # structured subgroup
                        if covered and is_must:
                            # MUST-spine implied
                            walk(item, gates, True, mult)
                        else:
                            walk(item, gates + (item,), True, mult)
                    else:  # pure-SHOULD: auto-matched by any present leaf
                        walk(item, gates, False, mult)

        if (self.musts or self.nots) and not top_guaranteed:
            walk(self, (self,), True, 1.0)
        else:
            walk(self, (), top_guaranteed, 1.0)
        return [classes[key] for key in order]


def _classify_expansion(text: str) -> "tuple[str, str, int] | None":
    """(kind, text, num) when ``text`` is an expansion atom (regexp /
    fuzzy / prefix / wildcard), else None. Shared by the bare and the
    field-scoped member paths of ``parse_group_tree``."""
    rx = _REGEX_RE.match(text)
    if rx is not None:
        return ("regexp", rx.group(1), 0)
    fz = _FUZZY_RE.match(text)
    if fz is not None:
        return ("fuzzy", fz.group(1),
                _fuzzy_edits(fz.group(1), fz.group(2)))
    if text.endswith("*") and "*" not in text[:-1] and "?" not in text:
        if len(text) < 2:
            raise ValueError("bare * inside a group")
        return ("prefix", text[:-1], 0)
    if "*" in text or "?" in text:
        return ("wildcard", text, 0)
    return None


def parse_group_tree(inner: str) -> GroupNode:
    """Parse the inside of a nested () group: plain terms, +/- occurs,
    AND/OR/NOT connectives, and nested groups. Same connective semantics
    as the top level (AND promotes both neighbors to MUST, NOT == -).
    Members may carry ``^boosts`` (round 4, final) — terms, phrases,
    expansions, field-scoped terms, and whole subgroups; a range boost
    raises (ranges never score)."""
    if not _NESTED_OK_RE.match(inner):
        raise ValueError(
            "nested () groups may contain only plain terms, quoted "
            "phrases, expansions, field terms/phrases/ranges, ^boosts, "
            f"+/-, AND/OR/NOT and nested groups: {inner!r}")
    node = GroupNode()
    seq: list[tuple[str, object]] = []   # (occur, atom-or-node)
    pending_not = False
    pending_and = False
    for tok in _split_tokens(inner):
        up = tok.upper()
        if up in ("AND", "&&"):
            if seq and seq[-1][0] == "":
                seq[-1] = ("+", seq[-1][1])
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
            raise ValueError("dangling +/- with no atom in group")
        # member ^boost (round 4, final) — parsed outermost, exactly as
        # at top level ('"a b"~1^2', '(b c)^2', 'lang:py*^3')
        boost = 1.0
        bm = _BOOST_RE.match(tok)
        if bm is not None and not tok.endswith('"'):
            tok, boost = bm.group(1), float(bm.group(2))
            if not tok:
                raise ValueError("dangling ^boost with no atom in group")
        pm = _PHRASE_RE.match(tok)
        if pm is not None:
            # quoted phrase leaf (round 4): ("a b"~N c) — exact phrase
            # matching, constituent-term scoring gated on the match set
            if not pm.group(1).strip():
                raise ValueError(f"empty phrase in group: {inner!r}")
            seq.append((occur, PhraseLeaf(pm.group(1),
                                          int(pm.group(2) or 0),
                                          boost=boost)))
            continue
        if tok.startswith('"'):
            raise ValueError(f"malformed phrase in group: {tok!r}")
        if _outer_parens_match(tok):
            child = parse_group_tree(tok[1:-1].strip())
            if not (child.musts or child.shoulds or child.nots):
                raise ValueError(f"empty () group in: {inner!r}")
            child.boost = boost   # subquery boost '(b c)^2' (round 4)
            seq.append((occur, child))
            continue
        fgm = _FIELD_RE.match(tok)
        if fgm is not None and _outer_parens_match(fgm.group(2)):
            # field-scoped group member (round 4, final):
            # (+lang:(en fr) x) — Lucene's field-grouped syntax at any
            # nesting depth. A pure-SHOULD GroupNode of FieldLeaf /
            # field-scoped ExpansionLeaf members over the field's
            # namespace; plain terms and expansions only (the same
            # member grammar as top-level field groups), each
            # optionally ^boosted; the whole group's ^boost rides
            # GroupNode.boost.
            g_field, g_inner = fgm.group(1), fgm.group(2)[1:-1].strip()
            if not g_inner:
                raise ValueError(f"empty () group in: {inner!r}")
            if (any(ch in g_inner for ch in '":()[]{}')
                    or _STRUCT_RE.search(g_inner)
                    or any(m.upper() in ("AND", "OR", "NOT", "&&", "||")
                           for m in g_inner.split())):
                # members beyond plain terms/expansions (quoted phrases,
                # occur prefixes, connectives): distribute the field and
                # recurse — f:("a b" -c) == (f:"a b" -f:c) (round 4,
                # final; MultiFieldQueryParser field-grouping sugar)
                child = parse_group_tree(
                    _distribute_field(g_field, g_inner))
                child.boost = boost
                seq.append((occur, child))
                continue
            child = GroupNode(boost=boost)
            for mem in g_inner.split():
                m_boost = 1.0
                mb = _BOOST_RE.match(mem)
                if mb is not None:
                    mem, m_boost = mb.group(1), float(mb.group(2))
                    if not mem:
                        raise ValueError(
                            "dangling ^boost with no atom in group")
                exp = _classify_expansion(mem)
                if exp is not None:
                    kind, text, num = exp
                    child.shoulds.append(ExpansionLeaf(
                        kind, text, num, field=g_field, boost=m_boost))
                else:
                    child.shoulds.append(
                        FieldLeaf(g_field, mem, boost=m_boost))
            seq.append((occur, child))
            continue
        if "(" in tok or ")" in tok:
            raise ValueError(f"malformed group atom: {tok!r}")
        fm = _FIELD_RE.match(tok)
        if fm is not None:
            fname, f_inner = fm.group(1), fm.group(2)
            if f_inner == "*":
                # field-presence member (Lucene FieldExistsQuery):
                # matching-only, same as the open range [* TO *]
                if boost != 1.0:
                    raise ValueError("range boosts are not supported")
                seq.append((occur, RangeLeaf(fname, "* TO *", 0)))
                continue
            rm = _RANGE_RE.match(f_inner)
            if rm is not None:
                # field range member (round 4): matching-only, legal in
                # any occur position (a SHOULD range joins the match
                # union but never scores)
                if boost != 1.0:
                    raise ValueError("range boosts are not supported")
                ex = ((1 if rm.group(1) == "{" else 0)
                      | (2 if rm.group(4) == "}" else 0))
                seq.append((occur, RangeLeaf(
                    fname, f"{rm.group(2)} TO {rm.group(3)}", ex)))
                continue
            fpm = _PHRASE_RE.match(f_inner)
            if fpm is not None:
                # field-scoped phrase member (round 4, final):
                # (path:"file txt"~N c) — exact positions in the
                # field's namespace, field norms
                if not fpm.group(1).strip():
                    raise ValueError(f"empty phrase in group: {inner!r}")
                seq.append((occur, PhraseLeaf(fpm.group(1),
                                              int(fpm.group(2) or 0),
                                              field=fname, boost=boost)))
                continue
            if '"' in f_inner:
                raise ValueError(f"malformed phrase in group: {tok!r}")
            exp = _classify_expansion(f_inner)
            if exp is not None:
                # field-scoped expansion member (round 4, final):
                # (+lang:py* x) — the field's namespaced dictionary slice
                kind, text, num = exp
                seq.append((occur, ExpansionLeaf(kind, text, num,
                                                 field=fname,
                                                 boost=boost)))
                continue
            if any(ch in f_inner for ch in '*?/~"[]{}'):
                raise ValueError(
                    "field-scoped members inside groups may be plain "
                    f"terms, phrases, expansions or ranges only: {tok!r}")
            seq.append((occur, FieldLeaf(fname, f_inner, boost=boost)))
            continue
        if any(ch in tok for ch in '[]{}'):
            raise ValueError(f"range member needs a field: {tok!r}")
        exp = _classify_expansion(tok)
        if exp is not None:
            kind, text, num = exp
            seq.append((occur, ExpansionLeaf(kind, text, num,
                                             boost=boost)))
            continue
        if "/" in tok or '"' in tok:
            raise ValueError(f"malformed atom in group: {tok!r}")
        seq.append((occur, TermLeaf(tok, boost) if boost != 1.0 else tok))
    for occur, item in seq:
        (node.musts if occur == "+" else
         node.nots if occur == "-" else node.shoulds).append(item)
    if node.nots and not (node.musts or node.shoulds):
        raise ValueError(
            f"group with only MUST_NOT clauses matches nothing it can "
            f"enumerate: {inner!r}")
    return node
def _distribute_field(field: str, inner: str) -> str:
    """Lucene field grouping is syntax sugar: ``f:(a "b c" -d)`` is
    ``(f:a f:"b c" -f:d)`` — the field distributes over every member
    atom (``MultiFieldQueryParser`` semantics). Reroutes field-scoped
    groups whose members go beyond plain terms/expansions (quoted
    phrases, ``+``/``-`` occur prefixes, AND/OR/NOT connectives,
    nested subgroups — distributed recursively) through the
    structured-group substrate. Ranges and already-fielded members
    inside a field group raise loudly."""
    out: list[str] = []
    for tok in _split_tokens(inner):
        if tok.upper() in ("AND", "OR", "NOT", "&&", "||"):
            out.append(tok)
            continue
        pre = ""
        if tok[:1] in "+-":
            pre, tok = tok[0], tok[1:]
            if not tok:
                raise ValueError(
                    f"dangling +/- in field group: {inner!r}")
        if "(" in tok or ")" in tok:
            # nested subgroup inside a field group (round 4, final):
            # the field distributes recursively — f:(a (b c)^2) ==
            # (f:a (f:b f:c)^2); anything else paren-shaped raises
            core, suffix = tok, ""
            bm = _BOOST_RE.match(tok)
            if bm is not None and bm.group(1):
                core, suffix = bm.group(1), tok[len(bm.group(1)):]
            if not _outer_parens_match(core):
                raise ValueError(
                    f"malformed () inside a field-scoped group: {tok!r}")
            sub = core[1:-1].strip()
            if not sub:
                raise ValueError(f"empty () group in: {inner!r}")
            out.append(
                f"{pre}({_distribute_field(field, sub)}){suffix}")
            continue
        if "[" in tok or "{" in tok:
            raise ValueError(
                "ranges inside a field-scoped group are not "
                f"supported: {tok!r}")
        if not tok.startswith('"') and ":" in tok:
            raise ValueError(
                "field-scoped member inside a field-scoped group: "
                f"{tok!r}")
        out.append(f"{pre}{field}:{tok}")
    return " ".join(out)


_FUZZY_RE = re.compile(r'^(.+?)~(\d*(?:\.\d+)?)$')


def _fuzzy_edits(text: str, spec: str) -> int:
    """Map a fuzzy suffix to max edit distance, Lucene
    ``FuzzyQuery.floatToEdits`` semantics: bare ``~`` = 2; a value
    ≥ 1 is the edit distance itself, capped at 2 (Lucene's
    ``MAXIMUM_SUPPORTED_DISTANCE``); a fraction in (0, 1) is legacy
    minimum-similarity — edits = ⌊(1 − sim) · len(term)⌋ capped at 2."""
    if not spec:
        return 2
    val = float(spec)
    if val >= 1.0:
        return int(min(val, 2.0))
    if val == 0.0:
        return 0
    return min(int((1.0 - val) * len(text)), 2)
_BOOST_RE = re.compile(r'^(.+?)\^(\d+(?:\.\d+)?)$')
_REGEX_RE = re.compile(r'^/(.+)/$', re.S)
#: inclusive [lo TO hi], exclusive {lo TO hi}, and the mixed forms
#: ([lo TO hi} / {lo TO hi]) — Lucene TermRangeQuery bracket grammar
_RANGE_RE = re.compile(r'^([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])$', re.I)


@dataclass(frozen=True)
class Clause:
    occur: str       # "+" MUST | "" SHOULD | "-" MUST_NOT
    field: str       # "" = content
    kind: str        # term | phrase | prefix | wildcard | fuzzy | regexp
                     #      | group (text = space-separated plain terms)
                     #      | nested (text = raw inner string; parse with
                     #        parse_group_tree)
                     #      | range (text = "lo TO hi", inclusive; "*"
                     #        bound = open-ended, Lucene null bound)
                     #      | matchall (Lucene MatchAllDocsQuery, `*:*`)
    text: str        # raw atom text (unanalyzed)
    num: int = 0     # phrase slop / fuzzy max edits / range-exclusivity
                     #   bits (bit0 = lo exclusive, bit1 = hi exclusive)
    boost: float = 1.0  # Lucene ^boost (multiplies the clause's score)


def parse_query_string(q: str) -> list[Clause]:
    """Parse a Lucene classic query string into clauses. Raises ValueError
    on malformed input (unbalanced quote, empty field atom)."""
    if q.count('"') % 2:
        raise ValueError(f"unbalanced quote in query: {q!r}")
    clauses: list[Clause] = []
    pending_not = False
    pending_and = False
    for tok in _split_tokens(q):
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
        if tok == "*:*":
            # Lucene MatchAllDocsQuery: every live doc at constant score
            clauses.append(Clause(occur, "", "matchall", "*:*",
                                  boost=boost))
            continue
        if _outer_parens_match(tok):
            inner = tok[1:-1].strip()
            if not inner:
                raise ValueError("empty () group")
            if '"' in inner or ":" in inner:
                # quoted phrases, field-scoped terms/phrases/expansions,
                # and field ranges inside () groups (round 4) ride the
                # nested parser — PhraseLeaf / FieldLeaf / RangeLeaf /
                # ExpansionLeaf leaves, each optionally ^boosted
                clauses.append(Clause(occur, "", "nested", inner,
                                      boost=boost))
                continue
            if _STRUCT_RE.search(inner):
                # nesting or internal +/-/AND/NOT: boolean-structured
                # group; expansion members (round 4) become
                # ExpansionLeaf SHOULD-of-expansions rewrites; member
                # and subgroup ^boosts (round 4, final) fold into the
                # leaves' scoring weights
                clauses.append(Clause(occur, "", "nested", inner,
                                      boost=boost))
            else:
                # flat SHOULD group; members may be plain terms or
                # expansions (wind* t?ble fuzz~1 /re.ex/) — round 4 —
                # optionally member-boosted (a^2 wind*^3): Lucene
                # boosts each SHOULD clause inside the group
                clauses.append(Clause(occur, "", "group", inner,
                                      boost=boost))
            continue
        fm = _FIELD_RE.match(tok)
        if (fm is not None and not tok.startswith(('"', '/'))
                and _outer_parens_match(fm.group(2))):
            # field-scoped group (round 4): lang:(python go) — a
            # plain-term SHOULD group over the field's namespace
            # (Lucene's field-grouped query syntax)
            inner = fm.group(2)[1:-1].strip()
            if not inner:
                raise ValueError("empty () group")
            if (any(ch in inner for ch in '":()')
                    or _STRUCT_RE.search(inner)):
                # members beyond plain terms/expansions — quoted
                # phrases, occur prefixes, AND/NOT connectives:
                # distribute the field and reroute through the
                # structured-group substrate (round 4, final) —
                # f:("a b" -c) == (f:"a b" -f:c), Lucene's
                # MultiFieldQueryParser field-grouping sugar
                clauses.append(Clause(
                    occur, "", "nested",
                    _distribute_field(fm.group(1), inner), boost=boost))
                continue
            clauses.append(Clause(occur, fm.group(1), "group", inner,
                                  boost=boost))
            continue
        if "(" in tok or ")" in tok:
            raise ValueError(f"unbalanced or nested parens in atom: {tok!r}")
        field = ""
        if not tok.startswith(('"', '/')):
            m = _FIELD_RE.match(tok)
            if m:
                field, tok = m.group(1), m.group(2)
        if field and tok == "*":
            # Lucene FieldExistsQuery (`field:*`): a non-scoring
            # field-presence filter — identical to the open range
            # `field:[* TO *]`
            clauses.append(Clause(occur, field, "range", "* TO *",
                                  boost=boost))
            continue
        m = _RANGE_RE.match(tok)
        if m is not None:
            if not field:
                raise ValueError(
                    f"range clause needs a field: {tok!r}")
            # num encodes endpoint exclusivity as two bits:
            # bit0 = lo exclusive ('{'), bit1 = hi exclusive ('}')
            excl = ((1 if m.group(1) == "{" else 0)
                    | (2 if m.group(4) == "}" else 0))
            clauses.append(Clause(occur, field, "range",
                                  f"{m.group(2)} TO {m.group(3)}",
                                  num=excl, boost=boost))
            continue
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
            clauses.append(Clause(occur, field, "fuzzy", m.group(1),
                                  _fuzzy_edits(m.group(1), m.group(2)),
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
