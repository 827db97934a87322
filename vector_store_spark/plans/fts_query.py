"""FTS query-language parser (SURVEY.md §2.7 F7).

Grammar (the subset the reference's validator pins — fts.rs:248-337: terms,
AND / OR / NOT, parenthesised grouping, "phrase" queries):

    query   := or_expr
    or_expr := and_expr (OR and_expr)*
    and_expr:= not_expr (AND not_expr)*          # AND binds tighter than OR
    not_expr:= unary (NOT unary)*                # a NOT b = a AND NOT b
    unary   := '(' query ')' | '"' words '"' | word

Bare adjacent terms combine with OR (Lucene/Tantivy QueryParser default).
Terms are analyzed with the same chain as documents (lowercase; stop-words
dropped — a query that is only stop-words matches nothing).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from vector_store_spark.functions.text import ENGLISH_STOPWORDS


class QueryParseError(ValueError):
    pass


class QueryNode:
    pass


@dataclass(frozen=True)
class TermNode(QueryNode):
    term: str


@dataclass(frozen=True)
class PhraseNode(QueryNode):
    terms: tuple[str, ...]


@dataclass(frozen=True)
class AndNode(QueryNode):
    left: QueryNode
    right: QueryNode


@dataclass(frozen=True)
class OrNode(QueryNode):
    left: QueryNode
    right: QueryNode


@dataclass(frozen=True)
class NotNode(QueryNode):
    left: QueryNode
    right: QueryNode


_TOKEN_RE = re.compile(r'\s*(\(|\)|"[^"]*"|[^\s()"]+)')
_STOP = set(ENGLISH_STOPWORDS)


def _analyze_word(w: str) -> list[str]:
    """Same analyzer as documents: lowercase, split non-alphanumeric, drop
    stop-words."""
    return [t for t in re.split("[^a-z0-9]+", w.lower()) if t and t not in _STOP]


class _Parser:
    def __init__(self, text: str):
        self.tokens: list[str] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if not m:
                break
            self.tokens.append(m.group(1))
            pos = m.end()
        self.i = 0

    def peek(self) -> str | None:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def next(self) -> str:
        tok = self.peek()
        if tok is None:
            raise QueryParseError("unexpected end of query")
        self.i += 1
        return tok

    def parse(self) -> QueryNode:
        node = self.or_expr()
        if self.peek() is not None:
            raise QueryParseError(f"unexpected token: {self.peek()}")
        return node

    def or_expr(self) -> QueryNode:
        node = self.and_expr()
        while True:
            tok = self.peek()
            if tok is not None and tok.upper() == "OR":
                self.next()
                node = OrNode(node, self.and_expr())
            elif tok is not None and tok not in (")",) and tok.upper() not in ("AND", "NOT"):
                # bare adjacency = OR (QueryParser default)
                node = OrNode(node, self.and_expr())
            else:
                return node

    def and_expr(self) -> QueryNode:
        node = self.not_expr()
        while (tok := self.peek()) is not None and tok.upper() == "AND":
            self.next()
            nxt = self.peek()
            if nxt is not None and nxt.upper() == "NOT":  # a AND NOT b
                self.next()
                node = NotNode(node, self.unary())
            else:
                node = AndNode(node, self.not_expr())
        return node

    def not_expr(self) -> QueryNode:
        node = self.unary()
        while (tok := self.peek()) is not None and tok.upper() == "NOT":
            self.next()
            node = NotNode(node, self.unary())
        return node

    def unary(self) -> QueryNode:
        tok = self.next()
        if tok == "(":
            node = self.or_expr()
            if self.next() != ")":
                raise QueryParseError("expected )")
            return node
        if tok == ")":
            raise QueryParseError("unexpected )")
        if tok.startswith('"'):
            words = _analyze_word(tok.strip('"'))
            if not words:
                raise QueryParseError("empty phrase")
            if len(words) == 1:
                return TermNode(words[0])
            return PhraseNode(tuple(words))
        words = _analyze_word(tok)
        if not words:
            raise QueryParseError(f"term is all stop-words or empty: {tok!r}")
        if len(words) == 1:
            return TermNode(words[0])
        # a word that splits into several tokens ("out-of-memory") behaves as a
        # phrase, matching the analyzer's positional output
        return PhraseNode(tuple(words))


def parse_query(text: str) -> QueryNode:
    if not text or not text.strip():
        raise QueryParseError("empty query")
    return _Parser(text).parse()
