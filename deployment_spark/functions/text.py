"""Text / string scalar functions (SURVEY §2.3) — all Catalyst built-ins,
no Python UDFs, so every expression stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _s(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _filled(c: Column | str) -> Column:
    # fillna('') parity — FAISS/PlainDemo/pipeline.py:281-287
    return F.coalesce(_s(c).cast("string"), F.lit(""))


def packet_text_v1(
    ip_src="ip_src",
    ip_dst="ip_dst",
    protocol="_ws_col_protocol",
    srcport="tcp_srcport",
    dstport="tcp_dstport",
    frame_len="frame_len",
) -> Column:
    """F1 — PlainDemo serialization (``FAISS/PlainDemo/pipeline.py:280-288``).

    Preserves the reference's quirk of including the protocol token TWICE
    (positions 3 and 6) — documented in SURVEY §7.3(3); parity with the
    reference's embeddings requires identical input text.
    """
    return F.concat_ws(
        " ",
        _filled(ip_src),
        _filled(ip_dst),
        _filled(protocol),
        _filled(srcport),
        _filled(dstport),
        _filled(protocol),
        _filled(frame_len),
    )


def packet_text_v2(
    ip_src="ip_src",
    ip_dst="ip_dst",
    protocol="_ws_col_protocol",
    srcport="tcp_srcport",
    dstport="tcp_dstport",
    frame_len="frame_len",
) -> Column:
    """F1 variant — UI-Demo serialization, 6 fields, protocol once
    (``FAISS/UI-Demo/pipeline+ui.py:322-329``)."""
    return F.concat_ws(
        " ",
        _filled(ip_src),
        _filled(ip_dst),
        _filled(protocol),
        _filled(srcport),
        _filled(dstport),
        _filled(frame_len),
    )


def combined_text(cols: list[str]) -> Column:
    """F2 — Milvus all-columns space-join (``Milvus/stream1.py:222``):
    ``df[cols].apply(lambda r: ' '.join(r.astype(str)), axis=1)`` without
    the row-at-a-time Python; ``concat_ws`` skips NULLs, matching the
    reference's dropna-before-join path."""
    return F.concat_ws(" ", *[_s(c).cast("string") for c in cols])


def sanitize_name(c: Column | str) -> Column:
    """F3 — model/collection name sanitization
    (``FAISS/PlainDemo/pipeline.py:310``; ``Milvus/stream1.py:97``)."""
    return F.regexp_replace(_s(c), r"[/\-.]", "_")


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization of non-empty text → array<string>."""
    return F.split(F.trim(_s(c)), r"\s+")


def token_at(c: Column | str, i: int) -> Column:
    """F4 — token extraction, e.g. protocol = text.split()[2]
    (``FAISS/UI-Demo/pipeline+ui.py:643-646``)."""
    return tokens(c).getItem(i)


def word_shingles(
    c: Column | str, n: int = 3, *, from_tokens: bool = False
) -> Column:
    """Word n-gram shingles → array<string>, distinct.

    Built by zipping ``n`` shifted slices of the token array — pure
    Catalyst, no UDF, and O(n·tokens) per row. NOT a per-index
    ``transform`` lambda doing ``slice(toks, i, n)``: higher-order
    lambdas evaluate interpreted and re-run the tokenizing regex split
    per element access, O(tokens²) per document — harmless on 100-token
    test docs, a multiplier on real multi-thousand-token documents
    (measured 10× on the DSIR operator before the same fix). Texts
    shorter than ``n`` words yield a single shingle of all their words
    (never an empty array for non-empty text, matching the usual
    MinHash convention): the shifted slices beyond the text are empty,
    ``zip_with`` pads them with NULL, and ``concat_ws`` skips nulls.

    ``from_tokens=True`` (r13): ``c`` is an ALREADY-TOKENIZED
    array<string> column. The shingle expression references the token
    array ``n + 1`` times; when that expression feeds a ``Generate``
    (explode), the generator is evaluated interpreted with NO common-
    subexpression elimination, so a text-column input re-runs the regex
    split ``n + 1`` times per row. Callers that explode shingles should
    pre-project ``tokens(text)`` once and pass the array column here —
    each reference is then a cheap attribute read (measured at sf0.1:
    doc_ngram_jaccard's shingle pass −0.2 s, dsir's feature pass −0.9 s
    for the analogous bigram fix).
    """
    from functools import reduce

    toks = _s(c) if from_tokens else tokens(c)
    cnt = F.size(toks)
    m = F.greatest(cnt - F.lit(n - 1), F.lit(1))
    shifted = [F.slice(toks, i + 1, m) for i in range(n)]
    sh = reduce(
        lambda a, b: F.zip_with(a, b, lambda x, y: F.concat_ws(" ", x, y)),
        shifted,
    )
    return F.array_distinct(sh)
