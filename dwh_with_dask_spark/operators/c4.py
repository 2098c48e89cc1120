"""C4-style heuristic cleaning rules (Raffel et al. 2020, public).

The C4 pipeline's page/line filters, re-expressed as pure Spark Column
algebra so a 100 TB corpus pays exactly one codegen'd scan — no Python,
no shuffle (every rule is row-local):

line level (a "line" is a ``\\n``-separated segment):
  * keep only lines that end in a terminal punctuation mark
    (``. ! ? "``),
  * keep only lines with at least ``min_words`` words,
  * drop lines containing the word "javascript" (case-insensitive);
page level:
  * drop pages containing "lorem ipsum" (case-insensitive),
  * drop pages containing a curly brace ``{`` (code),
  * drop pages whose retained text has fewer than ``min_sentences``
    sentence-terminal marks.

ABSENT-IN-REFERENCE (SURVEY.md §2B north-star): the reference pipeline
(`project-dask.py`, `dask-with-dataframe.py`) cleans financial-statement
cells, not web corpora; these rules are the published web-text
counterpart.

Determinism contract: no floats, no RNG — every output is a count or a
boolean, so the DuckDB oracle (plans/curation.py) reproduces it exactly.
Words within a line split on single spaces in BOTH engines (DuckDB's
``string_split`` is literal, so the Spark twin uses a literal single
space too; tab-joined words count as one — same on both sides).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TERMINAL_MARKS = (".", "!", "?", '"')


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _line_words(line: Column) -> Column:
    """Word count of one line: split on literal single spaces, drop
    empties (exact twin of DuckDB list_filter(string_split(x,' '),...))."""
    return F.size(F.filter(F.split(F.trim(line), " "), lambda w: w != F.lit("")))


def _line_keep(line: Column, min_words: int) -> Column:
    ends_terminal = F.right(F.rtrim(line), F.lit(1)).isin(*TERMINAL_MARKS)
    has_js = F.instr(F.lower(line), "javascript") > 0
    return ends_terminal & (_line_words(line) >= min_words) & ~has_js


def c4_lines(text: Column | str) -> Column:
    # NULL text behaves as the empty page, not a NULL cascade
    return F.split(F.coalesce(_col(text), F.lit("")), "\n")


def c4_kept_lines(text: Column | str, min_words: int = 5) -> Column:
    """Array of lines surviving the C4 line rules, original order."""
    return F.filter(c4_lines(text), lambda x: _line_keep(x, min_words))


def sentence_marks(text: Column | str) -> Column:
    """Count of sentence-terminal characters ``[.!?]`` — the cheap
    sentence proxy both engines compute as length minus stripped length."""
    c = _col(text)
    return F.length(c) - F.length(F.regexp_replace(c, r"[.!?]", ""))


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """Append the C4 rule columns to ``df``:

    ``c4_text`` (retained lines re-joined), ``n_lines``/``n_lines_kept``,
    ``has_lorem_ipsum``/``has_brace`` page flags, ``n_sentences`` (over
    the retained text), and the final ``c4_keep`` page verdict.

    One row-local projection — at 100 TB this fuses into the parquet
    scan with zero exchanges; the filterable verdict means downstream
    stages read only surviving pages.
    """
    text = F.coalesce(_col(text_col), F.lit(""))
    kept = c4_kept_lines(text, min_words)
    clean = F.array_join(kept, "\n")
    has_lorem = F.instr(F.lower(text), "lorem ipsum") > 0
    has_brace = F.instr(text, "{") > 0
    n_sent = sentence_marks(clean)
    return df.withColumns(
        {
            "c4_text": clean,
            "n_lines": F.size(c4_lines(text)),
            "n_lines_kept": F.size(kept),
            "has_lorem_ipsum": has_lorem,
            "has_brace": has_brace,
            "n_sentences": n_sent,
            "c4_keep": ~has_lorem & ~has_brace & (n_sent >= min_sentences),
        }
    )
