"""String-function library — the reference's parsing core re-expressed
as pure Column expressions (UDF-free, whole-stage-codegen'd).

Reference semantics reproduced:

* ``parse_credit_note`` — ``ParseCompanyFromPersonNotes``
  (reference ``GetWeta.py:370-411``): from a free-text credit note
  derive ``(role, company)``.
* ``strip_commas`` — CSV comma-strip escaping (``dwwApi.js:33-35``).
* ``clean_blacklist`` — blacklist-term removal (``dwwFront.js:159-176``).
* ``zzz_tag`` / ``is_sentinel`` — ``zzz_baddata``/``zzz_role`` sentinel
  tagging and filtering (``dwwFront.js:365-369``, ``GetWeta.py:161-164``).
* ``pad2`` — zero padding of date parts (``GetWeta.py:362-366``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# The chain mirrors the reference parse EXACTLY (GetWeta.py:370-411):
# symbol strip + IMMEDIATE lowercase (so later patterns see lowered
# text), quote normalize, episode-list removal, " uncredited"/" as …"
# removal (leading whitespace required), " ltd"/" inc" removal
# anywhere (optional trailing period), trim.
_SYMBOLS = r"[!@#*$()\\\[\]]"
_EPISODES = r"(\w+)\s(\bepisodes),?(\s\w+)?(-\w+)?"
_UNCREDITED_OR_AS = r"\suncredited|\sas\s.*$"
_CO_TYPES = r"(?:\sltd|\sinc)\.|(?:\sltd|\sinc)"


def clean_note(note: Column) -> Column:
    """Normalize a raw credit note string (pre-split cleanup chain,
    reference GetWeta.py:372-383)."""
    c = F.lower(F.regexp_replace(note, _SYMBOLS, ""))
    c = F.regexp_replace(c, '"', "'")
    c = F.regexp_replace(c, _EPISODES, "")
    c = F.regexp_replace(c, _UNCREDITED_OR_AS, "")
    c = F.regexp_replace(c, _CO_TYPES, "")
    return F.trim(c)


def _comp_side(c: Column) -> Column:
    """The company side: element between the first and second colon
    (reference splitRole[1], GetWeta.py:385-394), then the part before
    `` - `` (splitComp[0], :395)."""
    between = F.get(F.split(c, ":"), 1)
    return F.trim(F.substring_index(F.trim(between), " - ", 1))


def parse_role(note: Column) -> Column:
    """Role = text before the first ':'; colon-less notes yield ''
    (reference else-branch GetWeta.py:405-406)."""
    c = clean_note(note)
    return F.when(c.contains(":"), F.trim(F.substring_index(c, ":", 1))).otherwise(F.lit(""))


def parse_company(note: Column) -> Column:
    """Company from the company side, with division handling: a comma
    means ``division, company`` → company is the SECOND comma part
    (reference splitCompDivision[1], GetWeta.py:399-403); colon-less
    notes yield '' — the whole credit is unparseable, not a company
    (reference GetWeta.py:405-406)."""
    c = clean_note(note)
    side = _comp_side(c)
    company = F.when(
        side.contains(","), F.trim(F.get(F.split(side, ","), 1))
    ).otherwise(side)
    return F.when(c.contains(":"), company).otherwise(F.lit(""))


def parse_division(note: Column) -> Column:
    """Division = first comma part of the company side (appended to
    role in the reference: ``role += ", " + division``,
    GetWeta.py:401-402)."""
    c = clean_note(note)
    side = _comp_side(c)
    division = F.when(side.contains(","), F.trim(F.substring_index(side, ",", 1))).otherwise(
        F.lit("")
    )
    return F.when(c.contains(":"), division).otherwise(F.lit(""))


def strip_commas(col: Column) -> Column:
    """CSV escaping by comma removal (reference dwwApi.js:33-35 strips
    commas from values instead of quoting)."""
    return F.regexp_replace(col, ",", "")


def clean_blacklist(col: Column, terms: Sequence[str]) -> Column:
    """Remove each blacklist term (case-insensitive, LITERAL — terms
    like '(uncredited)' or 'ltd.' must not act as regex) and trim
    (reference dwwFront.js:159-176). Pure expression fold — no UDF."""
    import re

    c = F.lower(col)
    for t in terms:
        c = F.regexp_replace(c, rf"(?i){re.escape(t)}", "")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def blacklist_hits(col: Column, terms: Sequence[str]) -> Column:
    """Array of blacklist terms present in the value
    (reference dwwFront.js:160-168 tracks which terms hit)."""
    return F.filter(
        F.array(*[F.lit(t) for t in terms]),
        lambda t: F.lower(col).contains(F.lower(t)),
    )


def zzz_tag(col: Column, kind: str = "baddata") -> Column:
    """Prefix a sentinel tag (reference dwwFront.js:365-369)."""
    return F.concat(F.lit(f"zzz_{kind}:"), col)


def is_sentinel(col: Column) -> Column:
    """True when the value carries a zzz_ sentinel
    (reference GetWeta.py:161-164, dwwFront.js:206)."""
    return col.contains("zzz_")


def pad2(col: Column) -> Column:
    """Left-pad a date part to 2 digits (reference GetWeta.py:362-366) —
    keeps lexicographic order == chronological order."""
    return F.lpad(col, 2, "0")
