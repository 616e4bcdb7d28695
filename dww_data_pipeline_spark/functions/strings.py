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

# Order matters and mirrors the reference parse chain
# (GetWeta.py:376-395): symbol strip, quote normalize, episode-list
# removal, uncredited/as-suffix removal, company-suffix removal.
_SYMBOLS = r"[!@#*$()\[\]]"
_EPISODES = r"(\w+)\s(episodes),?(\s\w+)?(-\w+)?"
_UNCREDITED = r"uncredited"
_AS_SUFFIX = r"\bas\s.*$"
_CO_SUFFIX = r"\b(ltd|inc)\.?\s*$"


def clean_note(note: Column) -> Column:
    """Normalize a raw credit note string (pre-split cleanup chain)."""
    c = F.regexp_replace(note, _SYMBOLS, "")
    c = F.regexp_replace(c, '"', "'")
    c = F.regexp_replace(c, _EPISODES, "")
    c = F.regexp_replace(c, _UNCREDITED, "")
    c = F.regexp_replace(c, _AS_SUFFIX, "")
    c = F.lower(F.trim(c))
    return c


def parse_role(note: Column) -> Column:
    """Role = text before the first ':' (empty if no colon)."""
    c = clean_note(note)
    return F.when(c.contains(":"), F.trim(F.substring_index(c, ":", 1))).otherwise(F.lit(""))


def parse_company(note: Column) -> Column:
    """Company = text after the first ':', with division handling.

    After the colon-split the company side is further split on
    `` - `` (take first part) and then on ``,``: a comma means
    ``division, company`` → the company is the part after the comma
    (reference GetWeta.py:397-409).
    """
    c = clean_note(note)
    after = F.when(c.contains(":"), F.trim(F.substring_index(c, ":", -1))).otherwise(c)
    after = F.trim(F.substring_index(after, " - ", 1))
    after = F.regexp_replace(after, _CO_SUFFIX, "")
    company = F.when(
        after.contains(","), F.trim(F.substring_index(after, ",", -1))
    ).otherwise(F.trim(after))
    return company


def parse_division(note: Column) -> Column:
    """Division = comma-prefixed part of the company side (appended to
    role in the reference: ``role += ", " + division``)."""
    c = clean_note(note)
    after = F.when(c.contains(":"), F.trim(F.substring_index(c, ":", -1))).otherwise(c)
    after = F.trim(F.substring_index(after, " - ", 1))
    return F.when(after.contains(","), F.trim(F.substring_index(after, ",", 1))).otherwise(
        F.lit("")
    )


def strip_commas(col: Column) -> Column:
    """CSV escaping by comma removal (reference dwwApi.js:33-35 strips
    commas from values instead of quoting)."""
    return F.regexp_replace(col, ",", "")


def clean_blacklist(col: Column, terms: Sequence[str]) -> Column:
    """Remove each blacklist term (case-insensitive) and trim
    (reference dwwFront.js:159-176). Pure expression fold — no UDF."""
    c = F.lower(col)
    for t in terms:
        c = F.regexp_replace(c, rf"(?i){t}", "")
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
