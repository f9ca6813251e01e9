"""Text column expressions (all JVM-side, whole-stage-codegen'd).

Parity targets in the reference:
- ``text_filter`` — reference/extractor/extractor.py:69-71
  (``re.sub("[^a-zA-Z0-9 \\n]", "", text)``).
- ``url_site`` — reference/extractor/extractor.py:97
  (``urlparse(url).netloc``), re-expressed as a single regex so it
  stays in codegen instead of a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Matches urlparse().netloc for the http(s) URLs GDELT carries:
# optional scheme, optional userinfo, then host[:port] up to / ? #.
_NETLOC_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*:\/\/)?(?:[^\/@?#]*@)?([^\/?#]+)"


def text_filter(col: Column | str) -> Column:
    """Strip every char outside [a-zA-Z0-9 \\n] (reference scrub)."""
    return F.regexp_replace(col, "[^a-zA-Z0-9 \n]", "")


def url_site(col: Column | str) -> Column:
    """Host (netloc incl. port) of a URL-ish string, '' if none."""
    return F.regexp_extract(col, _NETLOC_RE, 1)


def normalize_text(col: Column | str) -> Column:
    """Canonical form for hashing/dedup: lowercase, collapse runs of
    whitespace to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize_text(col), " ")
