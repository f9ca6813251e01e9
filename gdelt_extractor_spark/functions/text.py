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


def strip_markup(col: Column | str) -> Column:
    """Web-text cleanup (the C4 pre-filter step): drop <script>/
    <style> blocks WITH their contents, strip remaining tags and
    HTML comments, unescape the five predefined XML entities plus
    numeric &#NN; codes for ASCII, and collapse the whitespace the
    removals leave behind.

    Pure regexp_replace chain — whole-stage codegen, scan speed, and
    each pattern is engine-portable POSIX-ish regex so a DuckDB twin
    applies the identical sequence.  Order matters: blocks before
    tags (a stripped <script> tag would leak its payload as text),
    entities after tags (so &lt;b&gt; does not become a strippable
    tag), amp last (so &amp;lt; ends as the literal '&lt;').
    """
    # two separate block patterns, NOT one with a backreference:
    # RE2 engines (DuckDB) silently drop backrefs, so a \1 pattern
    # would strip blocks in Spark but not in an oracle twin
    out = F.regexp_replace(
        col, r"(?is)<script\b[^>]*>.*?</script\s*>", " "
    )
    out = F.regexp_replace(
        out, r"(?is)<style\b[^>]*>.*?</style\s*>", " "
    )
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"(?s)</?[a-zA-Z][^>]*>", " ")
    out = F.regexp_replace(out, "&lt;", "<")
    out = F.regexp_replace(out, "&gt;", ">")
    out = F.regexp_replace(out, "&quot;", '"')
    out = F.regexp_replace(out, "&#39;", "'")
    out = F.regexp_replace(out, "&amp;", "&")
    return F.trim(F.regexp_replace(out, r"\s+", " "))
