"""HTML / boilerplate text extraction — the first stage of every real
web-scale corpus pipeline (the reference has no text operators at all;
SURVEY.md §2.2). Every 100 TB crawl corpus starts as markup, and the
curation stack downstream of this module (Gopher repetition, CCNet chunk
filter, C4 blocklist — ``operators.text``) assumes clean text.

Three tiers, all pure JVM regexp/HOF expressions (no per-row Python, no
external parser — the rules are the public jusText/trafilatura-style
heuristics re-expressed as codegen-friendly regexes):

- ``strip_noise``: drop <script>/<style> elements and <!-- comments -->
  BEFORE any tag stripping (their bodies are code, not text, and may
  contain '<' that would corrupt a naive tag regex).
- ``html_to_text``: noise removal → every remaining tag → ' ' → named
  entity decode → whitespace collapse. The full-page text baseline.
- ``main_content``: text-density block heuristic. The page splits into
  blocks at closing block-level tags, each block becomes (text, n_links),
  and a block is kept iff it has >= ``min_words`` words and link density
  < 1/3 (``links * 3 < words`` — integer arithmetic, so the DuckDB oracle
  replays the keep decision EXACTLY). Navigation, footers, and titles are
  link-dense or too short; article bodies survive. This is the
  link-density core of jusText (Pomikalek 2011) without the stoplist
  refinement.

Cross-engine notes (the oracle contract): patterns stay inside the
Java-regex ∩ RE2 common subset — inline (?is) flags, non-greedy .*?,
explicit [ \\t\\n\\r] classes (never \\s: Java's includes \\x0B, RE2's does
not), no backreferences. Entity decode order matters: &amp; is decoded
LAST so '&amp;lt;' single-decodes to '&lt;' in both engines. Java's
split() drops trailing empty blocks while DuckDB's keeps them — harmless,
because empty-text blocks are filtered by the keep rule in both.

Scale shape: everything here is a narrow per-row projection — no shuffle,
no join, no aggregation. At 100 TB this stage is embarrassingly parallel
and scan-bound, which is exactly what the rawest, largest tier of the
pipeline needs; the per-source rollups in the registered query are one
partial-agg reduction on counts only (bodies never shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: closing tags that end a text block for the density heuristic
BLOCK_CLOSERS = (
    "p|div|li|h[1-6]|tr|td|table|ul|ol|nav|footer|header|section|article|title"
)
#: the full block-boundary pattern: closing block tags, plus <br>/<br/>
#: (r8 ADVICE: real crawl HTML separates text with <br> and never closes a
#: block tag — without this, <br>-separated nav/footer lines fuse into one
#: block and ride through the link-density rule). Shared verbatim with the
#: DuckDB oracle (Java-regex ∩ RE2 subset: explicit whitespace class).
BLOCK_SPLIT_RE = rf"(?i)(?:</(?:{BLOCK_CLOSERS})>|<br[ \t\n\r]*/?>)"
_BLOCK_SPLIT = BLOCK_SPLIT_RE

#: named entities decoded BEFORE the numeric pass; &amp; decodes LAST
#: (single-decode rule: '&amp;lt;' -> '&lt;', '&amp;#39;' -> '&#39;')
ENTITIES_NAMED = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
)
ENTITY_AMP = ("&amp;", "&")
#: kept for compatibility: the full named decode order (the numeric pass
#: sits between these two groups — see decode_entities)
ENTITIES = ENTITIES_NAMED + (ENTITY_AMP,)

#: numeric character-reference bodies (after a '&#' split): decimal and hex
_NUM_DEC = r"^([0-9]{1,7});"
_NUM_HEX = r"^[xX]([0-9a-fA-F]{1,6});"

_NOISE_PATTERNS = (
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
)


def strip_noise(html: Column) -> Column:
    """Remove script/style elements and comments (bodies and all)."""
    out = html
    for pat in _NOISE_PATTERNS:
        out = F.regexp_replace(out, pat, " ")
    return out


def _chr_bmp(code: Column) -> Column:
    """Unicode character from a BMP codepoint: int → 4 hex digits →
    UTF-16BE bytes → string. Spark's own char()/chr() is ASCII-mod-256 so
    it cannot produce typographic characters; this route is all built-ins
    (conv/lpad/unhex/decode) and DuckDB replays it as plain chr(code)."""
    return F.decode(
        F.unhex(F.lpad(F.conv(code.cast("string"), 10, 16), 4, "0")), "UTF-16BE"
    )


def _num_ok(code: Column) -> Column:
    """Decodable numeric reference: BMP, non-zero, not a surrogate — the
    exact predicate the DuckDB twin applies (DuckDB's chr() ERRORS on
    surrogates, so both engines must agree on what stays literal)."""
    return (
        code.isNotNull()
        & (code >= 1)
        & (code <= 65535)
        & ~((code >= 55296) & (code <= 57343))
    )


def decode_numeric_entities(text: Column) -> Column:
    """Decode `&#NN;` / `&#xNN;` numeric character references (r8 ADVICE:
    `&#x2019;`-style refs are everywhere in real crawl HTML and leaked into
    extracted text as literals). One split on '&#', then a transform that
    re-assembles each piece with its leading reference decoded — a single
    pass, so '&#38;#39;' single-decodes to '&#39;' like the named chain.
    BMP-only by design: astral refs (+ NUL and surrogates) stay literal —
    the guard keeps both engines total (DuckDB chr() errors on surrogates)
    and astral typography is vanishingly rare in boilerplate. All JVM
    built-ins; the DuckDB twin is the same split/transform with chr().

    The whole split/transform pipeline is gated behind a cheap
    ``contains('&#')`` pre-filter: most real blocks carry no numeric refs,
    and without a ref the decode is the identity, so the gate is
    semantics-identical while skipping ~all of the cost (r9 VERDICT: the
    ungated pass was a 1.8-1.9x regression on q_html_extract_stats)."""
    pieces = F.split(text, "&#")

    def _piece(p: Column, i: Column) -> Column:
        d = F.regexp_extract(p, _NUM_DEC, 1)
        h = F.regexp_extract(p, _NUM_HEX, 1)
        dcode = F.when(d != "", d.cast("long"))
        hcode = F.when(h != "", F.conv(h, 16, 10).cast("long"))
        rest_d = p.substr(F.length(d) + F.lit(2), F.length(p))
        rest_h = p.substr(F.length(h) + F.lit(3), F.length(p))
        return (
            F.when(i == 0, p)  # text before the first '&#' is never a ref
            .when(_num_ok(dcode), F.concat(_chr_bmp(dcode), rest_d))
            .when(_num_ok(hcode), F.concat(_chr_bmp(hcode), rest_h))
            .otherwise(F.concat(F.lit("&#"), p))
        )

    decoded = F.array_join(F.transform(pieces, _piece), "")
    return F.when(text.contains("&#"), decoded).otherwise(text)


def decode_entities(text: Column) -> Column:
    """Full entity decode, single-pass per reference: named entities, then
    numeric character references, then &amp; LAST — so '&amp;lt;' →
    '&lt;' and '&amp;#39;' → '&#39;' (one decode each). The one inherent
    ordering trade: '&#38;amp;' ends as '&' (numeric must precede amp or
    the far more common '&amp;#NN;' pattern would double-decode).

    Gated on ``contains('&')``: every entity form starts with '&', so a
    text without one decodes to itself and the whole replace/split chain
    can be skipped per-row (the numeric pass inside carries its own
    tighter '&#' gate for texts with named refs only)."""
    out = text
    for ent, rep in ENTITIES_NAMED:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    out = decode_numeric_entities(out)
    out = F.replace(out, F.lit(ENTITY_AMP[0]), F.lit(ENTITY_AMP[1]))
    return F.when(text.contains("&"), out).otherwise(text)


def _tagless_text(fragment: Column) -> Column:
    """Tags → space, entities decoded, whitespace collapsed, trimmed.
    Assumes noise (script/style/comments) is already gone."""
    t = F.regexp_replace(fragment, r"<[^>]*>", " ")
    t = decode_entities(t)
    t = F.regexp_replace(t, r"[ \t\n\r]+", " ")
    return F.trim(t)


def html_to_text(html: Column) -> Column:
    """Full-page plain text: noise removal + tag stripping + entity decode
    + whitespace normalization."""
    return _tagless_text(strip_noise(html))


def block_stats(html: Column) -> Column:
    """array<struct<txt, words, links>> — one entry per block-level text
    block: its cleaned text, word count, and <a>-tag count (link-density
    numerator). Noise is stripped page-wide BEFORE splitting so a '<'
    inside script code cannot corrupt a block boundary."""
    blocks = F.split(strip_noise(html), _BLOCK_SPLIT)
    # the tag name may be followed by any whitespace, not just a space —
    # '<a\nhref=...' is common in real markup and undercounting links would
    # let navigation blocks through as main content
    return F.transform(
        blocks,
        lambda b: F.struct(
            _tagless_text(b).alias("txt"),
            F.size(F.regexp_extract_all(F.lower(b), F.lit(r"<a[ \t\n\r>]"), 0)).alias(
                "links"
            ),
        ),
    )


def main_content(html: Column, min_words: int = 3) -> Column:
    """Main-content text by the link-density rule: keep blocks with >=
    ``min_words`` words and ``links * 3 < words``; join survivors with a
    single space. Deterministic, integer-exact — replayable in any SQL
    engine with list HOFs."""
    kept = F.filter(
        block_stats(html),
        lambda s: (s.getField("txt") != "")
        & (F.size(F.split(s.getField("txt"), " ")) >= min_words)
        & (s.getField("links") * 3 < F.size(F.split(s.getField("txt"), " "))),
    )
    return F.array_join(F.transform(kept, lambda s: s.getField("txt")), " ")
