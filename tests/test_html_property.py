"""Property fuzz for the HTML extraction tier: random small markup composed
from hazard fragments (script bodies containing '<', entities, links with
newline-wrapped attributes, unclosed tags, comments) — engine expressions vs
a pure-Python re-implementation of the same published rules."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from custom_columnar_format_spark.operators import html

_NOISE = (
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
)
_SPLIT = html.BLOCK_SPLIT_RE


def _py_strip_noise(h: str) -> str:
    for pat in _NOISE:
        h = re.sub(pat, " ", h)
    return h


def _py_decode_numeric(t: str) -> str:
    pieces = t.split("&#")
    out = [pieces[0]]
    for p in pieces[1:]:
        code = rest = None
        m = re.match(r"^([0-9]{1,7});", p)
        mh = re.match(r"^[xX]([0-9a-fA-F]{1,6});", p)
        if m:
            c = int(m.group(1))
            if 1 <= c <= 65535 and not (55296 <= c <= 57343):
                code, rest = c, p[m.end():]
        elif mh:
            c = int(mh.group(1), 16)
            if 1 <= c <= 65535 and not (55296 <= c <= 57343):
                code, rest = c, p[mh.end():]
        out.append(chr(code) + rest if code is not None else "&#" + p)
    return "".join(out)


def _py_tagless(f: str) -> str:
    t = re.sub(r"<[^>]*>", " ", f)
    for ent, rep in html.ENTITIES_NAMED:
        t = t.replace(ent, rep)
    t = _py_decode_numeric(t)
    t = t.replace(*html.ENTITY_AMP)
    return re.sub(r"[ \t\n\r]+", " ", t).strip()


def _py_html_to_text(h: str) -> str:
    return _py_tagless(_py_strip_noise(h))


def _py_main_content(h: str, min_words: int = 3) -> str:
    kept = []
    for b in re.split(_SPLIT, _py_strip_noise(h)):
        txt = _py_tagless(b)
        if not txt:
            continue
        words = len(txt.split(" "))
        links = len(re.findall(r"<a[ \t\n\r>]", b.lower()))
        if words >= min_words and links * 3 < words:
            kept.append(txt)
    return " ".join(kept)


_frag = st.sampled_from(
    [
        "plain words here",
        "three little words",
        "x",
        "<p>",
        "</p>",
        "<div class='c'>",
        "</div>",
        "<SCRIPT>if (1 < 2 && a > b) { x('</div>'); }</script>",
        "<style>p { color: red; }</style>",
        "<!-- a < comment -->",
        '<a href="/">home</a>',
        '<a\nhref="/t">tags</a>',
        "&amp;lt; &quot;q&quot; &#39;s&#39; &nbsp;",
        "&#8217;curly&#8217; &#x2014; dash",
        "&amp;#8217; literal &#xD800; bad &#0; nul &#999999; astral",
        "&#65&#x41 unterminated &# bare",
        "<br/>",
        "<br >",
        "one<br>two<br/>three",
        "<h2>head words</h2>",
        "\n\t ",
        "<unclosed",
        "dangling > bracket",
    ]
)
_page = st.lists(_frag, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=25, deadline=None)
@given(st.lists(_page, min_size=1, max_size=6))
def test_html_extraction_fuzz_matches_python(spark, pages):
    df = spark.createDataFrame([(i, p) for i, p in enumerate(pages)], "i: long, h: string")
    got = {
        r.i: (r.full, r.main)
        for r in df.select(
            "i",
            html.html_to_text(F.col("h")).alias("full"),
            html.main_content(F.col("h")).alias("main"),
        ).collect()
    }
    ref = {i: (_py_html_to_text(p), _py_main_content(p)) for i, p in enumerate(pages)}
    assert got == ref
