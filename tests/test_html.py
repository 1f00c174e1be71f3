"""HTML/boilerplate extraction (round 8): planted-markup tests for the
regexp/HOF extraction tier — script/style/comment removal, tag stripping,
entity decode order, and the jusText-style link-density block heuristic."""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_columnar_format_spark.operators import html


def _one(spark, page, expr):
    return (
        spark.createDataFrame([(page,)], "h: string")
        .select(expr(F.col("h")).alias("v"))
        .collect()[0]
        .v
    )


def test_html_to_text_strips_script_style_comments(spark):
    page = (
        "<html><head><style>body { color: red; }</style>"
        '<script>if (1 < 2 && x > 0) { track("a<b"); }</script>'
        "</head><body><!-- hidden < comment -->real body text here</body></html>"
    )
    assert _one(spark, page, html.html_to_text) == "real body text here"


def test_html_to_text_decodes_entities_single_pass(spark):
    # &amp;lt; must decode to the TEXT '&lt;', never double-decode to '<'
    page = "<p>Q&amp;A &#39;x&#39; 1&lt;2 &quot;q&quot;&nbsp;z &amp;lt;</p>"
    assert _one(spark, page, html.html_to_text) == "Q&A 'x' 1<2 \"q\" z &lt;"


def test_numeric_entities_decode_dec_and_hex(spark):
    # r8 ADVICE: &#x2019;-style refs leaked into extracted text as literals
    page = "<p>it&#8217;s &#x2019;quoted&#X2019; A=&#65; em&#x2014;dash</p>"
    assert (
        _one(spark, page, html.html_to_text)
        == "it’s ’quoted’ A=A em—dash"
    )


def test_numeric_entities_guards_stay_literal(spark):
    # NUL, surrogates, astral, overlong, and unterminated refs stay literal
    # (DuckDB chr() errors on surrogates — both engines must agree to skip)
    page = "<p>&#0; &#xD800; &#57343; &#128512; &#99999999; &#65 &#xZZ; &#</p>"
    assert (
        _one(spark, page, html.html_to_text)
        == "&#0; &#xD800; &#57343; &#128512; &#99999999; &#65 &#xZZ; &#"
    )


def test_numeric_entities_single_decode_with_amp(spark):
    # '&amp;#8217;' is an ESCAPED reference: one decode -> literal '&#8217;'
    page = "<p>&amp;#8217; and &#38;lt;</p>"
    assert _one(spark, page, html.html_to_text) == "&#8217; and &lt;"


def test_entity_gates_are_identity_without_refs(spark):
    # r9 VERDICT: the decode chain is gated on contains('&') / contains('&#')
    # — the gates must be exactly identity-preserving on every boundary:
    # no '&' at all, '&' without any entity, named-only, numeric-only, and
    # empty/null inputs.
    cases = [
        ("plain text no entities at all", "plain text no entities at all"),
        ("AT&T rocks & rolls", "AT&T rocks & rolls"),  # '&' but no entity
        ("a &lt; b", "a < b"),  # named only (no '&#')
        ("it&#8217;s", "it’s"),  # numeric only
        ("&amp;#39; mix &#x41;", "&#39; mix A"),  # both, single-decode
        ("", ""),
    ]
    df = spark.createDataFrame(cases, "t: string, want: string").select(
        html.decode_entities(F.col("t")).alias("got"), "want"
    )
    for r in df.collect():
        assert r.got == r.want, (r.got, r.want)
    # null stays null through both gates
    null_row = (
        spark.createDataFrame([(None,)], "t: string")
        .select(html.decode_entities(F.col("t")).alias("got"))
        .collect()[0]
    )
    assert null_row.got is None


def test_br_splits_blocks_for_density_rule(spark):
    # <br>-separated short/link lines must split into their own blocks and
    # be dropped — previously they fused into one block and rode through
    page = (
        "<body><div><p>this long article body clearly survives the density"
        " rule with many words</p></div>"
        'contact<br>mail room<br/>tel 0100<br >'
        '<a href="/x">site index here</a><br/><a href="/y">y</a>'
        "</body>"
    )
    got = _one(spark, page, html.main_content)
    assert "long article body" in got
    # each <br>-separated line is its own block now: the 2-word lines fail
    # min_words and the link line fails density — none may leak through
    assert "contact" not in got and "mail room" not in got and "0100" not in got
    assert "site index" not in got


def test_html_to_text_collapses_whitespace_across_tags(spark):
    page = "<div>alpha</div>\n\t <div>beta\n\ngamma</div>"
    assert _one(spark, page, html.html_to_text) == "alpha beta gamma"


def test_main_content_drops_linkdense_and_short_blocks(spark):
    page = (
        "<html><head><title>short title</title></head><body>"
        '<nav><a href="/">home</a> <a href="/a">about</a> <a href="/b">faq</a>'
        " <a href=\"/c\">rss</a></nav>"
        "<div><p>this is the long article body that should clearly survive"
        " the density rule</p></div>"
        '<footer><a href="/p">privacy</a> <a href="/t">terms</a> copy</footer>'
        "</body></html>"
    )
    got = _one(spark, page, html.main_content)
    assert "long article body" in got
    assert "home" not in got and "privacy" not in got and "short title" not in got


def test_main_content_counts_links_across_newline_attributes(spark):
    # review r8: '<a\nhref=...' is common in real markup — the link counter
    # must see it, or navigation sneaks through as main content
    page = (
        '<nav><a\nhref="/">home</a> <a\thref="/t">tags</a> <a\nhref="/a">faq</a>'
        " <a\nhref=\"/r\">rss</a> extra filler words</nav>"
        "<p>the genuine article body with plenty of words here</p>"
    )
    got = _one(spark, page, html.main_content)
    assert "genuine article body" in got
    assert "home" not in got and "filler" not in got


def test_main_content_keeps_multiple_blocks_in_order(spark):
    page = "<p>first paragraph with enough words</p><p>second paragraph also long enough</p>"
    got = _one(spark, page, html.main_content)
    assert got == (
        "first paragraph with enough words second paragraph also long enough"
    )


def test_main_content_script_angle_brackets_cannot_corrupt_blocks(spark):
    # '</p>' INSIDE a script string must not split a block, because noise
    # strips page-wide before block splitting
    page = (
        '<script>var s = "</p> not a block break";</script>'
        "<p>only this real paragraph of article text remains</p>"
    )
    got = _one(spark, page, html.main_content)
    assert got == "only this real paragraph of article text remains"


def test_html_query_registered_and_oracled():
    from custom_columnar_format_spark.queries.registry import all_queries

    qd = all_queries()["q_html_extract_stats"]
    assert qd.sql is not None and "md5(main_text)" in qd.sql
