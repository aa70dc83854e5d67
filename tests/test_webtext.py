"""htmlextract main-content extraction + urls normalization ops."""

import pytest
from pyspark.sql import Row

from pipeline_spark.functions.htmlextract import extract_main_text
from pipeline_spark.registry import ModuleContext

ARTICLE = """
<html><head><title>Widget Review</title>
<script>var x = "script noise that must never appear";</script>
<style>.a { color: red }</style></head>
<body>
<nav><a href="/">Home</a> <a href="/about">About</a></nav>
<div id="sidebar"><p>Subscribe to our newsletter for daily widget facts and promotions.</p></div>
<article>
<h1>The Widget</h1>
<p>Widgets are the fundamental building block of modern industry, and this
review covers the top models of the year in exhaustive detail.</p>
<p>Our testing methodology involved dropping each widget from a standard
height and measuring the resulting acoustic signature carefully.</p>
<p><a href="/buy">Buy now</a></p>
</article>
<footer><p>Copyright 2026 WidgetCorp. All rights reserved worldwide.</p></footer>
</body></html>
"""


def test_extract_article_content():
    r = extract_main_text(ARTICLE)
    assert r["title"] == "Widget Review"
    assert "fundamental building block" in r["text"]
    assert "acoustic signature" in r["text"]
    # chrome is gone
    assert "newsletter" not in r["text"]
    assert "Copyright" not in r["text"]
    assert "Home" not in r["text"]
    assert "script noise" not in r["text"]
    assert r["n_paragraphs"] == 2  # the buy-now link para is link-dominated


def test_extract_div_fallback_and_link_density():
    html = """
    <html><body>
    <div class="nav-menu"><p>One Two Three Four Five Six Seven Eight Nine Ten</p></div>
    <div id="content">
      <p>This paragraph is long enough to count as real content for the
      extractor and contains no links at all in its body.</p>
    </div>
    <div id="links"><p><a href="a">This entire paragraph is one giant link and
    must be rejected by the link density rule completely</a></p></div>
    </body></html>
    """
    r = extract_main_text(html)
    assert "real content" in r["text"]
    assert "giant link" not in r["text"]
    assert "One Two Three" not in r["text"]  # class="nav-menu" is boilerplate


def test_extract_empty_and_chrome_only():
    assert extract_main_text("")["text"] == ""
    r = extract_main_text("<html><body><nav><a href='/'>Home</a></nav></body></html>")
    assert r["text"] == "" and r["n_paragraphs"] == 0


def test_paragraph_breaks_preserved():
    html = ("<article><p>First paragraph body that is long enough to pass "
            "the gate.</p><p>Second paragraph body that is also long enough "
            "to pass.</p></article>")
    r = extract_main_text(html)
    lines = r["text"].split("\n")
    assert len(lines) == 2
    assert lines[0].startswith("First") and lines[1].startswith("Second")


def test_htmlextract_module(spark):
    from pipeline_spark.operators.htmlextract import htmlextract_transform

    df = spark.createDataFrame(
        [Row(doc=1, html=ARTICLE), Row(doc=2, html="<p>short</p>")]
    )
    out = htmlextract_transform(
        ModuleContext(
            spark=spark, name="hx", params={"field": "html"},
            inputs=[df], input_names=["in"], side_inputs={},
        )
    )[""]
    rows = {r["doc"]: r for r in out.collect()}
    assert rows[1]["title"] == "Widget Review"
    assert rows[1]["n_paragraphs"] == 2
    assert rows[2]["main_text"] == "" and rows[2]["n_paragraphs"] == 0


# ------------------------------------------------------------------- urls


URLS = [
    # (input, scheme, host, domain, path, normalized)
    ("HTTP://User@Example.COM:80/Path/To?q=1&utm_source=x#frag",
     "http", "example.com", "example.com", "/Path/To",
     "http://example.com/Path/To?q=1"),
    ("https://news.bbc.co.uk:8443/stories?utm_campaign=a&id=7&fbclid=zz",
     "https", "news.bbc.co.uk", "bbc.co.uk", "/stories",
     "https://news.bbc.co.uk:8443/stories?id=7"),
    ("https://sub.deep.example.org",
     "https", "sub.deep.example.org", "example.org", "/",
     "https://sub.deep.example.org/"),
    ("ftp://files.example.net/pub/file.txt",
     "ftp", "files.example.net", "example.net", "/pub/file.txt",
     "ftp://files.example.net/pub/file.txt"),
    ("not a url", None, None, None, None, None),
]


def test_urls_module(spark):
    from pipeline_spark.operators.urls import urls_transform

    df = spark.createDataFrame([Row(i=i, url=u[0]) for i, u in enumerate(URLS)])
    out = urls_transform(
        ModuleContext(
            spark=spark, name="u", params={"field": "url"},
            inputs=[df], input_names=["in"], side_inputs={},
        )
    )[""]
    rows = sorted(out.collect(), key=lambda r: r["i"])
    for row, (_, scheme, host, domain, path, norm) in zip(rows, URLS):
        assert row["url_scheme"] == scheme, row
        assert row["url_host"] == host, row
        assert row["url_domain"] == domain, row
        assert row["url_path"] == path, row
        assert row["url_normalized"] == norm, row


def test_urls_strip_www_and_tracking_only_query(spark):
    from pipeline_spark.operators.urls import urls_transform

    df = spark.createDataFrame(
        [Row(i=0, url="https://WWW.Example.com/a?utm_source=x&utm_medium=y")]
    )
    out = urls_transform(
        ModuleContext(
            spark=spark, name="u", params={"field": "url", "stripWWW": True},
            inputs=[df], input_names=["in"], side_inputs={},
        )
    )[""]
    row = out.collect()[0]
    assert row["url_host"] == "example.com"
    assert row["url_normalized"] == "https://example.com/a"


def test_urls_plan_is_pure_column(spark):
    """No Python stage: the urls op must stay whole-stage-codegen-able."""
    from pipeline_spark.operators.urls import urls_transform

    df = spark.createDataFrame([Row(url="https://example.com/x")])
    out = urls_transform(
        ModuleContext(
            spark=spark, name="u", params={"field": "url"},
            inputs=[df], input_names=["in"], side_inputs={},
        )
    )[""]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_urls_fragment_question_mark_not_query(spark):
    """A '?' inside the fragment must not leak into url_normalized."""
    from pipeline_spark.operators.urls import urls_transform

    df = spark.createDataFrame(
        [Row(i=0, url="https://ex.com/page#sec?x=1"),
         Row(i=1, url="https://ex.com/p?a=2#frag?b=3")]
    )
    out = urls_transform(
        ModuleContext(
            spark=spark, name="u", params={"field": "url"},
            inputs=[df], input_names=["in"], side_inputs={},
        )
    )[""]
    rows = sorted(out.collect(), key=lambda r: r["i"])
    assert rows[0]["url_normalized"] == "https://ex.com/page"
    assert rows[1]["url_normalized"] == "https://ex.com/p?a=2"


# ------------------------------------------------------------- streaming


def test_webtext_ops_run_on_streams(spark, tmp_path):
    """htmlextract / urls / chunk are stateless maps: they must compose
    on a streaming DataFrame unchanged (batch/streaming symmetry)."""
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    in_dir = str(tmp_path / "in")
    df = spark.createDataFrame(
        [Row(doc=1,
             html="<article><p>Streaming body text long enough to pass the "
                  "paragraph gate easily today.</p></article>",
             url="HTTPS://Example.COM/a?utm_source=x&id=1")]
    )
    df.coalesce(1).write.parquet(in_dir)
    out_dir = str(tmp_path / "out")
    outs = run_pipeline(spark, parse_config(f"""
sources:
  - name: pages
    module: storage
    parameters: {{format: parquet, input: {in_dir}, mode: streaming}}
transforms:
  - name: hx
    module: htmlextract
    inputs: [pages]
    parameters: {{field: html}}
  - name: un
    module: urls
    inputs: [hx]
    parameters: {{field: url}}
  - name: ck
    module: chunk
    inputs: [un]
    parameters: {{field: main_text, size: 4}}
sinks:
  - name: out
    module: storage
    inputs: [ck]
    parameters:
      format: parquet
      output: {out_dir}
      availableNow: true
"""))
    assert outs["ck"].isStreaming
    rows = spark.read.parquet(out_dir).collect()
    assert rows and rows[0]["url_normalized"] == "https://example.com/a?id=1"
    texts = {r["chunk_id"]: r["chunk_text"] for r in rows}
    assert texts[0].startswith("Streaming body text")
