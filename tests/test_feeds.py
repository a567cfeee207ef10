"""Feed payload dialect (stages/feeds.py): RSS 2.0 / Atom / RSS 1.0
RDF sniff + extraction semantics, and extract_row wiring — feeds
extract where they previously quarantined, html pages never sniff as
feeds."""

from __future__ import annotations

from nidaba_ray.stages.extract import extract_row
from nidaba_ray.stages.feeds import extract_feed_paragraphs, sniff_feed

RSS = b"""<?xml version="1.0" encoding="UTF-8"?>
<rss version="2.0" xmlns:content="http://purl.org/rss/1.0/modules/content/">
<channel>
  <title>Example Engineering Blog</title>
  <link>https://example.com/blog</link>
  <description>Posts about infrastructure.</description>
  <item>
    <title>Scaling the ingest tier</title>
    <description>We doubled throughput &amp; halved cost.</description>
  </item>
  <item>
    <title>Postmortem: the cache stampede</title>
    <content:encoded><![CDATA[<p>At 09:12 UTC the cache emptied.</p>
<p>Recovery took <b>14 minutes</b>.</p>]]></content:encoded>
    <description>short teaser that must lose to content:encoded</description>
  </item>
  <item><description>Untitled item body only.</description></item>
</channel>
</rss>"""

ATOM = b"""<?xml version="1.0" encoding="utf-8"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Status Updates</title>
  <entry>
    <title>All systems nominal</title>
    <summary>No incidents reported today.</summary>
  </entry>
  <entry>
    <title>Elevated error rates</title>
    <content type="html">&lt;p&gt;Investigating 5xx spikes in region B.&lt;/p&gt;
&lt;p&gt;Mitigated by failover.&lt;/p&gt;</content>
    <summary>loses to content</summary>
  </entry>
</feed>"""

RDF = b"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns="http://purl.org/rss/1.0/">
  <channel rdf:about="https://example.org/">
    <title>RDF Channel</title>
  </channel>
  <item rdf:about="https://example.org/a">
    <title>First item</title>
    <description>Body of the first item.</description>
  </item>
</rdf:RDF>"""


def test_sniff_feed_kinds():
    assert sniff_feed(RSS[:512].decode().lower()) == "rss"
    assert sniff_feed(ATOM[:512].decode().lower()) == "atom"
    assert sniff_feed(RDF[:512].decode().lower()) == "rdf"
    assert sniff_feed("<html><body>rss is great</body>") is None


def test_rss_paragraphs():
    paras = extract_feed_paragraphs(RSS.decode(), "rss")
    assert paras == [
        "Example Engineering Blog",
        "Scaling the ingest tier",
        "We doubled throughput & halved cost.",
        "Postmortem: the cache stampede",
        "At 09:12 UTC the cache emptied.",
        "Recovery took 14 minutes .",
        "Untitled item body only.",
    ]


def test_atom_paragraphs():
    paras = extract_feed_paragraphs(ATOM.decode(), "atom")
    assert paras == [
        "Status Updates",
        "All systems nominal",
        "No incidents reported today.",
        "Elevated error rates",
        "Investigating 5xx spikes in region B.",
        "Mitigated by failover.",
    ]


def test_rdf_paragraphs():
    paras = extract_feed_paragraphs(RDF.decode(), "rdf")
    assert paras == ["RDF Channel", "First item", "Body of the first item."]


def test_extract_row_feed_kinds():
    for payload in (RSS, ATOM, RDF):
        kind, spans, err = extract_row(payload)
        assert kind == "feed" and err == "" and spans
        assert all(s["kind"] == "feed" for s in spans)
        # PDF no-chrome convention: score == text length
        assert all(s["score"] == float(len(s["text"])) for s in spans)


def test_extract_row_feed_matches_kernel():
    kind, spans, err = extract_row(RSS)
    assert [s["text"] for s in spans] == extract_feed_paragraphs(
        RSS.decode(), "rss")


def test_empty_feed_quarantines():
    kind, spans, err = extract_row(b"<rss version='2.0'><channel></channel></rss>")
    assert kind == "feed" and spans == [] and "no item text" in err


def test_html_page_mentioning_rss_is_still_html():
    page = (b"<html><body><p>Subscribe to our <a href='/feed'>rss</a> "
            b"feed for updates about the project roadmap.</p></body></html>")
    kind, spans, err = extract_row(page)
    assert kind == "html"


def test_gzipped_feed_inflates_first():
    import gzip

    kind, spans, err = extract_row(gzip.compress(ATOM))
    assert kind == "feed" and err == "" and len(spans) == 6


def test_mixed_cdata_and_escaped_content():
    rss = ("<rss><channel><title>T</title><item><title>i</title>"
           "<description><![CDATA[part one ]]>&amp; escaped "
           "<![CDATA[part two]]></description></item></channel></rss>")
    assert extract_feed_paragraphs(rss, "rss") == [
        "T", "i", "part one & escaped part two"]
