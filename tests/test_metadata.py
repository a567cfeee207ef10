"""JSON-LD metadata extraction (stages/metadata.py): parse semantics,
error isolation, and the fixture-corpus pass (the flagship extractor
skips these blocks; this stage reads ONLY them)."""

import pyarrow as pa
import ray.data as rd

from nidaba_ray import realpages
from nidaba_ray.stages.metadata import (
    extract_jsonld_objects,
    jsonld_rows,
    page_jsonld_metadata,
)


def test_extract_objects_shapes():
    html = """
    <script type="application/ld+json">{"@type":"NewsArticle",
      "headline":"H1","datePublished":"2024-04-03",
      "author":{"@type":"Person","name":"A. Writer"}}</script>
    <script type='APPLICATION/LD+JSON'>[{"@type":"Thing","name":"T1"},
      {"@type":"Thing","name":"T2"}]</script>
    <script type="application/ld+json">{"@context":"x","@graph":
      [{"@type":"WebSite","name":"S"},{"@type":"Org","name":"O"}]}</script>
    <script type="application/ld+json">{broken json}</script>
    <script>var notLd = {"@type":"Nope"};</script>
    """
    objs, n_invalid = extract_jsonld_objects(html)
    assert n_invalid == 1
    assert [o.get("@type") for o in objs] == [
        "NewsArticle", "Thing", "Thing", "WebSite", "Org"]


def test_jsonld_rows_kernel():
    html = ('<script type="application/ld+json">{"@type":"NewsArticle",'
            '"headline":"Budget","datePublished":"2024-04-02",'
            '"author":{"name":"Desk"}}</script>')
    batch = pa.table({
        "url": pa.array(["u1", "u2", "u3"], pa.string()),
        "html": pa.array([html.encode(), b"<p>no ld</p>",
                          b'<script type="application/ld+json">oops</script>'],
                         pa.binary()),
    })
    out = jsonld_rows(batch).to_pandas()
    # u2 emits nothing; u3 emits the invalid-count sentinel
    assert list(out["url"]) == ["u1", "u3"]
    r = out.iloc[0]
    assert (r["jsonld_type"], r["name"], r["date_published"], r["author"],
            r["n_invalid"]) == ("NewsArticle", "Budget", "2024-04-02",
                                "Desk", 0)
    assert out.iloc[1]["jsonld_type"] == "" and out.iloc[1]["n_invalid"] == 1


def test_fixture_corpus_jsonld(ray_session):
    pages = rd.from_arrow(realpages.fixture_pages_table())
    out = page_jsonld_metadata(pages).to_pandas()
    by_url = {u: g for u, g in out.groupby("url")}
    art = by_url["fixture://jsonld_scripts"]
    # the fixture's NewsArticle block wraps a string value across a raw
    # newline — INVALID JSON per spec, so strict parsing counts it
    # invalid and only the BreadcrumbList survives
    assert set(art["jsonld_type"]) == {"BreadcrumbList"}
    assert (art["n_invalid"] == 1).all()
    rec = by_url["fixture://recipe_page"]
    assert list(rec["jsonld_type"]) == ["Recipe"]
    assert list(rec["name"]) == ["Harbor oat pancakes"]
    # every other fixture carries no JSON-LD
    assert set(out["url"]) == {"fixture://jsonld_scripts",
                               "fixture://recipe_page"}


def test_pipeline_specs_with_new_stages(ray_session, tmp_path):
    """The example YAML specs exercising clean.pii and extract.jsonld
    compile and run end-to-end through the registry."""
    import pyarrow.parquet as pq

    from nidaba_ray.stages import registry
    from nidaba_ray.synth import pages_dataset_from_documents

    spec = registry.load_spec("examples/jsonld_metadata.yaml")
    out = registry.compile_pipeline(
        rd.from_arrow(realpages.fixture_pages_table()), spec
    ).to_pandas()
    assert {"fixture://jsonld_scripts", "fixture://recipe_page"} == set(out["url"])

    spec = registry.load_spec("examples/extract_clean.yaml")
    pages = pages_dataset_from_documents("/root/testdata/sf0.001")
    cleaned = registry.compile_pipeline(pages, spec).to_pandas()
    orig = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    m = cleaned[cleaned["error"] == ""].merge(
        orig, on="doc_id", suffixes=("_got", "_orig"))
    # the synthetic corpus has no PII, so the scrub is an identity on
    # the byte-identical extraction output
    assert len(m) and (m["text_got"] == m["text_orig"]).all()
