"""Markdown payload extraction (stages/mdtext.py + the extract_row
plain-text branch): syntax strips to prose, fences stay verbatim,
plain text never mis-kinds."""

from __future__ import annotations

from nidaba_ray.stages.extract import extract_row
from nidaba_ray.stages.mdtext import looks_like_markdown, markdown_paragraphs

DOC = """# Deploying the service

The deploy runs from the `main` branch and takes **about four
minutes** end to end, including the [health checks](https://x.io/hc).

## Steps

- Tag the release candidate and push the tag to the shared remote
- Wait for the build to go green on the three platform runners
- Run the promotion script with the environment name

```bash
./promote.sh production
tail -f /var/log/deploy.log
```

> Note: rollbacks use the same script with the previous tag, and
> finish in under a minute.

1. Verify the dashboard shows the new version
2. Close the deploy ticket with a link to the build
"""


def test_detection():
    assert looks_like_markdown(DOC)
    assert looks_like_markdown("```\ncode\n```\n")
    assert not looks_like_markdown(
        "Plain prose with a #hashtag and 3 * 4 = 12 math, plus a "
        "parenthetical (like this) that is not a link.")
    assert not looks_like_markdown("Issue #42 was fixed.")


def test_paragraphs():
    paras = markdown_paragraphs(DOC)
    assert paras == [
        "Deploying the service",
        "The deploy runs from the main branch and takes about four "
        "minutes end to end, including the health checks.",
        "Steps",
        "Tag the release candidate and push the tag to the shared "
        "remote",
        "Wait for the build to go green on the three platform runners",
        "Run the promotion script with the environment name",
        "./promote.sh production\ntail -f /var/log/deploy.log",
        "Note: rollbacks use the same script with the previous tag, "
        "and finish in under a minute.",
        "Verify the dashboard shows the new version",
        "Close the deploy ticket with a link to the build",
    ]


def test_heading_without_blank_line():
    paras = markdown_paragraphs("# Title\nBody text directly after.")
    assert paras == ["Title", "Body text directly after."]


def test_images_keep_alt():
    paras = markdown_paragraphs(
        "# T\n\nSee ![the harbor at dusk](i.png) for the final state "
        "of the installation after two weeks of work.")
    assert paras[1].startswith("See the harbor at dusk for the final")


def test_extract_row_markdown_kind():
    kind, spans, err = extract_row(DOC.encode("utf-8"))
    assert kind == "markdown" and err == ""
    assert [s["text"] for s in spans] == markdown_paragraphs(DOC)
    assert all(s["kind"] == "markdown" for s in spans)


def test_plain_text_still_plain():
    text = ("The committee approved the budget on Tuesday after a "
            "long debate. " * 5 + "\n\n" +
            "A final vote is expected next month at the main hall. " * 5)
    kind, spans, err = extract_row(text.encode("utf-8"))
    assert kind == "text"
