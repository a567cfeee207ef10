"""Main-content scoring + boilerplate thresholding — the binarization
analog (nidaba binarize.otsu / binarize.sauvola via leptonica,
nidaba/tasks/binarize.py + plugins/leptonica.py, UNVERIFIED per
SURVEY.md §0).

Per the north_star: "Sauvola/Otsu-style binary thresholding ... reborn
as DOM-tree boilerplate classification and block-level main-content
scoring (text-density + link-density heuristics)".

Every kernel here is numpy over per-page score arrays; thresholds are
chosen from the page's *own* score histogram (exactly how Otsu picks a
global image threshold) and from sliding local windows (Sauvola).
Scores are log-compressed before histogramming so the split is scale
invariant (a 30 kB article and a 300-byte stub threshold the same way).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "block_features",
    "block_scores",
    "smooth_scores",
    "suppress_isolated",
    "otsu_threshold",
    "keep_global_otsu",
    "keep_local_sauvola",
    "keep_nlbin",
    "CHROME_WEIGHT",
    "CHROME_SAT",
]

CHROME_WEIGHT = 0.1  # score multiplier for blocks inside nav/aside/footer/header
CHROME_SAT = 50.0    # chrome text evidence saturates at this many chars
N_BINS = 64


def block_features(blocks) -> dict[str, np.ndarray]:
    """Vector features for one page's block list (segment.Block)."""
    n = len(blocks)
    text_len = np.fromiter((len(b.text) for b in blocks), dtype=np.float64, count=n)
    anchor = np.fromiter((b.anchor_chars for b in blocks), dtype=np.float64, count=n)
    n_tags = np.fromiter((b.n_tags for b in blocks), dtype=np.float64, count=n)
    chrome = np.fromiter((b.in_chrome for b in blocks), dtype=bool, count=n)
    cell = np.fromiter((b.kind in ("td", "th") for b in blocks),
                       dtype=bool, count=n)
    link_density = np.where(text_len > 0, anchor / np.maximum(text_len, 1.0), 0.0)
    text_density = text_len / (1.0 + n_tags)
    return {
        "text_len": text_len,
        "link_density": link_density,
        "text_density": text_density,
        "chrome": chrome,
        "cell": cell,
    }


def block_scores(feat: dict[str, np.ndarray]) -> np.ndarray:
    """score = text_len · (1 − link_density)² · chrome_weight, with
    chrome evidence SATURATED at ``CHROME_SAT`` chars first.

    High for long, link-free content blocks; ~0 for link farms; damped
    for site furniture. The saturation exists because the thresholds
    histogram log1p(score): a linear 0.1× discount is only a −ln(10)
    shift there, so a prose-LENGTH chrome block (a consent wall's
    legal text, ~300 chars) would land inside the content cluster and
    survive Otsu — length is not evidence of content-ness once
    structure marks furniture, so chrome contribution is bounded.
    A cap (not a power law) keeps every chrome block under the cap at
    its EXACT historical score, so no frozen fixture's threshold
    histogram moves. Fixture ``consent_wall_classonly`` pins the
    long-chrome case."""
    base = feat["text_len"] * np.square(1.0 - feat["link_density"])
    return np.where(
        feat["chrome"], CHROME_WEIGHT * np.minimum(base, CHROME_SAT), base
    )


def smooth_scores(scores: np.ndarray, feat: dict[str, np.ndarray],
                  alpha: float = 0.25, beta: float = 3.0) -> np.ndarray:
    """Context boost (boilerpipe-style): a content-shaped block
    (non-chrome, low link density) adjacent to high-scoring blocks is
    almost certainly content even if short — add a fraction of its
    neighbors' scores so trailing short paragraphs don't fall into the
    boilerplate class of the histogram. Chrome / link-heavy blocks are
    never boosted (the boost must not leak into site furniture).

    For TABLE CELLS the boost is capped at ``beta``× the cell's own
    score. Prose blocks read in document order, so adjacency is strong
    continuity evidence and a genuinely tiny trailing paragraph should
    ride its neighbors' mass — but a grid serializes row-major, its
    document-order neighbors are not its visual neighbors, so context
    may AMPLIFY a cell's own evidence, never fabricate it. Without the
    cap a near-empty cell (a bare day-number in a calendar grid)
    sandwiched between two populated cells crosses the threshold on
    neighbor mass alone; with it, worded cells (own score ≥ a few
    chars) still chain normally. Real-page fixtures
    ``event_calendar_grid`` (bare cells drop) and ``data_table`` /
    ``giant_data_table`` (worded cells keep) pin both sides."""
    if len(scores) < 2:
        return scores
    prev = np.concatenate(([0.0], scores[:-1]))
    nxt = np.concatenate((scores[1:], [0.0]))
    eligible = (~feat["chrome"]) & (feat["link_density"] < 0.33) & (scores > 0)
    boost = alpha * (prev + nxt)
    boost = np.where(feat["cell"], np.minimum(boost, beta * scores), boost)
    return np.where(eligible, scores + boost, scores)


def suppress_isolated(raw: np.ndarray, smoothed: np.ndarray,
                      frac: float = 0.15) -> np.ndarray:
    """Zero out *isolated weak runs*: contiguous stretches of
    positive-score blocks whose combined mass is small relative to the
    page's top block — "Load more" stubs, orphan feed placeholders,
    stray UI strings floating between chrome.

    Runs (not single blocks) are the unit because article-internal
    structure — table cells, captions, definition lists, headings — is
    individually weak but sits in one contiguous run with the strong
    paragraphs (zero-score link farms break runs, content never does),
    so the run containing the page max is always safe. Real-page
    fixtures ``infinite_scroll_stub`` and ``data_table``
    (tests/test_realpages.py) pin both sides of this rule."""
    if len(raw) < 2:
        return smoothed
    mx = raw.max()
    pos = raw > 0
    starts = pos & ~np.concatenate(([False], pos[:-1]))
    run_id = np.cumsum(starts) * pos  # 0 marks non-positive gaps
    run_sum = np.bincount(run_id, weights=raw)[run_id]
    weak = pos & (run_sum < frac * mx)
    return np.where(weak, 0.0, smoothed)


def otsu_threshold(scores: np.ndarray, n_bins: int = N_BINS) -> float:
    """Otsu's method over log1p(score) histogram: the threshold (in log
    space) maximizing between-class variance. Returns the threshold in
    *raw score* space. Faithful to the classic algorithm (public
    knowledge), applied to block scores instead of pixels."""
    ls = np.log1p(scores)
    lo, hi = float(ls.min()), float(ls.max())
    if hi - lo < 1e-12:
        return -1.0  # degenerate page: single level → keep everything
    hist, edges = np.histogram(ls, bins=n_bins, range=(lo, hi))
    p = hist.astype(np.float64) / hist.sum()
    centers = (edges[:-1] + edges[1:]) / 2.0
    w0 = np.cumsum(p)
    w1 = 1.0 - w0
    mu = np.cumsum(p * centers)
    mu_t = mu[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        between = np.where(
            (w0 > 0) & (w1 > 0), (mu_t * w0 - mu) ** 2 / (w0 * w1), 0.0
        )
    k = int(np.argmax(between))  # first maximum → deterministic
    return float(np.expm1(edges[k + 1]))


def keep_global_otsu(scores: np.ndarray) -> np.ndarray:
    """Variant A — global threshold from the page's score histogram.

    Otsu assumes a bimodal histogram; an all-content page (e.g. a PDF
    with uniform block scores) is unimodal and a blind threshold would
    cut the cluster in half. Guard: if the two classes' raw-score means
    are not well separated (< 3×), the page is single-class → keep
    every positive-score block."""
    if len(scores) == 0:
        return np.zeros(0, dtype=bool)
    t = otsu_threshold(scores)
    keep = scores > max(t, 0.0)
    if keep.any() and not keep.all():
        lo_mean = float(scores[~keep].mean())
        hi_mean = float(scores[keep].mean())
        if hi_mean < 3.0 * max(lo_mean, 1.0):
            keep = scores > 0
    if not keep.any():
        # fallback: never emit an empty page if any block scored > 0;
        # keep the argmax (deterministic: first max).
        if scores.max() > 0:
            keep = np.zeros_like(keep)
            keep[int(np.argmax(scores))] = True
    return keep


def keep_local_sauvola(
    scores: np.ndarray, window: int = 5, k: float = 0.34, r: float = 4.0
) -> np.ndarray:
    """Variant B — Sauvola-style local adaptive threshold.

    T_i = m_i · (1 + k·(s_i/R − 1)) over a centered window of
    ``window`` blocks in reading order (m=mean, s=std of log1p scores);
    keep block i if log1p(score_i) > T_i, score > 0, AND above a global
    floor of 25% of the page's max log-score (the analog of Sauvola's
    dependence on the global dynamic range R — a purely local rule
    would keep boilerplate islands surrounded by more boilerplate).
    Still differs from variant A on borderline pages — the
    disagreement feeds the merge/vote stage (SURVEY.md §2.2)."""
    n = len(scores)
    if n == 0:
        return np.zeros(0, dtype=bool)
    ls = np.log1p(scores)
    floor = 0.25 * float(ls.max())
    half = window // 2
    # windowed mean/std via cumulative sums (vectorized, O(n))
    pad = np.pad(ls, (half, half), mode="edge")
    zero = np.zeros(1)
    # concatenate, not np.insert — same values, ~3× less overhead on
    # these tiny per-page arrays (profiled)
    c1 = np.cumsum(np.concatenate((zero, pad)))
    c2 = np.cumsum(np.concatenate((zero, pad * pad)))
    m = (c1[window:] - c1[:-window]) / window
    var = np.maximum((c2[window:] - c2[:-window]) / window - m * m, 0.0)
    s = np.sqrt(var)
    t = m * (1.0 + k * (s / r - 1.0))
    keep = (ls > t) & (scores > 0) & (ls > floor)
    if not keep.any() and scores.max() > 0:
        keep = np.zeros(n, dtype=bool)
        keep[int(np.argmax(scores))] = True
    return keep


def keep_nlbin(scores: np.ndarray, low: float = 5.0, high: float = 90.0,
               threshold: float = 0.5) -> np.ndarray:
    """Variant C — kraken-nlbin-style percentile normalization
    (nidaba plugins/kraken.py nlbin exposes perc/low/high/threshold
    knobs, UNVERIFIED per SURVEY.md §0): flatten the page's dynamic
    range to [0,1] between the ``low``/``high`` percentiles of the
    positive log-scores, keep blocks above ``threshold``. A third
    ensemble member for the vote — agrees with Otsu on clean pages,
    differs on pages with a compressed score range."""
    n = len(scores)
    if n == 0:
        return np.zeros(0, dtype=bool)
    ls = np.log1p(scores)
    pos = np.sort(ls[scores > 0])
    if len(pos) == 0:
        return np.zeros(n, dtype=bool)

    def _pct(p: float) -> float:
        # identical to np.percentile(method='linear') but ~10× faster
        # on the tiny per-page arrays this sees (profiled: percentile
        # overhead was 10% of the whole pipeline)
        x = (len(pos) - 1) * p / 100.0
        i = int(x)
        frac = x - i
        return float(pos[i]) if frac == 0 else float(
            pos[i] + frac * (pos[i + 1] - pos[i])
        )

    lo = _pct(low)
    hi = _pct(high)
    if hi - lo < 1e-12:
        return scores > 0
    norm = np.clip((ls - lo) / (hi - lo), 0.0, 1.0)
    keep = (norm > threshold) & (scores > 0)
    if not keep.any() and scores.max() > 0:
        keep = np.zeros(n, dtype=bool)
        keep[int(np.argmax(scores))] = True
    return keep
