"""Sequential reference-semantics simulator (the crawl-ordering oracle).

A faithful pure-Python replay of the reference's per-request BFS loop
(spider/src/crawl_loop.rs:106-256) over the synthetic fixture web,
including:

- FIFO frontier + queued/visited/blocked sets (crawl_loop.rs:115-121)
- robots gate with the policy table (robots.rs:62-134), visited marked
  *before* the robots check (crawl_loop.rs:158)
- sitemap seeding at depth 1 (crawl_loop.rs:129-141, sitemap.rs:17-119)
- fetch: retries (web_visitor.rs:24,144-184), manual redirects <= 10
  hops (web_visitor.rs:120,186-252), 403 -> Blocked + origin blocked
  (crawl_loop.rs:187-195), content-type + 5 MiB body gates
  (web_visitor.rs:119-136,220-241)
- final_url marked visited, trap check on final_url (crawl_loop.rs:203-206)
- max_pages counted at successful extraction (crawl_loop.rs:223),
  max_depth counted at pop (crawl_loop.rs:145-150)
- enqueue dedup (crawl_loop.rs:258-272), same_domain filter
  (crawl_loop.rs:230-233), link canonicalization + trap/file filters
  (web_visitor.rs:315-331)

The Spark BSP runner must reproduce this simulator's visit order, URL-seen
set, metrics and chunks exactly; tests compare the two paths.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from ..functions.robots import origin_allowed, policy_for_status, robots_sitemaps
from ..functions.text import extract_caption_page, needs_browser
from ..functions.url import (
    py_canonicalize_url,
    py_is_crawl_trap,
    py_looks_like_file_url,
    py_origin,
    py_same_origin,
)

MAX_ATTEMPTS = 3  # web_visitor.rs:24
MAX_REDIRECTS = 10  # web_visitor.rs:120
MAX_HTML_BYTES = 5 * 1024 * 1024  # web_visitor.rs:25
ALLOWED_CTYPES = ("text/html", "application/xhtml+xml")  # web_visitor.rs:127-134
SITEMAP_MAX_DEPTH = 3  # sitemap.rs:13
SITEMAP_MAX_FILES = 20  # sitemap.rs:14
SITEMAP_HARD_CAP = 10_000  # sitemap.rs:35


@dataclass
class FetchOutcome:
    kind: str  # ok | blocked | failed
    final_url: str | None = None
    image_id: str | None = None
    outlinks: list[str] = field(default_factory=list)
    blocked_url: str | None = None
    error: str | None = None
    needs_browser: bool = False


class SyntheticWeb:
    """Dict-indexed view of the fixture tables (the sim's 'network')."""

    def __init__(self, fx: dict[str, pd.DataFrame]):
        self.pages = {r.url: r for r in fx["pages"].itertuples()}
        self.redirects = {r.src_url: r.dst_url for r in fx["redirects"].itertuples()}
        self.robots = {r.origin: r for r in fx["robots"].itertuples()}
        self.sitemaps: dict[str, list] = {}
        for r in fx["sitemaps"].itertuples():
            self.sitemaps.setdefault(r.sitemap_url, []).append(r)
        self.captions = dict(zip(fx["images"].image_id, fx["images"].caption))
        rend = fx.get("rendered")
        self.rendered = (
            {} if rend is None else {r.url: r for r in rend.itertuples()}
        )

    def browser_fetch(self, url: str) -> FetchOutcome:
        """Browser-mode fetch (web_visitor_browser.rs:77-153): the rendered
        table IS the browser's view — no redirects, no status semantics;
        a missing row is a browser failure (mapped to an error like
        crawl_loop.rs:175)."""
        row = self.rendered.get(url)
        if row is None:
            return FetchOutcome("failed", error="browser")
        return FetchOutcome(
            "ok", final_url=url, image_id=row.image_id, outlinks=list(row.outlinks)
        )

    def fetch(self, url: str) -> FetchOutcome:
        """fetch_html semantics (web_visitor.rs:138-252) on the fixture web."""
        cur, hops = url, 0
        while True:
            row = self.pages.get(cur)
            if row is None:
                return FetchOutcome("failed", error="http:connect")
            if row.flaky_fail_times >= MAX_ATTEMPTS:
                return FetchOutcome("failed", error=f"http:{row.status}")
            status = 200 if row.flaky_fail_times > 0 else row.status
            if status == 403:
                return FetchOutcome("blocked", blocked_url=cur)
            if 300 <= status < 400:
                hops += 1
                dst = self.redirects.get(cur)
                if dst is None or hops > MAX_REDIRECTS:
                    return FetchOutcome("failed", error="redirect")
                cur = dst
                continue
            if not (200 <= status < 300):
                return FetchOutcome("failed", error=f"http:{status}")
            if row.content_type not in ALLOWED_CTYPES:
                return FetchOutcome("failed", error="unsupported_content_type")
            if row.body_len > MAX_HTML_BYTES:
                return FetchOutcome("failed", error="body_too_large")
            return FetchOutcome(
                "ok", final_url=cur, image_id=row.image_id,
                outlinks=list(row.outlinks),
                needs_browser=needs_browser(
                    getattr(row, "body_html", "<p>static content</p>") or ""
                ),
            )


class RobotsOracle:
    """RobotsCache semantics (robots.rs:48-134); single-run, so no TTL decay."""

    def __init__(self, web: SyntheticWeb, product_token: str = "my_crawler"):
        self.web = web
        self.token = product_token
        self.cache: dict[str, tuple[str | None, bool]] = {}

    def policy(self, url: str) -> tuple[bool, list[str]]:
        origin = py_origin(url)
        if origin is None:
            return False, []
        if origin not in self.cache:
            row = self.web.robots.get(origin)
            status = 404 if row is None else int(row.status)
            body = "" if row is None else (row.body or "")
            entry_body, allow_all, _ttl = policy_for_status(status, body, None)
            self.cache[origin] = (entry_body, allow_all)
        entry_body, allow_all = self.cache[origin]
        allowed = origin_allowed(entry_body, allow_all, self.token, url)
        return allowed, robots_sitemaps(entry_body)


def discover_sitemap_pages(
    web: SyntheticWeb, seed: str, declared: list[str], max_pages: int
) -> list[str]:
    """sitemap::discover (sitemap.rs:17-75) over the pre-parsed fixture."""
    initial = declared if declared else [py_origin(seed) + "/sitemap.xml"]
    queue: list[tuple[str, int]] = [
        (u, 0) for u in initial if py_same_origin(seed, u)
    ]
    files: set[str] = set()
    pages: list[str] = []
    limit = min(max_pages * 4, SITEMAP_HARD_CAP)
    while queue:
        url, depth = queue.pop(0)
        if len(files) >= SITEMAP_MAX_FILES or len(pages) >= limit or depth > SITEMAP_MAX_DEPTH:
            break
        if url in files:
            continue
        files.add(url)
        entries = web.sitemaps.get(url)
        if not entries:
            continue  # fetch failure / empty -> skip (sitemap.rs:41-49)
        found = [(e.loc, e.lastmod) for e in entries if e.kind == "url"
                 and py_same_origin(seed, e.loc)]
        found.sort(key=lambda t: t[1], reverse=True)  # lastmod desc, stable
        pages.extend(u for u, _ in found)
        del pages[limit:]
        if depth < SITEMAP_MAX_DEPTH:
            nested = [(e.loc, e.lastmod) for e in entries if e.kind == "sitemap"
                      and py_same_origin(seed, e.loc)]
            nested.sort(key=lambda t: t[1], reverse=True)
            queue.extend((u, depth + 1) for u, _ in nested)
    seen: set[str] = set()
    out = []
    for u in pages:
        c = py_canonicalize_url(u)
        if c and c not in seen:
            seen.add(c)
            out.append(c)
            if len(out) >= limit:
                break
    return out


@dataclass
class CrawlResult:
    request_id: int
    visit_order: list[dict]  # fetch-attempted URLs in FIFO order, with outcome
    url_seen: set[str]
    metrics: dict[str, int]
    chunks: list[dict]


def crawl_request_sim(
    web: SyntheticWeb,
    request_id: int,
    seed_url: str,
    max_pages: int,
    max_depth: int = 10,
    same_domain: bool = True,
    use_browser: bool = False,
    product_token: str = "my_crawler",
) -> CrawlResult | None:
    """Replay crawl_request (crawl_loop.rs:106-256). None = seed rejected
    (add_crawl_request, crawl_loop.rs:61-69)."""
    seed = py_canonicalize_url(seed_url)
    if seed is None or py_is_crawl_trap(seed):
        return None
    robots = RobotsOracle(web, product_token)
    frontier: list[tuple[str, int]] = [(seed, 0)]
    queued = {seed}
    visited: set[str] = set()
    blocked_origins: set[str] = set()
    m = dict(crawled=0, indexed=0, failed=0, skipped_robots=0, skipped_depth=0, blocked=0)
    visit_order: list[dict] = []
    all_chunks: list[dict] = []

    def enqueue(url: str, depth: int) -> None:  # crawl_loop.rs:258-272
        if py_is_crawl_trap(url):
            return
        if url not in visited and url not in queued:
            queued.add(url)
            frontier.append((url, depth))

    seed_allowed, seed_sitemaps = robots.policy(seed)
    if seed_allowed:
        for u in discover_sitemap_pages(web, seed, seed_sitemaps, max_pages):
            enqueue(u, 1)

    while frontier:
        url, depth = frontier.pop(0)
        queued.discard(url)
        if m["crawled"] >= max_pages or depth > max_depth:
            if depth > max_depth:
                m["skipped_depth"] += 1
            continue
        origin = py_origin(url)
        if url in visited or (origin is not None and origin in blocked_origins):
            continue
        visited.add(url)
        allowed, _ = robots.policy(url)
        if not allowed:
            m["skipped_robots"] += 1
            visit_order.append(dict(url=url, depth=depth, outcome="robots"))
            continue
        outcome = web.browser_fetch(url) if use_browser else web.fetch(url)
        if outcome.kind == "blocked":
            m["blocked"] += 1
            o = py_origin(outcome.blocked_url)
            if o:
                blocked_origins.add(o)
            visit_order.append(dict(url=url, depth=depth, outcome="blocked"))
            continue
        if outcome.kind == "failed":
            m["failed"] += 1
            visit_order.append(dict(url=url, depth=depth, outcome="failed"))
            continue
        visited.add(outcome.final_url)
        if py_is_crawl_trap(outcome.final_url):
            visit_order.append(dict(url=url, depth=depth, outcome="final_trap"))
            continue
        if not use_browser and outcome.needs_browser:
            # SPA fallback (crawl_loop.rs:208-221): replace the content with
            # the browser's view when the render succeeds; keep the static
            # shell when it does not
            r = web.rendered.get(outcome.final_url)
            if r is not None:
                outcome.image_id = r.image_id
                outcome.outlinks = list(r.outlinks)
        caption = web.captions.get(outcome.image_id, "")
        extracted = extract_caption_page(outcome.final_url, caption)
        m["crawled"] += 1
        if extracted["chunks"]:
            m["indexed"] += 1
        all_chunks.extend(
            {**c, "request_id": request_id} for c in extracted["chunks"]
        )
        visit_order.append(
            dict(url=url, depth=depth, outcome="crawled", final_url=outcome.final_url)
        )
        for href in outcome.outlinks:
            link = py_canonicalize_url(href)
            if link is None or py_looks_like_file_url(link):
                continue  # extract_links filters (web_visitor.rs:315-331)
            if href.strip() == "" or any(
                href.strip().startswith(s) for s in ("javascript:", "mailto:", "tel:", "data:")
            ):
                continue
            if same_domain and not py_same_origin(seed, link):
                continue
            enqueue(link, depth + 1)

    return CrawlResult(request_id, visit_order, visited, m, all_chunks)
