"""Deterministic synthetic-web fixtures (seed 42, sized by a scale knob).

Generates the tables from FIXTURES.md: the image+caption payload table
(BASELINE.json input_hint schema), a link graph with traps / file URLs /
redirect chains / flaky statuses, per-origin robots bodies, sitemap entries,
crawl seeds, politeness budgets and Tranco-like ranks. No external data,
no network. Everything is a function of (seed, size parameters) only —
re-running yields byte-identical tables, which is what makes the
crawl-ordering oracle and resume tests meaningful.

Shapes exercised on purpose (reference behaviors they stress):
- Zipf-skewed host sizes              -> salting / skew handling (north_rule)
- trap + file URLs in outlinks        -> crawl_loop.rs:286-294, web_visitor.rs:302-313
- raw hrefs w/ query/fragment/ports   -> normalize_url (web_visitor.rs:288-301)
- redirect chains incl. len > 10      -> redirect cap (web_visitor.rs:120)
- 403 origins                         -> blocked-origin set (crawl_loop.rs:187-195)
- 429/503 flakiness                   -> retry loop (web_visitor.rs:144-184)
- non-HTML content types, >5MiB body  -> web_visitor.rs:119-136, 220-241
- robots 200/404/500 + Disallow rules -> robots.rs:100-134
- CJK / space-less captions > 1200 ch -> chunker 800/1200/450 (index.rs:11-13)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from .codecs import decode_image, encode_image, phash64

WORDS = {
    "en": "the quick brown fox jumps over lazy dog stream data table engine".split(),
    "de": "der schnelle braune fuchs springt über den faulen hund daten".split(),
    "fr": "le renard brun rapide saute par dessus le chien paresseux données".split(),
    "es": "el zorro marrón rápido salta sobre el perro perezoso datos tabla".split(),
    "zh": list("敏捷的棕色狐狸跳过懒狗数据表格引擎流处理分析查询索引爬虫网页内容"),
    "ar": "الثعلب البني السريع يقفز فوق الكلب الكسول بيانات جدول محرك".split(),
}
LANGS = list(WORDS)


def _rng(seed: int, *salts) -> np.random.Generator:
    h = hashlib.sha256(("|".join(map(str, (seed, *salts)))).encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "big"))


def make_caption(seed: int, i: int) -> str:
    r = _rng(seed, "caption", i)
    lang = LANGS[int(r.integers(0, len(LANGS)))]
    if i % 37 == 0:
        return ""  # empty caption -> page with no chunks (indexed stays flat)
    n = int(r.integers(5, 60))
    if i % 23 == 0:
        n = int(r.integers(300, 500))  # long -> multiple chunks
    words = [WORDS[lang][int(r.integers(0, len(WORDS[lang])))] for _ in range(n)]
    sep = "" if lang == "zh" and i % 2 == 0 else " "  # space-less CJK runs
    text = sep.join(words)
    if i % 11 == 0 and len(text) > 40:  # paragraph breaks -> multiple blocks
        mid = len(text) // 2
        text = text[:mid] + "\n\n" + text[mid:]
    return text


def make_pixels(seed: int, i: int, w: int, h: int) -> np.ndarray:
    r = _rng(seed, "pixels", i)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    f1, f2 = r.uniform(0.05, 0.5, 2)
    base = 127 + 100 * np.sin(f1 * xx + f2 * yy + r.uniform(0, 6.28))
    img = np.stack([base, np.roll(base, i % 7, 0), np.roll(base, i % 5, 1)], -1)
    img += r.normal(0, 8, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def aligned_pixels_for_caption(
    caption: str, w: int, h: int, bins: int = 16
) -> np.ndarray:
    """Pixels whose luma histogram matches the caption's token-hash
    histogram (operators/multimodal.py::caption_features: whitespace
    tokens, crc32 % bins, L1-normalized) — a planted TRUE caption-image
    pair for the alignment scorer. Gray pixels at bin centers so luma ==
    pixel value exactly and lossless decode reproduces the histogram."""
    import zlib

    toks = [t for t in (caption or "").lower().split() if t]
    hist = np.zeros(bins, dtype=np.float64)
    for t in toks:
        hist[zlib.crc32(t.encode("utf-8")) % bins] += 1
    if hist.sum() == 0:
        hist[:] = 1.0
    total = w * h
    counts = np.floor(hist / hist.sum() * total).astype(int)
    order = np.argsort(-hist, kind="stable")
    for j in range(total - int(counts.sum())):  # remainder, largest bins first
        counts[order[j % bins]] += 1
    width = 256 // bins
    vals = np.repeat(
        (np.arange(bins) * width + width // 2).astype(np.uint8), counts
    )
    gray = vals.reshape(h, w)
    return np.stack([gray, gray, gray], -1)


def make_images(seed: int = 42, n: int = 200, w: int = 24, h: int = 24) -> pd.DataFrame:
    """The payload table — exact input_hint schema."""
    fmts = ["png", "jpeg", "webp"]
    rows = []
    for i in range(n):
        fmt = fmts[i % 3]
        px = make_pixels(seed, i, w, h)
        data = encode_image(px, fmt)
        # ground-truth phash is of the DECODED pixels (FIXTURES.md §1): for
        # lossy fmts the quantizer shifts borderline DCT bits, so hashing the
        # round-tripped pixels is what makes exact equality checkable.
        rows.append(
            {
                "image_id": f"img-{i:08d}",
                "bytes": data,
                "w": np.int32(w),
                "h": np.int32(h),
                "fmt": fmt,
                "caption": make_caption(seed, i),
                "phash": np.int64(phash64(decode_image(data))),
            }
        )
    return pd.DataFrame(rows)


def _host(k: int) -> str:
    return f"h{k}.example.com"


def make_web(
    seed: int = 42,
    n_hosts: int = 8,
    n_pages: int = 200,
    zipf_a: float = 1.4,
) -> dict[str, pd.DataFrame]:
    """Link graph + redirects + robots + sitemaps + seeds + budgets + ranks.

    Every URL is stored in canonical form; *outlinks* are raw hrefs (query
    strings, fragments, explicit default ports, uppercase hosts) so the
    extract stage has real canonicalization work to do.
    """
    r = _rng(seed, "web")
    # Zipf page counts per host (host 0 is the hot one -> skew path).
    weights = 1.0 / np.arange(1, n_hosts + 1) ** zipf_a
    weights /= weights.sum()
    counts = np.maximum((weights * n_pages).astype(int), 2)
    pages = []
    by_host: dict[int, list[str]] = {}
    pid = 0
    for k in range(n_hosts):
        by_host[k] = []
        for j in range(int(counts[k])):
            if j % 29 == 7:
                path = f"/search/q{j}"  # trap
            elif j % 31 == 9:
                path = f"/files/report{j}.pdf"  # file URL
            elif j % 13 == 5:
                path = f"/private/p{j}"  # robots-disallowed on some hosts
            else:
                path = f"/a{j // 50}/p{j}"
            url = f"https://{_host(k)}{path}"
            by_host[k].append(url)
            pages.append({"url": url, "host": _host(k), "pid": pid})
            pid += 1
    df = pd.DataFrame(pages)

    statuses, ctypes, flaky, body_len, image_id = [], [], [], [], []
    redirect_rows = []
    rr = _rng(seed, "status")
    n_imgs = max(len(df), 1)
    for i, row in df.iterrows():
        u = rr.uniform()
        st, ct, fl, bl = 200, "text/html", 0, int(rr.integers(1000, 200_000))
        if u < 0.05:
            st = 301
        elif u < 0.08:
            st = 404
        elif u < 0.10:
            st = 500
        elif u < 0.12:
            st, fl = 503, int(rr.integers(1, 5))  # flaky: fails fl times
        elif u < 0.13 and row.host not in (_host(0), _host(1)):
            st = 403  # blocks its whole origin (keep seed hosts crawlable)
        elif u < 0.15:
            ct = "application/pdf"
        elif u < 0.16:
            bl = 6 * 1024 * 1024  # > 5 MiB cap
        statuses.append(st)
        ctypes.append(ct)
        flaky.append(fl)
        body_len.append(bl)
        image_id.append(f"img-{i % n_imgs:08d}")
    df["status"], df["content_type"] = statuses, ctypes
    df["flaky_fail_times"], df["body_len"], df["image_id"] = flaky, body_len, image_id
    # Guarantee coverage of every status class regardless of n_pages: pick
    # deterministic victims (never the seed URLs /a0/p0 or /a0/p1).
    def _force(mask_idx, **kv):
        for col, val in kv.items():
            df.loc[mask_idx, col] = val

    plain = df.index[df.url.str.contains("/a.*/p", regex=True) & ~df.url.str.endswith(("p0", "p1"))]
    away = df.index[
        df.url.str.contains("/a.*/p", regex=True)
        & ~df.url.str.endswith(("p0", "p1"))
        & ~df.host.isin([_host(0), _host(1)])
    ]
    # static body snippets (S3): the needs_browser heuristic runs on these
    # inside the fetch join; SPA victims get an app-root shell
    df["body_html"] = "<p>static content</p>"
    spa_with_render = spa_without_render = None
    if len(plain) >= 10 and len(away) >= 2:
        _force(away[0], status=403)  # blocked-origin path, off the seed hosts
        _force(plain[3], status=301)
        _force(away[1], status=503, flaky_fail_times=4)
        _force(plain[5], status=503, flaky_fail_times=1)
        _force(plain[6], content_type="application/pdf")
        _force(plain[7], body_len=6 * 1024 * 1024)
        # SPA pages (crawl_loop.rs:208-221): thin static shell, no static
        # content; plain[8] recovers via the browser (rendered row exists),
        # plain[9]'s browser fetch fails (no rendered row -> stays thin)
        spa_with_render, spa_without_render = plain[8], plain[9]
        for idx in (spa_with_render, spa_without_render):
            _force(idx, status=200, content_type="text/html", flaky_fail_times=0,
                   body_len=2_000, body_html='<div id="app"></div>')
        df["__spa_image_id"] = df["image_id"]
        df.loc[[spa_with_render, spa_without_render], "image_id"] = None
    # seeds must resolve: force the seed URLs healthy
    seeds_idx = df.index[df.url.str.endswith(("/a0/p0", "/a0/p1"))]
    _force(seeds_idx, status=200, content_type="text/html", flaky_fail_times=0,
           body_len=50_000)

    # redirect edges for every 3xx page; one long chain (>10) per run
    rd = _rng(seed, "redir")
    for _, row in df[df.status.between(300, 399)].iterrows():
        host_urls = by_host[int(row.host[1:].split(".")[0])]
        dst = host_urls[int(rd.integers(0, len(host_urls)))]
        if dst != row.url:
            redirect_rows.append({"src_url": row.url, "dst_url": dst})
    # deliberate over-long chain rooted at a dedicated URL
    chain = [f"https://{_host(0)}/chain/{i}" for i in range(13)]
    for a, b in zip(chain, chain[1:]):
        redirect_rows.append({"src_url": a, "dst_url": b})
    chain_rows = pd.DataFrame(
        {
            "url": chain,
            "host": _host(0),
            "pid": -1,
            "status": 302,
            "content_type": "text/html",
            "flaky_fail_times": 0,
            "body_len": 1000,
            "image_id": "img-00000000",
        }
    )
    df = pd.concat([df, chain_rows], ignore_index=True)

    # Retry-After (S2, web_visitor.rs:255-271): flaky pages advertise a
    # delay; NULL means header absent (pure exponential backoff) — the
    # tri-state matches the reference's Option<Duration>, where an explicit
    # 0 would sleep 0 s. Deterministic from position.
    df["retry_after_s"] = pd.array([pd.NA] * len(df), dtype="Int64")
    flaky_idx = df.index[df.flaky_fail_times > 0]
    vals = (flaky_idx % 3) * 4  # absent / 4 s / 8 s
    df.loc[flaky_idx, "retry_after_s"] = pd.array(
        [pd.NA if v == 0 else int(v) for v in vals], dtype="Int64"
    )

    # outlinks: raw hrefs with canonicalization noise
    lr = _rng(seed, "links")
    outlinks = []
    url_list = df.url.tolist()
    for i, row in df.iterrows():
        k = int(row.host[1:].split(".")[0])
        n_l = int(lr.integers(0, 7))
        ls = []
        for _ in range(n_l):
            if lr.uniform() < 0.15 and n_hosts > 1:  # cross-origin
                ok = int(lr.integers(0, n_hosts))
                pool = by_host[ok]
            else:
                pool = by_host[k]
            t = pool[int(lr.integers(0, len(pool)))]
            v = lr.uniform()
            if v < 0.2:
                t += f"?utm_source=x&i={int(lr.integers(0, 9))}"  # query -> stripped
            elif v < 0.3:
                t += "#section"
            elif v < 0.35:
                t = t.replace("https://", "https://", 1).replace(
                    ".example.com", ".EXAMPLE.com", 1
                )
            elif v < 0.4:
                t = t.replace(".example.com", ".example.com:443", 1)
            ls.append(t)
        if lr.uniform() < 0.2 and ls:
            ls.append(ls[0])  # duplicate href
        if lr.uniform() < 0.1:
            ls.append("mailto:x@example.com")  # dropped by extract_links
        if lr.uniform() < 0.1:
            ls.append("javascript:void(0)")
        outlinks.append(ls)
    df["outlinks"] = outlinks

    # rendered table (S3): what the headless browser sees. Rows exist for
    # (a) the recoverable SPA victim and (b) every page of h5 — request 6
    # crawls h5 with use_browser=True, where ALL fetches go through this
    # table (web_visitor_browser.rs:77-153). The thin-SPA victim without a
    # rendered row models a browser-fetch failure (static shell kept,
    # crawl_loop.rs:208-221).
    if "__spa_image_id" not in df.columns:
        df["__spa_image_id"] = df["image_id"]
    df["body_html"] = df["body_html"].fillna("<p>static content</p>")  # chain rows
    rendered_rows = []
    no_render_url = (
        df.loc[spa_without_render, "url"] if spa_without_render is not None else None
    )
    for _, row in df[df.host == _host(5)].iterrows():
        if row.url == no_render_url:
            continue  # the browser-failure victim has no rendered row anywhere
        rendered_rows.append(
            {"url": row.url, "image_id": row["__spa_image_id"],
             "outlinks": list(row.outlinks)}
        )
    if spa_with_render is not None:
        r = df.loc[spa_with_render]
        rendered_rows.append(
            {"url": r.url, "image_id": r["__spa_image_id"],
             "outlinks": list(r.outlinks)}
        )
        for idx in (spa_with_render, spa_without_render):
            df.at[idx, "outlinks"] = []  # static SPA shell links to nothing
    rendered = pd.DataFrame(
        rendered_rows, columns=["url", "image_id", "outlinks"]
    ).drop_duplicates(subset=["url"], keep="last")
    df = df.drop(columns=["__spa_image_id"])

    # robots per origin: h0,h1 disallow /private/; h2 -> 404 allow-all;
    # h3 -> 500 disallow-on-failure; rest -> allow-all body. h0 declares a
    # sitemap. (policy table robots.rs:100-134)
    robots_rows = []
    for k in range(n_hosts):
        origin = f"https://{_host(k)}"
        if k in (0, 1):
            body = "User-agent: *\nDisallow: /private/\n"
            if k == 0:
                body += f"Sitemap: {origin}/sitemap.xml\n"
            robots_rows.append({"origin": origin, "status": 200, "body": body})
        elif k == 2:
            robots_rows.append({"origin": origin, "status": 404, "body": ""})
        elif k == 3:
            robots_rows.append({"origin": origin, "status": 500, "body": ""})
        else:
            robots_rows.append(
                {"origin": origin, "status": 200, "body": "User-agent: *\nAllow: /\n"}
            )
    robots = pd.DataFrame(robots_rows)

    # sitemap entries for h0 (declared) and every host's conventional
    # /sitemap.xml (sitemap.rs:24 joins "/sitemap.xml" when none declared)
    sm_rows = []
    smr = _rng(seed, "sitemap")
    for k in range(min(n_hosts, 4)):
        origin = f"https://{_host(k)}"
        sm_url = f"{origin}/sitemap.xml"
        picks = by_host[k][: min(6, len(by_host[k]))]
        for j, loc in enumerate(picks):
            sm_rows.append(
                {
                    "sitemap_url": sm_url,
                    "kind": "url",
                    "loc": loc,
                    "lastmod": pd.Timestamp("2026-01-01")
                    + pd.Timedelta(days=int(smr.integers(0, 300))),
                }
            )
        if k == 0:  # nested index file
            nested = f"{origin}/sitemap-news.xml"
            sm_rows.append(
                {
                    "sitemap_url": sm_url,
                    "kind": "sitemap",
                    "loc": nested,
                    "lastmod": pd.Timestamp("2026-02-01"),
                }
            )
            for j, loc in enumerate(by_host[0][6:10]):
                sm_rows.append(
                    {
                        "sitemap_url": nested,
                        "kind": "url",
                        "loc": loc,
                        "lastmod": pd.Timestamp("2026-03-01") + pd.Timedelta(days=j),
                    }
                )
    sitemaps = pd.DataFrame(sm_rows)

    host403 = df.loc[away[0], "host"] if len(away) else _host(4)
    seeds_df = pd.DataFrame(
        [
            # request 5 crawls the host carrying the forced 403 -> exercises
            # blocked-origin propagation (crawl_loop.rs:187-195) end-to-end
            {"request_id": 5, "url": f"https://{host403}/a0/p0", "max_pages": 30,
             "max_depth": 10, "same_domain": True},
            {"request_id": 1, "url": f"https://{_host(0)}/a0/p0", "max_pages": 25,
             "max_depth": 10, "same_domain": True},
            {"request_id": 2, "url": f"https://{_host(1)}/a0/p0", "max_pages": 10,
             "max_depth": 2, "same_domain": True},
            {"request_id": 3, "url": f"https://{_host(4)}/a0/p0?ref=home", "max_pages": 50,
             "max_depth": 10, "same_domain": False},
            {"request_id": 4, "url": f"https://{_host(3)}/a0/p1", "max_pages": 5,
             "max_depth": 10, "same_domain": True},
            # S3: browser-mode request — every fetch resolves via the
            # rendered table (web_visitor_browser.rs; crawl_loop.rs:167-176)
            {"request_id": 6, "url": f"https://{_host(5)}/a0/p0", "max_pages": 12,
             "max_depth": 10, "same_domain": True, "use_browser": True},
        ]
    )
    seeds_df["use_browser"] = seeds_df.get("use_browser", False)
    seeds_df["use_browser"] = seeds_df["use_browser"].fillna(False).astype(bool)

    budgets = pd.DataFrame(
        {"host": [_host(k) for k in range(n_hosts)],
         "tokens_per_round": [8 if k == 0 else 5 for k in range(n_hosts)]}
    )
    ranks = pd.DataFrame(
        {"rank": np.arange(1, n_hosts + 1),
         "domain": [_host(k) for k in range(n_hosts)]}
    )
    return {
        "pages": df.drop(columns=["pid"]),
        "redirects": pd.DataFrame(redirect_rows),
        "rendered": rendered,
        "robots": robots,
        "sitemaps": sitemaps,
        "seeds": seeds_df,
        "politeness_budget": budgets,
        "domain_ranks": ranks,
    }


def make_all(seed: int = 42, n_hosts: int = 8, n_pages: int = 200,
             img_w: int = 24, img_h: int = 24) -> dict[str, pd.DataFrame]:
    out = make_web(seed=seed, n_hosts=n_hosts, n_pages=n_pages)
    out["images"] = make_images(seed=seed, n=len(out["pages"]), w=img_w, h=img_h)
    return out
