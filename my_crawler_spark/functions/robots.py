"""robots.txt matching + policy semantics.

Re-implements (from public REP / Google robotstxt semantics, which the
reference consumes via the `robotstxt` crate — spider/src/robots.rs:30-38):

- group selection: the group whose user-agent token is the longest
  case-insensitive prefix of the product token wins; else the ``*`` group.
- rule matching: longest-pattern match wins; Allow beats Disallow on ties;
  ``*`` wildcards and ``$`` end-anchor supported; empty Disallow = allow.
- policy table (robots.rs:100-134): 2xx -> parse body, TTL 24 h; 4xx ->
  allow-all, TTL 24 h; 5xx/error -> stale body if present else disallow,
  TTL 5 min.

Used identically by the sequential oracle simulator and inside the Spark
robots-gate stage (Arrow batch), so both paths share one matcher.
"""

from __future__ import annotations

import re
from functools import lru_cache
from urllib.parse import urlsplit

ROBOTS_OK_TTL_SECS = 24 * 60 * 60  # robots.rs:13
ROBOTS_FAIL_TTL_SECS = 5 * 60  # robots.rs:14
ROBOTS_MAX_BYTES = 512 * 1024  # robots.rs:12


def parse_robots(body: str) -> tuple[list[tuple[str, str, str]], list[str]]:
    """-> ([(agent, kind, pattern)], [sitemap_urls]).

    Each rule is replicated per user-agent of its group, REP-style: a run of
    consecutive ``User-agent`` lines opens a group; rules bind to all of them.
    """
    rules: list[tuple[str, str, str]] = []
    sitemaps: list[str] = []
    agents: list[str] = []
    last_was_agent = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not last_was_agent:
                agents = []
            agents.append(val.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if key == "sitemap":
            if val:
                sitemaps.append(val)
        elif key in ("allow", "disallow"):
            for a in agents or []:
                rules.append((a, key, val))
    return rules, sitemaps


@lru_cache(maxsize=4096)
def _pattern_re(pattern: str) -> re.Pattern:
    parts = []
    i = 0
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    for ch in body:
        parts.append(".*" if ch == "*" else re.escape(ch))
    return re.compile("^" + "".join(parts) + ("$" if anchored else ""))


def select_group_rules(
    body: str, product_token: str
) -> list[tuple[str, bool, re.Pattern]] | None:
    """Parse once and pre-compile the applicable group's rules for batch
    matching: returns [(pattern, is_allow, compiled_regex)] sorted by
    ASCENDING precedence (pattern length, then allow-wins-ties), so a
    vectorized matcher can apply them in order and let the last write win.
    None = no applicable group (allow everything)."""
    rules, _ = parse_robots(body)
    token = product_token.lower()
    candidates = {a for a, _, _ in rules}
    best = ""
    for a in candidates:
        if a != "*" and token.startswith(a) and len(a) > len(best):
            best = a
    if not best and "*" not in candidates:
        return None
    group = best or "*"
    sel = [
        (p, kind == "allow", _pattern_re(p))
        for a, kind, p in rules
        if a == group and p != ""
    ]
    sel.sort(key=lambda t: (len(t[0]), t[1]))
    return sel


def url_match_path(url: str) -> str:
    """The path[?query] string robots rules match against."""
    parts = urlsplit(url)
    path = parts.path or "/"
    if parts.query:
        path += "?" + parts.query
    return path


def robots_allowed(body: str | None, product_token: str, url: str) -> bool:
    """one_agent_allowed_by_robots analogue (robots.rs:32-37)."""
    if body is None:
        return True
    rules, _ = parse_robots(body)
    token = product_token.lower()
    # pick the most specific matching agent group
    candidates = {a for a, _, _ in rules}
    best = ""
    has_star = "*" in candidates
    for a in candidates:
        if a != "*" and token.startswith(a) and len(a) > len(best):
            best = a
    if not best and not has_star:
        return True
    group = best or "*"
    parts = urlsplit(url)
    path = parts.path or "/"
    if parts.query:
        path += "?" + parts.query
    verdict, best_len = True, -1
    for a, kind, pattern in rules:
        if a != group:
            continue
        if pattern == "":
            continue  # empty Disallow/Allow matches nothing
        if _pattern_re(pattern).match(path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and kind == "allow"):
                verdict = kind == "allow"
                best_len = plen
    return verdict


def robots_sitemaps(body: str | None) -> list[str]:
    if not body:
        return []
    return parse_robots(body)[1]


def policy_for_status(status: int, body: str, stale_body: str | None):
    """Cache-entry policy (robots.rs:100-134) -> (body|None, allow_all, ttl).

    body=None + allow_all=True  -> 4xx allow-all
    body=None + allow_all=False -> hard disallow (5 min TTL)
    """
    if 200 <= status < 300:
        # BYTE cap, not chars: the reference caps the fetched byte stream
        # (robots.rs:86) then from_utf8_lossy's it — a rule straddling the
        # cap decodes to U+FFFD the same way here
        capped = body.encode("utf-8")[:ROBOTS_MAX_BYTES].decode("utf-8", "replace")
        return capped, False, ROBOTS_OK_TTL_SECS
    if 400 <= status < 500:
        return None, True, ROBOTS_OK_TTL_SECS
    if stale_body is not None:
        return stale_body, False, ROBOTS_OK_TTL_SECS
    return None, False, ROBOTS_FAIL_TTL_SECS


def origin_allowed(entry_body: str | None, allow_all: bool, product_token: str, url: str) -> bool:
    """CacheEntry::allowed (robots.rs:30-39)."""
    if entry_body is not None:
        return robots_allowed(entry_body, product_token, url)
    return allow_all
