"""robots.txt parsing + rule evaluation — from scratch, RFC 9309 core.

The crawl-side gate of a web corpus: before a page enters the training
pool, its URL must be allowed by the host's robots.txt for the crawler's
user-agent (the reference repo's pipeline assumes pre-crawled inputs;
a corpus engine replaying WARC captures needs the gate itself).

Scope (the subset real crawlers agree on): grouped `User-agent` lines
select the most specific group (exact product-token match beats `*`;
multiple agents may share one group), `Allow`/`Disallow` path rules
with RFC 9309 §2.2.3 wildcards (`*` matches any character run, a
trailing `$` anchors the end), most-specific-match wins at evaluation
(specificity = rule-string length, the published Google convention),
allow wins a same-length tie, empty `Disallow:` means allow-all, and
an unmatched URL defaults to allowed. Total: malformed input never
raises.
"""

from __future__ import annotations

import re


def pattern_re(pattern: str) -> str:
    """Regex translation of an RFC 9309 path rule: anchored at the
    start, `*` -> `.*`, a TRAILING `$` anchors the end (a `$` anywhere
    else is a literal byte per the RFC), everything else literal. The
    translation uses only syntax shared by Java regex and RE2, so the
    same string drives Spark's regexp_like and the DuckDB oracle."""
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(part) for part in core.split("*"))
    return "^" + rx + ("$" if anchored else "")


def _match(pattern: str, path: str) -> bool:
    if "*" not in pattern and not pattern.endswith("$"):
        return path.startswith(pattern)          # fast path
    return re.match(pattern_re(pattern), path) is not None


def parse_robots(text: str, agent: str = "*") -> list[tuple[str, bool]]:
    """(path_prefix, allow) rules of the group that applies to
    ``agent``. Group selection: the group whose user-agent token is the
    longest case-insensitive substring-token match of ``agent`` wins;
    `*` groups apply only when nothing more specific matched. Returns
    [] (allow everything) when no group applies or input is empty.
    """
    if not text:
        return []
    agent_l = agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    seen_rule = False

    def flush() -> None:
        nonlocal cur_agents, cur_rules, seen_rule
        if cur_agents:
            groups.append((cur_agents, cur_rules))
        cur_agents, cur_rules, seen_rule = [], [], False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if seen_rule:
                flush()
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            seen_rule = True
            if key == "disallow" and val == "":
                # "Disallow:" (empty) = no restriction; keep as a
                # zero-length allow so the group still exists
                cur_rules.append(("", True))
            elif val:
                cur_rules.append((val, key == "allow"))
        # other keys (crawl-delay, sitemap, ...) are ignored
    flush()

    # RFC 9309 §2.2.1: ALL groups matching the chosen user-agent merge
    # into one rule set (a file may repeat "User-agent: x" headers).
    best_len = -1
    for agents, _ in groups:
        for a in agents:
            if a != "*" and a and a in agent_l and len(a) > best_len:
                best_len = len(a)
    merged: list[tuple[str, bool]] = []
    if best_len >= 0:
        for agents, rules in groups:
            if any(a != "*" and a and a in agent_l and len(a) == best_len
                   for a in agents):
                merged.extend(rules)
        return merged
    for agents, rules in groups:
        if "*" in agents:
            merged.extend(rules)
    return merged


def parse_sitemap_urls(text: str) -> list[str]:
    """`Sitemap:` lines of a robots.txt (RFC 9309 §2.2.4 treats them as
    any-group metadata; the sitemaps.org convention points the crawler
    at the host's own URL list — this is the discovery hook that feeds
    core/sitemap.py). Group-independent per the spec: collected from
    the WHOLE file, order preserved, duplicates dropped (first wins),
    comments stripped, malformed lines ignored — total."""
    if not text:
        return []
    out: list[str] = []
    seen: set[str] = set()
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        if key.strip().lower() == "sitemap":
            val = val.strip()
            if val and val not in seen:
                seen.add(val)
                out.append(val)
    return out


def robots_allows(rules: list[tuple[str, bool]], path: str) -> bool:
    """Most-specific-match evaluation (specificity = rule-string
    length, wildcards counted); allow wins same-length ties; no
    matching rule means allowed."""
    verdict = True
    match_len = -1
    for pattern, allow in rules:
        if _match(pattern, path):
            plen = len(pattern)
            if plen > match_len or (plen == match_len and allow):
                verdict, match_len = allow, plen
    return verdict
