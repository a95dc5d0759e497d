"""robots.txt parsing (RFC 9309) — C5's ingestion side: the engine's
politeness filter consumes per-host `robots_disallow` rules
(`schemas.HOSTS`), and this module produces them FROM robots.txt
text instead of hand-injection — what a production deployment does
when it fetches `https://host/robots.txt` before crawling the host.

Three layers, each tested against the others:
- `parse_robots(text, agent)` — pure Python: group records by
  User-agent, select the most specific applicable group (longest
  case-insensitive agent-substring match; `*` as fallback; an agent
  with an empty group still shadows `*` per RFC 9309 §2.2.1), return
  allow/disallow rule lists + crawl-delay.
- `is_allowed(path, rules)` — pure Python longest-match precedence
  (RFC 9309 §2.2.2: the longest matching rule wins; tie -> allow).
- `robots_allowed_col(path_col, rules)` — the SAME longest-match
  decision as a broadcast-rule column expression (codegen'd; one
  startswith per rule, rules sorted once driver-side), for filtering
  a URL column distributed without a UDF.

Engine wiring: `host_entry_from_robots` maps a parsed group onto the
engine's host-state dict (`sources/corpus.default_hosts` shape).
The engine's in-loop filter is prefix-disallow only (no Allow
overrides — documented in frontier/engine.py); `host_entry_from_robots`
therefore REFUSES (loudly) to flatten a group whose Allow rules would
change any decision the prefix filter makes, rather than silently
dropping them: groups without Allow-override semantics (the common
case) wire straight in, and full-precedence filtering stays available
via `robots_allowed_col` upstream of the frontier.

Scale: robots.txt is per-HOST state (10^8 hosts, bytes each — not
corpus-scale); parsing runs driver-side for the engine's broadcast
host table, or inside a pandas UDF when rules live in a DataFrame
column. Only matching (`robots_allowed_col`) touches URL-scale data,
and it is a pure column expression.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass
class RobotsRules:
    allow: list[str] = field(default_factory=list)
    disallow: list[str] = field(default_factory=list)
    crawl_delay: float | None = None


def parse_robots(text: str, agent: str = "*") -> RobotsRules:
    """Parse robots.txt text and select the rule group for ``agent``.

    Group selection (RFC 9309 §2.2.1): the group whose User-agent
    token is the LONGEST case-insensitive substring of ``agent`` wins;
    `*` matches any agent with specificity 0; absent any match, no
    rules apply (everything allowed). Consecutive User-agent lines
    share one group. Unknown directives are ignored; `#` starts a
    comment; empty Disallow (`Disallow:`) is a no-op per the RFC."""
    groups: dict[str, RobotsRules] = {}
    current: list[str] | None = None
    saw_rule = True  # a User-agent line after rules starts a NEW group set
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            ua = val.lower()
            if current is None or saw_rule:
                current = [ua]
                saw_rule = False
            else:
                current.append(ua)
            groups.setdefault(ua, RobotsRules())
        elif key in ("allow", "disallow", "crawl-delay"):
            saw_rule = True
            if current is None:
                continue  # rules before any User-agent line: ignored
            for ua in current:
                g = groups[ua]
                if key == "allow" and val:
                    g.allow.append(val)
                elif key == "disallow" and val:
                    g.disallow.append(val)
                elif key == "crawl-delay":
                    try:
                        g.crawl_delay = float(val)
                    except ValueError:
                        pass
    agent_l = agent.lower()
    best: str | None = None
    for ua in groups:
        if ua == "*":
            if best is None:
                best = ua
        elif ua in agent_l:
            if best is None or best == "*" or len(ua) > len(best):
                best = ua
    return groups[best] if best is not None else RobotsRules()


def is_allowed(path: str, rules: RobotsRules) -> bool:
    """RFC 9309 §2.2.2 longest-match precedence: among all matching
    Allow/Disallow rules, the longest wins; a tie resolves to allow;
    no match -> allowed."""
    best_len, best_allow = -1, True
    for rule, allowed in [(r, True) for r in rules.allow] + [
        (r, False) for r in rules.disallow
    ]:
        if path.startswith(rule):
            if len(rule) > best_len or (len(rule) == best_len and allowed):
                best_len, best_allow = len(rule), allowed
    return best_allow


def robots_allowed_col(path_col: Column, rules: RobotsRules) -> Column:
    """The is_allowed decision as a pure column expression over a URL
    path column — rules fold in as literals (per-host rule sets are
    bytes; the column side is the URL-scale data).

    Implementation: rules sorted by (length desc, allow-first)
    driver-side; the first matching rule in that order IS the
    longest-match winner, so a single chained CASE WHEN evaluates the
    precedence with one startswith per rule."""
    ordered = sorted(
        [(r, True) for r in rules.allow] + [(r, False) for r in rules.disallow],
        key=lambda t: (-len(t[0]), not t[1]),
    )
    out = F.lit(True)  # no matching rule -> allowed
    for rule, allowed in reversed(ordered):
        out = F.when(path_col.startswith(rule), F.lit(allowed)).otherwise(out)
    return out


def host_entry_from_robots(
    host: str,
    text: str,
    agent: str = "*",
    rate_limit_rps: float = 3.0,
    token_capacity: float = 30.0,
) -> dict:
    """Parsed robots.txt -> the engine's host-state dict
    (`sources/corpus.default_hosts` shape: the broadcast politeness
    table CrawlEngine consumes).

    The engine's in-loop robots filter is prefix-DISALLOW only; if the
    group's Allow rules would override any Disallow (an Allow that
    extends a Disallow prefix), flattening would silently change crawl
    decisions — refused with ValueError instead (filter those URL sets
    upstream with robots_allowed_col). Allow rules that overlap no
    Disallow prefix are redundant under prefix semantics and drop
    cleanly."""
    rules = parse_robots(text, agent)
    for a in rules.allow:
        for d in rules.disallow:
            if a.startswith(d):
                raise ValueError(
                    f"robots group for {host!r} has Allow {a!r} overriding"
                    f" Disallow {d!r}; the engine's prefix filter cannot"
                    " express this — filter with robots_allowed_col upstream"
                )
    return {
        "host": host,
        "rate_limit_rps": rate_limit_rps,
        "crawl_delay_s": rules.crawl_delay,
        "robots_disallow": list(rules.disallow),
        "token_capacity": token_capacity,
        "auth_required": False,
        "session_token": None,
    }
