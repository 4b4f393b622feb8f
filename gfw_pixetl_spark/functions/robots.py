"""robots.txt evaluation per RFC 9309 (public spec) — the crawl
pipeline's legality filter: before a corpus ingests a page, the
fetcher's decision (allowed / disallowed for our agent) must be
reproducible at audit time from the robots snapshot.

Implemented exactly as the RFC specifies:

* group selection: the most specific matching ``User-agent`` line wins
  (longest case-insensitive product-token prefix match), ``*`` group
  is the fallback; multiple user-agent lines stack onto one group,
* rule matching: ``Allow``/``Disallow`` paths match as prefixes with
  ``*`` (any sequence) and ``$`` (end anchor) wildcards,
* decision: the LONGEST matching rule wins (octet length of the rule
  path, per §2.2.2); on an exact length tie Allow wins; no match or an
  empty Disallow value = allowed.

The Spark operator runs the parser in an Arrow ``mapInPandas`` kernel
(string-grammar work does not vectorize; batches are Arrow-bounded),
the same execution shape as the codec kernels. q370 value-checks the
decisions against an analytic oracle that replays the DECISION TABLE,
not the parser — a parser bug cannot hide on both sides (q251's move).

Reference parity: gfw_pixetl has no crawl path (raster ETL only);
this extends SURVEY §2's LLM-pipeline text family like
``text.py::canonical_url``.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def parse_robots(txt: str, agent: str = "*") -> list[tuple[bool, str]]:
    """Parse robots.txt into the [(is_allow, path_pattern)] rule list
    of the group governing ``agent`` (most specific user-agent match;
    '*' fallback). Unknown directives are ignored per the RFC."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    saw_rule = False
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if saw_rule and cur_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules, saw_rule = [], [], False
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            if not cur_agents:
                continue  # rules before any user-agent line: ignored
            saw_rule = True
            cur_rules.append((key == "allow", val))
        # crawl-delay/sitemap/etc.: not access rules, ignored
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    agent = agent.lower()
    best_score = -1
    merged: list[tuple[bool, str]] = []
    for agents, rules in groups:
        score = max((0 if a == "*" else len(a) + 1
                     for a in agents
                     if a == "*" or agent.startswith(a)), default=-1)
        if score < 0:
            continue
        if score > best_score:
            best_score, merged = score, list(rules)
        elif score == best_score:
            # RFC 9309 §2.2.1: groups matching equally MUST be combined
            # (concatenated robots files commonly repeat 'User-agent: *')
            merged.extend(rules)
    return merged


def _pattern_matches(pattern: str, path: str) -> bool:
    """RFC 9309 path match: prefix semantics with '*' (any run) and a
    trailing '$' end anchor."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    rx = "".join(".*" if c == "*" else re.escape(c) for c in pattern)
    rx = rx + ("$" if anchored else "")
    return re.match(rx, path) is not None


def _decide(rules: list[tuple[bool, str]], path: str) -> bool:
    """The RFC decision over a parsed rule list: longest matching rule
    wins (octet length, §2.2.2); Allow wins length ties; an empty
    Disallow value or no match = allowed."""
    best_len, best_allow = -1, True
    for is_allow, pattern in rules:
        if pattern and _pattern_matches(pattern, path):
            ln = len(pattern)
            if ln > best_len or (ln == best_len and is_allow):
                best_len, best_allow = ln, is_allow
    return best_allow


def robots_allowed(txt: str, path: str, agent: str = "*") -> bool:
    """The RFC decision for one (robots.txt, path)."""
    return _decide(parse_robots(txt, agent), path)


def robots_filter(
    df: DataFrame,
    robots_col: str = "robots_txt",
    path_col: str = "path",
    agent: str = "*",
) -> DataFrame:
    """Evaluate each row's (robots.txt, path) pair under ``agent``.
    Arrow-batched kernel; per-row grammar work, no shuffle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list] = {}
        for pdf in batches:
            out = []
            for txt, path in zip(pdf[robots_col], pdf[path_col]):
                rules = cache.get(txt)
                if rules is None:
                    rules = cache[txt] = parse_robots(txt, agent)
                out.append(_decide(rules, path))
            res = pdf.copy()
            res["allowed"] = out
            yield res

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields) + ", allowed boolean"
    return df.mapInPandas(kernel, schema)
