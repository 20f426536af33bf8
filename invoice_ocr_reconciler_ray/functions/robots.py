"""Real robots.txt parser + matcher (RFC 9309 path-matching subset).

The crawl-side gate every web-scale corpus pipeline needs: given the
fetched ``robots.txt`` of a host and a URL path, decide whether the
corpus may keep the page.  Implements the RFC 9309 group rules we can
make deterministic and oracle-exact:

* a rule is ``Allow:`` / ``Disallow:`` + a path prefix (no wildcards in
  this dialect — wildcard-free rule sets are the overwhelmingly common
  case and keep the SQL oracle exact);
* the MOST SPECIFIC rule wins: longest matching path-prefix;
* on a length tie, ``Allow`` wins (RFC 9309 §2.2.2);
* no matching rule → allowed;
* an empty ``Disallow:`` line matches nothing (explicit allow-all).

Parsing follows the line dialect: ``key: value`` per line, ``#`` starts
a comment, keys case-insensitive, ``User-agent:`` groups — we evaluate
for a single agent and merge ``*`` groups with the agent's own groups,
as RFC 9309 §2.2.1 prescribes when no specific group exists; when a
specific group exists it REPLACES ``*`` (not merged).

No reference-repo analogue (the reference never crawls); this is the
standard public semantics, implemented from the RFC text.
"""

from __future__ import annotations


def parse_robots(text: str, *, agent: str = "graftbot") -> list[tuple[bool, str]]:
    """robots.txt → ordered [(is_allow, path_prefix)] rules for ``agent``.

    Groups for the exact agent (case-insensitive token match) replace the
    ``*`` groups; otherwise the ``*`` groups apply.  Empty-path rules are
    dropped (they match nothing).
    """
    agent = agent.lower()
    star_rules: list[tuple[bool, str]] = []
    agent_rules: list[tuple[bool, str]] = []
    cur_agents: set[str] = set()
    in_group_header = False  # consecutive User-agent lines stack

    for raw in text.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_group_header:
                cur_agents = set()
                in_group_header = True
            cur_agents.add(val.lower())
            continue
        in_group_header = False
        if key not in ("allow", "disallow") or not val:
            continue
        rule = (key == "allow", val)
        if agent in cur_agents:
            agent_rules.append(rule)
        if "*" in cur_agents:
            star_rules.append(rule)
    return agent_rules if agent_rules else star_rules


def is_allowed(rules: list[tuple[bool, str]], path: str) -> tuple[bool, str]:
    """(allowed, winning_rule_path) under longest-prefix / allow-on-tie.

    ``winning_rule_path`` is '' when no rule matched (default allow).
    """
    best_len = -1
    best_allow = True
    best_path = ""
    for is_allow, prefix in rules:
        if path.startswith(prefix):
            ln = len(prefix)
            if ln > best_len or (ln == best_len and is_allow and not best_allow):
                best_len, best_allow, best_path = ln, is_allow, prefix
    return best_allow, best_path
