"""robots.txt matcher compatible with the reference's usage of the
``texting_robots`` crate (packages/firecrawl-rs/src/crawler.rs:255-261,
461-467): agent "FireCrawlAgent" with fallback "FirecrawlAgent"; malformed /
non-UTF8 / odd-whitespace bodies must parse *leniently* (reference tests
crawler.rs:916-995 expect such bodies to effectively allow everything they
don't cleanly disallow).

Standard REP semantics (public spec, RFC 9309): group selection by longest
user-agent token match (case-insensitive, '*' fallback), rule matching by
longest-path-match with '*' wildcards and '$' end anchor; on a length tie,
Allow wins; unmatched → allowed.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

__all__ = ["Robot", "robots_allowed"]


class Robot:
    def __init__(self, agent: str, robots_txt: str) -> None:
        self.agent = agent.lower()
        self._rules: list[tuple[bool, str]] = []  # (is_allow, pattern)
        self.crawl_delay: float | None = None
        self._parse(robots_txt)

    def _parse(self, text: str) -> None:
        groups: list[tuple[list[str], list[tuple[bool, str]], float | None]] = []
        cur_agents: list[str] = []
        cur_rules: list[tuple[bool, str]] = []
        cur_delay: float | None = None
        last_was_agent = False

        def flush() -> None:
            nonlocal cur_agents, cur_rules, cur_delay
            if cur_agents:
                groups.append((cur_agents, cur_rules, cur_delay))
            cur_agents, cur_rules, cur_delay = [], [], None

        for raw_line in text.replace("\x00", "").splitlines():
            line = raw_line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, value = line.partition(":")
            key = key.strip().lower()
            value = value.strip()
            if key == "user-agent":
                if not last_was_agent:
                    flush()
                cur_agents.append(value.lower())
                last_was_agent = True
                continue
            last_was_agent = False
            if key == "disallow":
                cur_rules.append((False, value))
            elif key == "allow":
                cur_rules.append((True, value))
            elif key == "crawl-delay":
                try:
                    cur_delay = float(value)
                except ValueError:
                    pass
        flush()

        # Longest user-agent token that prefixes our agent wins; '*' fallback.
        best_len = -1
        best = None
        star = None
        for agents, rules, delay in groups:
            for ua in agents:
                if ua == "*":
                    star = star or (agents, rules, delay)
                elif self.agent.startswith(ua) and len(ua) > best_len:
                    best_len, best = len(ua), (agents, rules, delay)
        chosen = best or star
        if chosen:
            self._rules = chosen[1]
            self.crawl_delay = chosen[2]

    @staticmethod
    def _pattern_to_regex(pattern: str) -> re.Pattern[str]:
        anchored = pattern.endswith("$")
        if anchored:
            pattern = pattern[:-1]
        parts = [re.escape(p) for p in pattern.split("*")]
        regex = ".*".join(parts)
        return re.compile("^" + regex + ("$" if anchored else ""))

    def allowed(self, url: str) -> bool:
        try:
            parts = urlsplit(url)
            path = parts.path or "/"
            if parts.query:
                path += "?" + parts.query
        except ValueError:
            path = url
        best_len = -1
        best_allow = True
        for is_allow, pattern in self._rules:
            if not pattern:
                # empty Disallow/Allow matches nothing
                continue
            if self._pattern_to_regex(pattern).match(path):
                # specificity = raw pattern length (spec-approved proxy)
                plen = len(pattern)
                if plen > best_len or (plen == best_len and is_allow and not best_allow):
                    best_len, best_allow = plen, is_allow
        return best_allow if best_len >= 0 else True


def robots_allowed(robots_txt: str | None, url: str, ignore: bool = False) -> bool:
    """filterLinks' robots gate — crawler.rs:255-261,325-330. Empty/ignored
    robots → allowed. Agent FireCrawlAgent, fallback FirecrawlAgent (both
    lowercase to the same token, kept for parity)."""
    if ignore or not robots_txt:
        return True
    robot = Robot("FireCrawlAgent", robots_txt)
    return robot.allowed(url)
