"""AI-provider adapters for issue analysis — config-only network seam.

The reference ships three analysis providers
(``/root/reference/src/data_quality/ai_integration.py:270-617``): a
rule-based LOCAL provider (the default — already ported as
``plans.analysis.analyze_issues``) and two paid HTTP providers (OpenAI
chat-completions, Anthropic messages).  This module closes the HTTP
half with the same surface and laws, WITHOUT the vendor SDKs: both
public APIs are plain JSON-over-HTTP, so the adapters speak the wire
shape directly through an injectable ``transport`` callable —

    transport(url, headers, payload_dict) -> response body str

— defaulting to stdlib ``urllib``.  This sandbox has no network; the
transport seam is what makes the adapters fully testable here (and is
better engineering than the reference's untestable SDK calls: its
network paths are ``pragma: no cover``).

Reference laws kept exactly:
- prompt shape (scan totals + top-10 issue block + the numbered
  SUMMARY/SEVERITY/…/CONFIDENCE ask, ``ai_integration.py:529-573``);
- response parsing (\\`\\`\\`json fence, then outermost {...}, then
  raw; JSON failure → truncated-summary fallback at confidence 0.3,
  ``ai_integration.py:575-617``);
- provider failure → degraded Analysis at confidence 0.0, never an
  exception mid-report (``ai_integration.py:405-416``);
- temperature 0.1 / max_tokens 1500; API keys read from the standard
  env vars and NEVER echoed.

``sql_fixes`` in the reference maps to this repo's
``Analysis.fix_templates``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Callable, Mapping, Sequence

from ..exceptions import ConfigurationError
from .analysis import Analysis, analyze_issues

__all__ = [
    "ProviderConfig",
    "build_analysis_prompt",
    "parse_provider_response",
    "analyze_with_provider",
]

Transport = Callable[[str, Mapping[str, str], Mapping[str, Any]], str]

_SYSTEM = (
    "You are a senior database engineer and data quality expert. "
    "Analyze data quality issues and provide actionable insights for "
    "production systems."
)


@dataclass
class ProviderConfig:
    provider: str = "local"          # local | openai | anthropic
    model: str = "rule-based"
    endpoint: str = ""               # override for proxies/self-hosting
    timeout_s: float = 30.0


def _default_transport(url: str, headers: Mapping[str, str],
                       payload: Mapping[str, Any],
                       timeout_s: float = 30.0) -> str:
    import urllib.request

    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={**headers, "content-type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        return resp.read().decode()


def build_analysis_prompt(issues: Sequence[Mapping[str, Any]],
                          summary: Mapping[str, int],
                          scan_time_ms: float) -> str:
    """The reference's prompt shape (ai_integration.py:529-573)."""
    out = f"""
Analyze this data quality report and provide insights:

SCAN RESULTS:
- Total Issues: {len(issues)}
- Critical: {summary.get('critical', 0)}
- Warning: {summary.get('warning', 0)}
- Info: {summary.get('info', 0)}
- Scan Time: {scan_time_ms:.0f}ms

DETAILED ISSUES:
"""
    for issue in list(issues)[:10]:
        out += f"""
- {str(issue['severity']).upper()}: {issue['description']}
  Table: {issue['table']}, Column: {issue['column']}
  Impact: {issue['count']:,} of {issue['total']:,} rows ({issue['percent']:.1f}%)
"""
    out += """

Please provide:
1. SUMMARY: Brief overview of the data quality state
2. SEVERITY: Overall severity assessment (LOW/MEDIUM/HIGH/CRITICAL)
3. BUSINESS_IMPACT: How these issues affect business operations
4. ACTIONS: 3-5 specific recommended actions (prioritized)
5. SQL_FIXES: Specific SQL statements to fix the most critical issues
6. CONFIDENCE: Your confidence in this analysis (0.0-1.0)

Format your response as JSON with keys: summary, severity_assessment,
business_impact, recommended_actions, sql_fixes, confidence_score.
"""
    return out


def parse_provider_response(text: str) -> Analysis:
    """The reference's parse ladder: ```json fence → outermost braces →
    raw; unparseable → truncated summary at confidence 0.3."""
    try:
        if "```json" in text:
            start = text.find("```json") + 7
            body = text[start:text.find("```", start)].strip()
        elif "{" in text and "}" in text:
            body = text[text.find("{"):text.rfind("}") + 1]
        else:
            body = text
        data = json.loads(body)
        return Analysis(
            summary=data.get("summary", "AI analysis completed"),
            severity_assessment=data.get("severity_assessment", "MEDIUM"),
            business_impact=data.get(
                "business_impact", "Impact assessment unavailable"),
            recommended_actions=list(data.get("recommended_actions", [])),
            fix_templates=list(data.get("sql_fixes", [])),
            confidence_score=float(data.get("confidence_score", 0.7)),
        )
    except (json.JSONDecodeError, KeyError, ValueError, TypeError):
        return Analysis(
            summary=text[:200] + "..." if len(text) > 200 else text,
            severity_assessment="MEDIUM",
            business_impact="Unable to parse detailed analysis",
            recommended_actions=["Review AI response manually"],
            fix_templates=[],
            confidence_score=0.3,
        )


def _require_key(env: str, provider: str) -> str:
    key = os.environ.get(env, "")
    if not key:
        raise ConfigurationError(
            env,
            f"provider {provider!r} requires an API key in ${env}",
            "export the key or use provider='local' (no key needed)",
        )
    return key


def _openai_call(cfg: ProviderConfig, prompt: str,
                 transport: Transport) -> str:
    key = _require_key("OPENAI_API_KEY", "openai")
    url = (cfg.endpoint or "https://api.openai.com") + "/v1/chat/completions"
    body = transport(url, {"authorization": f"Bearer {key}"}, {
        "model": cfg.model,
        "messages": [
            {"role": "system", "content": _SYSTEM},
            {"role": "user", "content": prompt},
        ],
        "temperature": 0.1,
        "max_tokens": 1500,
    })
    return json.loads(body)["choices"][0]["message"]["content"]


def _anthropic_call(cfg: ProviderConfig, prompt: str,
                    transport: Transport) -> str:
    key = _require_key("ANTHROPIC_API_KEY", "anthropic")
    url = (cfg.endpoint or "https://api.anthropic.com") + "/v1/messages"
    body = transport(url, {
        "x-api-key": key,
        "anthropic-version": "2023-06-01",
    }, {
        "model": cfg.model,
        "max_tokens": 1500,
        "temperature": 0.1,
        "messages": [{
            "role": "user",
            "content": "You are a senior database engineer. Analyze "
                       f"these data quality issues:\n\n{prompt}",
        }],
    })
    return json.loads(body)["content"][0]["text"]


def analyze_with_provider(
    issues: Sequence[Mapping[str, Any]],
    summary: Mapping[str, int] | None = None,
    scan_time_ms: float = 0.0,
    config: ProviderConfig | None = None,
    transport: Transport | None = None,
) -> Analysis:
    """Issue rows → Analysis via the configured provider.

    'local' (default) is the ported rule-based analyzer — no key, no
    network.  HTTP providers raise ConfigurationError for a MISSING key
    (a config bug the caller must see), but degrade to a confidence-0.0
    Analysis on transport/HTTP/parse-shape failure (the reference's
    never-crash-a-report law)."""
    cfg = config or ProviderConfig()
    if cfg.provider == "local":
        return analyze_issues(list(issues))
    if cfg.provider not in ("openai", "anthropic"):
        raise ConfigurationError(
            "provider", f"unsupported AI provider: {cfg.provider!r}",
            "one of: local, openai, anthropic",
        )
    if summary is None:
        summary = {}
        for i in issues:
            sev = i.get("severity", "info")
            summary[sev] = summary.get(sev, 0) + 1
    prompt = build_analysis_prompt(issues, summary, scan_time_ms)
    tp = transport or (
        lambda u, h, p: _default_transport(u, h, p, cfg.timeout_s))
    call = _openai_call if cfg.provider == "openai" else _anthropic_call
    try:
        text = call(cfg, prompt, tp)
    except ConfigurationError:
        raise
    except Exception as exc:  # noqa: BLE001 - the reference's degrade law
        return Analysis(
            summary=f"AI analysis failed: {exc}",
            severity_assessment="UNKNOWN",
            business_impact="Unable to assess impact due to AI service "
                            "error.",
            recommended_actions=[
                "Review issues manually",
                "Check AI service configuration",
            ],
            fix_templates=[],
            confidence_score=0.0,
        )
    return parse_provider_response(text)
