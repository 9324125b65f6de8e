"""AI-provider adapters: wire shape + parse/degrade laws through the
injectable transport (ref ai_integration.py:270-617).  No network —
that is the point of the seam."""

from __future__ import annotations

import json

import pytest

from data_quality_spark.exceptions import ConfigurationError
from data_quality_spark.plans.providers import (
    ProviderConfig,
    analyze_with_provider,
    build_analysis_prompt,
    parse_provider_response,
)

ISSUES = [
    {"table": "songs", "column": "isrc", "issue_type": "nulls",
     "count": 1, "total": 4, "percent": 25.0, "severity": "critical",
     "description": "isrc has NULL values"},
    {"table": "songs", "column": "isrc", "issue_type": "duplicate",
     "count": 1, "total": 4, "percent": 25.0, "severity": "warning",
     "description": "isrc has duplicate values"},
]

GOOD_JSON = {
    "summary": "one null, one dup",
    "severity_assessment": "HIGH",
    "business_impact": "royalty routing breaks",
    "recommended_actions": ["backfill isrc"],
    "sql_fixes": ["UPDATE songs SET isrc = ..."],
    "confidence_score": 0.9,
}


class _Recorder:
    def __init__(self, body: str):
        self.body = body
        self.calls: list = []

    def __call__(self, url, headers, payload):
        self.calls.append((url, dict(headers), payload))
        return self.body


def test_local_provider_is_the_ported_analyzer():
    a = analyze_with_provider(ISSUES)
    assert a.severity_assessment == "high"  # analyze_issues law
    assert a.confidence_score > 0.9  # local provider, no degrade path


def test_openai_wire_shape_and_parse(monkeypatch):
    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")
    tp = _Recorder(json.dumps(
        {"choices": [{"message": {"content": json.dumps(GOOD_JSON)}}]}))
    a = analyze_with_provider(
        ISSUES, config=ProviderConfig("openai", "gpt-4o-mini"),
        transport=tp)
    url, headers, payload = tp.calls[0]
    assert url == "https://api.openai.com/v1/chat/completions"
    assert headers["authorization"] == "Bearer sk-test"
    assert payload["model"] == "gpt-4o-mini"
    assert payload["temperature"] == 0.1 and payload["max_tokens"] == 1500
    assert payload["messages"][0]["role"] == "system"
    assert "DETAILED ISSUES" in payload["messages"][1]["content"]
    assert a.summary == "one null, one dup"
    assert a.fix_templates == ["UPDATE songs SET isrc = ..."]
    assert a.confidence_score == 0.9


def test_anthropic_wire_shape(monkeypatch):
    monkeypatch.setenv("ANTHROPIC_API_KEY", "ak-test")
    tp = _Recorder(json.dumps(
        {"content": [{"text": "```json\n" + json.dumps(GOOD_JSON)
                      + "\n```"}]}))
    a = analyze_with_provider(
        ISSUES, config=ProviderConfig("anthropic", "claude-3-haiku"),
        transport=tp)
    url, headers, payload = tp.calls[0]
    assert url == "https://api.anthropic.com/v1/messages"
    assert headers["x-api-key"] == "ak-test"
    assert headers["anthropic-version"] == "2023-06-01"
    assert payload["messages"][0]["role"] == "user"
    assert a.severity_assessment == "HIGH"  # fenced-JSON parse law


def test_missing_key_is_configuration_error(monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    with pytest.raises(ConfigurationError, match="OPENAI_API_KEY"):
        analyze_with_provider(ISSUES, config=ProviderConfig("openai"))


def test_transport_failure_degrades_not_raises(monkeypatch):
    monkeypatch.setenv("ANTHROPIC_API_KEY", "ak")

    def boom(url, headers, payload):
        raise OSError("connection refused")

    a = analyze_with_provider(
        ISSUES, config=ProviderConfig("anthropic"), transport=boom)
    assert a.confidence_score == 0.0
    assert "AI analysis failed" in a.summary
    assert a.severity_assessment == "UNKNOWN"


def test_unparseable_response_fallback(monkeypatch):
    monkeypatch.setenv("OPENAI_API_KEY", "sk")
    tp = _Recorder(json.dumps(
        {"choices": [{"message": {"content": "no json here at all"}}]}))
    a = analyze_with_provider(
        ISSUES, config=ProviderConfig("openai"), transport=tp)
    assert a.confidence_score == 0.3
    assert a.summary == "no json here at all"


def test_unknown_provider_rejected():
    with pytest.raises(ConfigurationError, match="unsupported"):
        analyze_with_provider(ISSUES, config=ProviderConfig("ollama"))


def test_prompt_limits_to_top_ten_issues():
    many = [dict(ISSUES[0], column=f"c{i}") for i in range(15)]
    p = build_analysis_prompt(many, {"critical": 15}, 12.0)
    assert p.count("Table: songs") == 10
    assert "Total Issues: 15" in p


def test_parse_outermost_braces():
    text = "preamble {" + json.dumps(GOOD_JSON)[1:-1] + "} trailer"
    a = parse_provider_response(text)
    assert a.summary == "one null, one dup"


def test_default_transport_request_shape(monkeypatch):
    """The stdlib urllib transport: POST, JSON body, merged headers —
    verified by intercepting urlopen (no network)."""
    import json as _json

    from data_quality_spark.plans import providers as P

    seen = {}

    class _Resp:
        def read(self):
            return b'{"ok": true}'

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        seen["url"] = req.full_url
        seen["method"] = req.get_method()
        seen["headers"] = dict(req.header_items())
        seen["body"] = _json.loads(req.data.decode())
        seen["timeout"] = timeout
        return _Resp()

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    body = P._default_transport(
        "https://api.example.com/v1/x", {"x-api-key": "k"},
        {"model": "m"}, timeout_s=7.0)
    assert body == '{"ok": true}'
    assert seen["method"] == "POST"
    assert seen["timeout"] == 7.0
    assert seen["body"] == {"model": "m"}
    hdrs = {k.lower(): v for k, v in seen["headers"].items()}
    assert hdrs["x-api-key"] == "k"
    assert hdrs["content-type"] == "application/json"
