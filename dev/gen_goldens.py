#!/usr/bin/env python3
"""Golden generator: runs the REFERENCE transformers (read-only at
/root/reference) over seeded pseudo-random messy records and writes
aligned input/expected JSONL for GoldenFuzzSpec. Deterministic (seed 42);
outputs are committed so the Scala tests need no Python at run time.

Expected values are flattened to dot-paths, restricted to the scalar
surface the Spark stages implement.
"""
import json
import random
import sys

sys.path.insert(0, '/root/reference')
from etl.transform.marketo_transformer import MarketoTransformer
from etl.transform.frontend_transformer import FrontendTransformer
from etl.transform.text_agent_transformer import TextAgentTransformer

rng = random.Random(42)

WORDS = ["the", "and", "help", "sorry", "product", "price", "recommend",
         "shipping", "refund", "demo", "contact", "buy", "steps", "solution",
         "cannot", "great", "terrible", "el", "que", "le", "être", "solved",
         "try", "escalate", "specifically", "however", "furthermore", "x",
         "payment", "warranty", "tracking", "suggest", "info", "details"]

def maybe(v, p=0.8):
    # include non-space whitespace: Python .strip() removes \t/\n, Spark
    # trim() would not — the round-1 advice gap
    return v if rng.random() < p else rng.choice([None, "", "  ", "\n", "\t"])

def text(n):
    parts = [rng.choice(WORDS) for _ in range(n)]
    if rng.random() < 0.2:
        parts.append("visit http://example.com")
    if rng.random() < 0.1:
        parts.append("```code```")
    if rng.random() < 0.3:
        parts.append("done.")
    return " ".join(parts)

def gen_marketo(i):
    emails = [f"user{i}@Example.COM", f"  USER{i}@test.org  ", "bad email",
              f"user{i}@gmail.com", None, "", f"a+b_{i}@x-y.co",
              f"\nuser{i}@tabbed.io\t"]
    phones = [f"{rng.randrange(10**9, 10**10)}", f"1{rng.randrange(10**9, 10**10)}",
              "(555) 987-6543 ext 123", "+44 20 7946 0958", None, "", "12345"]
    sources = ["web", "WEBSITE", " referral ", "fax machine", "Paid Search",
               "organic search", None, "", "direct mail", "trade show",
               "\torganic search\n"]
    return {
        "id": i,
        "email": rng.choice(emails),
        "firstName": maybe(f"First{i}"),
        "lastName": maybe(f"Last{i}"),
        "company": maybe(f"Co {i}"),
        "title": maybe("VP"),
        "phone": rng.choice(phones),
        "leadSource": rng.choice(sources),
        "originalSourceType": maybe("Organic"),
        "leadStatus": maybe("New"),
        "createdAt": rng.choice(["2024-01-15T10:30:00Z", "2024-02-01 08:00:00",
                                 None, "", "not-a-date"]),
        # all parseable-aware values are >7 days old at any run time, naive
        # datetimes raise TypeError and garbage raises ValueError in the
        # reference's recency try/except — every branch is deterministic
        "updatedAt": rng.choice(["2024-01-20T14:22:00Z", "2023-06-01T00:00:00Z",
                                 None, "", "2024-02-01 08:00:00", "not-a-date"]),
        "country": maybe("US"), "state": maybe("CA"),
        "city": maybe("SF"), "postalCode": maybe("94105"),
    }

MARKETO_FIELDS = ["lead_id", "email", "first_name", "last_name", "company",
                  "title", "phone", "lead_source", "original_source_type",
                  "lead_status", "full_name", "email_domain",
                  "lead_quality_score"]

def gen_frontend(i):
    uas = ["Mozilla/5.0 (Windows NT 10.0) Chrome/120.0",
           "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) Version/17.0 Mobile Safari/604.1",
           "Mozilla/5.0 (X11; Linux x86_64) Firefox/115.0",
           "Mozilla/5.0 (Windows NT 10.0) Chrome/120 Edg/120.0",
           "Googlebot/2.1", None, ""]
    urls = [f"https://shop.example.com/product/p{i}",
            "https://x.io/search?q=a&utm_source=google&utm_medium=cpc",
            "https://a.b/cart/checkout", "https://a.b/", "", None,
            f"https://news.example.org/article/{i}"]
    refs = ["https://google.com/search?q=x", "https://facebook.com/p",
            "https://partner.io/a", "", None, "https://mail.google.com/u/0",
            "https://partner.io:8080/a",      # netloc keeps the port
            "www.google.com/search?q=x"]      # scheme-less: netloc = ''
    events = ["widget_open", "click", "page_view", "form_submit", "scroll",
              "Widget-Open", "PURCHASE", "hover"]
    return {
        "event_type": rng.choice(events),
        "timestamp": rng.choice([1705320000000, 1705320000, "2024-01-15T12:00:00Z"]),
        "session_id": maybe(f"sess_{i}"),
        "user_id": f"user_{i}",  # unique join key for the spec
        "interaction_type": maybe("click"),
        "widget_id": maybe("w1"),
        "page_url": rng.choice(urls),
        "page_title": maybe(f"Title {i}"),
        "referrer": rng.choice(refs),
        "user_agent": rng.choice(uas),
        "screen_resolution": maybe("1920x1080"),
        "viewport_size": maybe("1200x800"),
        "time_on_page": rng.choice([0, 10, 45, 150, 400, None]),
    }

FRONTEND_FIELDS = ["session_id", "user_id", "event_type", "interaction_type",
                   "widget_id", "user_segment", "engagement_score",
                   "conversion_stage", "quality_score",
                   "page_info.domain", "page_info.path", "page_info.category",
                   "page_info.utm_source", "page_info.utm_medium",
                   "referrer_info.referrer_domain", "referrer_info.referrer_type",
                   "device_info.device_type", "device_info.browser",
                   "device_info.operating_system", "device_info.is_mobile"]

def gen_textagent(i):
    models = ["gpt-4-turbo", "claude-3-opus", "llama-2-70b-chat",
              "gemini-pro-vision", "mistral-7b-instruct-v0.2", "custom-model",
              "code-davinci instruct"]
    tools = [[], ["web_search"], ["calc_tool", "db_query", "api_service"],
             ["finder", "math_helper"], None]
    return {
        "session_id": f"s{i}", "turn_id": f"t{i}", "user_id": maybe(f"u{i}"),
        "channel": rng.choice(["web_chat", "voice", ""]),
        "timestamp": 1705320000000 + i,
        "model": rng.choice(models),
        "tokens_in": rng.choice([0, 5, 150, 900]),
        "tokens_out": rng.choice([0, 8, 60, 342, 800, 1500]),
        "latency_ms": rng.choice([0, 40, 1250, 30000]),
        "response_text": rng.choice([text(rng.randrange(0, 120)), "", None,
                                     "\n" + text(rng.randrange(1, 40)),
                                     " \t" + text(rng.randrange(1, 40)) + " \n"]),
        "tools_used": rng.choice(tools),
        "tool_results": rng.choice([{}, {"a": {"success": True}},
                                    {"a": {"success": True}, "b": {"success": False}},
                                    {"a": {}}]),
    }

TEXTAGENT_FIELDS = [
    "session_id", "turn_id", "user_id", "channel",
    "model_info.model_family", "model_info.estimated_size", "model_info.model_version",
    "performance_metrics.total_tokens", "performance_metrics.tokens_per_second",
    "performance_metrics.compression_ratio", "performance_metrics.efficiency_score",
    "content_analysis.response_length", "content_analysis.word_count",
    "content_analysis.sentence_count", "content_analysis.has_code_blocks",
    "content_analysis.has_links", "content_analysis.language",
    "content_analysis.sentiment",
    "tool_usage.tools_count", "tool_usage.tool_success_rate",
    "quality_metrics.completeness_score", "quality_metrics.relevance_score",
    "quality_metrics.helpfulness_score", "quality_metrics.overall_quality_score",
    "quality_metrics.response_appropriateness",
    "business_metrics.estimated_cost_usd", "business_metrics.has_conversion_indicators",
    "business_metrics.support_resolution_type", "business_metrics.business_value_score"]

def dig(d, path):
    cur = d
    for p in path.split("."):
        if cur is None:
            return None
        cur = cur.get(p)
    return cur

def run(family, gen, transformer, fields, n, out_prefix):
    inputs, expected = [], []
    for i in range(n):
        rec = gen(i)
        try:
            out = transformer.transform(dict(rec))["data"]
        except Exception:
            continue  # rejected by validation — not part of the parity surface
        inputs.append(rec)
        expected.append({"__id": len(inputs) - 1,
                         **{f: dig(out, f) for f in fields}})
    with open(f"{out_prefix}_inputs.jsonl", "w") as f:
        for i, rec in enumerate(inputs):
            f.write(json.dumps({"__id": i, **rec}, ensure_ascii=False) + "\n")
    with open(f"{out_prefix}_expected.jsonl", "w") as f:
        for rec in expected:
            f.write(json.dumps(rec, ensure_ascii=False) + "\n")
    print(f"{family}: {len(inputs)} accepted records")

if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/goldens"
    import os
    os.makedirs(outdir, exist_ok=True)
    run("marketo", gen_marketo, MarketoTransformer(), MARKETO_FIELDS,
        800, f"{outdir}/marketo")
    run("frontend", gen_frontend, FrontendTransformer(), FRONTEND_FIELDS,
        800, f"{outdir}/frontend")
    run("textagent", gen_textagent, TextAgentTransformer(), TEXTAGENT_FIELDS,
        800, f"{outdir}/textagent")
