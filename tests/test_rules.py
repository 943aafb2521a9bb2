"""Rule registry: first-match-wins, typed captures, routes (the open
replacement for the reference's closed parser enum, src/lib.rs:35-93)."""

import pyarrow as pa
import pytest

from ulp_ray.rules import (
    Capture,
    CompiledRegistry,
    Rule,
    RuleRegistry,
    UNMATCHED,
    default_transcript_registry,
)


@pytest.fixture(scope="module")
def compiled() -> CompiledRegistry:
    return default_transcript_registry().compile()


def test_first_match_wins_and_fallback(compiled):
    texts = pa.array(
        [
            "Calling tool bash with args path=/tmp/x timeout=30",
            "ERROR [auth] code=0x1A retry=true: boom boom",
            "connection from 10.0.0.1:8080 latency=12.5ms",
            "status=ok at 2026-01-02T03:04:05+00:00 items=7",
            "lorem ipsum dolor sit amet.",
        ]
    )
    out = compiled.parse_column(texts)
    assert out["rule"].to_pylist() == [
        "tool_call",
        "error_line",
        "net_event",
        "status",
        UNMATCHED,
    ]


def test_typed_captures(compiled):
    texts = pa.array(
        [
            "ERROR [cache] code=0xFF retry=false: x",
            "connection from 0:0:0:0:0:0:0:1:443 latency=1.5ms",
            "status=null at 2026-01-02T03:04:05+00:00 items=12",
            "status=0 at 2026-01-02T03:04:05+00:00 items=1",
            "Calling tool read with args path=/a/b timeout=600",
        ]
    )
    out = compiled.parse_column(texts)
    rows = out.to_pylist()
    # hex int via str_int (types.rs:168-181)
    assert rows[0]["x_code"] == 255
    assert rows[0]["x_retry"] is False
    # ipv6 canonicalized (tests.rs:520-547)
    assert rows[1]["x_ip"] == "::1"
    assert rows[1]["x_port"] == 443
    assert rows[1]["x_latency"] == 1.5
    # null sentinels (types.rs:150-156): "null" and "0" → null
    assert rows[2]["x_status"] is None
    assert rows[3]["x_status"] is None
    assert rows[2]["x_items"] == 12
    # ts parsed as RFC-3339 UTC
    assert rows[2]["x_ts"] is not None
    assert rows[4]["x_timeout"] == 600
    # captures from non-winning rules stay null
    assert rows[4]["x_code"] is None


def test_routes_default_and_template():
    reg = RuleRegistry(
        [
            Rule(
                "evt",
                r"evt (?P<x_kind>\w+)",
                (Capture("x_kind"),),
                route="evt_{{x_kind}}",
            ),
            Rule("plain", r"plain"),
        ]
    )
    c = reg.compile()
    parsed = c.parse_column(pa.array(["evt Login", "plain text", "nothing"]))
    routes = c.routes_for(parsed).to_pylist()
    assert routes == ["evt_Login", "plain", UNMATCHED]


def test_registry_version_changes_with_rules():
    r1 = RuleRegistry([Rule("a", r"a")])
    r2 = RuleRegistry([Rule("a", r"b")])
    assert r1.version != r2.version
    assert r1.version == RuleRegistry([Rule("a", r"a")]).version


def test_duplicate_rule_names_rejected():
    with pytest.raises(ValueError):
        RuleRegistry([Rule("a", r"a"), Rule("a", r"b")])


def test_capture_must_be_in_pattern():
    with pytest.raises(ValueError):
        Rule("a", r"a", (Capture("missing"),))


def test_conflicting_capture_types_rejected():
    reg = RuleRegistry(
        [
            Rule("a", r"(?P<x>\d+)", (Capture("x", "int"),)),
            Rule("b", r"(?P<x>\w+)", (Capture("x", "str"),)),
        ]
    )
    with pytest.raises(ValueError):
        reg.compile()


def test_parse_actor_pool(ray_session):
    """Actor-pool form of the parse stage (ST1 pattern)."""
    import ray.data

    from ulp_ray.stages.parse import ParseActor

    ds = ray.data.from_arrow(
        pa.table({"text": ["Calling tool bash with args path=/x timeout=5"] * 64})
    )
    out = ds.map_batches(
        ParseActor,
        fn_constructor_kwargs={"registry": default_transcript_registry()},
        batch_format="pyarrow",
        concurrency=2,
    ).take_all()
    assert all(r["rule"] == "tool_call" and r["x_timeout"] == 5 for r in out)


def test_conversion_failure_is_row_level_not_task_level():
    """A matching row whose capture can't convert yields a null capture,
    keeps its rule, and never fails the batch (north-rule row-level
    error policy; the reference panics the worker, src/lib.rs:90)."""
    reg = RuleRegistry(
        [Rule("num", r"n=(?P<x_n>\S+)", (Capture("x_n", "int"),))]
    )
    out = reg.compile().parse_column(
        pa.array(["n=42", "n=not_a_number", "n=0x1F", "no match here"])
    )
    rows = out.to_pylist()
    assert [r["rule"] for r in rows] == ["num", "num", "num", UNMATCHED]
    assert rows[0]["x_n"] == 42
    assert rows[1]["x_n"] is None  # conversion failed -> null, row kept
    assert rows[2]["x_n"] == 31  # hex path


def test_registry_json_round_trip():
    reg = default_transcript_registry()
    back = RuleRegistry.from_json(reg.to_json())
    assert back.version == reg.version
    assert [r.name for r in back.rules] == [r.name for r in reg.rules]
    assert back.rules[0].prefilter == reg.rules[0].prefilter


def test_unicode_text_passthrough(compiled):
    texts = pa.array(
        [
            "这是一个中文句子 with mixed 内容 🚀",
            "état= café… naïve ≠ ASCII",
            "Calling tool bash with args path=/tmp/文件.txt timeout=9",
        ]
    )
    out = compiled.parse_column(texts)
    rows = out.to_pylist()
    assert rows[0]["rule"] == UNMATCHED
    assert rows[1]["rule"] == UNMATCHED
    assert rows[2]["rule"] == "tool_call"
    assert rows[2]["x_path"] == "/tmp/文件.txt"


def test_grok_rule_expansion_and_parse():
    from ulp_ray.rules import RuleRegistry, grok_rule

    reg = RuleRegistry(
        [
            grok_rule(
                "conn",
                r"connection from %{IPV4:src}:%{POSINT:port} latency=%{NUMBER:lat}ms",
                prefilter="connection from ",
            ),
            grok_rule("err", r"%{LOGLEVEL:level} \[%{WORD:comp}\] %{GREEDYDATA:msg}"),
        ]
    )
    compiled = reg.compile()
    out = compiled.parse_column(
        pa.array(
            [
                "connection from 10.0.0.1:443 latency=3.5ms",
                "ERROR [disk] out of space",
                "no match here",
            ]
        )
    )
    assert out["rule"].to_pylist() == ["conn", "err", "_unmatched"]
    assert out["src"].to_pylist()[0] == "10.0.0.1"
    assert out["port"].to_pylist()[0] == 443  # typed int via IPV4/POSINT defaults
    assert out["lat"].to_pylist()[0] == 3.5
    assert out["comp"].to_pylist()[1] == "disk"


def test_grok_type_override_and_roundtrip():
    from ulp_ray.rules import RuleRegistry, grok_rule

    r = grok_rule("kv", r"k=%{NOTSPACE:k:int}")
    assert r.captures[0].type == "int"
    reg = RuleRegistry([r])
    again = RuleRegistry.from_json(reg.to_json())
    assert again.version == reg.version  # grok expands before serialization


def test_grok_unknown_alias_rejected():
    import pytest as _pytest

    from ulp_ray.rules import expand_grok

    with _pytest.raises(ValueError, match="unknown grok alias"):
        expand_grok("%{NOPE:x}")


def test_grok_timestamp_and_hex():
    from ulp_ray.rules import RuleRegistry, grok_rule

    reg = RuleRegistry(
        [grok_rule("st", r"at %{TIMESTAMP_ISO8601:t} code=%{HEXINT:c}")]
    )
    out = reg.compile().parse_column(
        pa.array(["at 2024-05-06T07:08:09+00:00 code=0x1f"])
    )
    assert out["c"].to_pylist() == [31]
    assert out["t"].to_pylist()[0].year == 2024


def test_grok_custom_pattern_definitions():
    from ulp_ray.rules import RuleRegistry, grok_rule

    reg = RuleRegistry(
        [
            grok_rule(
                "sess",
                r"session %{SESSION_ID:sid} opened",
                extra_patterns={"SESSION_ID": r"[A-Z]{2}-\d{4}"},
            )
        ]
    )
    out = reg.compile().parse_column(
        pa.array(["session AB-1234 opened", "session nope opened"])
    )
    assert out["rule"].to_pylist() == ["sess", "_unmatched"]
    assert out["sid"].to_pylist()[0] == "AB-1234"


def test_grok_nested_custom_patterns_expand_recursively():
    from ulp_ray.rules import RuleRegistry, expand_grok, grok_rule

    reg = RuleRegistry(
        [
            grok_rule(
                "sess2",
                r"session %{SESSION_ID:sid} opened",
                extra_patterns={"SESSION_ID": r"%{WORD}-%{INT}"},
            )
        ]
    )
    out = reg.compile().parse_column(pa.array(["session ab-12 opened"]))
    assert out["sid"].to_pylist() == ["ab-12"]
    # cycles raise instead of looping
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cycle"):
        expand_grok("%{A:x}", extra_patterns={"A": "%{B}", "B": "%{A}"})


def test_grok_common_access_log(ray_session):
    """A Common-Log-Format rule built purely from the grok vocabulary
    parses real access-log lines with typed captures, and the typed
    output matches a DuckDB regexp_extract oracle over the same lines."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from ulp_ray.rules import RuleRegistry, grok_rule
    from ulp_ray.stages.parse import make_parse_fn

    rule = grok_rule(
        "clf",
        r'%{IPV4:client} - %{USER:ident} \[%{HTTPDATE:when:str}\] '
        r'"%{HTTPMETHOD:method} %{URIPATH:path}(?:%{QS})? %{HTTPVERSION}" '
        r"%{POSINT:status} %{POSINT:nbytes}",
    )
    reg = RuleRegistry([rule])
    lines = [
        '10.0.0.1 - alice [17/Aug/2026:09:00:00 +0000] "GET /index.html HTTP/1.1" 200 5213',
        '192.168.7.9 - - [17/Aug/2026:09:00:01 +0000] "POST /api/v1/items?x=1 HTTP/1.1" 201 77',
        "not a log line at all",
        '8.8.8.8 - bob [17/Aug/2026:09:00:02 +0000] "DELETE /thing HTTP/2" 204 0',
    ]
    t = pa.table({"text": pa.array(lines), "line_id": pa.array(range(len(lines)), pa.int64())})
    ds = ray.data.from_arrow(t)
    out = (
        ds.map_batches(make_parse_fn(reg), batch_format="pyarrow")
        .to_pandas()
        .sort_values("line_id")
        .reset_index(drop=True)
    )
    matched = out[out["rule"] == "clf"]
    assert len(matched) == 3
    assert matched["client"].tolist() == ["10.0.0.1", "192.168.7.9", "8.8.8.8"]
    assert matched["status"].tolist() == [200, 201, 204]
    # (int64 in Arrow; pandas promotes the null-carrying column to float)
    assert matched["nbytes"].tolist() == [5213, 77, 0]
    assert out[out["line_id"] == 2]["rule"].iloc[0] == "_unmatched"
    # oracle: the same typed extraction via DuckDB RE2
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        "SELECT line_id, regexp_extract(text, '^((?:\\d{1,3}\\.){3}\\d{1,3}) ', 1)"
        " AS client, CAST(regexp_extract(text, '\" (\\d+) (\\d+)$', 1) AS BIGINT)"
        " AS status FROM t WHERE regexp_matches(text, '^(?:\\d{1,3}\\.){3}\\d{1,3} ')"
        " ORDER BY line_id"
    ).df()
    assert matched["client"].tolist() == exp["client"].tolist()
    assert matched["status"].tolist() == exp["status"].tolist()
