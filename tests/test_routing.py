"""Conformance tests for routing templates, dotted-path lookup, and route
sanitization (reference src/type_map.rs + src/elastic.rs:156-182)."""

import pyarrow as pa

from ulp_ray.functions.routing import (
    IndexPattern,
    _MISSING,
    dotted_get,
    sanitise_route,
    sanitise_routes,
)

from conformance_cases import TEMPLATE_GOLDEN


def test_template_golden():
    # type_map.rs:201-218
    template, record, expected = TEMPLATE_GOLDEN
    assert IndexPattern.parse(template).evaluate(record) == expected


def test_template_sentinels():
    p = IndexPattern.parse("pre_{{k}}_post")
    assert p.evaluate({}) == "pre_NONE_post"
    assert p.evaluate({"k": [1, 2]}) == "pre_ARRAY_post"
    assert p.evaluate({"k": {"a": 1}}) == "pre_OBJECT_post"
    assert p.evaluate({"k": "v"}) == "pre_v_post"
    # non-string scalars append NOTHING (Value::as_str quirk, type_map.rs:50-54)
    assert p.evaluate({"k": 7}) == "pre__post"
    assert p.evaluate({"k": None}) == "pre__post"


def test_dotted_get_arrays():
    data = {"a": {"b": [{"c": 5}, {"c": 6}]}}
    assert dotted_get(data, "a.b.0.c") == 5
    assert dotted_get(data, "a.b.1.c") == 6
    assert dotted_get(data, "a.b.2.c") is _MISSING
    assert dotted_get(data, "a.x") is _MISSING
    # numeric segment never indexes an object (Rust Value::get(usize))
    assert dotted_get({"0": "x"}, "0") is _MISSING


def test_sanitise_route_scalar():
    # elastic.rs:156-182
    assert sanitise_route("EVTX_Micro soft:Windows/Sys*mon") == "evtx_micro_softwindowssysmon"
    assert sanitise_route("__..--abc") == "abc"
    # sequential trims: all '_', then all '.', then all '-'
    assert sanitise_route("_-._x") == "-._x".lstrip("_").lstrip(".").lstrip("-")
    assert sanitise_route('a"b*c+d/e\\f|g?h#i%j<k>l') == "abcdefghijkl"


def test_sanitise_routes_vector_matches_scalar():
    vals = [
        "EVTX_Micro soft:Windows/Sys*mon",
        "__..--abc",
        "_-._x",
        'a"b*c+d/e\\f|g?h#i%j<k>l',
        "plain",
        "UPPER CASE",
    ]
    out = sanitise_routes(pa.array(vals)).to_pylist()
    assert out == [sanitise_route(v) for v in vals]


def test_template_evaluate_columns():
    batch = pa.table(
        {
            "x_tool": pa.array(["bash", None, "read"]),
            "n": pa.array([1, 2, 3]),
        }
    )
    p = IndexPattern.parse("rule_{{x_tool}}_{{missing}}")
    assert p.evaluate_columns(batch).to_pylist() == [
        "rule_bash_NONE",
        "rule_NONE_NONE",
        "rule_read_NONE",
    ]


def test_template_evaluate_columns_nested_struct():
    """The reference golden case ({{x.y}}_aaa_{{a.b}}_bbb -> apple_aaa_
    pear_bbb, type_map.rs:201-218) through the VECTORIZED path over
    struct columns."""
    batch = pa.table(
        {
            "x": pa.array([{"y": "apple"}, {"y": None}, None]),
            "a": pa.array([{"b": "pear"}, {"b": "plum"}, {"b": "fig"}]),
        }
    )
    p = IndexPattern.parse("{{x.y}}_aaa_{{a.b}}_bbb")
    assert p.evaluate_columns(batch).to_pylist() == [
        "apple_aaa_pear_bbb",
        "NONE_aaa_plum_bbb",
        "NONE_aaa_fig_bbb",
    ]
    # scalar/vector agreement on the golden record
    rec = {"x": {"y": "apple"}, "a": {"b": "pear"}}
    assert p.evaluate(rec) == "apple_aaa_pear_bbb"


def test_template_evaluate_columns_nested_sentinels():
    batch = pa.table(
        {
            "s": pa.array([{"inner": {"k": 1}, "arr": [1, 2]}] * 2),
        }
    )
    p = IndexPattern.parse("{{s.inner}}|{{s.arr}}|{{s.missing}}|{{s.inner.k}}")
    out = p.evaluate_columns(batch).to_pylist()
    # struct leaf -> OBJECT, list leaf -> ARRAY, missing field -> NONE,
    # non-string scalar -> printed form (vectorized-path deviation)
    assert out == ["OBJECT|ARRAY|NONE|1"] * 2


def test_template_evaluate_columns_list_indexing():
    batch = pa.table({"tags": pa.array([["a", "b"], ["c"], []])})
    p = IndexPattern.parse("t_{{tags.1}}")
    assert p.evaluate_columns(batch).to_pylist() == ["t_b", "t_NONE", "t_NONE"]
