"""Conformance tests for the widening merge lattice (reference
type_casting/src/lib.rs:14-166 + tests.rs:7-67)."""

import pyarrow as pa
import pytest
from hypothesis import given, strategies as st

from ulp_ray.functions.casts import SemType as T
from ulp_ray.functions.schema_merge import (
    ListNode,
    ObjectNode,
    arrow_schema_from_json,
    arrow_schema_to_json,
    infer_type,
    merge_types,
    type_node_to_arrow,
    unify_arrow_schemas,
)

from conformance_cases import MERGE_COMMUTATIVE_OBJECT_PAIRS


def test_null_absorbs():
    # tests.rs:59-67
    for t in (T.BOOL, T.INT, T.FLOAT, T.STR, T.IPV4, T.IPV6, T.DATE):
        assert merge_types(T.NULL, t) is t
        assert merge_types(t, T.NULL) is t


def test_numeric_ladder():
    assert merge_types(T.BOOL, T.INT) is T.INT
    assert merge_types(T.INT, T.FLOAT) is T.FLOAT
    assert merge_types(T.BOOL, T.FLOAT) is T.FLOAT
    assert merge_types(T.INT, T.STR) is T.STR
    assert merge_types(T.IPV4, T.IPV6) is T.STR


@pytest.mark.parametrize("a,b", MERGE_COMMUTATIVE_OBJECT_PAIRS)
def test_merge_commutative_on_reference_cases(a, b):
    # tests.rs:10-54: merge(a,b) == merge(b,a) on real JSON objects
    ta, tb = infer_type(a), infer_type(b)
    assert merge_types(ta, tb) == merge_types(tb, ta)


def test_reference_asymmetric_corners_documented():
    # lib.rs:117-146 ships a non-commutative table at these corners; we
    # reproduce it exactly rather than "fixing" it silently.
    assert merge_types(T.FLOAT, T.DATE) is T.FLOAT
    assert merge_types(T.DATE, T.FLOAT) is T.STR
    assert merge_types(T.FLOAT, T.IPV6) is T.FLOAT
    assert merge_types(T.IPV6, T.FLOAT) is T.STR


def test_object_merge_recursive():
    a = infer_type({"a": 1, "b": 2.0, "c": 1})
    b = infer_type({"a": 1, "b": "2.a", "c": "1.0.2.4"})
    m = merge_types(a, b)
    assert isinstance(m, ObjectNode)
    # "1" sniffs BOOL (str_bool int fallback); int+bool→int
    assert m["a"] is T.BOOL or m["a"] is T.INT
    assert m["b"] is T.STR
    # c: Int merged with IPv4 → Str
    assert m["c"] is T.STR


def test_list_scalar_merges_into_element_zero():
    lst = infer_type([1, 2.5])
    m = merge_types(lst, T.FLOAT)
    assert isinstance(m, ListNode)
    assert m[0] is T.FLOAT
    assert m[1] is T.FLOAT


def test_object_list_numeric_key_merge():
    obj = ObjectNode({"0": T.INT, "x": T.STR})
    lst = ListNode({0: T.FLOAT, 1: T.STR})
    m = merge_types(obj, lst)
    assert isinstance(m, ObjectNode)
    assert m["0"] is T.FLOAT  # merged
    assert "1" not in m  # unmatched list entries dropped (lib.rs:69-86)


_scalars = st.sampled_from([T.NULL, T.BOOL, T.INT, T.FLOAT, T.STR])


@given(_scalars, _scalars, _scalars)
def test_associative_on_commutative_core(a, b, c):
    # the Null/Bool/Int/Float/Str core IS a lattice: associativity holds
    assert merge_types(merge_types(a, b), c) == merge_types(a, merge_types(b, c))


def test_arrow_projection():
    node = infer_type({"n": 1, "f": 2.5, "s": "hello world", "lst": [1, 2]})
    t = type_node_to_arrow(node)
    assert t == pa.struct(
        [
            pa.field("f", pa.float64()),
            pa.field("lst", pa.list_(pa.int64())),
            pa.field("n", pa.int64()),
            pa.field("s", pa.string()),
        ]
    )


def test_unify_arrow_schemas_widens():
    s1 = pa.schema([("a", pa.int64()), ("b", pa.string())])
    s2 = pa.schema([("a", pa.float64()), ("c", pa.timestamp("us"))])
    u = unify_arrow_schemas([s1, s2])
    assert u.field("a").type == pa.float64()
    assert u.field("b").type == pa.string()
    assert u.field("c").type == pa.timestamp("us")


def test_schema_json_roundtrip():
    s = pa.schema([("a", pa.int64()), ("b", pa.string()), ("t", pa.timestamp("us"))])
    assert arrow_schema_from_json(arrow_schema_to_json(s)) == s
