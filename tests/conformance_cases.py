"""Conformance fixtures ported (as data, not code) from the reference's
unit tests so our scalar library matches ulp's semantics.

Sources (behavioral, in /root/reference):
- merge commutativity object pairs: type_casting/src/tests.rs:10-54
- merge Null-absorption cases:      type_casting/src/tests.rs:59-67
- null/bool/int cast cases:         type_casting/src/tests.rs:70-217
- ipv4/ipv6 cases incl. ::1:        type_casting/src/tests.rs:497-548
- route-template golden case:       src/type_map.rs:201-218
"""

from ulp_ray.functions.casts import SemType as T

# (value-as-python, expected sniffed SemType) — test_str order null→bool→
# int→float→ipv4→ipv6→date→str (types.rs:203-221)
SNIFF_CASES = [
    ("null", T.NULL),
    ("NULL ", T.NULL),
    (" null", T.NULL),
    ("0", T.NULL),  # reference quirk: "0" sniffs as null (types.rs:152)
    ("true", T.BOOL),
    ("False", T.BOOL),
    ("1", T.BOOL),  # str_bool falls back to int 1 → bool before int wins
    ("2", T.INT),
    ("-17", T.INT),
    ("0x1A", T.INT),
    ("0XFF", T.INT),
    ("3.25", T.FLOAT),
    ("-1e3", T.FLOAT),
    ("1.0.2.4", T.IPV4),
    ("0.0.0.0", T.IPV4),
    ("255.255.255.255", T.IPV4),
    ("0x12.12.12.12", T.STR),  # bad octet → not ipv4, falls to Str
    ("2001:db8::1", T.IPV6),
    ("::1", T.IPV6),
    ("684d:1111:222:3333:4444:5555:6:77", T.IPV6),
    ("2021-01-01T00:00:00Z", T.DATE),
    ("2021-01-01T00:00:00+02:00", T.DATE),
    ("2021-01-01", T.STR),  # date-only is NOT rfc3339 datetime
    ("2.a", T.STR),
    ("hello world", T.STR),
]

# ipv6 canonicalization (tests.rs:520-547)
IPV6_CANONICAL = [
    ("684d:1111:222:3333:4444:5555:6:77", "684d:1111:222:3333:4444:5555:6:77"),
    ("2001:db8::1", "2001:db8::1"),
    ("0:0:0:0:0:0:0:1", "::1"),
    ("::1", "::1"),
]
IPV6_INVALID = ["1.0.0.0"]
IPV4_VALID = ["0.0.0.0", "0.0.255.255", "255.255.255.255"]
IPV4_INVALID = ["0x12.12.12.12", "2001:db8::1"]

# merge commutativity object pairs (tests.rs:10-54): dicts of python values;
# the test infers both types, merges both ways, asserts equality.
MERGE_COMMUTATIVE_OBJECT_PAIRS = [
    (
        {"a": 1, "b": 2.0, "c": 1},
        {"a": 1, "b": "2.a", "c": "1.0.2.4"},
    ),
    (
        {"x": {"y": "apple"}, "a": {"b": "pear"}},
        {"x": {"y": None}, "a": {"b": 3}},
    ),
    (
        {"lst": [1, 2.5, "x"], "k": True},
        {"lst": [None], "k": 0},
    ),
]

# route-template golden case (type_map.rs:201-218)
TEMPLATE_GOLDEN = (
    "{{x.y}}_aaa_{{a.b}}_bbb",
    {"x": {"y": "apple"}, "a": {"b": "pear"}},
    "apple_aaa_pear_bbb",
)
