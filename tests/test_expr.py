"""Selector-grammar parser tests, ported from the reference's parser tests
(ndjson-common/src/json_selector_parser.rs:454-657)."""

import pytest

from ndjson_spatial_spark.expr import (
    Selector,
    parse_comparison,
    parse_selector,
    selector_output_name,
)


class TestSelector:
    def test_simple(self):
        assert parse_selector("d.foo").steps == (("key", "foo"),)

    def test_nested(self):
        assert parse_selector("d.properties.AREA").steps == (
            ("key", "properties"),
            ("key", "AREA"),
        )

    def test_root_index(self):
        # `d[24]` (parser.rs:216-233)
        assert parse_selector("d[24]").steps == (("index", 24),)

    def test_mixed_index(self):
        # `d[5].manager.pay` (SURVEY §1.1)
        assert parse_selector("d[5].manager.pay").steps == (
            ("index", 5),
            ("key", "manager"),
            ("key", "pay"),
        )

    def test_trailing_index(self):
        assert parse_selector("d.a[2].c").steps == (
            ("key", "a"),
            ("index", 2),
            ("key", "c"),
        )

    @pytest.mark.parametrize("bad", ["foo", "d.", "d..a", "x.y", "d[", "d[a]"])
    def test_negatives(self, bad):
        with pytest.raises(ValueError):
            parse_selector(bad)

    def test_output_name_joins_segments(self):
        # aggregate output naming (aggregate.rs:34-41): d.foo.baz -> foo_baz
        assert selector_output_name("d.foo.baz") == "foo_baz"


class TestComparison:
    def test_int(self):
        sel, cmp, lit = parse_comparison("d.a > 1")
        assert sel == Selector((("key", "a"),)) and cmp == ">" and lit == 1

    def test_float(self):
        _, cmp, lit = parse_comparison("d.properties.Area >= 30000.0")
        assert cmp == ">=" and lit == 30000.0 and isinstance(lit, float)

    def test_negative_int(self):
        _, _, lit = parse_comparison("d.a == -45")
        assert lit == -45 and isinstance(lit, int)

    def test_bool(self):
        _, cmp, lit = parse_comparison("d.a == true")
        assert lit is True

    def test_null(self):
        _, cmp, lit = parse_comparison("d.a != null")
        assert lit is None and cmp == "!="

    def test_unquoted_string_rest_of_line(self):
        # `d.product == Virtual Currency` (ndjson/README.md usage)
        _, cmp, lit = parse_comparison("d.product == Virtual Currency")
        assert lit == "Virtual Currency"

    def test_le_not_lt(self):
        _, cmp, _ = parse_comparison("d.a <= 5")
        assert cmp == "<="

    def test_leftmost_comparator_wins(self):
        # a bare-string RHS containing a later comparator must not steal
        # the split: `d.product == a>=b` compares against the string "a>=b"
        sel, cmp, lit = parse_comparison("d.product == a>=b")
        assert cmp == "==" and lit == "a>=b"
        assert sel.field_names == ("product",)

    def test_leftmost_with_lt_inside_string(self):
        sel, cmp, lit = parse_comparison("d.tag != x<=y")
        assert cmp == "!=" and lit == "x<=y"

    def test_typed_cascade_order_int_before_float(self):
        # first grammar wins (filter.rs:36-50): "24" is i64 not f64
        _, _, lit = parse_comparison("d.a == 24")
        assert isinstance(lit, int)
