"""BIGDECIMAL decimal(76,38) config type (Schema.java:496-497,724-731;
VERDICT r10 ask #7): beyond Spark's DecimalType precision cap (38), so
string-backed per SURVEY §1.2/§7.3 — string sources keep every digit,
numeric sources render through decimal(38,18) in plain notation."""

from decimal import Decimal

from pyspark.sql import types as T

from pipeline_spark.compilers.select_fns import (
    _is_bigdecimal,
    apply_select,
    spark_type,
)


def test_type_parse():
    assert isinstance(spark_type("bigdecimal"), T.StringType)
    assert isinstance(spark_type("BIGDECIMAL"), T.StringType)
    assert isinstance(spark_type("decimal(76,38)"), T.StringType)
    assert spark_type("decimal(10,2)") == T.DecimalType(10, 2)
    assert spark_type("numeric(20, 4)") == T.DecimalType(20, 4)
    assert spark_type("decimal") == T.DecimalType(38, 9)
    assert isinstance(spark_type("array<bigdecimal>").elementType, T.StringType)
    assert _is_bigdecimal("bigdecimal") and _is_bigdecimal("decimal(39,0)")
    assert not _is_bigdecimal("decimal(38,9)")


def test_string_literal_survives_all_76_digits(spark):
    big = "1234567890" * 3 + "12345678" + "." + "9876543210" * 3 + "98765432"
    assert len(big.replace(".", "")) == 76
    df = spark.createDataFrame([(f"  {big} ",)], "raw string")
    out = apply_select(df, [
        {"name": "bd", "field": "raw", "type": "bigdecimal"},
    ])
    assert out.collect()[0]["bd"] == big
    assert out.schema["bd"].dataType == T.StringType()


def test_numeric_sources_render_plain_notation(spark):
    df = spark.createDataFrame(
        [(1, 0.000000000000000001, Decimal("12.50"))],
        "i long, d double, dec decimal(10,2)",
    )
    out = apply_select(df, [
        {"name": "bi", "field": "i", "type": "bigdecimal"},
        {"name": "bd", "field": "d", "type": "BIGDECIMAL"},
        {"name": "bdec", "field": "dec", "type": "decimal(76,38)"},
    ]).collect()[0]
    assert out["bi"] == "1"  # integral: straight plain render
    assert out["bd"] == "0.000000000000000001"  # no scientific notation
    assert out["bdec"] == "12.5"  # decimal: canonical render (r12)


def test_cast_back_out_and_constant(spark):
    df = spark.createDataFrame([("3.5",)], "bd string")
    out = apply_select(df, [
        {"name": "dbl", "field": "bd", "type": "float64"},
        {"name": "k", "func": "constant", "value": "9" * 40,
         "type": "bigdecimal"},
    ]).collect()[0]
    assert out["dbl"] == 3.5
    assert out["k"] == "9" * 40


def test_create_source_bigdecimal_field(spark):
    from pipeline_spark.registry import ModuleContext, get_module

    fn = get_module("create", "source").fn
    out = fn(ModuleContext(
        spark=spark, name="c",
        params={"elements": [{"x": "1.25"}]},
        config={"schema": {"fields": [
            {"name": "x", "type": "bigdecimal"}]}},
    ))[""]
    assert out.schema["x"].dataType == T.StringType()
    assert out.collect()[0]["x"] == "1.25"


# --------------------------------------------------------------- r11
# review fixes: bound-field classification, overflow tiers, constants.


def test_chained_bound_string_field(spark):
    """A string field bound EARLIER in the same select list must
    classify as a string source (pass-through), not numeric."""
    big = "9" * 40
    df = spark.createDataFrame([(big,)], "raw string")
    out = apply_select(df, [
        {"name": "s", "field": "raw"},
        {"name": "b", "field": "s", "type": "bigdecimal"},
    ]).collect()[0]
    assert out["b"] == big


def test_large_double_renders_integral_tier(spark):
    df = spark.createDataFrame(
        [(1e25, 1e39, None)], "big double, huge double, miss double"
    )
    out = apply_select(df, [
        {"name": "b", "field": "big", "type": "bigdecimal"},
        {"name": "h", "field": "huge", "type": "bigdecimal"},
        {"name": "m", "field": "miss", "type": "bigdecimal"},
    ]).collect()[0]
    assert out["b"] == "1" + "0" * 25  # no crash, plain notation
    assert out["h"] is None  # beyond decimal(76,38)'s 38 integer digits
    assert out["m"] is None


def test_wide_decimal_source_keeps_digits(spark):
    from decimal import Decimal

    df = spark.createDataFrame(
        [(Decimal("9" * 29),)], "d decimal(38,0)"
    )
    out = apply_select(df, [
        {"name": "b", "field": "d", "type": "bigdecimal"},
    ]).collect()[0]
    assert out["b"] == "9" * 29


def test_constant_float_plain_notation(spark):
    df = spark.createDataFrame([(1,)], "x long")
    out = apply_select(df, [
        {"name": "tiny", "func": "constant", "value": 1e-07,
         "type": "bigdecimal"},
        {"name": "big", "func": "constant", "value": 1e21,
         "type": "bigdecimal"},
    ]).collect()[0]
    assert out["tiny"] == "0.0000001"
    assert out["big"] == "1" + "0" * 21


def test_invalid_string_casts_to_null(spark):
    """r12 (ADVICE): a non-numeric string must yield NULL like every
    other Spark numeric cast (and BigDecimal's parse, which rejects
    garbage) — not pass through as a bogus bigdecimal value.  Valid
    decimal literals (sign / fraction / exponent) still pass intact."""
    vals = [
        ("abc", None), ("", None), ("1.2.3", None), ("12a", None),
        ("NaN", None), ("Infinity", None), ("1,5", None), (".", None),
        ("e5", None), ("+", None),
        ("42", "42"), ("-7.25", "-7.25"),
        # r12 canonicalization: one plain-notation shape per VALUE, so
        # equal values from different source types compare equal
        ("+.5", "0.5"), ("3.", "3"), ("007", "7"), ("-00.50", "-0.5"),
        ("1.50", "1.5"), ("-0.000", "0"), ("-0", "0"),
        ("1.5E10", "15000000000"), ("2e-3", "0.002"),
        ("  99  ", "99"),  # trimmed
        # Spark's numeric cast trimAll semantics: ALL whitespace trims
        # (F.trim alone strips only spaces), and Java's $ would match
        # before an embedded trailing newline — both covered (r12)
        ("42\n", "42"), (" 7\t", "7"), ("\n8 ", "8"),
        ("4\n2", None), ("9\nx", None),
        (None, None),
    ]
    df = spark.createDataFrame([(v,) for v, _ in vals], "raw string")
    out = apply_select(df, [
        {"name": "raw", "field": "raw"},
        {"name": "bd", "field": "raw", "type": "bigdecimal"},
    ]).collect()
    got = {r["raw"]: r["bd"] for r in out}
    for v, want in vals:
        assert got[v] == want, (v, got[v], want)
