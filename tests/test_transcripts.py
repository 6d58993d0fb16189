"""Transcript generator: determinism, schema, FIXTURES.md coverage."""

from __future__ import annotations

from transner_spark.sources.transcripts import (
    gen_turn,
    generate_transcripts_pdf,
    generate_transcripts_spark,
)


def test_deterministic():
    a = generate_transcripts_pdf(50, 5)
    b = generate_transcripts_pdf(50, 5)
    assert a.equals(b)


def test_schema_and_density(tiny_pdf):
    assert list(tiny_pdf.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert str(tiny_pdf["turn_idx"].dtype) == "int32"
    # dense unique turn_idx per conv
    g = tiny_pdf.groupby("conv_id")["turn_idx"]
    assert (g.nunique() == g.size()).all()
    # monotone ts within conv
    assert (
        tiny_pdf.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["ts"]
        .apply(lambda s: s.is_monotonic_increasing)
        .all()
    )
    assert set(tiny_pdf["role"]) <= {"user", "assistant", "agent", "tool", "system"}


def test_skew_hot_entity():
    pdf = generate_transcripts_pdf(500, 10, skew=True)
    hot = pdf["text"].str.contains("Mario Rossi|Rossi", regex=True).mean()
    assert hot > 0.10  # hot-key fixture really is hot


def test_tool_only_on_tool_roles(tiny_pdf):
    assert (tiny_pdf.loc[tiny_pdf["tool"].notna(), "role"] == "tool").all()


def test_spark_generation_matches_pandas(spark):
    got = (
        generate_transcripts_spark(spark, 30, 5)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        generate_transcripts_pdf(30, 5)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_pure_per_turn():
    assert gen_turn(7, 3) == gen_turn(7, 3)
    assert gen_turn(7, 3)["conv_id"] == "conv-00000007"
