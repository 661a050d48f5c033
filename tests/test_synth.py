"""S2 generator: determinism, schema, FIXTURES.md §1 rules."""

from pyspark.sql import functions as F

from opentsdb_rollup_rust_spark.sources.synth import synth_sequences, MAX_LEN, VOCAB


def test_schema(sequences):
    assert [(f.name, f.dataType.simpleString()) for f in sequences.schema.fields] == [
        ("doc_id", "string"),
        ("tokens", "array<int>"),
        ("n_tok", "int"),
        ("source", "string"),
    ]


def test_deterministic_across_partitionings(spark, sequences):
    again = synth_sequences(spark, 1_000, partitions=7)
    assert again.exceptAll(sequences).count() == 0
    assert sequences.exceptAll(again).count() == 0


def test_value_ranges(sequences):
    row = sequences.agg(
        F.min("n_tok").alias("lo"),
        F.max("n_tok").alias("hi"),
        F.min(F.array_min("tokens")).alias("tlo"),
        F.max(F.array_max("tokens")).alias("thi"),
    ).first()
    assert 1 <= row.lo and row.hi <= MAX_LEN
    assert 0 <= row.tlo and row.thi < VOCAB


def test_n_tok_consistent(sequences):
    assert sequences.where(F.size("tokens") != F.col("n_tok")).count() == 0


def test_source_skew(sequences):
    frac = sequences.where(F.col("source") == "web").count() / sequences.count()
    assert 0.6 < frac < 0.8  # the deliberate hot key


def test_derive_points_arrow_matches_sql(sequences):
    """Golden: the vectorized arrow derive (the scale path / job
    default) is bit-identical to the pure-SQL reference derive."""
    from opentsdb_rollup_rust_spark.operators.points import derive_points

    arrow = derive_points(sequences, keep_doc_id=True, impl="arrow")
    sql = derive_points(sequences, keep_doc_id=True, impl="sql")
    assert arrow.exceptAll(sql).count() == 0
    assert sql.exceptAll(arrow).count() == 0
    assert arrow.count() == sequences.count() * 6  # one point per stat
