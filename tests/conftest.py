from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture(scope="session")
def spark():
    from transner_spark.functions.session import get_spark

    s = get_spark(master="local[4]", app_name="transner_spark_tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_pdf() -> pd.DataFrame:
    from transner_spark.sources.transcripts import generate_transcripts_pdf

    return generate_transcripts_pdf(20, 5)


@pytest.fixture(scope="session")
def tiny_df(spark, tiny_pdf):
    return spark.createDataFrame(tiny_pdf)


@pytest.fixture(scope="session")
def oracle_results(tiny_pdf):
    from transner_spark.kernels.oracle import run_oracle_pipeline

    return run_oracle_pipeline(tiny_pdf)


@pytest.fixture(scope="session")
def annotated(spark, tiny_df):
    from transner_spark.operators.annotate import annotate_turns

    ann = annotate_turns(tiny_df).cache()
    ann.count()
    return ann


def assert_pdf_equal(left: pd.DataFrame, right: pd.DataFrame, sort_cols: list[str]):
    """Order-insensitive frame equality with int-dtype normalization."""
    l = left.sort_values(sort_cols).reset_index(drop=True)
    r = right[left.columns.tolist()].sort_values(sort_cols).reset_index(drop=True)
    for c in l.columns:
        if str(l[c].dtype).startswith("int"):
            l[c] = l[c].astype("int64")
        if str(r[c].dtype).startswith("int"):
            r[c] = r[c].astype("int64")
    pd.testing.assert_frame_equal(l, r, check_dtype=False)
