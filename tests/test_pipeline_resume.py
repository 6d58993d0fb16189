"""Orchestrator tests: staged commits, lineage metrics, resume after kill."""

from __future__ import annotations

import shutil

from transner_spark.plans.pipeline import STAGES, PipelineRun


def test_pipeline_commits_and_resume(spark, tiny_df, tmp_path):
    workdir = str(tmp_path / "kg")

    run1 = PipelineRun(spark, workdir, run_id="run1")
    out = run1.run(tiny_df)
    assert set(run1.stages_run) == set(STAGES)
    assert run1.stages_skipped == []
    assert out["edges"].count() > 0

    # lineage rows exist for every stage with positive row counts
    lineage = run1.catalog.read("_lineage").toPandas()
    assert set(lineage["stage"]) == set(STAGES)
    assert (lineage.groupby("stage")["rows_out"].sum() >= 0).all()

    e1 = out["edges"].toPandas().sort_values(["subj_id", "pred", "obj_id"]).reset_index(drop=True)

    # simulate a mid-run kill: wipe the trailing stages, rerun
    shutil.rmtree(run1.catalog.path("canonical"))
    shutil.rmtree(run1.catalog.path("edges"))
    shutil.rmtree(run1.catalog.path("serving"))
    run2 = PipelineRun(spark, workdir, run_id="run2")
    out2 = run2.run(tiny_df)
    assert set(run2.stages_run) == {"canonical", "edges", "serving"}
    assert set(run2.stages_skipped) == set(STAGES) - {
        "canonical", "edges", "serving",
    }

    # identical final edge table
    e2 = out2["edges"].toPandas().sort_values(["subj_id", "pred", "obj_id"]).reset_index(drop=True)
    assert e1.equals(e2)

    # full rerun: everything skipped
    run3 = PipelineRun(spark, workdir, run_id="run3")
    run3.run(tiny_df)
    assert run3.stages_run == []
    assert set(run3.stages_skipped) == set(STAGES)


def test_quarantine_routes_overlong(spark, tiny_df, tmp_path):
    from transner_spark.operators.annotate import split_quarantine

    kept, rejected = split_quarantine(tiny_df)
    total = tiny_df.count()
    assert kept.count() + rejected.count() == total
    assert rejected.count() > 0  # the 160-word template occurs in the fixture
    # every quarantined row really is overlong
    for r in rejected.select("text").toPandas()["text"]:
        assert len(r.split()) > 150
